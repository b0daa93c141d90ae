"""Import reference PyTorch checkpoints into framework parameter trees.

The inverse of :mod:`torch_export`. The reference's pickled whole-module
checkpoints ARE its inter-stage API (train_echoed_speech.py:18-19,
train_location.py:38): every downstream stage starts from a ``torch.load``
of the previous stage's model. This module lets a reference-trained model
continue inside the framework — evaluate, fine-tune, or hand off — by
mapping its ``state_dict`` onto our flax param trees.

Layout inversions (see torch_export for the forward direction):

  * torch conv weight (out, in, k) -> flax kernel (k, in, out);
  * torch ``ConvTranspose1d`` weight (in, out, k) -> our stride-1 conv
    kernel via flip-transpose (conv_transpose(x, W) == conv(x, flip(W^T))).

The reference's tied residual stacks (residual_stack.py:40-41, one module
instance replicated N times) serialize as N identical per-layer tensors;
import detects equality and produces the tied single-block tree, falling
back to the untied ``residual_{i}`` tree when layers differ (e.g. a model
trained with the fixed untied variant exported back to torch).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "torch_state_dict",
    "vqvae_params",
    "decoder_params",
    "echoed_params",
    "location_params",
]


def torch_state_dict(obj: Any) -> Dict[str, np.ndarray]:
    """Normalize a checkpoint handle into ``{key: np.ndarray}``.

    Accepts a live ``nn.Module``, an already-extracted state dict (tensors
    or arrays), or a path to a ``torch.save`` file (whole-module pickle —
    the reference's format, requires the reference package importable — or
    a plain state-dict/tensor-bundle save).
    """
    if isinstance(obj, str):
        import torch

        loaded = torch.load(obj, map_location="cpu", weights_only=False)
        return torch_state_dict(loaded)
    if hasattr(obj, "state_dict") and callable(obj.state_dict):
        obj = obj.state_dict()
    out = {}
    for k, v in dict(obj).items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _f(weight: np.ndarray) -> np.ndarray:
    """torch conv weight (out, in, k) -> flax kernel (k, in, out)."""
    return np.ascontiguousarray(np.asarray(weight).transpose(2, 1, 0)).astype(np.float32)


def _f_transposed(weight: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d weight (in, out, k) -> flax stride-1 conv kernel
    (k, in, out): inverse of torch_export._t_transposed (flip k, swap io)."""
    w = np.asarray(weight)
    return np.ascontiguousarray(w.transpose(2, 0, 1)[::-1]).astype(np.float32)


def _conv_tree(sd: Dict[str, np.ndarray], name: str, transposed: bool = False) -> Dict[str, Any]:
    sub: Dict[str, np.ndarray] = {
        "kernel": _f_transposed(sd[f"{name}.weight"]) if transposed else _f(sd[f"{name}.weight"])
    }
    if f"{name}.bias" in sd:
        sub["bias"] = np.asarray(sd[f"{name}.bias"]).astype(np.float32)
    return {"Conv_0": sub}


def _infer_layers(sd: Dict[str, np.ndarray], prefix: str) -> int:
    n = 0
    while f"{prefix}._layers.{n}._block.1.weight" in sd:
        n += 1
    if n == 0:
        raise KeyError(f"no residual layers found under {prefix!r}")
    return n


def _stack_tree(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    n = _infer_layers(sd, prefix)
    blocks = [
        {
            "conv_1": {"Conv_0": {"kernel": _f(sd[f"{prefix}._layers.{i}._block.1.weight"])}},
            "conv_2": {"Conv_0": {"kernel": _f(sd[f"{prefix}._layers.{i}._block.3.weight"])}},
        }
        for i in range(n)
    ]
    tied = all(
        np.array_equal(blocks[i]["conv_1"]["Conv_0"]["kernel"], blocks[0]["conv_1"]["Conv_0"]["kernel"])
        and np.array_equal(blocks[i]["conv_2"]["Conv_0"]["kernel"], blocks[0]["conv_2"]["Conv_0"]["kernel"])
        for i in range(n)
    )
    if tied:
        return {"residual": blocks[0]}
    return {f"residual_{i}": b for i, b in enumerate(blocks)}


def decoder_params(checkpoint: Any, prefix: str = "_decoder") -> Dict[str, Any]:
    """Param subtree for our ``DeconvolutionalDecoder`` from a reference
    decoder's state-dict keys under ``prefix`` (deconvolutional_decoder.py)."""
    sd = torch_state_dict(checkpoint)
    tree: Dict[str, Any] = {
        "conv_1": _conv_tree(sd, f"{prefix}._conv_1"),
        "residual_stack": _stack_tree(sd, f"{prefix}._residual_stack"),
    }
    for i in (1, 2, 3):
        tree[f"conv_trans_{i}"] = _conv_tree(sd, f"{prefix}._conv_trans_{i}", transposed=True)
    return tree


def vqvae_params(checkpoint: Any, prefix: str = "") -> Dict[str, Any]:
    """Full param tree for our ``ConvolutionalVQVAE`` from a reference
    ``ConvolutionalVQVAE`` module / state dict / pickle path
    (convolutional_vq_vae.py:18-105). Residual layer count and tying are
    inferred from the checkpoint."""
    sd = torch_state_dict(checkpoint)
    if prefix:
        plen = len(prefix) + 1
        sd = {k[plen:]: v for k, v in sd.items() if k.startswith(prefix + ".")}
    return {
        "_encoder": {
            "conv_1": _conv_tree(sd, "_encoder._conv_1"),
            "residual_stack": _stack_tree(sd, "_encoder._residual_stack"),
        },
        "_pre_vq_conv": _conv_tree(sd, "_pre_vq_conv"),
        "_vq": {"codebook": np.asarray(sd["_vq._embedding.weight"]).astype(np.float32)},
        "_decoder": decoder_params(sd),
    }


def echoed_params(checkpoint: Any) -> Dict[str, Any]:
    """Param tree for our ``EchoedSpeechReconModel`` from a reference
    composite checkpoint (echoed_speech_model.py:9-56): the two sub-VQ-VAEs
    under their attribute names plus the fresh decoder."""
    sd = torch_state_dict(checkpoint)
    return {
        "rir_model": vqvae_params(sd, prefix="rir_model"),
        "speech_model": vqvae_params(sd, prefix="speech_model"),
        "_decoder": decoder_params(sd),
    }


def location_params(checkpoint: Any) -> Dict[str, Any]:
    """Param tree for our ``LocationModule`` from the reference MLP
    (location_model.py:5-29)."""
    sd = torch_state_dict(checkpoint)
    return {
        f"fc_{i}": {
            "Dense_0": {
                "kernel": np.ascontiguousarray(np.asarray(sd[f"fc_{i}.weight"]).T).astype(np.float32),
                "bias": np.asarray(sd[f"fc_{i}.bias"]).astype(np.float32),
            }
        }
        for i in (1, 2, 3, 4, 5)
    }
