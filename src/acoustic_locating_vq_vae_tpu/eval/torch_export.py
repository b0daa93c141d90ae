"""Export trained parameters to PyTorch state dicts with the reference's
module naming, so weights can move back into the reference implementation.

The reference checkpoints whole pickled modules (train_speech.py:117-118),
which only load inside the reference package; the portable interchange is a
``state_dict`` keyed exactly like the reference modules
(``_encoder._conv_1.weight``, ``_vq._embedding.weight``, ...). This module
produces those dicts from our flax parameter trees, handling the two layout
differences:

  * flax conv kernels (k, in, out) -> torch (out, in, k);
  * our stride-1 ``ConvTranspose1d`` is implemented as a Conv with its own
    kernel; the equivalent torch ``ConvTranspose1d`` weight (in, out, k) is
    the transpose-flip of our kernel (conv_transpose(x, W) ==
    conv(x, flip(W^T)) at stride 1).

The tied residual stack exports the SAME tensors for every layer index,
matching the reference's shared-instance ModuleList (residual_stack.py:40-41).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "vqvae_state_dict",
    "decoder_state_dict",
    "echoed_state_dict",
    "location_state_dict",
    "save_reference_state_dicts",
]


def _t(kernel) -> "np.ndarray":
    """flax conv kernel (k, in, out) -> torch conv weight (out, in, k)."""
    return np.ascontiguousarray(np.asarray(kernel).transpose(2, 1, 0))


def _t_transposed(kernel) -> "np.ndarray":
    """flax conv kernel (k, in, out) -> torch ConvTranspose1d weight (in, out, k)
    via the stride-1 equivalence (flip along k, swap io)."""
    return np.ascontiguousarray(np.asarray(kernel)[::-1].transpose(1, 2, 0))


def _conv_entry(tree, name: str, out: Dict[str, np.ndarray], transposed: bool = False):
    sub = tree["Conv_0"]
    out[f"{name}.weight"] = _t_transposed(sub["kernel"]) if transposed else _t(sub["kernel"])
    if "bias" in sub:
        out[f"{name}.bias"] = np.asarray(sub["bias"])


def _stack_entries(tree, prefix: str, num_layers: int, out: Dict[str, np.ndarray]):
    # tied (reference default): one block replicated across indices
    if "residual" in tree:
        blocks = [tree["residual"]] * num_layers
    else:
        blocks = [tree[f"residual_{i}"] for i in range(num_layers)]
    for i, b in enumerate(blocks):
        base = f"{prefix}._layers.{i}._block"
        # reference Residual block: Sequential(relu, conv_1, relu, conv_2)
        # -> indices 1 and 3 (residual.py:58-64)
        out[f"{base}.1.weight"] = _t(b["conv_1"]["Conv_0"]["kernel"])
        out[f"{base}.3.weight"] = _t(b["conv_2"]["Conv_0"]["kernel"])


def vqvae_state_dict(params: Any, num_residual_layers: int, vq_stats: Any = None) -> Dict[str, np.ndarray]:
    """State dict for a reference ``ConvolutionalVQVAE`` from our params.

    ``vq_stats``: pass the TrainState.variables["vq_stats"] of an EMA-trained
    model (whose codebook lives outside params).
    """
    out: Dict[str, np.ndarray] = {}
    enc = params["_encoder"]
    _conv_entry(enc["conv_1"], "_encoder._conv_1", out)
    _stack_entries(enc["residual_stack"], "_encoder._residual_stack", num_residual_layers, out)

    _conv_entry(params["_pre_vq_conv"], "_pre_vq_conv", out)

    if vq_stats is not None and "codebook" in vq_stats.get("_vq", {}):
        codebook = vq_stats["_vq"]["codebook"]
    else:
        codebook = params["_vq"]["codebook"]
    out["_vq._embedding.weight"] = np.asarray(codebook)

    dec = params["_decoder"]
    _conv_entry(dec["conv_1"], "_decoder._conv_1", out)
    _stack_entries(dec["residual_stack"], "_decoder._residual_stack", num_residual_layers, out)
    for i in (1, 2, 3):
        _conv_entry(dec[f"conv_trans_{i}"], f"_decoder._conv_trans_{i}", out, transposed=True)
    return out


def decoder_state_dict(
    dec_params: Any, num_residual_layers: int, prefix: str = "_decoder"
) -> Dict[str, np.ndarray]:
    """State dict for a standalone reference ``DeconvolutionalDecoder``
    (deconvolutional_decoder.py:7-79) from our decoder param subtree."""
    out: Dict[str, np.ndarray] = {}
    _conv_entry(dec_params["conv_1"], f"{prefix}._conv_1", out)
    _stack_entries(dec_params["residual_stack"], f"{prefix}._residual_stack", num_residual_layers, out)
    for i in (1, 2, 3):
        _conv_entry(dec_params[f"conv_trans_{i}"], f"{prefix}._conv_trans_{i}", out, transposed=True)
    return out


def echoed_state_dict(
    params: Any,
    rir_residual_layers: int,
    speech_residual_layers: int,
    decoder_residual_layers: int,
) -> Dict[str, np.ndarray]:
    """State dict for the reference ``EchoedSpeechReconModel``
    (echoed_speech_model.py:9-56): the two sub-VQ-VAEs under their attribute
    prefixes plus the fresh composite decoder."""
    out: Dict[str, np.ndarray] = {}
    for name, layers in (("rir_model", rir_residual_layers), ("speech_model", speech_residual_layers)):
        for k, v in vqvae_state_dict(params[name], num_residual_layers=layers).items():
            out[f"{name}.{k}"] = v
    out.update(decoder_state_dict(params["_decoder"], decoder_residual_layers))
    return out


def location_state_dict(params: Any) -> Dict[str, np.ndarray]:
    """State dict for the reference ``LocationModule`` (location_model.py:10-18)."""
    out: Dict[str, np.ndarray] = {}
    for i in (1, 2, 3, 4, 5):
        sub = params[f"fc_{i}"]["Dense_0"]
        out[f"fc_{i}.weight"] = np.ascontiguousarray(np.asarray(sub["kernel"]).T)
        out[f"fc_{i}.bias"] = np.asarray(sub["bias"])
    return out


def save_reference_state_dicts(path: str, dicts: Dict[str, Dict[str, np.ndarray]]) -> None:
    """torch.save a {model_name: state_dict} bundle (tensors)."""
    import torch

    bundle = {
        name: {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
        for name, sd in dicts.items()
    }
    torch.save(bundle, path)
