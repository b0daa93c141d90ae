"""The five training-stage task specs (BASELINE.json configs).

Each reference entry-point script hard-wired its own loop, normalization,
permutes, and loss (SURVEY.md §3.2-3.5). Here each stage is a declarative
``Task``: model factory + per-batch wiring + loss. One generic mesh-sharded
loop (train/loop.py) runs them all.

Stage hyperparameters are the reference's:
  speech   train_speech.py:24-44   B=32 lr=1e-3 15k  H=1024 L=3 RH=1024 D=128 K=1024 jitter
  rir      train_rir.py:120-137    B=32 lr=1e-3 15k  in=500 H=1024 L=2 RH=64  D=64  K=1024 out=1
  echoed   train_echoed_speech.py:21-31  B=64 lr=1e-3 15k  H=1024 L=2 RH=1024 jitter
  finetune encoder_training_echoed_model.py:22-28  B=64 lr=1e-5 5k (train_encoder=True)
  location train_location.py:22-27,39  B=16 lr=1e-3 15k  MLP(201,1024,1), target theta/pi
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import unfreeze

from ..data.config import DatasetConfig
from ..data.synth import SampleBatch
from ..dsp import znorm
from ..models import (
    ConvolutionalVQVAE,
    EchoedSpeechReconModel,
    JointLocationModel,
    LocationModule,
)

__all__ = [
    "Task",
    "SpeechVQVAETask",
    "RirVQVAETask",
    "EchoedSpeechTask",
    "EncoderFinetuneTask",
    "LocationTask",
    "JointLocationTask",
    "make_task",
    "graft_pretrained",
]


@dataclasses.dataclass(frozen=True)
class Task:
    """A training stage: model + batch wiring + loss."""

    name: str
    learning_rate: float
    batch_size: int
    num_updates: int
    eval_every: int = 500  # reference's n_samples_test_on_validation_set
    ckpt_every: int = 1000

    def build_model(self) -> nn.Module:
        raise NotImplementedError

    def model_inputs(self, batch: SampleBatch) -> Tuple:
        """Positional model inputs extracted from a SampleBatch."""
        raise NotImplementedError

    def loss(
        self, model: nn.Module, params, batch: SampleBatch, rngs: Dict, train: bool,
        variables=None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """``variables``: non-trainable collections (e.g. EMA vq_stats);
        implementations that mutate them return the update under the
        reserved metrics key ``"_variables"``."""
        raise NotImplementedError

    @property
    def rng_streams(self) -> Tuple[str, ...]:
        return ("jitter",)

    @property
    def init_truncate(self) -> bool:
        """Whether parameter shapes are independent of the sequence length
        (stride-1 conv stacks), letting init run on a short truncation."""
        return True

    @property
    def resident_fields(self) -> Tuple[str, ...]:
        """SampleBatch fields this task's loss actually reads. A 20k-scale
        resident dataset stores ~1.2 MB/sample across all spectrogram leaves
        (over one chip's HBM, reference 20k_set: train_rir.py:121); pruning
        to the stage's fields (make_dataset keep_fields=) cuts that ~3x, and
        bf16 storage halves it again — 20k x speech = 4 GB, resident."""
        return ("speech_spec", "rir_spec", "echoed_spec", "fs", "theta", "wiener_est")

    @property
    def supports_cache(self) -> bool:
        """Whether the task exposes a frozen path the Trainer may cache
        (build_cache / loss_cached or feats_from_codes). Default: no."""
        return False



def _dtype(name: str):
    return {"float32": None, "bfloat16": jnp.bfloat16}[name]


def _apply_vqvae(model, params, x, rngs, train, ema: bool, variables):
    """Apply a ConvolutionalVQVAE, threading the mutable vq_stats collection
    when the codebook is EMA-learned. EMA statistics only update on training
    steps (train_vq=train there; gradient mode keeps the reference's
    always-on q-latent loss value)."""
    if ema:
        (out, mutated) = model.apply(
            {"params": params, **(variables or {})}, x,
            train=train, train_vq=train, rngs=rngs, mutable=["vq_stats"],
        )
        metrics = {"_variables": dict(mutated)} if train else {}
        return out, metrics
    out = model.apply({"params": params}, x, train=train, rngs=rngs)
    return out, {}

def _scale(v: int, width_scale: float, floor: int = 4) -> int:
    return max(floor, int(v * width_scale))


@dataclasses.dataclass(frozen=True)
class SpeechVQVAETask(Task):
    """Clean-speech power-spectrogram reconstruction (train_speech.py)."""

    name: str = "speech"
    learning_rate: float = 1e-3
    batch_size: int = 32
    num_updates: int = 15000
    config: DatasetConfig = DatasetConfig()
    width_scale: float = 1.0  # <1 for smoke/test configs
    vq_backend: str = "xla"
    compute_dtype: str = "float32"  # "bfloat16" for MXU-rate mixed precision
    vq_ema: bool = False  # EMA codebook (option; gradient mode = reference parity)
    # Mesh axis sharding the TIME dimension (long-sequence training,
    # SURVEY.md §5.7); implies the fixed channels-last VQ flatten.
    sequence_axis: object = None
    # None (auto) = the reference's memory-order flatten
    # (vector_quantizer.py:32) unless sequence_axis is set (which needs the
    # position-local vectors flatten). Explicit True together with
    # sequence_axis raises in the model rather than silently overriding the
    # requested compat semantics.
    compat_vq_flatten: Optional[bool] = None

    def build_model(self) -> ConvolutionalVQVAE:
        s = lambda v: _scale(v, self.width_scale)
        return ConvolutionalVQVAE(
            in_channels=self.config.num_freq,
            num_hiddens=s(1024),
            embedding_dim=s(128),
            num_residual_layers=3,
            num_residual_hiddens=s(1024),
            commitment_cost=0.25,
            num_embeddings=s(1024),
            use_jitter=True,
            vq_backend=self.vq_backend,
            compute_dtype=_dtype(self.compute_dtype),
            vq_ema=self.vq_ema,
            sequence_axis=self.sequence_axis,
            compat_vq_flatten=(
                self.compat_vq_flatten
                if self.compat_vq_flatten is not None
                else self.sequence_axis is None
            ),
        )

    @property
    def resident_fields(self) -> Tuple[str, ...]:
        return ("speech_spec", "fs", "theta")

    def model_inputs(self, batch: SampleBatch) -> Tuple:
        # abs + z-norm over the freq dim (train_speech.py:63-64)
        x = znorm(jnp.abs(batch.speech_spec), axis=1)
        return (x,)

    def loss(self, model, params, batch, rngs, train, variables=None):
        (x,) = self.model_inputs(batch)
        out, metrics = _apply_vqvae(model, params, x, rngs, train, self.vq_ema, variables)
        vq_loss, recon, perplexity = out
        recon = recon[..., : x.shape[-1]]  # trim guard (train_speech.py:70-72)
        recon_error = jnp.mean((recon - x) ** 2)
        loss = recon_error + vq_loss  # train_speech.py:88
        metrics.update(recon_error=recon_error, vq_loss=vq_loss, perplexity=perplexity)
        return loss, metrics


@dataclasses.dataclass(frozen=True)
class RirVQVAETask(Task):
    """RIR VQ-VAE: transposed spectrogram in, Wiener estimate out (train_rir.py)."""

    name: str = "rir"
    learning_rate: float = 1e-3
    batch_size: int = 32
    num_updates: int = 15000
    config: DatasetConfig = DatasetConfig()
    width_scale: float = 1.0
    vq_backend: str = "xla"
    compute_dtype: str = "float32"
    vq_ema: bool = False
    # Present for interface symmetry but REJECTED: this task's conv length
    # is the 201-bin freq axis (it feeds the transposed spectrogram,
    # train_rir.py:45) and its z-norm reduces over that axis, so sharding it
    # would both be pointless (it is short) and silently wrong (shard-local
    # normalization statistics).
    sequence_axis: object = None
    compat_vq_flatten: Optional[bool] = None

    def build_model(self) -> ConvolutionalVQVAE:
        if self.sequence_axis is not None:
            raise ValueError(
                "RirVQVAETask does not support sequence parallelism: its conv "
                "length is the (short) freq axis and znorm reduces over it; "
                "use sequence parallelism on the speech stage"
            )
        s = lambda v: _scale(v, self.width_scale)
        return ConvolutionalVQVAE(
            in_channels=self.config.num_frames,  # 500 time-frames-as-channels (train_rir.py:125)
            num_hiddens=s(1024),
            embedding_dim=s(64),
            num_residual_layers=2,
            num_residual_hiddens=s(64),
            commitment_cost=0.25,
            num_embeddings=s(1024),
            use_jitter=False,
            out_channels=1,
            vq_backend=self.vq_backend,
            compute_dtype=_dtype(self.compute_dtype),
            vq_ema=self.vq_ema,
            compat_vq_flatten=(
                self.compat_vq_flatten if self.compat_vq_flatten is not None else True
            ),
        )

    @property
    def resident_fields(self) -> Tuple[str, ...]:
        return ("rir_spec", "wiener_est", "fs", "theta")

    def model_inputs(self, batch: SampleBatch) -> Tuple:
        # z-norm over dim 1 THEN permute (B,F,T)->(B,T,F) (train_rir.py:44-45)
        x = znorm(batch.rir_spec, axis=1)
        return (jnp.swapaxes(x, 1, 2),)

    def loss(self, model, params, batch, rngs, train, variables=None):
        (x,) = self.model_inputs(batch)
        target = znorm(batch.wiener_est, axis=1)[:, None, :]  # (B,1,F) (train_rir.py:46-49)
        out, metrics = _apply_vqvae(model, params, x, rngs, train, self.vq_ema, variables)
        vq_loss, recon, perplexity = out
        recon = recon[..., : target.shape[-1]]  # trim guard (train_rir.py:54-58)
        recon_error = jnp.mean((recon - target) ** 2)
        loss = recon_error + vq_loss  # train_rir.py:72
        metrics.update(recon_error=recon_error, vq_loss=vq_loss, perplexity=perplexity)
        return loss, metrics


def _echoed_model(
    config: DatasetConfig, width_scale: float, vq_backend: str,
    compute_dtype: str = "float32", compat_vq_flatten: Optional[bool] = None,
    sequence_axis: object = None,
):
    # None (auto) resolves like SpeechVQVAETask: compat unless sequence
    # parallelism forces the position-local vectors flatten (explicit True +
    # sequence_axis raises in the speech model's setup, never overridden
    # silently). One flag governs BOTH branches so the stage-1/2 handoff
    # codebooks keep matching code semantics.
    if compat_vq_flatten is None:
        compat_vq_flatten = sequence_axis is None
    s = lambda v: _scale(v, width_scale)
    dt = _dtype(compute_dtype)
    rir_model = ConvolutionalVQVAE(
        in_channels=config.num_frames, num_hiddens=s(1024), embedding_dim=s(64),
        num_residual_layers=2, num_residual_hiddens=s(64), commitment_cost=0.25,
        num_embeddings=s(1024), use_jitter=False, out_channels=1, vq_backend=vq_backend,
        compute_dtype=dt, compat_vq_flatten=compat_vq_flatten,
    )
    speech_model = ConvolutionalVQVAE(
        in_channels=config.num_freq, num_hiddens=s(1024), embedding_dim=s(128),
        num_residual_layers=3, num_residual_hiddens=s(1024), commitment_cost=0.25,
        num_embeddings=s(1024), use_jitter=True, vq_backend=vq_backend,
        compute_dtype=dt, compat_vq_flatten=compat_vq_flatten,
        sequence_axis=sequence_axis,
    )
    # Composite decoder config: train_echoed_speech.py:23-27 (H=1024, 2 res
    # layers, res-H=1024, jitter on; out_channels = spectrogram freq bins).
    return EchoedSpeechReconModel(
        rir_model=rir_model,
        speech_model=speech_model,
        out_channels=config.num_freq,
        num_hiddens=s(1024),
        num_residual_layers=2,
        num_residual_hiddens=s(1024),
        use_jitter=True,
        compute_dtype=dt,
        sequence_axis=sequence_axis,
    )


@dataclasses.dataclass(frozen=True)
class EchoedSpeechTask(Task):
    """Frozen-encoder composite: train the fresh decoder to reconstruct the
    echoed spectrogram (train_echoed_speech.py)."""

    name: str = "echoed"
    learning_rate: float = 1e-3
    batch_size: int = 64
    num_updates: int = 15000
    config: DatasetConfig = DatasetConfig()
    width_scale: float = 1.0
    vq_backend: str = "xla"
    compute_dtype: str = "float32"
    train_encoder: bool = False
    # Weight on the branch VQ losses (commitment terms) added to the recon
    # loss. The reference's phase-2 loss is recon-only, which lets unfrozen
    # encoders drift from the frozen codebooks until they collapse
    # (VALIDATION.md); a nonzero weight anchors them. 0.0 = reference parity.
    # Only meaningful with train_encoder=True: on a FROZEN stage the
    # stop-gradient'd latents give encoders no recon gradient, so the anchor
    # becomes their only gradient — unopposed commitment pull collapses them
    # (measured: speech perplexity -> 1.0, VALIDATION.md round 2).
    commitment_weight: float = 0.0
    compat_vq_flatten: Optional[bool] = None
    # Mesh axis sharding the speech TIME dimension (SURVEY.md §5.7): the
    # speech branch and composite decoder run time-sharded (halo convs); the
    # RIR branch all-gathers its transposed input and computes its short
    # latent replicated per shard (see EchoedSpeechReconModel.sequence_axis).
    # Implies the vectors VQ flatten, like SpeechVQVAETask.
    sequence_axis: object = None

    def build_model(self) -> EchoedSpeechReconModel:
        return _echoed_model(
            self.config, self.width_scale, self.vq_backend, self.compute_dtype,
            compat_vq_flatten=self.compat_vq_flatten,
            sequence_axis=self.sequence_axis,
        )

    @property
    def resident_fields(self) -> Tuple[str, ...]:
        return ("echoed_spec", "fs", "theta")

    def model_inputs(self, batch: SampleBatch) -> Tuple:
        x = znorm(batch.echoed_spec, axis=1)  # train_echoed_speech.py:64
        return x, jnp.swapaxes(x, 1, 2)

    def loss(self, model, params, batch, rngs, train, variables=None):
        x, x_rir = self.model_inputs(batch)
        recon, speech_perp, rir_perp, vq_losses = model.apply(
            {"params": params}, x, x_rir, train=train,
            train_encoder=self.train_encoder, rngs=rngs, return_vq_losses=True,
        )
        recon = recon[..., : x.shape[-1]]
        recon_error = jnp.mean((recon - x) ** 2)
        # loss = recon only (train_echoed_speech.py:89); VQ/codebooks frozen.
        # Optional commitment anchor for unfrozen encoders (non-compat).
        loss = recon_error
        if self.commitment_weight:
            loss = loss + self.commitment_weight * (vq_losses["speech"] + vq_losses["rir"])
        return loss, {
            "recon_error": recon_error,
            "speech_perplexity": speech_perp,
            "rir_perplexity": rir_perp,
        }

    # ----- frozen-latent cache (TPU-native optimization, no reference
    # counterpart: train_echoed_speech.py re-runs both frozen encoder stacks
    # every step even though their outputs are constant per sample) -----

    @property
    def supports_cache(self) -> bool:
        # Frozen branches only: with train_encoder=True the encoder outputs
        # change every step; with a commitment anchor the branch VQ losses
        # (not cached) enter the loss.
        return not self.train_encoder and not self.commitment_weight

    @property
    def cached_frozen_subtrees(self) -> Tuple[str, ...]:
        """Param subtrees the cache assumes bit-constant (Trainer verifies
        these when a caller-supplied optimizer is in play)."""
        return ("rir_model", "speech_model")

    def build_cache(self, model, params, batch: SampleBatch):
        """Per-sample frozen-branch VQ code ids (exact, compact)."""
        x, x_rir = self.model_inputs(batch)
        return model.apply({"params": params}, x, x_rir, method=model.encode_codes)

    def loss_cached(self, model, params, batch, cache, rngs, train):
        """Decoder-only step from cached codes — bit-equivalent to loss()
        in this task's frozen configuration (same quantized latents, same
        jitter stream, same metrics), minus both encoder stacks."""
        x, _ = self.model_inputs(batch)
        recon, speech_perp, rir_perp = model.apply(
            {"params": params}, cache["speech_codes"], cache["rir_codes"],
            train=train, rngs=rngs, method=model.decode_from_codes,
        )
        recon = recon[..., : x.shape[-1]]
        recon_error = jnp.mean((recon - x) ** 2)
        return recon_error, {
            "recon_error": recon_error,
            "speech_perplexity": speech_perp,
            "rir_perplexity": rir_perp,
        }


@dataclasses.dataclass(frozen=True)
class EncoderFinetuneTask(EchoedSpeechTask):
    """Phase 2: unfreeze encoders at lr=1e-5 (encoder_training_echoed_model.py)."""

    name: str = "finetune"
    learning_rate: float = 1e-5
    num_updates: int = 5000
    train_encoder: bool = True


@dataclasses.dataclass(frozen=True)
class LocationTask(Task):
    """Angle regression from RIR-branch one-hot encodings (train_location.py)."""

    name: str = "location"
    learning_rate: float = 1e-3
    batch_size: int = 16
    num_updates: int = 15000
    config: DatasetConfig = DatasetConfig()
    width_scale: float = 1.0
    vq_backend: str = "xla"
    compute_dtype: str = "float32"
    output_dim: int = 1
    # "encodings": flattened one-hot code assignments, the reference input
    # (train_location.py:69-75). "quantized": the RIR-branch quantized
    # latents — a denser fixed-variant input the reference lacks.
    input_mode: str = "encodings"
    # "normalized_angle": regress theta/pi with MSE (the reference target,
    # train_location.py:77-78 — discontinuous at the +-pi wrap).
    # "sincos": regress (sin theta, cos theta) and decode with atan2 — the
    # circular fixed-variant.
    target_mode: str = "normalized_angle"
    compat_vq_flatten: Optional[bool] = None

    def build_model(self) -> LocationModule:
        if self.input_mode == "quantized":
            width = _scale(64, self.width_scale)  # rir embedding_dim
        else:
            width = _scale(1024, self.width_scale)  # rir num_embeddings (K)
        out_dim = 2 if self.target_mode == "sincos" else self.output_dim
        # LocationModule(201, 1024, 1) (train_location.py:39): flattens
        # (B, F, width) features.
        return LocationModule(
            encoder_output_dim=self.config.num_freq,
            num_hiddens=width,
            output_dim=out_dim,
        )

    def build_composite(self) -> EchoedSpeechReconModel:
        return _echoed_model(
            self.config, self.width_scale, self.vq_backend, self.compute_dtype,
            compat_vq_flatten=self.compat_vq_flatten,
        )

    def encodings_from_composite(self, composite, composite_params, batch: SampleBatch):
        """Frozen RIR-branch one-hot encodings, reshaped (B, F, K)
        (train_location.py:63-74)."""
        x = znorm(batch.echoed_spec, axis=1)
        x_trans = jnp.swapaxes(x, 1, 2)
        _, q, _, enc = composite.rir_model.apply(
            {"params": composite_params["rir_model"]},
            x_trans,
            method=composite.rir_model.get_latent_representation,
            need_encodings=self.input_mode == "encodings",
        )
        if self.input_mode == "quantized":
            feats = jnp.swapaxes(q, 1, 2)  # (B, F, D_rir)
        else:
            feats = enc.reshape(q.shape[0], self.config.num_freq, -1)
        return jax.lax.stop_gradient(feats)

    # ----- frozen-latent cache: the whole composite is frozen at location
    # time (train_location.py:69), so the RIR-branch codes are constant per
    # sample — cache them and the step reduces to the MLP. -----

    @property
    def supports_cache(self) -> bool:
        return True

    def build_cache(self, composite, composite_params, batch: SampleBatch):
        x = znorm(batch.echoed_spec, axis=1)
        x_trans = jnp.swapaxes(x, 1, 2)
        codes = composite.rir_model.apply(
            {"params": composite_params["rir_model"]},
            x_trans,
            method=composite.rir_model.get_latent_codes,
        )
        return {"rir_codes": codes}

    def feats_from_codes(self, composite, composite_params, cache):
        """Rebuild the location input from cached codes — identical to
        encodings_from_composite (one-hot of the same ids / codebook lookup
        of the same ids) without the encoder forward."""
        codes = cache["rir_codes"]  # (B, F)
        if self.input_mode == "quantized":
            q = composite.rir_model.apply(
                {"params": composite_params["rir_model"]},
                codes,
                method=composite.rir_model.codes_to_latent,
            )  # (B, D_rir, F)
            feats = jnp.swapaxes(q, 1, 2)
        else:
            k = composite.rir_model.num_embeddings
            feats = jax.nn.one_hot(codes, k, dtype=jnp.float32)  # (B, F, K)
        return jax.lax.stop_gradient(feats)

    @property
    def resident_fields(self) -> Tuple[str, ...]:
        return ("echoed_spec", "fs", "theta")

    def model_inputs(self, batch: SampleBatch) -> Tuple:
        raise RuntimeError("LocationTask needs composite encodings; use loss()")

    def loss(self, model, params, batch, rngs, train, encodings=None, variables=None):
        assert encodings is not None, "pass precomputed encodings"
        pred = model.apply({"params": params}, encodings)
        theta = batch.theta.reshape(-1, 1).astype(pred.dtype)
        if self.target_mode == "sincos":
            target = jnp.concatenate([jnp.sin(theta), jnp.cos(theta)], axis=1)
        else:
            target = theta / jnp.pi
        loss = jnp.mean((pred - target) ** 2)  # train_location.py:77-78
        return loss, {"location_error": loss}

    def decode_angle(self, pred: jnp.ndarray) -> jnp.ndarray:
        """Model output -> angle in radians."""
        if self.target_mode == "sincos":
            return jnp.arctan2(pred[:, 0], pred[:, 1])
        return pred.reshape(-1) * jnp.pi

    @property
    def rng_streams(self) -> Tuple[str, ...]:
        return ()


def graft_pretrained(
    composite_params,
    speech_params=None,
    rir_params=None,
    speech_variables=None,
    rir_variables=None,
):
    """Stage handoff: insert pretrained VQ-VAE parameter trees into a freshly
    initialized composite — the functional equivalent of the reference's
    whole-module pickle loading (train_echoed_speech.py:18-19).

    ``*_variables``: the TrainState.variables of an EMA-trained stage; its
    vq_stats codebook is grafted into the composite's (param-mode, frozen)
    codebook slot, converting EMA -> frozen-parameter representation.
    """
    p = unfreeze(composite_params) if hasattr(composite_params, "unfreeze") else dict(composite_params)
    # Copy the grafted trees: the next stage's jitted step donates its
    # TrainState, which would otherwise invalidate the donor stage's params.
    copy = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(a), t)
    if speech_params is not None:
        p["speech_model"] = copy(speech_params)
    if rir_params is not None:
        p["rir_model"] = copy(rir_params)

    def graft_codebook(model_key, variables):
        cb = variables["vq_stats"]["_vq"]["codebook"]
        sub = dict(p[model_key])
        sub["_vq"] = {**dict(sub.get("_vq", {})), "codebook": jnp.array(cb)}
        p[model_key] = sub

    if speech_variables:
        graft_codebook("speech_model", speech_variables)
    if rir_variables:
        graft_codebook("rir_model", rir_variables)
    return p


def resolved_vq_flatten(task) -> bool:
    """The task's build_model compat/vectors VQ-flatten resolution as a bool
    (True = the reference's memory-order compat flatten,
    vector_quantizer.py:32). ``None`` resolves exactly like the model
    builders: compat UNLESS sequence parallelism forces the position-local
    vectors flatten."""
    v = getattr(task, "compat_vq_flatten", None)
    if v is None:
        v = getattr(task, "sequence_axis", None) is None
    return bool(v)


def check_flatten_handoff(donor_meta: dict, task, donor_label: str) -> None:
    """Guard a stage handoff against a VQ-flatten mode mismatch.

    The two flatten modes produce IDENTICAL parameter shapes but different
    code semantics (the compat mode quantizes memory-order time-chunks, the
    vectors mode channel vectors — vector_quantizer.py:32), so grafting a
    codebook trained in one mode into a composite resolved to the other
    succeeds structurally and then trains on garbage latents with no error.
    ``donor_meta`` is the donor stage's StageStore metadata; stores that
    predate the metadata (no ``compat_vq_flatten`` key) skip the check — the
    eval-side pre-metadata warning covers those.
    """
    if "compat_vq_flatten" not in donor_meta:
        return
    donor = bool(donor_meta["compat_vq_flatten"])
    mine = resolved_vq_flatten(task)
    if donor != mine:
        names = {True: "compat", False: "vectors"}
        raise ValueError(
            f"VQ flatten mismatch: stage {donor_label!r} was trained with the "
            f"{names[donor]!r} flatten but task {task.name!r} resolves to "
            f"{names[mine]!r}. The codebooks are shape-compatible but their "
            "codes mean different things, so the handoff would silently "
            "corrupt training. Re-run this stage with --vq-flatten "
            f"{names[donor]} (or retrain the donor with --vq-flatten "
            f"{names[mine]})."
        )


@dataclasses.dataclass(frozen=True)
class JointLocationTask(Task):
    """Joint location fine-tuning: RIR encoder + location head trained
    together on the angle loss — a beyond-parity stage the reference lacks
    (train_location.py:69 freezes the composite). Seeds the encoder from a
    pretrained composite's rir_model subtree (``seed_params``); gradients
    flow through the VQ straight-through estimator; the commitment term of
    the frozen-codebook VQ loss anchors the encoder (the same fix validated
    for the phase-2 collapse, VALIDATION.md)."""

    name: str = "location_joint"
    learning_rate: float = 1e-4  # encoder fine-tuning: lower than the MLP-only 1e-3
    batch_size: int = 16
    num_updates: int = 15000
    config: DatasetConfig = DatasetConfig()
    width_scale: float = 1.0
    vq_backend: str = "xla"
    compute_dtype: str = "float32"
    compat_vq_flatten: bool = False  # one-hot-free gradients need vectors
    # sincos default: the circular target removes the ±pi wraparound and
    # halves the held-out coordinate RMSE vs theta/pi regression on this
    # stage (0.201 -> 0.129 m, VALIDATION.md). The frozen stage-5
    # LocationTask keeps "normalized_angle" (reference parity; sincos
    # collapses to the mean attractor on its weak inputs).
    target_mode: str = "sincos"
    output_dim: int = 1
    commitment_weight: float = 0.25
    # 2-D polar localization (beyond parity): append a range (source radius)
    # output to the head and supervise it with batch.radius — meaningful
    # with radius-randomized data (synthesize_batch radius_range=); at fixed
    # geometry the target is constant and the head just learns it. The
    # radius is regressed in METERS (the reference geometry's R=1 keeps the
    # target O(1); no config-dependent normalization, so eval tools may
    # freely swap condition configs).
    predict_radius: bool = False
    radius_weight: float = 1.0
    # Hard-example (tail) weighting: add tail_weight x the mean of the worst
    # ceil(tail_frac x batch) per-sample angle errors to the loss. The
    # uniform-mean objective leaves an outlier tail the medians never see
    # (VALIDATION.md run E final grid: 0.25-10.5% of draws >0.1 rad, worst
    # at far range, while medians sat at 0.02-0.033 rad) — a p90-sensitive
    # term makes exactly those draws carry gradient. 0 disables (default:
    # identical objective to runs C-I).
    tail_weight: float = 0.0
    tail_frac: float = 0.125
    # Interface symmetry with the other stages but REJECTED (mirrors
    # RirVQVAETask): this task's model IS the rir branch + MLP head — the
    # spectrogram's time axis enters as the first conv's CHANNELS and the
    # conv length is the short 201-bin freq axis, so there is no long
    # sequence dimension to shard. Sharding the channel contraction would be
    # tensor (model) parallelism, which the 'model' mesh axis already covers.
    sequence_axis: object = None

    def build_model(self) -> JointLocationModel:
        if self.sequence_axis is not None:
            raise ValueError(
                "JointLocationTask does not support sequence parallelism: its "
                "compute is the rir branch (time-as-channels, conv length = "
                "the short freq axis); use sequence parallelism on the "
                "speech/echoed/finetune stages"
            )
        s = lambda v: _scale(v, self.width_scale)
        rir_model = ConvolutionalVQVAE(
            in_channels=self.config.num_frames, num_hiddens=s(1024), embedding_dim=s(64),
            num_residual_layers=2, num_residual_hiddens=s(64), commitment_cost=0.25,
            num_embeddings=s(1024), use_jitter=False, out_channels=1,
            vq_backend=self.vq_backend, compute_dtype=_dtype(self.compute_dtype),
            compat_vq_flatten=self.compat_vq_flatten,
        )
        out_dim = 2 if self.target_mode == "sincos" else self.output_dim
        if self.predict_radius:
            out_dim += 1  # trailing column: source radius in METERS (loss,
            # decode_radius, and eval all use raw meters — deliberately NOT
            # normalized by config.R, so eval tools can swap condition configs)
        return JointLocationModel(rir_model=rir_model, output_dim=out_dim)

    @staticmethod
    def seed_params(fresh_params, composite_params):
        """Graft a pretrained composite's rir_model subtree under this task's
        params (the stage handoff for the joint stage)."""
        p = dict(fresh_params)
        p["rir_model"] = jax.tree_util.tree_map(
            lambda a: jnp.array(a), composite_params["rir_model"]
        )
        return p

    @property
    def resident_fields(self) -> Tuple[str, ...]:
        return ("echoed_spec", "fs", "theta", "radius")

    def model_inputs(self, batch: SampleBatch) -> Tuple:
        x = znorm(batch.echoed_spec, axis=1)  # train_location.py:63-65
        return (jnp.swapaxes(x, 1, 2),)

    def loss(self, model, params, batch, rngs, train, variables=None):
        (x_trans,) = self.model_inputs(batch)
        pred, perp, vq_loss = model.apply({"params": params}, x_trans)
        theta = batch.theta.reshape(-1, 1).astype(pred.dtype)
        if self.target_mode == "sincos":
            target = jnp.concatenate([jnp.sin(theta), jnp.cos(theta)], axis=1)
        else:
            target = theta / jnp.pi
        pred_loc = pred[:, :-1] if self.predict_radius else pred
        per_sample = jnp.mean((pred_loc - target) ** 2, axis=1)  # (B,)
        mse = jnp.mean(per_sample)
        loss = mse + self.commitment_weight * vq_loss
        metrics = {"location_error": mse, "rir_perplexity": perp}
        if self.tail_weight:
            # p90-sensitive term: the worst ceil(tail_frac x B) samples of
            # the batch carry extra gradient (targets the far-range outlier
            # tail the uniform mean ignores; see the field comment)
            k = max(1, math.ceil(per_sample.shape[0] * self.tail_frac))
            tail = jnp.mean(jax.lax.top_k(per_sample, k)[0])
            loss = loss + self.tail_weight * tail
            metrics["tail_error"] = tail
        if self.predict_radius:
            r_target = batch.radius.astype(pred.dtype)  # meters
            mse_r = jnp.mean((pred[:, -1] - r_target) ** 2)
            loss = loss + self.radius_weight * mse_r
            metrics["radius_error"] = mse_r
        return loss, metrics

    def decode_angle(self, pred: jnp.ndarray) -> jnp.ndarray:
        if self.target_mode == "sincos":
            return jnp.arctan2(pred[:, 0], pred[:, 1])
        return pred[:, 0] * jnp.pi

    def decode_radius(self, pred: jnp.ndarray) -> jnp.ndarray:
        """Predicted source radius in METERS (the trailing head column);
        requires ``predict_radius=True``."""
        if not self.predict_radius:
            raise ValueError("decode_radius requires predict_radius=True")
        return pred[:, -1]

    @property
    def rng_streams(self) -> Tuple[str, ...]:
        return ()

    @property
    def init_truncate(self) -> bool:
        # the head's fc_1 width depends on the latent length: init full-length
        return False


_TASKS = {
    "speech": SpeechVQVAETask,
    "rir": RirVQVAETask,
    "echoed": EchoedSpeechTask,
    "finetune": EncoderFinetuneTask,
    "location": LocationTask,
    "location_joint": JointLocationTask,
}


def make_task(name: str, **kwargs) -> Task:
    return _TASKS[name](**kwargs)
