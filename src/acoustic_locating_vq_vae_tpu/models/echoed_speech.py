"""Echoed-speech composite model (reference: vq_vae/echoed_speech_model.py:9-56).

Holds the two pretrained VQ-VAEs (speech + RIR), concatenates their VQ
latents (RIR latent right-padded along time to the speech latent length),
and decodes the echoed spectrogram with a fresh decoder.

Freeze semantics, reproduced exactly:
  * both codebooks run with ``train_vq=False`` (echoed_speech_model.py:17-18),
    so their q-latent losses are gradient-stopped;
  * the concatenated latents are gradient-stopped unless
    ``train_encoder=True`` (:51-54) — phase 2
    (encoder_training_echoed_model.py:44) flips that flag so encoders
    fine-tune while codebooks stay frozen.

Stage handoff: initialize this module fresh, then graft the pretrained
parameter subtrees under ``params["rir_model"]`` / ``params["speech_model"]``
(see train/tasks.py) — the functional equivalent of the reference's
whole-module pickle loading (train_echoed_speech.py:18-19).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv_vqvae import ConvolutionalVQVAE, DeconvolutionalDecoder

__all__ = ["EchoedSpeechReconModel"]


class EchoedSpeechReconModel(nn.Module):
    rir_model: ConvolutionalVQVAE
    speech_model: ConvolutionalVQVAE
    out_channels: int
    num_hiddens: int
    num_residual_layers: int
    num_residual_hiddens: int
    use_jitter: bool = True
    jitter_probability: float = 0.25  # echoed_speech_model.py:30
    tied: bool = True
    compat_init: bool = True
    compat_inplace_relu: bool = True
    compute_dtype: object = None
    # Sequence parallelism (SURVEY.md §5.7) for the composite: name of the
    # mesh axis sharding the speech TIME dimension when applied inside a
    # shard_map. The speech branch and the composite decoder run
    # time-sharded (halo convs; speech_model must be built with the same
    # sequence_axis); the RIR branch consumes the WHOLE time extent as
    # channels (echoed_speech_model.py:38 feeds the transposed spectrogram),
    # so its input is all-gathered over the axis and its (short, length-201)
    # latent is computed replicated per shard, then sliced into each shard's
    # window of the zero-padded global time axis by _pad_concat_sharded —
    # the shard-aware equivalent of the reference's right-pad+concat
    # (echoed_speech_model.py:41-49).
    sequence_axis: object = None

    def setup(self):
        if self.sequence_axis is not None:
            if getattr(self.speech_model, "sequence_axis", None) != self.sequence_axis:
                raise ValueError(
                    "EchoedSpeechReconModel(sequence_axis=...) requires the "
                    "speech_model to be built with the same sequence_axis "
                    "(its time axis is the sharded one)"
                )
            if getattr(self.rir_model, "sequence_axis", None) is not None:
                raise ValueError(
                    "the composite's rir_model must NOT set sequence_axis: its "
                    "conv length is the short freq axis; the composite gathers "
                    "its input and runs it replicated per shard"
                )
        self._decoder = DeconvolutionalDecoder(
            out_channels=self.out_channels,
            num_hiddens=self.num_hiddens,
            num_residual_layers=self.num_residual_layers,
            num_residual_hiddens=self.num_residual_hiddens,
            use_jitter=self.use_jitter,
            jitter_probability=self.jitter_probability,
            tied=self.tied,
            compat_init=self.compat_init,
            compat_inplace_relu=self.compat_inplace_relu,
            dtype=self.compute_dtype,
            sequence_axis=self.sequence_axis,
        )

    def __call__(
        self,
        spec_in: jnp.ndarray,
        spec_in_rir: jnp.ndarray,
        train: bool = True,
        train_encoder: bool = False,
        return_vq_losses: bool = False,
    ):
        """``spec_in`` (B, F=201, T=500), ``spec_in_rir`` its transpose
        (B, 500, 201). Returns (recon (B, 201, 500), speech_perplexity,
        rir_perplexity) — echoed_speech_model.py:36-56. With
        ``return_vq_losses=True`` a dict of the two branch VQ losses is
        appended (their commitment terms are differentiable w.r.t. the
        encoders, the anchor the reference's phase-2 recon-only loss lacks —
        see VALIDATION.md on codebook collapse)."""
        if self.sequence_axis is not None:
            # Time-sharded mode: spec_in_rir arrives as this shard's
            # (B, T_local, F) slice; the RIR branch's in_channels are the
            # FULL time extent, so gather the slices over the axis (one
            # all-gather of the input spectrogram per step over ICI; its
            # autodiff transpose reduce-scatters the gradient back).
            spec_in_rir = jax.lax.all_gather(
                spec_in_rir, self.sequence_axis, axis=1, tiled=True
            )
        rir_vq_loss, rir_q, rir_perp, _ = self.rir_model.get_latent_representation(
            spec_in_rir, train_vq=False, need_encodings=False
        )  # (B, D_rir, L_rir)
        speech_vq_loss, speech_q, speech_perp, _ = self.speech_model.get_latent_representation(
            spec_in, train_vq=False, need_encodings=False
        )  # (B, D_speech, L_speech)

        if self.sequence_axis is not None:
            quantized = self._pad_concat_sharded(speech_q, rir_q)
        else:
            quantized = self._pad_concat(speech_q, rir_q)
        if not train_encoder:
            quantized = jax.lax.stop_gradient(quantized)  # :51-54

        recon = self._decoder(jnp.swapaxes(quantized, -1, -2), train=train)
        out = (jnp.swapaxes(recon, -1, -2), speech_perp, rir_perp)
        if return_vq_losses:
            return out + ({"speech": speech_vq_loss, "rir": rir_vq_loss},)
        return out

    @staticmethod
    def _pad_concat(speech_q: jnp.ndarray, rir_q: jnp.ndarray) -> jnp.ndarray:
        """Right-pad the shorter latent along time, concat on channels
        (echoed_speech_model.py:41-49 pads only the RIR side and would crash
        the other way; generalized)."""
        size_diff = speech_q.shape[2] - rir_q.shape[2]
        if size_diff > 0:
            rir_q = jnp.pad(rir_q, ((0, 0), (0, 0), (0, size_diff)))
        elif size_diff < 0:
            speech_q = jnp.pad(speech_q, ((0, 0), (0, 0), (0, -size_diff)))
        return jnp.concatenate([speech_q, rir_q], axis=1)  # (B, D_s+D_r, L)

    def _pad_concat_sharded(self, speech_q: jnp.ndarray, rir_q: jnp.ndarray) -> jnp.ndarray:
        """Shard-aware _pad_concat: ``speech_q`` is this shard's
        (B, D_s, L_local) window of the time axis; ``rir_q`` is the full
        replicated (B, D_r, L_rir) latent. Globally the reference right-pads
        the RIR latent to the speech length and concatenates on channels
        (echoed_speech_model.py:41-49); shard i of that global result is
        ``padded_rir[:, :, i*L_local:(i+1)*L_local]`` — a dynamic slice of
        the zero-padded latent, no cross-shard traffic."""
        n = jax.lax.axis_size(self.sequence_axis)
        idx = jax.lax.axis_index(self.sequence_axis)
        l_local = speech_q.shape[2]
        t_global = n * l_local
        if rir_q.shape[2] > t_global:
            raise ValueError(
                f"RIR latent length {rir_q.shape[2]} exceeds the global speech "
                f"latent length {t_global}; the sharded composite only "
                "supports the reference geometry (rir shorter than speech)"
            )
        rir_pad = jnp.pad(rir_q, ((0, 0), (0, 0), (0, t_global - rir_q.shape[2])))
        local = jax.lax.dynamic_slice_in_dim(rir_pad, idx * l_local, l_local, axis=2)
        return jnp.concatenate([speech_q, local], axis=1)  # (B, D_s+D_r, L_local)

    def encode_codes(self, spec_in: jnp.ndarray, spec_in_rir: jnp.ndarray):
        """Frozen-branch VQ code ids — the frozen-latent cache entries. With
        both encoders and codebooks frozen (train_encoder=False, the echoed
        stage's configuration), these are constant per sample, so the trainer
        precomputes them once per dataset instead of re-running both encoder
        stacks every step (train_echoed_speech.py recomputes per step)."""
        return {
            "speech_codes": self.speech_model.get_latent_codes(spec_in),
            "rir_codes": self.rir_model.get_latent_codes(spec_in_rir),
        }

    def decode_from_codes(
        self, speech_codes: jnp.ndarray, rir_codes: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Decoder-only forward from cached code ids: reproduces
        ``__call__(..., train_encoder=False)`` (same quantized latents via
        codebook lookup — up to f32 rounding of the straight-through
        expression ``x + sg(q - x)`` the uncached path returns — same
        per-batch perplexities from the code histogram, same jitter stream:
        the decoder submodule path is identical) at the decoder's cost
        alone."""
        from ..ops.vq import perplexity_from_indices

        speech_q = self.speech_model.codes_to_latent(speech_codes)
        rir_q = self.rir_model.codes_to_latent(rir_codes)
        quantized = jax.lax.stop_gradient(self._pad_concat(speech_q, rir_q))
        recon = self._decoder(jnp.swapaxes(quantized, -1, -2), train=train)
        speech_perp = perplexity_from_indices(
            speech_codes, self.speech_model.num_embeddings
        )
        rir_perp = perplexity_from_indices(rir_codes, self.rir_model.num_embeddings)
        return jnp.swapaxes(recon, -1, -2), speech_perp, rir_perp
