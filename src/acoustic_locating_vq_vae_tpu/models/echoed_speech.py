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

    def setup(self):
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
        rir_vq_loss, rir_q, rir_perp, _ = self.rir_model.get_latent_representation(
            spec_in_rir, train_vq=False, need_encodings=False
        )  # (B, D_rir, L_rir)
        speech_vq_loss, speech_q, speech_perp, _ = self.speech_model.get_latent_representation(
            spec_in, train_vq=False, need_encodings=False
        )  # (B, D_speech, L_speech)

        size_diff = speech_q.shape[2] - rir_q.shape[2]
        if size_diff > 0:  # right-pad RIR latent along time (:41-49)
            rir_q = jnp.pad(rir_q, ((0, 0), (0, 0), (0, size_diff)))
        elif size_diff < 0:
            # The reference would crash here (it only pads the RIR side);
            # generalized to right-pad the shorter latent either way.
            speech_q = jnp.pad(speech_q, ((0, 0), (0, 0), (0, -size_diff)))

        quantized = jnp.concatenate([speech_q, rir_q], axis=1)  # (B, D_s+D_r, L)
        if not train_encoder:
            quantized = jax.lax.stop_gradient(quantized)  # :51-54

        recon = self._decoder(jnp.swapaxes(quantized, -1, -2), train=train)
        out = (jnp.swapaxes(recon, -1, -2), speech_perp, rir_perp)
        if return_vq_losses:
            return out + ({"speech": speech_vq_loss, "rir": rir_vq_loss},)
        return out
