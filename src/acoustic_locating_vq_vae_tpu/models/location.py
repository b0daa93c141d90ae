"""Location regression MLP (reference: vq_vae/location_model/location_model.py:5-29).

Flattens (B, encoder_output_dim, num_hiddens) one-hot VQ encodings and
regresses the source angle theta/pi (train_location.py:77-78); with
``output_dim=3`` it regresses 3-D coordinates (the intent of the broken
compare_location_models.py:31)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Dense

__all__ = ["LocationModule", "JointLocationModel"]


class LocationModule(nn.Module):
    encoder_output_dim: int
    num_hiddens: int
    output_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        z = x.reshape((x.shape[0], -1))  # torch.flatten(x, start_dim=1)
        z = nn.relu(Dense(1024, name="fc_1")(z))
        z = nn.relu(Dense(512, name="fc_2")(z))
        z = nn.relu(Dense(512, name="fc_3")(z))
        z = nn.relu(Dense(64, name="fc_4")(z))
        return Dense(self.output_dim, name="fc_5")(z)


class JointLocationModel(nn.Module):
    """RIR encoder + location head trained JOINTLY on the angle loss — a
    capability the reference lacks (its location stage reads latents from a
    frozen composite, train_location.py:69, so the representation can never
    adapt to the localization objective; VALIDATION.md documents how that
    plateaus at the trivial predictor). Gradients reach the encoder through
    the VQ straight-through estimator; the codebook stays frozen
    (``train_vq=False``), and the branch VQ loss (commitment term) is
    returned so the task can anchor the encoder to the frozen codebook.

    Dense quantized features are required — one-hot encodings block all
    gradients (the argmin has none)."""

    rir_model: object  # ConvolutionalVQVAE (declared loosely to avoid a cycle)
    output_dim: int = 1

    @nn.compact
    def __call__(self, x_trans: jnp.ndarray):
        """``x_trans``: the transposed echoed spectrogram (B, T, F) — the RIR
        branch's input layout (train_location.py:63-66). Returns
        (prediction, rir_perplexity, rir_vq_loss)."""
        vq_loss, q, perp, _ = self.rir_model.get_latent_representation(
            x_trans, train_vq=False, need_encodings=False
        )  # q: (B, D_rir, L=F)
        feats = jnp.swapaxes(q, 1, 2)  # (B, F, D_rir)
        pred = LocationModule(
            encoder_output_dim=feats.shape[1],
            num_hiddens=feats.shape[2],
            output_dim=self.output_dim,
            name="head",
        )(feats)
        return pred, perp, vq_loss
