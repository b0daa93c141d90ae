"""Location regression MLP (reference: vq_vae/location_model/location_model.py:5-29).

Flattens (B, encoder_output_dim, num_hiddens) one-hot VQ encodings and
regresses the source angle theta/pi (train_location.py:77-78); with
``output_dim=3`` it regresses 3-D coordinates (the intent of the broken
compare_location_models.py:31)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Dense

__all__ = ["LocationModule"]


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
