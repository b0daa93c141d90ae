"""Weight initializers matching the reference's torch init choices.

The reference uses ``nn.init.kaiming_uniform_(w, a=0, mode="fan_in",
nonlinearity="relu")`` on most convs (e.g. convolutional_encoder.py:24) and
leaves torch's default init (kaiming_uniform with a=sqrt(5), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in))) on ``Residual.conv_2`` — a quirk of
residual.py:45,55 initializing conv_1 twice — and on all Linear layers.

Flax conv kernels are (kernel_width, in_features, out_features); fan_in =
kernel_width * in_features, matching torch's conv fan_in.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["kaiming_uniform_relu", "torch_default_weight", "torch_default_bias"]

# U(-sqrt(6/fan_in), sqrt(6/fan_in)): kaiming uniform, fan_in, relu gain.
kaiming_uniform_relu = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")

# torch's default Conv/Linear weight init: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform).
torch_default_weight = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in**0.5)
        import jax

        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
