"""Length-preserving 1-D conv blocks, channels-last for TPU.

The reference stacks ``nn.Conv1d`` / ``nn.ConvTranspose1d`` with kernel 3,
stride 1, padding 1 everywhere (convolutional_encoder.py:17-24,
deconvolutional_decoder.py:19-61) — every layer is length-preserving. On TPU
we keep features in the lane dimension (channels-last, (B, L, C)); XLA lowers
these convs to MXU matmuls over the unrolled kernel taps.

Note on ConvTranspose1d: with stride 1, kernel 3, padding 1 a transposed
convolution is mathematically a plain convolution with a flipped kernel and
identical padding. Since no torch weights are ever imported, we implement it
as a Conv with its own parameters — identical function class, identical
shapes, simpler lowering.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .initializers import kaiming_uniform_relu, torch_default_bias, torch_default_weight

__all__ = ["Conv1d", "ConvTranspose1d", "Dense"]


class Conv1d(nn.Module):
    """1-D convolution on (B, L, C_in) -> (B, L', C_out).

    ``init_mode="kaiming"`` matches the reference's explicit kaiming-uniform relu
    init; ``init_mode="torch_default"`` matches torch's module default.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    init_mode: str = "kaiming"
    # Compute dtype (e.g. jnp.bfloat16 for MXU-rate mixed precision);
    # parameters stay float32. None = float32 compute.
    dtype: object = None
    # Sequence parallelism (SURVEY.md §5.7): when set, the module is being
    # traced inside a shard_map whose ``sequence_axis`` shards the L (time)
    # dimension; exchange (k-1)//2 boundary frames with the mesh neighbors
    # over ICI (parallel/sequence.py halo_exchange) and convolve VALID —
    # numerically identical to the unsharded SAME conv. Parameter shapes are
    # unchanged, so the same checkpoint runs sharded or replicated.
    sequence_axis: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel_init = kaiming_uniform_relu if self.init_mode == "kaiming" else torch_default_weight
        fan_in = self.kernel_size * x.shape[-1]
        padding = [(self.padding, self.padding)]
        if self.sequence_axis is not None and self.padding:
            if self.stride != 1 or self.padding != (self.kernel_size - 1) // 2:
                raise ValueError("sequence_axis requires stride-1 SAME convs")
            from ..parallel.sequence import halo_exchange

            x = halo_exchange(x, self.padding, self.sequence_axis)
            padding = "VALID"
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=padding,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=torch_default_bias(fan_in),
            dtype=self.dtype,
        )(x)


class ConvTranspose1d(Conv1d):
    """Stride-1 transposed conv == conv with flipped kernel (see module doc).

    Kept as a distinct name so model code reads like the reference
    (deconvolutional_decoder.py:36-61)."""


class Dense(nn.Module):
    """Linear layer with torch's default init (location_model.py:10-18)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            kernel_init=torch_default_weight,
            bias_init=torch_default_bias(fan_in),
            dtype=self.dtype,
        )(x)
