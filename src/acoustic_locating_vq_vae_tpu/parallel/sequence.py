"""Sequence (time-axis) parallelism via halo exchange.

The reference handles long sequences by truncating to 500 frames
(data_preprocessing.py:64-69); it has no scaling story. Since every layer in
this model family is a stride-1 conv with kernel <= 3, the TPU-native way to
scale sequence length is to shard the time axis across the mesh and exchange
k-1 boundary frames ("halos") between neighbor devices over ICI before each
conv — O(B*C) bytes per step, independent of sequence length.

``halo_exchange``/``sharded_conv1d`` are written against a named mesh axis
and run under ``jax.shard_map``; ``sequence_sharded_conv`` is the user-facing
wrapper that shards (B, L, C) over a mesh axis, applies the conv locally
with halos, and returns the equivalent of the unsharded convolution.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "halo_exchange",
    "sharded_conv1d",
    "sequence_sharded_conv",
    "sequence_parallel_apply",
]


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Append neighbors' boundary frames around this shard's time axis.

    ``x``: local shard (B, L_local, C). Returns (B, L_local + 2*halo, C) with
    the left neighbor's last ``halo`` frames prepended and the right
    neighbor's first ``halo`` frames appended (zeros at the chain ends,
    matching zero padding of the global conv).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    right_edge = x[:, -halo:, :]  # what our RIGHT neighbor needs as left halo
    left_edge = x[:, :halo, :]  # what our LEFT neighbor needs as right halo

    # ppermute rides ICI: shift edges to the neighbors.
    from_left = jax.lax.ppermute(right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)])

    zeros = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zeros, from_left)  # chain end: zero pad
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def sharded_conv1d(
    x: jnp.ndarray, kernel: jnp.ndarray, axis_name: str, bias: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """'SAME' stride-1 conv over a time-sharded (B, L_local, C_in) shard.

    ``kernel``: (k, C_in, C_out), k odd. Equivalent to the unsharded conv of
    the concatenated sequence with zero padding (k-1)//2 on both ends.
    """
    k = kernel.shape[0]
    halo = (k - 1) // 2
    if halo:
        x = halo_exchange(x, halo, axis_name)
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        out = out + bias
    return out


def sequence_sharded_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    mesh: Mesh,
    mesh_axis: str = "data",
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Convolve (B, L, C_in) with time sharded over ``mesh_axis``.

    L must divide evenly across the axis. Result equals the unsharded SAME
    conv; the only cross-device traffic is the (k-1)-frame halo per call.
    """
    n = mesh.shape[mesh_axis]
    if x.shape[1] % n:
        raise ValueError(f"sequence length {x.shape[1]} not divisible by {mesh_axis}={n}")

    fn = functools.partial(sharded_conv1d, axis_name=mesh_axis)
    specs_in = (
        P(None, mesh_axis, None),  # x: time sharded
        P(),  # kernel replicated
    ) + ((P(),) if bias is not None else ())
    args = (x, kernel) + ((bias,) if bias is not None else ())
    mapped = jax.shard_map(
        (lambda a, kk, bb=None: fn(a, kk, bias=bb)),
        mesh=mesh,
        in_specs=specs_in,
        out_specs=P(None, mesh_axis, None),
    )
    return mapped(*args)


def sequence_parallel_apply(
    model,
    variables,
    x: jnp.ndarray,
    mesh: Mesh,
    mesh_axis: str = "data",
    train: bool = False,
    jitter_key: Optional[jax.Array] = None,
):
    """Apply a ``ConvolutionalVQVAE`` built with ``sequence_axis=mesh_axis``
    to ``x`` (B, C, L) with the TIME dimension sharded over ``mesh_axis`` —
    activations run as P(None, mesh_axis, None) internally.

    Every conv halo-exchanges its k-1 boundary frames over ICI
    (O(B*C) bytes per conv, independent of L), the VQ reduces its loss means
    and code-usage counts over the axis, and jitter draws per-shard decisions
    with a 1-frame halo. Returns (vq_loss, recon, perplexity) equal to the
    replicated model's (recon stays time-sharded). This is the §5.7 scaling
    story: sequence length bounded by total-mesh HBM, not per-chip — e.g.
    4000-frame sequences the reference's 500-frame truncation cannot touch.

    Differentiable: grads w.r.t. ``variables`` under jax.grad psum across
    shards automatically (replicated in_spec transposes to a psum).
    """
    if getattr(model, "sequence_axis", None) != mesh_axis:
        raise ValueError(
            f"model.sequence_axis={getattr(model, 'sequence_axis', None)!r} "
            f"must equal mesh_axis={mesh_axis!r}"
        )
    n = mesh.shape[mesh_axis]
    if x.shape[-1] % n:
        raise ValueError(f"sequence length {x.shape[-1]} not divisible by {mesh_axis}={n}")
    if jitter_key is None:
        jitter_key = jax.random.PRNGKey(0)  # unused unless train & use_jitter

    def local(v, xl, k):
        return model.apply(v, xl, train=train, rngs={"jitter": k})

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, None, mesh_axis), P()),
        out_specs=(P(), P(None, None, mesh_axis), P()),
    )(variables, x, jitter_key)
