"""Chorowski-2019 latent jitter (reference: vq_vae/modules/jitter.py:31-70).

The reference loops over time in Python, drawing one replace/direction
decision per time step that is **shared across the whole batch**, and writes
the (detached) original neighbor vector into replaced slots. Here the same
semantics are one vectorized gather:

* ``replace ~ Bernoulli(p)`` per time step (batch-shared, compat default;
  ``per_batch=True`` gives the fixed per-sample variant),
* direction ±1 uniform, ends clamped to their single neighbor,
* replaced positions carry **no gradient** (the reference assigns from
  ``quantized.detach().clone()``, jitter.py:47-53).

Train-mode only — the decoder gates it on ``train`` just as the reference
gates on ``self.training`` (deconvolutional_decoder.py:66-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Jitter", "jitter", "jitter_sharded"]


def jitter(
    x: jnp.ndarray, key: jax.Array, probability: float, per_batch: bool = False
) -> jnp.ndarray:
    """Apply latent jitter along the time axis of ``x`` (B, L, D)."""
    length = x.shape[1]
    k_replace, k_dir = jax.random.split(key)
    decision_shape = (x.shape[0], length) if per_batch else (length,)
    replace = jax.random.bernoulli(k_replace, probability, decision_shape)
    direction = jnp.where(jax.random.bernoulli(k_dir, 0.5, decision_shape), 1, -1)

    pos = jnp.arange(length)
    if per_batch:
        pos = jnp.broadcast_to(pos, decision_shape)
    neighbor = pos + direction
    # Ends clamp to their single neighbor (jitter.py:57-61).
    neighbor = jnp.where(pos == 0, 1, neighbor)
    neighbor = jnp.where(pos == length - 1, length - 2, neighbor)
    idx = jnp.where(replace, neighbor, pos)

    if per_batch:
        gathered = jnp.take_along_axis(x, idx[:, :, None], axis=1)
        mask = replace[:, :, None]
    else:
        gathered = x[:, idx, :]
        mask = replace[None, :, None]
    # Replaced slots are gradient-stopped, matching the detached source copy.
    return jnp.where(mask, jax.lax.stop_gradient(gathered), x)


def jitter_sharded(
    x: jnp.ndarray,
    key: jax.Array,
    probability: float,
    axis_name: str,
    per_batch: bool = False,
) -> jnp.ndarray:
    """Jitter a TIME-SHARDED (B, L_local, D) shard inside a shard_map.

    Same semantics as :func:`jitter` on the concatenated sequence: a 1-frame
    halo exchange supplies the neighbors across shard boundaries, the ends of
    the GLOBAL sequence clamp to their single neighbor, and each shard folds
    its axis index into the key so decisions are independent per position.
    """
    from ..parallel.sequence import halo_exchange

    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    key = jax.random.fold_in(key, i)

    length = x.shape[1]
    k_replace, k_dir = jax.random.split(key)
    decision_shape = (x.shape[0], length) if per_batch else (length,)
    replace = jax.random.bernoulli(k_replace, probability, decision_shape)
    direction = jnp.where(jax.random.bernoulli(k_dir, 0.5, decision_shape), 1, -1)

    xh = halo_exchange(x, 1, axis_name)  # (B, L_local + 2, D)
    pos = jnp.arange(length) + 1  # position in the haloed shard
    if per_batch:
        pos = jnp.broadcast_to(pos, decision_shape)
    neighbor = pos + direction
    # Global-end clamping (jitter.py:57-61): first/last position of the whole
    # sequence only has one neighbor.
    gpos = i * length + (pos - 1)
    neighbor = jnp.where(gpos == 0, pos + 1, neighbor)
    neighbor = jnp.where(gpos == n * length - 1, pos - 1, neighbor)

    if per_batch:
        gathered = jnp.take_along_axis(xh, neighbor[:, :, None], axis=1)
        mask = replace[:, :, None]
    else:
        gathered = xh[:, neighbor, :]
        mask = replace[None, :, None]
    return jnp.where(mask, jax.lax.stop_gradient(gathered), x)


class Jitter(nn.Module):
    probability: float = 0.12
    per_batch: bool = False
    # Set when traced inside a time-sharding shard_map (see ops/conv.py).
    sequence_axis: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if not train or self.probability <= 0.0:
            return x
        if self.sequence_axis is not None:
            return jitter_sharded(
                x, self.make_rng("jitter"), self.probability, self.sequence_axis,
                self.per_batch,
            )
        return jitter(x, self.make_rng("jitter"), self.probability, self.per_batch)
