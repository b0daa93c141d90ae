"""Explicit-collective data-parallel training step (shard_map + pmean).

The main loop (train/loop.py) uses GSPMD: batch sharded via NamedSharding,
XLA derives the gradient/codebook-stat allreduces. This module provides the
explicit alternative — per-shard loss/grad under ``jax.shard_map`` with
``jax.lax.pmean`` collectives over the ``data`` axis — for cases where you
want manual control of what crosses ICI (or to read the collectives in the
HLO). Both formulations compute identical updates; the test asserts it.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_shard_map_train_step"]


def make_shard_map_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
):
    """Build ``step(params, opt_state, batch) -> (params, opt_state, metrics)``.

    ``loss_fn(params, batch) -> (loss, metrics)`` must compute per-shard MEAN
    losses (the usual ``jnp.mean``); grads and scalar metrics are averaged
    across shards with ``pmean`` — exactly the global-batch semantics of the
    single-device step.
    """

    def shard_step(params, opt_state, batch):
        def local_loss(p, b):
            loss, metrics = loss_fn(p, b)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(local_loss, has_aux=True)(params, batch)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        metrics = jax.tree_util.tree_map(lambda m: jax.lax.pmean(m, axis), metrics)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, {**metrics, "loss": loss}

    batch_spec = P(axis)
    mapped = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(), batch_spec),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(mapped)
