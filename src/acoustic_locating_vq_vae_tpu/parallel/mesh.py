"""Mesh construction and data/param placement helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "local_mesh", "batch_sharding", "replicated", "shard_batch", "shard_params"]


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """A (data, model) mesh. ``data=-1`` uses all remaining devices.

    The ``data`` axis carries batch sharding (gradient + codebook-stat
    allreduce ride ICI); ``model`` optionally shards large kernels/codebook.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def local_mesh() -> Mesh:
    """Single-device mesh — the degenerate case every config runs on."""
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of (B, ...) arrays batch-sharded on the mesh."""
    return jax.device_put(batch, batch_sharding(mesh))


def shard_params(params, mesh: Mesh, model_parallel: bool = False):
    """Place parameters: replicated, or sharded per sharding_rules when
    ``model_parallel`` and the mesh has a non-trivial model axis."""
    if model_parallel and mesh.shape["model"] > 1:
        from .sharding_rules import param_shardings

        return jax.device_put(params, param_shardings(params, mesh))
    return jax.device_put(params, replicated(mesh))
