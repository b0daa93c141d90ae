"""Mesh construction and data/param placement helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "local_mesh",
    "batch_sharding",
    "batch_shardings",
    "replicated",
    "shard_batch",
    "shard_params",
]


def make_mesh(
    data: int = -1, model: int = 1, seq: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """A (data, model, seq) mesh. ``data=-1`` uses all remaining devices.

    The ``data`` axis carries batch sharding (gradient + codebook-stat
    allreduce ride ICI); ``model`` optionally shards large kernels/codebook;
    ``seq`` shards the TIME dimension of activations for long-sequence
    training (halo exchanges ride ICI — SURVEY.md §5.7). The seq axis is
    size 1 unless requested, so 2-D callers are unaffected.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (model * seq):
            raise ValueError(f"{n} devices not divisible by model*seq={model * seq}")
        data = n // (model * seq)
    if data * model * seq > n:
        raise ValueError(
            f"mesh {data}x{model}x{seq} needs {data * model * seq} devices, have {n}"
        )
    arr = np.array(devices[: data * model * seq]).reshape(data, model, seq)
    return Mesh(arr, axis_names=("data", "model", "seq"))


def local_mesh() -> Mesh:
    """Single-device mesh — the degenerate case every config runs on."""
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def batch_shardings(batch, mesh: Mesh, seq_axis: Optional[str] = None):
    """Per-leaf shardings for a SampleBatch pytree: leading axis over 'data';
    with ``seq_axis``, the trailing (time) axis of 3-D spectrogram leaves is
    additionally sharded over that mesh axis."""
    import jax as _jax

    def spec(a):
        if seq_axis is not None and a.ndim == 3:
            return NamedSharding(mesh, P("data", None, seq_axis))
        return NamedSharding(mesh, P("data"))

    return _jax.tree_util.tree_map(spec, batch)


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
