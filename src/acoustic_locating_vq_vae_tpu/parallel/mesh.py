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
    data: int = -1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence] = None,
    slices: int = 1,
    slice_map=None,
) -> Mesh:
    """A (data, model, seq) mesh. ``data=-1`` uses all remaining devices.

    The ``data`` axis carries batch sharding (gradient + codebook-stat
    allreduce ride ICI); ``model`` optionally shards large kernels/codebook;
    ``seq`` shards the TIME dimension of activations for long-sequence
    training (halo exchanges ride ICI — SURVEY.md §5.7). The seq axis is
    size 1 unless requested, so 2-D callers are unaffected.

    Multi-slice (DCN) topologies — SURVEY.md §5.8's "×DCN later" — need no
    fourth axis name: pure data parallelism over slices is expressed by
    device ORDER. With ``slices=N`` the devices are grouped slice-major
    (``d.slice_index`` when the runtime exposes it, contiguous chunks
    otherwise, or an explicit ``slice_map``: device → slice id) before the
    (data, model, seq) reshape. Because ``data`` is the mesh's outermost
    dimension, each slice then owns a contiguous block of data rows while
    every model/seq group lies WITHIN one slice — so the gradient ``psum``
    over "data" lowers hierarchically (in-slice reduce over ICI + one
    cross-slice exchange over DCN) and the latency-sensitive model/seq
    collectives (halo exchange, codebook all-gather) never touch DCN. A
    layout where model or seq would straddle a slice boundary is rejected.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if slices > 1:
        if n % slices:
            raise ValueError(f"{n} devices not divisible into {slices} slices")
        per_slice = n // slices
        if slice_map is None:
            idx = getattr(devices[0], "slice_index", None)
            if idx is not None:
                slice_map = {d: d.slice_index for d in devices}
            else:
                # no topology info (virtual/CPU devices): contiguous chunks
                slice_map = {d: i // per_slice for i, d in enumerate(devices)}
        elif callable(slice_map):
            slice_map = {d: slice_map(d) for d in devices}
        groups: dict = {}
        for d in devices:
            groups.setdefault(slice_map[d], []).append(d)
        sizes = {s: len(g) for s, g in groups.items()}
        if len(groups) != slices or any(v != per_slice for v in sizes.values()):
            raise ValueError(
                f"slice assignment {sizes} does not form {slices} equal "
                f"slices of {per_slice}"
            )
        if per_slice % (model * seq):
            raise ValueError(
                f"model*seq={model * seq} does not divide the {per_slice} "
                f"devices per slice — the model/seq axes would straddle a "
                f"DCN boundary; shrink them to fit within one slice"
            )
        devices = [d for s in sorted(groups) for d in groups[s]]
    if data == -1:
        if n % (model * seq):
            raise ValueError(f"{n} devices not divisible by model*seq={model * seq}")
        data = n // (model * seq)
    total = data * model * seq
    if total > n:
        raise ValueError(
            f"mesh {data}x{model}x{seq} needs {total} devices, have {n}"
        )
    if slices > 1 and total < n:
        # A plain prefix cut after the slice-major reorder would take every
        # device from slice 0 — silently collapsing the requested multi-slice
        # layout into a single slice. Take an equal prefix from EACH slice so
        # the slice-major/data-outermost guarantees keep holding.
        if data % slices:
            raise ValueError(
                f"data={data} not divisible by slices={slices}: each slice "
                f"must own an equal contiguous block of data rows (use "
                f"data=-1 or a multiple of {slices})"
            )
        per_slice = n // slices
        take = total // slices
        devices = [
            d for s in range(slices)
            for d in devices[s * per_slice : s * per_slice + take]
        ]
    arr = np.array(devices[:total]).reshape(data, model, seq)
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
