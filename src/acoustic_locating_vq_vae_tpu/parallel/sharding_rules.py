"""Tensor-parallel partition rules for model parameters.

GSPMD-style: we annotate where the big parameters live on the ``model`` mesh
axis and let XLA's sharding propagation insert the collectives. The conv
stacks are Megatron-shaped pairs — the 3-tap conv (H -> RH) is
column-parallel (shard out-features), the following 1x1 conv (RH -> H) is
row-parallel (shard in-features) so the block needs one reduce per residual
branch. The VQ codebook shards over code rows: each shard computes distances
to K/n codes; the argmin and gather resolve through an all-gather XLA
inserts. Everything small stays replicated.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["param_partition_spec", "param_shardings"]

_MIN_SHARD_DIM = 256  # don't shard small tensors


def param_partition_spec(path: Tuple[str, ...], shape: Tuple[int, ...], model_axis_size: int) -> P:
    """PartitionSpec for one parameter, keyed on its tree path and shape."""
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)

    def divisible(dim: int) -> bool:
        return dim >= _MIN_SHARD_DIM and dim % model_axis_size == 0

    # VQ codebook (K, D): shard code rows.
    if names and names[-1] == "codebook" and divisible(shape[0]):
        return P("model", None)

    if names and names[-1] == "kernel":
        if len(shape) == 3:  # conv kernel (k, in, out)
            _, cin, cout = shape
            if "conv_2" in joined and divisible(cin):
                return P(None, "model", None)  # row-parallel 1x1
            if divisible(cout):
                return P(None, None, "model")  # column-parallel
            if divisible(cin):
                return P(None, "model", None)
        elif len(shape) == 2:  # dense kernel (in, out)
            cin, cout = shape
            if divisible(cin) and cin >= cout:
                return P("model", None)
            if divisible(cout):
                return P(None, "model")
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree matching ``params``."""
    size = mesh.shape["model"]

    def one(path, leaf):
        return NamedSharding(mesh, param_partition_spec(path, leaf.shape, size))

    return jax.tree_util.tree_map_with_path(one, params)
