"""Device mesh / sharding layer.

The reference has no distributed support of any kind (SURVEY.md §2 inventory
note: single process, single device). Here parallelism is mesh-first from
day one: single-chip is just a (1,)-mesh, and the same jitted train step
scales over ICI via GSPMD — batch sharded on the ``data`` axis, large
parameters optionally sharded on the ``model`` axis, with XLA inserting the
gradient/codebook-statistics allreduces (SURVEY.md §5.8)."""

from .mesh import (
    batch_sharding,
    local_mesh,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)
from .dp_step import make_shard_map_train_step
from .sequence import halo_exchange, sequence_sharded_conv, sharded_conv1d
from .sharding_rules import param_partition_spec, param_shardings

__all__ = [
    "make_shard_map_train_step",
    "halo_exchange",
    "sequence_sharded_conv",
    "sharded_conv1d",
    "batch_sharding",
    "local_mesh",
    "make_mesh",
    "replicated",
    "shard_batch",
    "shard_params",
    "param_partition_spec",
    "param_shardings",
]
