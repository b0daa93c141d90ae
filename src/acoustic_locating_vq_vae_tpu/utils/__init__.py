"""Utilities: Orbax checkpointing / stage store, profiling, visualization."""

from .checkpoint import StageStore, load_pytree, save_pytree

__all__ = ["StageStore", "load_pytree", "save_pytree"]
