"""Utilities: Orbax checkpointing / stage store, profiling, visualization."""

from .checkpoint import StageStore, load_pytree, save_pytree
from .profiling import StepTimer, time_fn, trace
from .viz import plot_spectrogram

__all__ = [
    "StageStore",
    "load_pytree",
    "save_pytree",
    "StepTimer",
    "time_fn",
    "trace",
    "plot_spectrogram",
]
