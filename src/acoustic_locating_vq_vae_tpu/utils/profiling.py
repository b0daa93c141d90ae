"""Profiling / tracing (SURVEY.md §5.1 TPU equivalent of the reference's
line_profiler decorators): jax.profiler trace contexts and a
block_until_ready step timer."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax

__all__ = ["trace", "StepTimer", "time_fn"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a Perfetto/TensorBoard-readable device trace of the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer that blocks on device completion, with running
    statistics (mean / p50 / p90)."""

    def __init__(self):
        self.samples = []

    @contextlib.contextmanager
    def step(self, result=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if "result" in out:
            jax.block_until_ready(out["result"])
        elif result is not None:
            jax.block_until_ready(result)
        self.samples.append(time.perf_counter() - t0)

    def stats(self) -> Dict[str, float]:
        import numpy as np

        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "steps": len(a),
        }


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1, **kwargs) -> Dict[str, float]:
    """Steady-state timing of a jitted callable (compile excluded)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_call": dt, "calls_per_sec": 1.0 / dt}
