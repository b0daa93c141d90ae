"""Utils tests: profiling timers and the visualization entry point."""

import numpy as np

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu.utils import StepTimer, plot_spectrogram, time_fn


def test_time_fn_reports_steady_state():
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    stats = time_fn(f, jnp.ones((128, 128)), iters=3, warmup=1)
    assert stats["sec_per_call"] > 0
    assert abs(stats["calls_per_sec"] * stats["sec_per_call"] - 1.0) < 1e-6


def test_step_timer_collects_stats():
    timer = StepTimer()
    f = jax.jit(lambda x: jnp.sum(x**2))
    for _ in range(4):
        with timer.step() as out:
            out["result"] = f(jnp.ones(64))
    s = timer.stats()
    assert s["steps"] == 4
    assert s["mean_s"] > 0 and s["p90_s"] >= s["p50_s"]


def test_plot_spectrogram_both_modes():
    import matplotlib

    matplotlib.use("Agg")
    ax = plot_spectrogram(np.abs(np.random.default_rng(0).standard_normal(50)))
    assert ax is not None
    ax2 = plot_spectrogram(
        np.abs(np.random.default_rng(1).standard_normal((20, 30))) ** 2, title="t"
    )
    assert ax2.get_title() == "t"
