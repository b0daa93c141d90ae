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


def test_load_pytree_cross_topology(tmp_path):
    """A checkpoint saved batch-sharded over the 8-device mesh restores in a
    SINGLE-device process (metadata-driven fallback in load_pytree) — the
    train-on-mesh / eval-on-one-chip handoff (round-3 fix)."""
    import subprocess
    import sys

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from acoustic_locating_vq_vae_tpu.parallel import make_mesh
    from acoustic_locating_vq_vae_tpu.utils.checkpoint import save_pytree

    mesh = make_mesh(data=8)
    tree = {
        "w": jax.device_put(jnp.arange(64.0).reshape(8, 8), NamedSharding(mesh, P("data"))),
        "b": jax.device_put(jnp.ones(3), NamedSharding(mesh, P())),
    }
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)

    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
import sys
sys.path.insert(0, {repr(str(__import__("os").path.join(__import__("os").path.dirname(__file__), "..", "src")))})
import numpy as np
from acoustic_locating_vq_vae_tpu.utils.checkpoint import load_pytree
t = load_pytree({path!r})
assert t["w"].shape == (8, 8), t["w"].shape
np.testing.assert_array_equal(np.asarray(t["w"]), np.arange(64.0).reshape(8, 8))
print("CROSS_TOPOLOGY_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert "CROSS_TOPOLOGY_OK" in out.stdout, out.stderr[-2000:]
