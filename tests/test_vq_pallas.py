"""Pallas VQ kernel vs the XLA reference path: forward values, gradients,
padding edge cases, and end-to-end use inside the VectorQuantizer module
(interpreter mode on CPU; the same code compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import ops
from acoustic_locating_vq_vae_tpu.ops.vq_pallas import nearest_codebook_pallas


@pytest.mark.parametrize(
    "n,d,k",
    [
        (512, 128, 1024),  # aligned (speech config geometry)
        (100, 4, 16),  # everything unaligned / padded
        (1000, 64, 1024),  # rir config geometry
        (513, 128, 100),  # row + codebook padding
    ],
)
def test_forward_matches_xla(n, d, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
    idx_ref, q_ref = ops.nearest_codebook(x, cb)
    idx_pl, q_pl = nearest_codebook_pallas(x, cb)
    np.testing.assert_array_equal(np.asarray(idx_pl), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(q_pl), np.asarray(q_ref), rtol=1e-5, atol=1e-6)


def test_codebook_gradient_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((300, 8)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))

    def loss_xla(cb_):
        _, q = ops.nearest_codebook(x, cb_)
        return jnp.sum(jnp.sin(q) * q)

    def loss_pl(cb_):
        _, q = nearest_codebook_pallas(x, cb_)
        return jnp.sum(jnp.sin(q) * q)

    g_xla = jax.grad(loss_xla)(cb)
    g_pl = jax.grad(loss_pl)(cb)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla), rtol=1e-4, atol=1e-5)


def test_input_gradient_is_zero_through_gather():
    """The assignment core carries no input gradient (STE handles inputs at
    the module level) — identical to the XLA path's structure."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))

    def f(x_):
        _, q = nearest_codebook_pallas(x_, cb)
        return jnp.sum(q**2)

    g = jax.grad(f)(x)
    assert float(jnp.abs(g).max()) == 0.0


def test_vq_module_with_pallas_backend_matches_xla():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((50, 8)).astype(np.float32))
    kwargs = dict(num_embeddings=16, embedding_dim=8, commitment_cost=0.25)
    vq_x = ops.VectorQuantizer(**kwargs, backend="xla")
    vq_p = ops.VectorQuantizer(**kwargs, backend="pallas")
    params = vq_x.init(jax.random.PRNGKey(0), x)
    out_x = vq_x.apply(params, x)
    out_p = vq_p.apply(params, x)
    np.testing.assert_allclose(float(out_p.loss), float(out_x.loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_p.quantized), np.asarray(out_x.quantized), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(out_p.perplexity), float(out_x.perplexity), rtol=1e-5)

    # gradients through the full module (STE + commitment + codebook)
    def loss(backend_mod, p):
        o = backend_mod.apply(p, x)
        return jnp.sum(o.quantized**2) + o.loss

    gx = jax.grad(lambda p: loss(vq_x, p))(params)
    gp = jax.grad(lambda p: loss(vq_p, p))(params)
    np.testing.assert_allclose(
        np.asarray(gp["params"]["codebook"]), np.asarray(gx["params"]["codebook"]),
        rtol=1e-4, atol=1e-5,
    )


def test_ties_resolve_identically():
    """Duplicate codebook rows: both paths must pick the same (first) index."""
    x = jnp.asarray(np.ones((8, 4), np.float32))
    cb = jnp.asarray(np.ones((6, 4), np.float32))  # all rows tie
    idx_ref, _ = ops.nearest_codebook(x, cb)
    idx_pl, _ = nearest_codebook_pallas(x, cb)
    np.testing.assert_array_equal(np.asarray(idx_pl), np.asarray(idx_ref))


def test_codebook_stats_pallas_matches_scatter():
    """The blocked one-hot-transpose stats kernel equals the scatter-adds."""
    from acoustic_locating_vq_vae_tpu.ops.vq_pallas import codebook_stats_pallas

    rng = np.random.default_rng(11)
    N, D, K = 700, 5, 37  # deliberately unaligned
    flat = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, K, N).astype(np.int32))
    counts, sums = codebook_stats_pallas(idx, flat, K)
    want_counts = np.zeros(K, np.float32)
    np.add.at(want_counts, np.asarray(idx), 1.0)
    want_sums = np.zeros((K, D), np.float32)
    np.add.at(want_sums, np.asarray(idx), np.asarray(flat))
    np.testing.assert_allclose(np.asarray(counts), want_counts)
    np.testing.assert_allclose(np.asarray(sums), want_sums, rtol=1e-5, atol=1e-5)


def test_ema_pallas_backend_matches_xla_backend():
    """EMA codebook update through the Pallas stats kernel equals the XLA
    scatter path (same key, same inputs)."""
    from acoustic_locating_vq_vae_tpu import ops

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((300, 4)).astype(np.float32))

    def run(backend):
        vq = ops.VectorQuantizer(
            num_embeddings=16, embedding_dim=4, commitment_cost=0.25,
            ema=True, backend=backend,
        )
        variables = vq.init(jax.random.PRNGKey(5), x)
        out, mutated = vq.apply(variables, x, train_vq=True, mutable=["vq_stats"])
        return out, mutated["vq_stats"]

    out_p, stats_p = run("pallas")
    out_x, stats_x = run("xla")
    np.testing.assert_array_equal(np.asarray(out_p.indices), np.asarray(out_x.indices))
    np.testing.assert_allclose(
        np.asarray(stats_p["ema_counts"]), np.asarray(stats_x["ema_counts"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats_p["ema_sums"]), np.asarray(stats_x["ema_sums"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats_p["codebook"]), np.asarray(stats_x["codebook"]), rtol=1e-5, atol=1e-6
    )
