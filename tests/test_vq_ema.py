"""EMA codebook learning: statistics update during training, the codebook
moves without gradients, checkpoints carry the collection, and the EMA
codebook grafts into the composite's frozen-parameter slot."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu import ops
from acoustic_locating_vq_vae_tpu.train import (
    EchoedSpeechTask,
    SpeechVQVAETask,
    Trainer,
    graft_pretrained,
)

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32


def test_ema_module_updates_codebook_toward_data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((200, 4)).astype(np.float32) * 3.0)
    vq = ops.VectorQuantizer(num_embeddings=8, embedding_dim=4, commitment_cost=0.25, ema=True)
    variables = vq.init(jax.random.PRNGKey(0), x)
    assert "vq_stats" in variables and "params" not in variables
    cb0 = np.asarray(variables["vq_stats"]["codebook"])

    out, mutated = vq.apply(variables, x, train_vq=True, mutable=["vq_stats"])
    cb1 = np.asarray(mutated["vq_stats"]["codebook"])
    assert not np.array_equal(cb0, cb1)
    # used codes move toward assigned input means
    used = np.unique(np.asarray(out.indices))
    assert np.abs(cb1[used]).max() > np.abs(cb0[used]).max()
    # EMA loss has no q-latent term: loss == beta * e_latent only
    e_lat = float(jnp.mean((jax.lax.stop_gradient(out.quantized) - x) ** 2))
    # quantized is STE (== x + sg(q - x)); recompute e_latent from raw assign
    _, q = ops.nearest_codebook(x, jnp.asarray(variables["vq_stats"]["codebook"]))
    e_lat = float(jnp.mean((q - x) ** 2))
    np.testing.assert_allclose(float(out.loss), 0.25 * e_lat, rtol=1e-5)


def test_ema_no_update_when_frozen():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((50, 4)).astype(np.float32))
    vq = ops.VectorQuantizer(num_embeddings=8, embedding_dim=4, commitment_cost=0.25, ema=True)
    variables = vq.init(jax.random.PRNGKey(0), x)
    _, mutated = vq.apply(variables, x, train_vq=False, mutable=["vq_stats"])
    np.testing.assert_array_equal(
        np.asarray(mutated["vq_stats"]["codebook"]), np.asarray(variables["vq_stats"]["codebook"])
    )


def test_ema_speech_task_trains_and_grafts(tmp_path):
    train = D.make_dataset(jax.random.PRNGKey(0), 24, SMALL, batch=12, rir_chunk=2048)
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, vq_ema=True)
    tr = Trainer(task, checkpoint_dir=str(tmp_path), verbose=False)
    st = tr.init_state(jax.random.PRNGKey(1), train)
    assert "vq_stats" in st.variables
    cb0 = np.asarray(st.variables["vq_stats"]["_vq"]["codebook"])
    st, hist = tr.fit(st, train, None, num_updates=40)
    f = hist.finalize()
    assert np.isfinite(f["train"]["loss"]).all()
    assert np.mean(f["train"]["recon_error"][-10:]) < np.mean(f["train"]["recon_error"][:10])
    cb1 = np.asarray(st.variables["vq_stats"]["_vq"]["codebook"])
    assert not np.array_equal(cb0, cb1)  # codebook learned without gradients
    # vq_loss metric is the commitment term only (no q-latent in EMA mode)
    assert (f["train"]["vq_loss"] >= 0).all()

    # graft the EMA codebook into a (param-mode) composite
    comp_task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8)
    comp_tr = Trainer(comp_task, verbose=False)
    comp_st = comp_tr.init_state(jax.random.PRNGKey(2), train)
    grafted = graft_pretrained(
        comp_st.params, speech_params=st.params, speech_variables=st.variables
    )
    np.testing.assert_array_equal(
        np.asarray(grafted["speech_model"]["_vq"]["codebook"]), cb1
    )
    # the grafted composite runs
    comp_st = comp_st.replace(params=grafted, opt_state=comp_tr.optimizer.init(grafted))
    comp_st, h = comp_tr.fit(comp_st, train, None, num_updates=3)
    assert np.isfinite(h.finalize()["train"]["loss"]).all()


def test_ema_checkpoint_roundtrip(tmp_path):
    train = D.make_dataset(jax.random.PRNGKey(3), 16, SMALL, batch=16, rir_chunk=2048)
    task = dataclasses.replace(
        SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, vq_ema=True), ckpt_every=4
    )
    tr = Trainer(task, checkpoint_dir=str(tmp_path), verbose=False)
    st = tr.init_state(jax.random.PRNGKey(4), train)
    st, _ = tr.fit(st, train, None, num_updates=6)

    tr2 = Trainer(task, checkpoint_dir=str(tmp_path), verbose=False)
    st2 = tr2.init_state(jax.random.PRNGKey(5), train)
    restored = tr2.restore_latest(st2)
    assert restored is not None
    st3, done = restored
    assert done == 4
    np.testing.assert_array_equal(
        np.asarray(st3.variables["vq_stats"]["_vq"]["ema_counts"]).shape,
        np.asarray(st2.variables["vq_stats"]["_vq"]["ema_counts"]).shape,
    )


def test_ema_statistics_global_under_dp_mesh():
    """EMA codebook statistics under an 8-way data-parallel mesh equal the
    single-device run: the count/sum reductions are over the GLOBAL batch
    (SURVEY.md §5.8), not per-shard. Dataset size == batch size so per-shard
    stratified sampling and global sampling draw the same multiset of rows
    (EMA statistics are permutation-invariant)."""
    from acoustic_locating_vq_vae_tpu.parallel import make_mesh

    train = D.make_dataset(jax.random.PRNGKey(7), 8, SMALL, batch=8, rir_chunk=2048)

    def run(mesh):
        task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, vq_ema=True)
        tr = Trainer(task, mesh=mesh, verbose=False)
        st = tr.init_state(jax.random.PRNGKey(8), train)
        st, _ = tr.fit(st, train, None, num_updates=5)
        return jax.device_get(st.variables["vq_stats"]["_vq"])

    single = run(make_mesh(data=1))
    sharded = run(make_mesh(data=8))
    np.testing.assert_allclose(sharded["ema_counts"], single["ema_counts"], rtol=1e-5)
    np.testing.assert_allclose(sharded["ema_sums"], single["ema_sums"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(sharded["codebook"], single["codebook"], rtol=1e-4, atol=1e-6)


def test_ema_dead_code_restart():
    """ema_reset_threshold re-seeds unused codes from batch rows: after one
    update on data clustered far from the init range, every code is live
    (count >= threshold equivalent) and dead codes moved to data rows."""
    rng = np.random.default_rng(3)
    # two tight clusters: only ~2 codes would ever win assignments
    x = np.concatenate([
        rng.standard_normal((100, 4)) * 0.01 + 5.0,
        rng.standard_normal((100, 4)) * 0.01 - 5.0,
    ]).astype(np.float32)
    x = jnp.asarray(x)

    def run(threshold, steps=120):
        # counts init at 1.0 and decay by 0.99/step: dead codes need ~100
        # updates to fall under 0.5
        vq = ops.VectorQuantizer(
            num_embeddings=8, embedding_dim=4, commitment_cost=0.25,
            ema=True, ema_reset_threshold=threshold,
        )
        variables = vq.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def step(stats):
            _, mutated = vq.apply(
                {"vq_stats": stats}, x, train_vq=True, mutable=["vq_stats"]
            )
            return mutated["vq_stats"]

        stats = variables["vq_stats"]
        for _ in range(steps):
            stats = step(stats)
        return stats

    no_reset = run(0.0)
    reset = run(0.5)
    # without restart most codes decay toward zero usage
    assert (np.asarray(no_reset["ema_counts"]) < 0.5).sum() >= 5
    # with restart every code is re-seeded live
    assert (np.asarray(reset["ema_counts"]) >= 0.5).all()
    # re-seeded codebook rows sit on actual data (|x| ~ 5), not init (~1/8)
    cb = np.asarray(reset["codebook"])
    assert np.abs(cb).max() > 1.0
