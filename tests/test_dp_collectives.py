"""DP-mesh data-path audit (SURVEY.md §5.8): the compiled training step must
contain only the expected collectives. Per-shard stratified batch sampling
(train/loop.py) keeps the resident-dataset gather local to each data shard —
a global random take over a batch-sharded dataset would all-gather the whole
dataset every step, eating ICI at scale."""

import re

import numpy as np

import jax

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.parallel import make_mesh
from acoustic_locating_vq_vae_tpu.parallel.mesh import batch_sharding
from acoustic_locating_vq_vae_tpu.train import SpeechVQVAETask, Trainer

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)


def _compiled_step_text(mesh, batch_size=8, n_data=16):
    train = D.make_dataset(jax.random.PRNGKey(0), n_data, SMALL, batch=16, rir_chunk=2048)
    task = SpeechVQVAETask(config=SMALL, width_scale=1 / 32, batch_size=batch_size)
    tr = Trainer(task, mesh=mesh, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(1), train)
    sharded = jax.device_put(train, batch_sharding(mesh))
    return tr._step_fn.lower(st, sharded, n_data, True).compile().as_text()


def test_dp_step_has_no_cross_shard_batch_collectives():
    txt = _compiled_step_text(make_mesh(data=8))
    counts = {
        name: len(re.findall(name, txt))
        for name in ("all-gather", "all-to-all", "reduce-scatter", "collective-permute", "all-reduce")
    }
    # batch sampling stays shard-local; only reductions (grad psum, global
    # VQ statistics, metric means) cross devices
    assert counts["all-gather"] == 0, counts
    assert counts["all-to-all"] == 0, counts
    assert counts["reduce-scatter"] == 0, counts
    assert counts["collective-permute"] == 0, counts
    assert counts["all-reduce"] >= 1, counts


def test_per_shard_sampling_learns_like_global(tmp_path):
    """The stratified sampler still trains: loss decreases over a short run
    on the 8-way mesh (batch divisible by the data axis -> per-shard path)."""
    train = D.make_dataset(jax.random.PRNGKey(2), 32, SMALL, batch=16, rir_chunk=2048)
    task = SpeechVQVAETask(config=SMALL, width_scale=1 / 32, batch_size=8)
    tr = Trainer(task, mesh=make_mesh(data=8), verbose=False)
    st = tr.init_state(jax.random.PRNGKey(3), train)
    st, hist = tr.fit(st, train, None, num_updates=30)
    f = hist.finalize()
    assert np.isfinite(f["train"]["loss"]).all()
    assert np.mean(f["train"]["recon_error"][-10:]) < np.mean(f["train"]["recon_error"][:10])


def test_cross_shard_fallback_warns():
    """B=12 on 8 data shards cannot stratify -> the trainer warns about the
    cross-shard gather fallback at trace time (VERDICT round 2, weak #5);
    a divisible configuration stays silent."""
    import warnings

    train = D.make_dataset(jax.random.PRNGKey(4), 16, SMALL, batch=16, rir_chunk=2048)
    mesh = make_mesh(data=8)

    task = SpeechVQVAETask(config=SMALL, width_scale=1 / 32, batch_size=12)
    tr = Trainer(task, mesh=mesh, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(5), train)
    sharded = jax.device_put(train, batch_sharding(mesh))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tr._step_fn.lower(st, sharded, 16, True)
    assert any("cross-shard gather" in str(w.message) for w in caught), [
        str(w.message) for w in caught
    ]

    task_ok = SpeechVQVAETask(config=SMALL, width_scale=1 / 32, batch_size=8)
    tr_ok = Trainer(task_ok, mesh=mesh, verbose=False)
    st_ok = tr_ok.init_state(jax.random.PRNGKey(6), train)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tr_ok._step_fn.lower(st_ok, sharded, 16, True)
    assert not any("cross-shard gather" in str(w.message) for w in caught)
