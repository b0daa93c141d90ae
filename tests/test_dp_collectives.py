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


# --------------------------------------------------- model-parallel numerics

def test_model_parallel_step_matches_replicated():
    """One training step on (data=4, model=2) with model_parallel=True
    reproduces the (data=8) replicated step's loss and metrics from
    identical init/rng — a wrong model-axis sharding rule producing a
    plausible loss would pass a run-only check (round-2 VERDICT item 5)."""
    train = D.make_dataset(jax.random.PRNGKey(7), 16, SMALL, batch=16, rir_chunk=2048)
    # width 0.5 keeps H/K divisible by the model axis. batch == dataset size
    # so both meshes consume the SAME 16 rows (the stratified sampler's
    # per-shard permutation differs with the data-axis size, but the batch
    # SET — and every loss/metric, which are row-order invariant — does not).
    task = SpeechVQVAETask(config=SMALL, width_scale=0.5, batch_size=16)

    def step_metrics(mesh, mp):
        tr = Trainer(task, mesh=mesh, model_parallel=mp, verbose=False)
        st = tr.init_state(jax.random.PRNGKey(8), train)
        data = jax.device_put(train, batch_sharding(mesh))
        _, m = tr._step_fn(st, data, 16, True)
        return {k: float(v) for k, v in m.items()}

    m_tp = step_metrics(make_mesh(data=4, model=2), True)
    m_dp = step_metrics(make_mesh(data=8), False)
    assert set(m_tp) == set(m_dp)
    for k in m_tp:
        np.testing.assert_allclose(m_tp[k], m_dp[k], rtol=2e-4, err_msg=k)


def test_model_axis_collectives_present():
    """The compiled (data=4, model=2) step must contain collectives over the
    MODEL axis (pair replica groups {0,1}{2,3}... on the (4,2) device grid):
    the row-sharded codebook and column/row-parallel conv pairs imply
    model-axis reductions; the data axis keeps its grad/stat allreduce."""
    train = D.make_dataset(jax.random.PRNGKey(9), 16, SMALL, batch=16, rir_chunk=2048)
    task = SpeechVQVAETask(config=SMALL, width_scale=0.5, batch_size=8)
    mesh = make_mesh(data=4, model=2)
    tr = Trainer(task, mesh=mesh, model_parallel=True, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(10), train)
    data = jax.device_put(train, batch_sharding(mesh))
    txt = tr._step_fn.lower(st, data, 16, True).compile().as_text()

    # XLA emits iota replica groups on the (data=4, model=2) device grid:
    #   model axis (minor, consecutive pairs {0,1}{2,3}...) -> [4,2]<=[8]
    #   data axis (strided columns {0,2,4,6}{1,3,5,7}) -> [2,4]<=[4,2]T(1,0)
    # (legacy explicit-list spellings accepted as fallback).
    n_model = txt.count("replica_groups=[4,2]<=[8]") + txt.count("{{0,1},{2,3},{4,5},{6,7}}")
    n_data = txt.count("replica_groups=[2,4]<=[4,2]T(1,0)") + txt.count("{{0,2,4,6},{1,3,5,7}}")
    assert n_model >= 1, f"no model-axis collectives in the tp step (data-axis: {n_data})"
    assert n_data >= 1, f"no data-axis collectives in the tp step (model-axis: {n_model})"


def test_multislice_collective_groups_are_slice_contiguous():
    """Multi-slice (DCN) HLO contract (VERDICT r3 next #7): compile the
    (data=4, model=2) training step on a slices=2 mesh with an INTERLEAVED
    fake topology (device i on slice i%2 — worst case for a naive grouping)
    and pin the collectives' replica groups against the mesh's device order:
    every model-axis group must lie within ONE slice (its latency-sensitive
    collectives never ride DCN), and every data-axis allreduce group must be
    slice-contiguous ([0,0,1,1] — equal in-slice blocks), the shape XLA's
    hierarchical lowering needs to stage the reduce as in-slice ICI passes
    plus one cross-slice DCN exchange. The layout test
    (test_multislice.py) pins mesh.devices; this pins the compiled
    collective groups that consume it."""
    devices = jax.devices()
    smap = {d: i % 2 for i, d in enumerate(devices)}  # interleaved worst case
    mesh = make_mesh(data=4, model=2, slices=2, slice_map=dict(smap))

    train = D.make_dataset(jax.random.PRNGKey(11), 16, SMALL, batch=16, rir_chunk=2048)
    task = SpeechVQVAETask(config=SMALL, width_scale=0.5, batch_size=8)
    tr = Trainer(task, mesh=mesh, model_parallel=True, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(12), train)
    data = jax.device_put(train, batch_sharding(mesh))
    txt = tr._step_fn.lower(st, data, 16, True).compile().as_text()

    # The same iota/explicit replica-group spellings as the tp test: group
    # ids index the mesh's device order (mesh.devices.ravel()).
    model_groups = ((0, 1), (2, 3), (4, 5), (6, 7))
    data_groups = ((0, 2, 4, 6), (1, 3, 5, 7))
    assert (
        "replica_groups=[4,2]<=[8]" in txt or "{{0,1},{2,3},{4,5},{6,7}}" in txt
    ), "no model-axis collective in the multislice step"
    assert (
        "replica_groups=[2,4]<=[4,2]T(1,0)" in txt or "{{0,2,4,6},{1,3,5,7}}" in txt
    ), "no data-axis collective in the multislice step"

    slice_of = [smap[d] for d in mesh.devices.ravel()]
    for g in model_groups:  # in-slice: never straddles DCN
        assert len({slice_of[i] for i in g}) == 1, (g, slice_of)
    for g in data_groups:  # slice-contiguous equal blocks: DCN-decomposable
        assert [slice_of[i] for i in g] == [0, 0, 1, 1], (g, slice_of)
