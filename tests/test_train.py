"""Training-loop tests: each stage learns, the multi-stage pipeline hands
parameters off correctly, validation cadence matches the reference quirk,
checkpoints round-trip, and everything runs sharded over the 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.parallel import make_mesh
from acoustic_locating_vq_vae_tpu.train import (
    EchoedSpeechTask,
    LocationTask,
    RirVQVAETask,
    SpeechVQVAETask,
    Trainer,
    graft_pretrained,
    run_pipeline,
)
from acoustic_locating_vq_vae_tpu.utils import StageStore, load_pytree, save_pytree

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32  # width scale: H=32, D=4, K=32


@pytest.fixture(scope="module")
def datasets():
    train = D.make_dataset(jax.random.PRNGKey(0), 32, SMALL, batch=16, rir_chunk=2048)
    val = D.make_dataset(jax.random.PRNGKey(1), 16, SMALL, batch=16, rir_chunk=2048)
    return train, val


def test_speech_task_learns(datasets):
    train, val = datasets
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, eval_every=10)
    tr = Trainer(task, log_every=1000, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(2), train)
    st, hist = tr.fit(st, train, val, num_updates=30)
    f = hist.finalize()
    assert f["train"]["recon_error"][-1] < f["train"]["recon_error"][0]
    assert f["train"]["perplexity"][-1] > 1.0
    # val-replaces-train: 3 val entries at steps 10/20/30, 27 train entries
    assert len(f["val"]["recon_error"]) == 3
    assert len(f["train"]["recon_error"]) == 27
    assert int(jax.device_get(st.step)) == 30


def test_rir_task_reconstructs_wiener(datasets):
    train, val = datasets
    task = RirVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, log_every=1000, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(3), train)
    st, hist = tr.fit(st, train, val, num_updates=20)
    f = hist.finalize()
    assert f["train"]["recon_error"][-1] < f["train"]["recon_error"][0]


def test_data_parallel_mesh_runs(datasets):
    train, val = datasets
    mesh = make_mesh(data=8)
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, mesh=mesh, log_every=1000, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(2), train)
    st, hist = tr.fit(st, train, val, num_updates=10)
    f = hist.finalize()
    assert np.isfinite(f["train"]["loss"]).all()
    assert f["train"]["recon_error"][-1] < 1.2


def test_model_parallel_mesh_runs(datasets):
    """2-D (data x model) mesh: large kernels sharded per sharding_rules.
    (Smoke only — the NUMERIC verification lives in
    tests/test_dp_collectives.py::test_model_parallel_step_matches_replicated
    and the model-axis HLO audit next to it.)"""
    train, val = datasets
    mesh = make_mesh(data=4, model=2)
    # width 1/2 keeps K=512, H=512 — divisible by the model axis.
    task = SpeechVQVAETask(config=SMALL, width_scale=0.5, batch_size=8)
    tr = Trainer(task, mesh=mesh, model_parallel=True, log_every=1000, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(2), train)
    st, hist = tr.fit(st, train, val, num_updates=4)
    f = hist.finalize()
    assert np.isfinite(f["train"]["loss"]).all()
    # codebook actually sharded over the model axis
    cb = st.params["_vq"]["codebook"]
    spec = cb.sharding.spec
    assert spec[0] == "model"


def test_full_pipeline_with_handoff(tmp_path, datasets):
    train, val = datasets
    res = run_pipeline(
        jax.random.PRNGKey(7), train, val, store_dir=str(tmp_path), config=SMALL,
        width_scale=WS, mesh=make_mesh(data=8), verbose=False,
        updates=dict(speech=10, rir=10, echoed=10, finetune=4, location=16),
    )
    assert set(res) == {"speech", "rir", "echoed", "finetune", "location"}
    # the composite really contains the pretrained speech codebook
    speech_cb = np.asarray(res["speech"][0]["_vq"]["codebook"])
    # echoed stage freezes codebooks -> composite's speech codebook unchanged
    comp_cb = np.asarray(res["echoed"][0]["speech_model"]["_vq"]["codebook"])
    np.testing.assert_array_equal(speech_cb, comp_cb)
    # location learns something
    f = res["location"][1].finalize()
    assert f["train"]["location_error"][-1] < f["train"]["location_error"][0]
    # stage store has all checkpoints
    store = StageStore(str(tmp_path))
    assert store.has_stage("speech") and store.has_stage("location")
    # stage metadata records the eval-relevant task config (the VQ flatten
    # mode is shape-invisible; eval tools self-configure from this)
    meta = store.stage_metadata("location")
    assert meta["compat_vq_flatten"] is True  # library default preset: compat
    assert meta["input_mode"] == "encodings"
    assert meta["target_mode"] == "normalized_angle"
    assert store.stage_metadata("speech")["compat_vq_flatten"] is True


def test_echoed_graft_uses_pretrained(datasets):
    train, val = datasets
    task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, log_every=1000, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(4), train)
    fake_speech = jax.tree_util.tree_map(jnp.ones_like, st.params["speech_model"])
    grafted = graft_pretrained(st.params, speech_params=fake_speech)
    assert float(jnp.min(grafted["speech_model"]["_vq"]["codebook"])) == 1.0
    # other subtrees untouched
    np.testing.assert_array_equal(
        np.asarray(grafted["rir_model"]["_vq"]["codebook"]),
        np.asarray(st.params["rir_model"]["_vq"]["codebook"]),
    )


def test_flatten_handoff_guard():
    """A donor stage trained in one VQ flatten mode must not graft into a
    composite resolved to the other: the codebooks are shape-identical but
    their codes mean different things (vector_quantizer.py:32), so the
    mismatch is invisible to shape checks. The default per-stage workflow
    hits exactly this (echoed resolves compat, JointLocationTask defaults to
    vectors) — the guard turns silent corruption into a reasoned error."""
    from acoustic_locating_vq_vae_tpu.train import (
        JointLocationTask,
        check_flatten_handoff,
        resolved_vq_flatten,
    )

    echoed = EchoedSpeechTask(config=SMALL, width_scale=WS)
    assert resolved_vq_flatten(echoed) is True  # None -> compat (no seq axis)
    assert resolved_vq_flatten(EchoedSpeechTask(config=SMALL, width_scale=WS, sequence_axis="seq")) is False
    joint = JointLocationTask(config=SMALL, width_scale=WS)
    assert resolved_vq_flatten(joint) is False  # dataclass default: vectors

    with pytest.raises(ValueError, match="VQ flatten mismatch"):
        check_flatten_handoff({"compat_vq_flatten": True}, joint, "finetune")
    # matching modes and pre-metadata stores pass
    check_flatten_handoff({"compat_vq_flatten": False}, joint, "finetune")
    check_flatten_handoff({}, joint, "finetune")
    check_flatten_handoff({"compat_vq_flatten": True}, echoed, "rir")


def test_checkpoint_roundtrip(tmp_path, datasets):
    train, _ = datasets
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, log_every=1000, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(5), train)
    save_pytree(str(tmp_path / "ck"), {"params": st.params})
    loaded = load_pytree(str(tmp_path / "ck"), {"params": st.params})
    a = jax.tree_util.tree_leaves(loaded["params"])
    b = jax.tree_util.tree_leaves(st.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_from_checkpoint_continues(tmp_path, datasets):
    train, val = datasets
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, checkpoint_dir=str(tmp_path), log_every=1000, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(6), train)
    st, _ = tr.fit(st, train, val, num_updates=5)
    # restore params from the final stage checkpoint and keep training
    restored = tr.load_stage_params("speech")
    st2 = tr.init_state(jax.random.PRNGKey(8), train)
    st2 = st2.replace(params=restored, opt_state=tr.optimizer.init(restored))
    st2, hist = tr.fit(st2, train, val, num_updates=5)
    assert np.isfinite(hist.finalize()["train"]["loss"]).all()


def test_location_task_requires_composite(datasets):
    with pytest.raises(ValueError):
        Trainer(LocationTask(config=SMALL, width_scale=WS), verbose=False)


def test_auto_resume_from_periodic_checkpoint(tmp_path, datasets):
    """Crash recovery: kill after the first periodic checkpoint, resume picks
    up params+opt_state+step from it (SURVEY.md §5.3 gap in the reference)."""
    train, val = datasets
    import dataclasses

    task = dataclasses.replace(
        SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8), ckpt_every=5
    )
    tr = Trainer(task, checkpoint_dir=str(tmp_path), log_every=1000, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(11), train)
    # "crash" after 7 updates: checkpoints exist at step 5
    st, _ = tr.fit(st, train, val, num_updates=7)

    tr2 = Trainer(task, checkpoint_dir=str(tmp_path), log_every=1000, verbose=False)
    st2 = tr2.init_state(jax.random.PRNGKey(12), train)
    restored = tr2.restore_latest(st2)
    assert restored is not None
    st3, done = restored
    assert done == 5
    # params differ from the fresh init (they are the trained ones)
    fresh = np.asarray(jax.tree_util.tree_leaves(st2.params)[0])
    rest = np.asarray(jax.tree_util.tree_leaves(st3.params)[0])
    assert not np.array_equal(fresh, rest)
    # and fit(resume=True) continues to the target without redoing work
    st4, hist = tr2.fit(st2, train, val, num_updates=10, resume=True)
    assert int(jax.device_get(st4.step)) == 10
    assert len(hist.finalize()["train"]["loss"]) == 5  # only steps 6..10 run


def test_on_the_fly_synthesis_training(datasets):
    """Fresh data synthesized inside the jitted step: no resident training
    set at all (train_data=None), loss finite and decreasing-ish."""
    _, val = datasets
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, eval_every=10)
    tr = Trainer(
        task, log_every=1000, verbose=False, on_the_fly=True,
        synth_kwargs=dict(rir_chunk=2048),
    )
    st = tr.init_state(jax.random.PRNGKey(21), val)
    st, hist = tr.fit(st, None, val, num_updates=20)
    f = hist.finalize()
    assert np.isfinite(f["train"]["loss"]).all()
    assert len(f["train"]["loss"]) == 18  # 2 val steps replaced train steps
    assert len(f["val"]["recon_error"]) == 2
    # on-the-fly without the flag is rejected
    tr2 = Trainer(task, verbose=False)
    st2 = tr2.init_state(jax.random.PRNGKey(22), val)
    with pytest.raises(ValueError):
        tr2.fit(st2, None, val, num_updates=2)


def test_on_the_fly_speech_pool_provenance(datasets):
    """Real-corpus OTF training (--wav-dir --on-the-fly): the speech pool
    must reach the jitted step — every synthesized sample's speech_spec is
    the STFT of a pool utterance, and fit() threads the pool as an OtfArrays
    operand. Round-3 bug: the pool was loaded by the CLI but never reached
    the step, silently training on the surrogate (VERDICT r3, missing #1)."""
    from acoustic_locating_vq_vae_tpu.train import OtfArrays

    _, val = datasets
    # Distinctive utterances: pure tones at well-separated frequencies.
    t = np.arange(SMALL.audio_samples) / SMALL.fs
    pool = np.stack(
        [np.sin(2 * np.pi * f * t).astype(np.float32) for f in (450.0, 1300.0, 3100.0)]
    )
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, eval_every=10)
    tr = Trainer(
        task, log_every=1000, verbose=False, on_the_fly=True,
        synth_kwargs=dict(rir_chunk=2048, speech_pool=pool),
    )
    assert "speech_pool" not in tr.synth_kwargs  # popped into the operand

    # Unit level: the step's batch builder draws pool rows.
    batch = tr._otf_batch(
        jax.random.PRNGKey(3), OtfArrays(speech_pool=jnp.asarray(pool))
    )
    pool_specs = np.asarray(
        jax.vmap(lambda w: D.observed_power_spec(w, SMALL))(jnp.asarray(pool))
    )
    got = np.asarray(batch.speech_spec)
    matched = set()
    for i in range(got.shape[0]):
        diffs = [np.abs(got[i] - ps).max() for ps in pool_specs]
        assert min(diffs) < 1e-4, f"sample {i} matches no pool row ({min(diffs)})"
        matched.add(int(np.argmin(diffs)))
    assert len(matched) > 1  # per-SAMPLE draws, not one shared row

    # End-to-end: fit() builds the OtfArrays operand and the step uses it.
    seen = {}
    orig = tr._otf_batch

    def spy(key, otf):
        seen["otf"] = otf
        return orig(key, otf)

    tr._otf_batch = spy
    st = tr.init_state(jax.random.PRNGKey(21), val)
    st, hist = tr.fit(st, None, val, num_updates=4)
    assert seen["otf"] is not None and seen["otf"].speech_pool is not None
    assert np.isfinite(hist.finalize()["train"]["loss"]).all()

    # A resident-data Trainer must reject the kwarg loudly, not drop it.
    with pytest.raises(ValueError, match="on_the_fly"):
        Trainer(task, verbose=False, synth_kwargs=dict(speech_pool=pool))


def test_location_quantized_input_mode(datasets):
    """Fixed-variant location input: quantized latents instead of one-hots."""
    train, _ = datasets
    comp_task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8)
    comp_tr = Trainer(comp_task, verbose=False)
    comp_st = comp_tr.init_state(jax.random.PRNGKey(31), train)
    task = LocationTask(
        config=SMALL, width_scale=WS, batch_size=8, input_mode="quantized"
    )
    tr = Trainer(task, composite_params=comp_st.params, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(32), train)
    st, hist = tr.fit(st, train, None, num_updates=10)
    f = hist.finalize()
    assert np.isfinite(f["train"]["location_error"]).all()


def test_location_sincos_target_mode(datasets):
    """Circular (sin, cos) target variant: trains and decodes angles."""
    train, _ = datasets
    comp_task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8)
    comp_tr = Trainer(comp_task, verbose=False)
    comp_st = comp_tr.init_state(jax.random.PRNGKey(41), train)
    task = LocationTask(
        config=SMALL, width_scale=WS, batch_size=8,
        input_mode="quantized", target_mode="sincos",
    )
    tr = Trainer(task, composite_params=comp_st.params, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(42), train)
    st, hist = tr.fit(st, train, None, num_updates=10)
    f = hist.finalize()
    assert np.isfinite(f["train"]["location_error"]).all()
    # decode shape check
    pred = jnp.asarray(np.random.default_rng(0).standard_normal((5, 2)).astype(np.float32))
    ang = np.asarray(task.decode_angle(pred))
    assert ang.shape == (5,)
    assert (np.abs(ang) <= np.pi).all()
    # evaluate_location handles sincos
    from acoustic_locating_vq_vae_tpu.eval import evaluate_location
    m = evaluate_location(task, st.params, comp_st.params, train)
    assert np.isfinite(m["rmse_radians"])


def test_history_save_load(tmp_path, datasets):
    train, val = datasets
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(51), train)
    st, hist = tr.fit(st, train, val, num_updates=6)
    path = str(tmp_path / "hist.npz")
    hist.save(path)
    from acoustic_locating_vq_vae_tpu.train import TrainHistory
    back = TrainHistory.load(path)
    np.testing.assert_allclose(
        back["train"]["loss"], hist.finalize()["train"]["loss"]
    )


def test_finetune_commitment_anchor(datasets):
    """Non-compat option: commitment weight anchors unfrozen encoders to the
    frozen codebooks (the reference's recon-only phase-2 loss collapses,
    VALIDATION.md)."""
    from acoustic_locating_vq_vae_tpu.train import EncoderFinetuneTask

    train, _ = datasets
    task = EncoderFinetuneTask(
        config=SMALL, width_scale=WS, batch_size=8, commitment_weight=0.25
    )
    tr = Trainer(task, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(61), train)

    # gradient flows to the encoders through the commitment term even though
    # the decoder path detaches nothing extra
    def loss_fn(p):
        l, _ = task.loss(tr.model, p, jax.tree_util.tree_map(lambda a: a[:4], train), {"jitter": jax.random.PRNGKey(0)}, True)
        return l

    g = jax.grad(loss_fn)(st.params)
    enc_grad = max(
        float(jnp.abs(v).max())
        for v in jax.tree_util.tree_leaves(g["speech_model"]["_encoder"])
    )
    assert enc_grad > 0.0
    # codebooks stay frozen
    assert float(jnp.abs(g["speech_model"]["_vq"]["codebook"]).max()) == 0.0
    st, hist = tr.fit(st, train, None, num_updates=6)
    assert np.isfinite(hist.finalize()["train"]["loss"]).all()


def test_make_task_factory():
    from acoustic_locating_vq_vae_tpu.train import make_task

    t = make_task("speech", config=SMALL, width_scale=WS)
    assert t.name == "speech" and t.batch_size == 32
    t = make_task("location", config=SMALL)
    assert t.name == "location"
    with pytest.raises(KeyError):
        make_task("nope")


def test_on_the_fly_under_data_parallel_mesh(datasets):
    """In-step synthesis composes with batch sharding over the 8-device mesh."""
    _, val = datasets
    mesh = make_mesh(data=8)
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(
        task, mesh=mesh, log_every=1000, verbose=False, on_the_fly=True,
        synth_kwargs=dict(rir_chunk=2048),
    )
    st = tr.init_state(jax.random.PRNGKey(71), val)
    st, hist = tr.fit(st, None, val, num_updates=6)
    f = hist.finalize()
    assert np.isfinite(f["train"]["loss"]).all()


def test_pipeline_fixed_preset_with_ema_handoff(datasets):
    """preset='fixed' (anchored finetune + quantized-latent location,
    VALIDATION.md) with EMA codebooks: the EMA-learned stage-1/2 codebooks
    (living in vq_stats, not params) must be grafted into the composite's
    frozen param-mode codebook slots."""
    train, val = datasets
    res = run_pipeline(
        jax.random.PRNGKey(9), train, val, config=SMALL, width_scale=WS,
        mesh=make_mesh(data=8), verbose=False, preset="fixed", vq_ema=True,
        updates=dict(speech=8, rir=8, echoed=6, finetune=4, location=8),
    )
    # EMA stages keep the codebook out of params
    assert "_vq" not in res["speech"][0] or "codebook" not in res["speech"][0].get("_vq", {})
    speech_cb = np.asarray(res["speech"][2]["vq_stats"]["_vq"]["codebook"])
    rir_cb = np.asarray(res["rir"][2]["vq_stats"]["_vq"]["codebook"])
    np.testing.assert_array_equal(
        np.asarray(res["echoed"][0]["speech_model"]["_vq"]["codebook"]), speech_cb
    )
    np.testing.assert_array_equal(
        np.asarray(res["echoed"][0]["rir_model"]["_vq"]["codebook"]), rir_cb
    )
    # fixed preset ran the quantized-latent location head: its fc_1 input is
    # F * D_rir (dense latents), not F * K (one-hot)
    d_rir = res["echoed"][0]["rir_model"]["_vq"]["codebook"].shape[1]
    fc1_in = res["location"][0]["fc_1"]["Dense_0"]["kernel"].shape[0]
    assert fc1_in == SMALL.num_freq * d_rir
    for stage in ("speech", "rir", "echoed", "finetune", "location"):
        assert np.isfinite(res[stage][1].finalize()["train"]["loss"]).all()


def test_joint_location_task_trains_encoder(datasets, tmp_path):
    """Beyond-parity joint location stage: encoder + head trained together on
    the angle loss; gradients reach the encoder through the VQ STE; the
    rir_model subtree seeds from a pretrained composite."""
    from acoustic_locating_vq_vae_tpu.train import EncoderFinetuneTask, JointLocationTask

    train, val = datasets
    # a quick composite to seed from
    comp_task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8,
                                 compat_vq_flatten=False)
    comp_tr = Trainer(comp_task, verbose=False)
    comp_st = comp_tr.init_state(jax.random.PRNGKey(10), train)

    task = JointLocationTask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(11), train)
    seeded = task.seed_params(st.params, comp_st.params)
    np.testing.assert_array_equal(
        np.asarray(seeded["rir_model"]["_vq"]["codebook"]),
        np.asarray(comp_st.params["rir_model"]["_vq"]["codebook"]),
    )
    st = st.replace(params=seeded, opt_state=tr.optimizer.init(seeded))

    enc0 = np.asarray(st.params["rir_model"]["_encoder"]["conv_1"]["Conv_0"]["kernel"])
    cb0 = np.asarray(st.params["rir_model"]["_vq"]["codebook"])
    st, hist = tr.fit(st, train, val, num_updates=80)
    f = hist.finalize()
    assert np.isfinite(f["train"]["location_error"]).all()
    # noisy small-batch regression: compare window means, not endpoints
    assert np.mean(f["train"]["location_error"][-20:]) < np.mean(
        f["train"]["location_error"][:10]
    )
    # encoder moved (STE gradients), codebook stayed frozen (train_vq=False)
    enc1 = np.asarray(st.params["rir_model"]["_encoder"]["conv_1"]["Conv_0"]["kernel"])
    cb1 = np.asarray(st.params["rir_model"]["_vq"]["codebook"])
    assert not np.array_equal(enc0, enc1)
    np.testing.assert_array_equal(cb0, cb1)


def test_joint_predict_radius_head(tmp_path):
    """2-D polar localization (beyond parity): predict_radius appends a range
    output supervised in meters by batch.radius. On radius-randomized data
    the range head must learn the per-sample radius (beat the
    constant-predictor variance), the radius metrics must appear in training
    history and eval, and the checkpoint metadata must record the mode."""
    from acoustic_locating_vq_vae_tpu.eval import evaluate_joint_location
    from acoustic_locating_vq_vae_tpu.train import JointLocationTask
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    train = D.make_dataset(
        jax.random.PRNGKey(0), 32, SMALL, batch=16, rir_chunk=2048,
        radius_range=(0.6, 1.4),
    )
    r = np.asarray(train.radius)
    assert r.min() >= 0.6 and r.max() <= 1.4 and np.unique(r).size > 1

    task = JointLocationTask(
        config=SMALL, width_scale=WS, batch_size=8, predict_radius=True,
    )
    tr = Trainer(task, verbose=False, checkpoint_dir=str(tmp_path))
    st = tr.init_state(jax.random.PRNGKey(1), train)
    st, hist = tr.fit(st, train, None, num_updates=120)
    f = hist.finalize()
    radius_err = f["train"]["radius_error"]
    assert np.isfinite(radius_err).all()
    # beat the constant predictor: Var(U(0.6,1.4)) = 0.8^2/12 = 0.053
    assert np.mean(radius_err[-20:]) < 0.05

    m = evaluate_joint_location(task, st.params, train)
    assert "rmse_radius_m" in m and np.isfinite(m["rmse_radius_m"])
    assert m["rmse_radius_m"] < 0.23  # constant predictor: 0.8/sqrt(12) = 0.231
    # predicted-radius coordinates: still finite/sane
    assert np.isfinite(m["rmse_coordinates_m"])

    meta = StageStore(str(tmp_path)).stage_metadata("location_joint")
    assert meta["predict_radius"] is True
    assert meta["target_mode"] == "sincos"

    # decode_radius is meters straight from the head; guarded otherwise
    with pytest.raises(ValueError, match="predict_radius"):
        JointLocationTask(config=SMALL, width_scale=WS).decode_radius(
            jnp.zeros((2, 3))
        )


def test_joint_tail_weighted_loss(datasets):
    """Hard-example weighting (tail_weight): the loss gains exactly
    tail_weight x the mean of the worst ceil(tail_frac x B) per-sample angle
    errors (reported as the tail_error metric), which is >= the uniform mean
    by construction; tail_weight=0 is bit-identical to the runs C-I
    objective (VERDICT r3 weak #3: the uniform mean leaves a far-range
    outlier tail nothing in training targets)."""
    import dataclasses as dc

    from acoustic_locating_vq_vae_tpu.train import JointLocationTask

    train, _ = datasets
    base = JointLocationTask(config=SMALL, width_scale=WS, batch_size=8)
    tailed = dc.replace(base, tail_weight=2.0, tail_frac=0.25)
    model = base.build_model()
    tr = Trainer(base, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(30), train)
    batch = jax.tree_util.tree_map(lambda a: a[:8], train)

    loss_b, met_b = base.loss(model, st.params, batch, {}, train=True)
    loss_t, met_t = tailed.loss(model, st.params, batch, {}, train=True)
    assert "tail_error" not in met_b
    tail = met_t["tail_error"]
    assert float(tail) >= float(met_t["location_error"])  # worst-k mean >= mean
    np.testing.assert_allclose(
        float(loss_t), float(loss_b) + 2.0 * float(tail), rtol=1e-6
    )
    # and it trains: the tail term carries gradient, metrics stay finite
    tr2 = Trainer(tailed, verbose=False)
    st2 = tr2.init_state(jax.random.PRNGKey(31), train)
    st2 = st2.replace(params=st.params, opt_state=tr2.optimizer.init(st.params))
    st2, hist = tr2.fit(st2, train, None, num_updates=10)
    f = hist.finalize()
    assert np.isfinite(f["train"]["tail_error"]).all()
    assert np.isfinite(f["train"]["loss"]).all()


def test_fit_joint_recipe(tmp_path, datasets):
    """The one-command run-H production recipe (VERDICT r3 weak #5):
    bank-pretrain leg 1 + exact-synthesis polish leg 2 through ONE store with
    one step numbering. The leg boundary is pinned as a periodic checkpoint
    (leg 2 resumes from it), the stage-final tag only exists after the
    polish, and the merged history spans both legs."""
    from acoustic_locating_vq_vae_tpu.data.synth import make_rir_bank
    from acoustic_locating_vq_vae_tpu.train import (
        EchoedSpeechTask,
        JointLocationTask,
        fit_joint_recipe,
    )

    train, val = datasets
    mesh = make_mesh(data=8)
    comp_task = EchoedSpeechTask(
        config=SMALL, width_scale=WS, batch_size=8, compat_vq_flatten=False
    )
    comp_st = Trainer(comp_task, verbose=False, mesh=mesh).init_state(
        jax.random.PRNGKey(40), train
    )

    bank = make_rir_bank(SMALL, n_theta=8, chunk=2048, batch=4)
    task = JointLocationTask(config=SMALL, width_scale=WS, batch_size=8)
    tkw = dict(
        verbose=False, on_the_fly=True, log_every=1000,
        synth_kwargs=dict(rir_bank=bank, rir_chunk=2048),
    )
    state, hist = fit_joint_recipe(
        task, jax.random.PRNGKey(41), None, val, str(tmp_path), mesh,
        composite_params=comp_st.params, bank_updates=4, num_updates=10,
        exact_synth_kwargs=dict(rir_chunk=2048), **tkw,
    )
    assert int(jax.device_get(state.step)) == 10
    f = hist.finalize()
    assert len(f["train"]["location_error"]) == 10  # both legs, one numbering
    assert np.isfinite(f["train"]["location_error"]).all()
    store = StageStore(str(tmp_path))
    assert store.has_stage("location_joint")  # final exists after the polish
    assert "location_joint_4" in store.stages()  # the pinned leg boundary
    # seeded from the composite: frozen codebook subtree matches
    np.testing.assert_array_equal(
        np.asarray(state.params["rir_model"]["_vq"]["codebook"]),
        np.asarray(comp_st.params["rir_model"]["_vq"]["codebook"]),
    )

    # storeless variant: leg 2 runs the remaining updates directly
    state2, hist2 = fit_joint_recipe(
        task, jax.random.PRNGKey(41), None, val, None, mesh,
        composite_params=comp_st.params, bank_updates=4, num_updates=10,
        exact_synth_kwargs=dict(rir_chunk=2048), **tkw,
    )
    assert len(hist2.finalize()["train"]["location_error"]) == 10

    # guard rails
    with pytest.raises(ValueError, match="bank_updates"):
        fit_joint_recipe(
            task, jax.random.PRNGKey(42), None, val, None, mesh,
            composite_params=comp_st.params, bank_updates=12, num_updates=10,
            exact_synth_kwargs={}, **tkw,
        )
    with pytest.raises(ValueError, match="RIR bank"):
        fit_joint_recipe(
            task, jax.random.PRNGKey(42), None, val, None, mesh,
            composite_params=comp_st.params, bank_updates=4, num_updates=10,
            exact_synth_kwargs={}, verbose=False, on_the_fly=True,
            synth_kwargs=dict(rir_chunk=2048),
        )
    with pytest.raises(ValueError, match="must not carry"):
        fit_joint_recipe(
            task, jax.random.PRNGKey(42), None, val, None, mesh,
            composite_params=comp_st.params, bank_updates=4, num_updates=10,
            exact_synth_kwargs=dict(rir_bank=bank), **tkw,
        )


def test_fit_joint_recipe_mixed_polish(datasets):
    """polish_bank_prob (round 5): the polish leg keeps the bank as a step
    operand and mixes bank/exact per sample (synthesize_batch bank_mix_prob)
    instead of hard-switching distributions; and the short-polish budget
    guard warns when the polish leg is under the measured ~50k
    re-convergence horizon while the bank leg is production-sized."""
    from acoustic_locating_vq_vae_tpu.data.synth import make_rir_bank
    from acoustic_locating_vq_vae_tpu.train import (
        EchoedSpeechTask,
        JointLocationTask,
        fit_joint_recipe,
    )

    train, val = datasets
    mesh = make_mesh(data=8)
    comp_task = EchoedSpeechTask(
        config=SMALL, width_scale=WS, batch_size=8, compat_vq_flatten=False
    )
    comp_st = Trainer(comp_task, verbose=False, mesh=mesh).init_state(
        jax.random.PRNGKey(43), train
    )
    bank = make_rir_bank(SMALL, n_theta=8, chunk=2048, batch=4)
    task = JointLocationTask(config=SMALL, width_scale=WS, batch_size=8)
    tkw = dict(
        verbose=False, on_the_fly=True, log_every=1000,
        synth_kwargs=dict(rir_bank=bank, rir_chunk=2048),
    )
    state, hist = fit_joint_recipe(
        task, jax.random.PRNGKey(44), None, val, None, mesh,
        composite_params=comp_st.params, bank_updates=4, num_updates=10,
        exact_synth_kwargs=dict(rir_chunk=2048), polish_bank_prob=0.5, **tkw,
    )
    assert int(jax.device_get(state.step)) == 10
    f = hist.finalize()
    assert len(f["train"]["location_error"]) == 10
    assert np.isfinite(f["train"]["location_error"]).all()

    with pytest.raises(ValueError, match="polish_bank_prob"):
        fit_joint_recipe(
            task, jax.random.PRNGKey(44), None, val, None, mesh,
            composite_params=comp_st.params, bank_updates=4, num_updates=10,
            exact_synth_kwargs={}, polish_bank_prob=1.0, **tkw,
        )
    # short-polish budget guard: polish(2) < bank(8) and < 50k -> warn
    with pytest.warns(UserWarning, match="re-convergence"):
        fit_joint_recipe(
            task, jax.random.PRNGKey(44), None, val, None, mesh,
            composite_params=comp_st.params, bank_updates=8, num_updates=10,
            exact_synth_kwargs=dict(rir_chunk=2048), **tkw,
        )


def test_pipeline_joint_location_stage(datasets):
    """joint_location=True appends stage 6: a JointLocationTask seeded from
    the fine-tuned composite (rir encoder + codebook copied), trained on the
    angle loss, with its results under 'location_joint'."""
    train, val = datasets
    res = run_pipeline(
        jax.random.PRNGKey(11), train, val, config=SMALL, width_scale=WS,
        mesh=make_mesh(data=8), verbose=False, preset="fixed",
        updates=dict(speech=6, rir=6, echoed=4, finetune=4, location=6, location_joint=8),
        joint_location=True,
    )
    params, hist, _ = res["location_joint"]
    f = hist.finalize()
    assert np.isfinite(f["train"]["location_error"]).all()
    assert len(f["train"]["location_error"]) > 0
    # seeded from the finetuned composite: frozen codebook subtree matches
    np.testing.assert_array_equal(
        np.asarray(params["rir_model"]["_vq"]["codebook"]),
        np.asarray(res["finetune"][0]["rir_model"]["_vq"]["codebook"]),
    )
    # the head is part of the joint tree
    assert "head" in params
