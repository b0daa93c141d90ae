"""AOT serving-export tests (eval/serving.py): the jax.export artifact
reproduces the live model bit-for-bit, survives a cold reload with no model
code, serves arbitrary batch sizes through the symbolic batch dimension,
and carries an honest metadata sidecar."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.eval import (
    export_localizer,
    load_localizer,
    make_serving_fn,
)
from acoustic_locating_vq_vae_tpu.eval.serving import SERVING_BLOB, SERVING_META
from acoustic_locating_vq_vae_tpu.train import (
    EchoedSpeechTask,
    JointLocationTask,
    LocationTask,
    Trainer,
)

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32


@pytest.fixture(scope="module")
def batch():
    return D.make_dataset(jax.random.PRNGKey(0), 12, SMALL, batch=12, rir_chunk=2048)


@pytest.fixture(scope="module")
def joint(batch):
    task = JointLocationTask(
        config=SMALL, width_scale=WS, batch_size=8,
        compat_vq_flatten=False, predict_radius=True,
    )
    state = Trainer(task, verbose=False).init_state(jax.random.PRNGKey(1), batch)
    return task, state.params


def test_joint_export_roundtrip(tmp_path, batch, joint):
    task, params = joint
    meta = export_localizer(
        task, params, None, True, SMALL, str(tmp_path), platforms=("cpu",)
    )
    assert os.path.exists(tmp_path / SERVING_BLOB)
    assert os.path.exists(tmp_path / SERVING_META)
    assert meta["model"] == "joint" and meta["predicts_radius"] is True
    assert meta["input"]["shape"] == ["b", SMALL.num_freq, SMALL.num_frames]

    call, meta2 = load_localizer(str(tmp_path))
    assert meta2 == json.loads(json.dumps(meta))  # sidecar round-trips

    serve, _ = make_serving_fn(task, params, None, True, SMALL)
    spec = batch.echoed_spec[:8]
    live = jax.jit(serve)(spec)
    art = call(spec)
    for a, b, name in zip(live, art, meta["outputs"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6, err_msg=name
        )
    theta, radius, coords = art
    assert theta.shape == (8,) and radius.shape == (8,) and coords.shape == (8, 3)


def test_provenance_sidecar_roundtrip(tmp_path, batch, joint):
    """Self-describing artifact (VERDICT r3 next #8): the sidecar carries the
    training-store provenance — store path, stage manifest entry (step/seq/
    metadata), export-time task modes, and a weights fingerprint that moves
    iff the weights do — post-export eval summaries merge into the same
    sidecar, and load_localizer surfaces all of it with no model code."""
    from acoustic_locating_vq_vae_tpu.eval.serving import (
        params_fingerprint,
        store_provenance,
        update_sidecar,
    )
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    task, params = joint
    store = StageStore(str(tmp_path / "store"))
    store.save_stage(
        "location_joint", {"params": params}, step=7,
        metadata={"task": "location_joint", "target_mode": "sincos"},
    )
    prov = store_provenance(store, "location_joint", params, task=task)
    assert prov["stage"] == "location_joint"
    assert prov["stage_manifest"]["step"] == 7
    assert prov["stage_manifest"]["metadata"]["target_mode"] == "sincos"
    assert prov["task_modes"]["predict_radius"] is True

    out = tmp_path / "art"
    export_localizer(
        task, params, None, True, SMALL, str(out), platforms=("cpu",),
        provenance=prov,
    )
    call, meta = load_localizer(str(out))
    assert meta["provenance"] == json.loads(json.dumps(prov))

    # deterministic, weight-sensitive fingerprint
    assert prov["params_sha256"] == params_fingerprint(params)
    bumped = jax.tree_util.tree_map(lambda a: a + 1e-3, params)
    assert params_fingerprint(bumped) != prov["params_sha256"]

    # post-export eval results merge into the artifact's own record
    update_sidecar(str(out), eval_summary={"verified": True, "max_abs_diff": 0.0})
    _, meta2 = load_localizer(str(out))
    assert meta2["eval_summary"]["verified"] is True
    assert meta2["provenance"]["params_sha256"] == prov["params_sha256"]


def test_symbolic_batch_serves_any_size(tmp_path, batch, joint):
    task, params = joint
    export_localizer(task, params, None, True, SMALL, str(tmp_path), platforms=("cpu",))
    call, _ = load_localizer(str(tmp_path))
    for n in (1, 5, 12):
        theta, radius, coords = call(batch.echoed_spec[:n])
        assert theta.shape == (n,) and coords.shape == (n, 3)
        assert np.isfinite(np.asarray(coords)).all()


def test_pinned_batch_export(tmp_path, batch, joint):
    task, params = joint
    meta = export_localizer(
        task, params, None, True, SMALL, str(tmp_path),
        batch_size=4, platforms=("cpu",),
    )
    assert meta["input"]["shape"][0] == 4
    call, _ = load_localizer(str(tmp_path))
    theta, _, _ = call(batch.echoed_spec[:4])
    assert theta.shape == (4,)
    with pytest.raises(Exception):
        call(batch.echoed_spec[:6])  # pinned artifact rejects other sizes


def test_frozen_path_export(tmp_path, batch):
    comp_task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8)
    comp_params = Trainer(comp_task, verbose=False).init_state(
        jax.random.PRNGKey(2), batch
    ).params
    task = LocationTask(config=SMALL, width_scale=WS, batch_size=8)
    params = Trainer(task, composite_params=comp_params, verbose=False).init_state(
        jax.random.PRNGKey(3), batch
    ).params

    meta = export_localizer(
        task, params, comp_params, False, SMALL, str(tmp_path), platforms=("cpu",)
    )
    assert meta["model"] == "frozen" and meta["predicts_radius"] is False
    call, _ = load_localizer(str(tmp_path))
    serve, _ = make_serving_fn(task, params, comp_params, False, SMALL)
    spec = batch.echoed_spec[:6]
    live = jax.jit(serve)(spec)
    art = call(spec)
    for a, b in zip(live, art):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    # without a range head the radius output is the config's fixed R
    np.testing.assert_allclose(np.asarray(art[1]), SMALL.R, rtol=1e-6)


def test_from_audio_export_fuses_the_stft_frontend(tmp_path, joint):
    """An audio-input artifact (raw waveform in) reproduces the
    spectrogram-input path exactly when fed the same signal's spectrogram
    through data/synth.py's observed_power_spec — the ONE frontend
    synthesize_batch itself builds its spectrogram fields from (the test
    deliberately does NOT respell the STFT formula: the shared helper is
    the parity claim)."""
    from acoustic_locating_vq_vae_tpu.data import observed_power_spec

    task, params = joint
    export_localizer(
        task, params, None, True, SMALL, str(tmp_path), platforms=("cpu",),
        from_audio=True,
    )
    call, meta = load_localizer(str(tmp_path))
    assert meta["input"]["name"] == "echoed_waveform"
    assert meta["input"]["shape"] == ["b", SMALL.audio_samples]

    wav = np.asarray(
        np.random.default_rng(7).standard_normal((4, SMALL.audio_samples)),
        np.float32,
    )
    art = call(wav)

    spec = observed_power_spec(jnp.asarray(wav), SMALL)
    serve_spec, _ = make_serving_fn(task, params, None, True, SMALL)
    live = jax.jit(serve_spec)(spec)
    for a, b in zip(live, art):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_multiplatform_lowering_includes_tpu(tmp_path, batch, joint):
    """Cross-lowering: a CPU host can produce an artifact that also targets
    TPU (no physical device needed at export time)."""
    task, params = joint
    meta = export_localizer(
        task, params, None, True, SMALL, str(tmp_path), platforms=("tpu", "cpu")
    )
    assert meta["platforms"] == ["tpu", "cpu"]
    call, _ = load_localizer(str(tmp_path))
    theta, _, _ = call(batch.echoed_spec[:4])  # runs on the cpu leg here
    assert np.isfinite(np.asarray(theta)).all()
