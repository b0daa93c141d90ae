"""Eval-layer tests: location evaluation math, model comparison, latent
collection, and audio resynthesis round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu import eval as E
from acoustic_locating_vq_vae_tpu.train import EchoedSpeechTask, LocationTask, Trainer

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32


@pytest.fixture(scope="module")
def trained():
    batch = D.make_dataset(jax.random.PRNGKey(0), 24, SMALL, batch=12, rir_chunk=2048)
    comp_task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8)
    comp_tr = Trainer(comp_task, verbose=False)
    comp_state = comp_tr.init_state(jax.random.PRNGKey(1), batch)

    loc_task = LocationTask(config=SMALL, width_scale=WS, batch_size=8)
    loc_tr = Trainer(loc_task, composite_params=comp_state.params, verbose=False)
    loc_state = loc_tr.init_state(jax.random.PRNGKey(2), batch)
    loc_state, _ = loc_tr.fit(loc_state, batch, None, num_updates=8)
    return batch, comp_state.params, loc_state.params, loc_task


def test_evaluate_location_metrics(trained):
    batch, comp_params, loc_params, task = trained
    m = E.evaluate_location(task, loc_params, comp_params, batch, batch_size=8)
    assert set(m) >= {
        "mse_theta_over_pi", "rmse_radians", "rmse_coordinates_m",
        "median_abs_radians", "p90_abs_radians",
        "frac_err_gt_0.1rad", "frac_err_gt_1rad",
    }
    assert m["median_abs_radians"] <= m["p90_abs_radians"]
    assert m["frac_err_gt_1rad"] <= m["frac_err_gt_0.1rad"]
    assert np.isfinite(list(m.values())).all()
    assert m["num_samples"] == 24
    # coordinate error bounded by circle diameter + clipping geometry
    assert 0.0 <= m["rmse_coordinates_m"] < 3.0


def test_compare_location_models(trained):
    batch, comp_params, loc_params, task = trained
    out = E.compare_location_models(
        {
            "a": {"location_params": loc_params, "composite_params": comp_params, "task": task},
            "b": {"location_params": loc_params, "composite_params": comp_params, "task": task},
        },
        batch,
    )
    assert out["a"] == out["b"]  # same params -> identical metrics


def test_collect_encodings_shapes(trained):
    batch, comp_params, _, task = trained
    enc = E.collect_encodings(task, comp_params, batch, batch_size=8)
    n = 24
    k = int(comp_params["rir_model"]["_vq"]["codebook"].shape[0])
    f = SMALL.num_freq
    assert enc["rir_encodings"].shape == (n, f * k)
    assert enc["theta"].shape == (n,)
    # one-hot rows: each frequency position selects exactly one code
    row = enc["rir_encodings"][0].reshape(f, k)
    np.testing.assert_allclose(row.sum(axis=1), 1.0)


def test_tsne_embedding(trained):
    batch, comp_params, _, task = trained
    emb, theta = E.tsne_rir_embedding(task, comp_params, batch, seed=0)
    assert emb.shape == (24, 2) and theta.shape == (24,)
    assert np.isfinite(emb).all()


def test_resynthesis_roundtrips():
    key = jax.random.PRNGKey(0)
    t = np.arange(SMALL.audio_samples) / SMALL.fs
    x = jnp.asarray(np.sin(2 * np.pi * 500.0 * t).astype(np.float32))
    from acoustic_locating_vq_vae_tpu.dsp import spectrogram

    complex_spec = spectrogram(x, SMALL.NFFT, SMALL.HOP_LENGTH, power=None)
    y = E.audio_from_complex_spec(complex_spec, SMALL, length=SMALL.audio_samples)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)

    power_spec = jnp.abs(complex_spec) ** 2
    z = E.audio_from_power_spec(power_spec, key, SMALL, n_iter=16, length=SMALL.audio_samples)
    spec_z = spectrogram(z, SMALL.NFFT, SMALL.HOP_LENGTH, power=2.0)
    snr = float(E.spectral_snr_db(power_spec, spec_z))
    assert snr > 10.0  # Griffin-Lim recovers the magnitude structure


def test_write_wav(tmp_path):
    from scipy.io import wavfile

    audio = np.sin(np.linspace(0, 100, 1600)).astype(np.float32)
    path = str(tmp_path / "out.wav")
    E.write_wav(path, audio, fs=16000)
    fs, back = wavfile.read(path)
    assert fs == 16000 and back.dtype == np.int16 and len(back) == 1600


@pytest.mark.parametrize("input_mode", ["encodings", "quantized"])
@pytest.mark.parametrize("target_mode", ["normalized_angle", "sincos"])
def test_infer_location_modes(trained, input_mode, target_mode):
    """Checkpoint self-configuration: the head widths identify the trained
    (input_mode, target_mode) for every combination, regardless of the
    probe task's own modes (scripts/compare_location_models.py)."""
    batch, comp_params, _, _ = trained
    task = LocationTask(
        config=SMALL, width_scale=WS, batch_size=8,
        input_mode=input_mode, target_mode=target_mode,
    )
    tr = Trainer(task, composite_params=comp_params, verbose=False)
    params = tr.init_state(jax.random.PRNGKey(3), batch).params
    probe = LocationTask(config=SMALL, width_scale=WS)  # default modes
    assert E.infer_location_modes(params, probe) == {
        "input_mode": input_mode,
        "target_mode": target_mode,
    }


def test_infer_location_modes_rejects_foreign_head(trained):
    batch, comp_params, loc_params, task = trained
    import dataclasses as dc

    bad_probe = dc.replace(task, config=dc.replace(SMALL, NFFT=16))  # wrong F
    with pytest.raises(ValueError, match="matches neither"):
        E.infer_location_modes(loc_params, bad_probe)


def test_linear_angle_probe_decodes_planted_signal():
    """The probe recovers a linearly-planted angle signal (R^2 -> 1, small
    RMSE) and reports no skill on pure noise (R^2 <= 0)."""
    rng = np.random.default_rng(0)
    theta_tr = rng.uniform(-np.pi, np.pi, 400)
    theta_te = rng.uniform(-np.pi, np.pi, 100)

    def feats(theta, informative):
        noise = rng.normal(size=(len(theta), 32))
        if not informative:
            return noise
        sig = np.stack([np.sin(theta), np.cos(theta)], 1)
        return np.concatenate([sig + 0.01 * rng.normal(size=sig.shape), noise], 1)

    m = E.linear_angle_probe(
        feats(theta_tr, True), theta_tr, feats(theta_te, True), theta_te
    )
    assert m["r2"] > 0.9
    assert m["angle_rmse_radians"] < 0.2

    m0 = E.linear_angle_probe(
        feats(theta_tr, False), theta_tr, feats(theta_te, False), theta_te
    )
    assert m0["r2"] < 0.1
    assert m0["angle_rmse_radians"] > 1.0
