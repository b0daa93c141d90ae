"""Moving-source tracking (eval.tracking + scripts/track.py): trajectory
generators, the circular alpha-beta smoother, and the end-to-end windowed
pipeline shape (synthesize at given geometry -> batched localization).
Framework extra — no reference counterpart (its scripts never run the
localizer as an estimator over time)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.eval import (
    alpha_beta_filter,
    arc_trajectory,
    track_metrics,
    walk_trajectory,
    wrap_angle,
)


def test_arc_trajectory_endpoints_and_spiral():
    theta, r = arc_trajectory(11, -2.0, 2.0, radius_start=0.8, radius_end=1.2)
    assert theta.shape == r.shape == (11,)
    assert theta[0] == pytest.approx(-2.0) and theta[-1] == pytest.approx(2.0)
    assert r[0] == pytest.approx(0.8) and r[-1] == pytest.approx(1.2)
    np.testing.assert_allclose(np.diff(theta), np.diff(theta)[0], rtol=1e-5)
    # radius_end defaults to constant radius
    _, r2 = arc_trajectory(5, 0.0, 1.0, radius_start=1.0)
    np.testing.assert_array_equal(r2, np.ones(5, np.float32))


def test_walk_trajectory_bounds_and_determinism():
    t1, r1 = walk_trajectory(64, seed=3, theta_step=0.2, radius=1.0,
                             radius_step=0.1, radius_bounds=(0.6, 1.4))
    t2, r2 = walk_trajectory(64, seed=3, theta_step=0.2, radius=1.0,
                             radius_step=0.1, radius_bounds=(0.6, 1.4))
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(r1, r2)
    assert r1.min() >= 0.6 and r1.max() <= 1.4
    assert np.std(np.diff(t1)) > 0  # actually moves


def test_alpha_beta_reduces_noise_on_constant_rate_track():
    """On a constant-rate arc with additive observation noise the
    constant-velocity filter must beat the raw observations (this is the
    regime it is exact for); an EMA would trade noise for lag."""
    rng = np.random.default_rng(0)
    true = np.linspace(-2.5, 2.5, 200)
    obs = wrap_angle(true + rng.normal(0.0, 0.1, true.shape))
    sm = alpha_beta_filter(obs, alpha=0.4, beta=0.05)
    raw_rmse = np.sqrt(np.mean(np.angle(np.exp(1j * (obs - true))) ** 2))
    sm_rmse = np.sqrt(np.mean(np.angle(np.exp(1j * (sm - true))) ** 2))
    assert sm_rmse < 0.6 * raw_rmse


def test_alpha_beta_tracks_through_pi_seam():
    """A track crossing the ±pi discontinuity must not glitch by ~2pi: the
    filter's innovation is circular."""
    true = np.linspace(np.pi - 0.5, np.pi + 0.5, 40)  # crosses the seam
    obs = wrap_angle(true)  # wrapped observations jump -pi<->pi mid-track
    sm = alpha_beta_filter(obs, alpha=0.5, beta=0.1)
    err = np.angle(np.exp(1j * (sm - true)))
    assert np.max(np.abs(err)) < 0.05


def test_alpha_beta_validates():
    with pytest.raises(ValueError):
        alpha_beta_filter(np.zeros((2, 2)))
    with pytest.raises(ValueError):
        alpha_beta_filter(np.zeros(4), alpha=0.0)


def test_track_metrics_keys_and_circular_error():
    true = np.array([3.1, -3.1])  # 2pi-close pair
    pred = np.array([-3.1, 3.1])
    m = track_metrics(true, pred, theta_smoothed=pred,
                      radius_true=np.ones(2), radius_pred=np.full(2, 1.1))
    assert m["rmse_radians"] == pytest.approx(2 * np.pi - 6.2, abs=1e-6)
    assert m["rmse_smoothed_radians"] == m["rmse_radians"]
    assert m["rmse_radius_m"] == pytest.approx(0.1, abs=1e-6)
    assert set(m) >= {"median_abs_radians", "max_abs_radians"}


def test_windowed_trajectory_localization_end_to_end():
    """The track.py core on a tiny config: synthesize a 6-window arc at
    exact given geometry, run a (fresh, untrained) joint localizer over the
    whole track in one batched dispatch, smooth — everything shapes up and
    the synthesized labels are exactly the trajectory."""
    from acoustic_locating_vq_vae_tpu.train import JointLocationTask

    small = D.DatasetConfig(
        n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32
    )
    theta, radius = arc_trajectory(6, -2.0, 2.0, 0.8, 1.2)
    batch = D.synthesize_batch(
        jax.random.PRNGKey(0), 6, small, rir_chunk=2048,
        theta=jnp.asarray(theta), radius=jnp.asarray(radius),
    )
    np.testing.assert_allclose(np.asarray(batch.theta), theta, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(batch.radius), radius, rtol=1e-6)

    task = JointLocationTask(
        config=small, width_scale=1 / 32, batch_size=6, predict_radius=True
    )
    model = task.build_model()
    (x,) = task.model_inputs(batch)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    pred = jax.jit(lambda p, b: model.apply({"params": p}, b)[0])(params, x)
    theta_pred = np.asarray(task.decode_angle(pred)).reshape(-1)
    r_pred = np.asarray(task.decode_radius(pred)).reshape(-1)
    sm = alpha_beta_filter(theta_pred)
    m = track_metrics(theta, theta_pred, sm, radius_true=radius, radius_pred=r_pred)
    assert theta_pred.shape == sm.shape == (6,)
    assert np.isfinite(list(m.values())).all()
