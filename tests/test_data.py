"""Data-layer tests: on-device synthesis, dataset round-trips (native npz and
reference .pt formats), collate parity, and in-memory sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D

# Small config so CPU tests stay fast: short audio, short RIR.
SMALL = D.DatasetConfig(n_sample=512, audio_samples=16000, num_frames=100)


def test_synthesize_batch_shapes_and_ranges():
    b = D.synthesize_batch(jax.random.PRNGKey(0), 4, SMALL, rir_chunk=2048)
    assert b.speech_spec.shape == (4, 201, 100)
    assert b.rir_spec.shape == (4, 201, 100)
    assert b.echoed_spec.shape == (4, 201, 100)
    assert b.wiener_est.shape == (4, 201)
    assert b.theta.shape == (4,)
    assert np.all(np.asarray(b.theta) >= -np.pi) and np.all(np.asarray(b.theta) <= np.pi)
    # power spectra are nonnegative and non-degenerate
    for s in (b.speech_spec, b.echoed_spec):
        arr = np.asarray(s)
        assert arr.min() >= 0.0 and arr.max() > 0.0
    # rir_spec was max-normalized in the complex domain before squaring
    assert np.asarray(b.rir_spec).max() <= 1.0 + 1e-5


def test_synthesize_fixed_modes():
    b = D.synthesize_batch(
        jax.random.PRNGKey(1), 3, SMALL, fixed_rir=True, fixed_speech=True, rir_chunk=2048
    )
    theta = np.asarray(b.theta)
    np.testing.assert_array_equal(theta, np.full_like(theta, theta[0]))
    sp = np.asarray(b.speech_spec)
    np.testing.assert_array_equal(sp[0], sp[1])


def test_synthesis_is_deterministic_in_key():
    a = D.synthesize_batch(jax.random.PRNGKey(7), 2, SMALL, rir_chunk=2048)
    b = D.synthesize_batch(jax.random.PRNGKey(7), 2, SMALL, rir_chunk=2048)
    np.testing.assert_array_equal(np.asarray(a.echoed_spec), np.asarray(b.echoed_spec))


def test_dataset_roundtrip_npz(tmp_path):
    batch = D.synthesize_batch(jax.random.PRNGKey(2), 3, SMALL, rir_chunk=2048)
    D.save_dataset(str(tmp_path), batch, SMALL)
    ds = D.SpecsDataset(str(tmp_path))
    assert len(ds) == 3
    assert ds.fs == 16000 and ds.NFFT == 400  # reference attr surface
    speech, rir, echoed, fs, theta, wiener = ds[1]
    np.testing.assert_allclose(speech, np.asarray(batch.speech_spec[1]))
    np.testing.assert_allclose(wiener, np.asarray(batch.wiener_est[1]))
    coords = ds.get_source_coordinates(np.asarray(batch.theta))
    assert coords.shape == (3, 3)
    assert (coords <= np.asarray(ds.room_dimensions) + 1e-9).all()


def test_dataset_roundtrip_reference_pt_format(tmp_path):
    """Framework-written .pt files read back through the same tuple contract
    the reference trainers rely on (specsdataset.py:31-36)."""
    batch = D.synthesize_batch(jax.random.PRNGKey(3), 2, SMALL, rir_chunk=2048)
    D.save_dataset_reference_format(str(tmp_path), batch, SMALL)
    import torch

    loaded = torch.load(str(tmp_path / "0.pt"), weights_only=False)
    assert len(loaded) == 6
    ds = D.SpecsDataset(str(tmp_path))
    speech, rir, echoed, fs, theta, wiener = ds[0]
    np.testing.assert_allclose(speech, np.asarray(batch.speech_spec[0]), rtol=1e-6)
    assert fs == 16000


def test_collate_drop_and_truncate():
    f = 201
    long = np.ones((f, 600))
    short = np.ones((f, 100))
    mk = lambda spec: (spec, spec, spec, 16000, np.array([0.5]), np.ones(f))
    out = D.spec_dataset_preprocessing([mk(long), mk(short), mk(long)], num_frames=500)
    assert out[0].shape == (2, f, 500)  # short sample dropped
    empty = D.spec_dataset_preprocessing([mk(short)], num_frames=500)
    assert all(x == [] for x in empty)


def test_in_memory_sampling():
    batch = D.synthesize_batch(jax.random.PRNGKey(4), 8, SMALL, rir_chunk=2048)
    ds = D.InMemoryDataset(batch)
    sub = ds.sample_batch(jax.random.PRNGKey(0), 4)
    assert sub.speech_spec.shape[0] == 4
    # without-replacement sampling: all rows distinct
    rows = np.asarray(sub.theta)
    assert len(np.unique(rows)) == 4
    # different key -> (almost surely) different batch
    sub2 = ds.sample_batch(jax.random.PRNGKey(1), 4)
    assert not np.array_equal(np.asarray(sub.theta), np.asarray(sub2.theta))


def test_echoed_differs_from_clean_and_has_reverb_energy():
    b = D.synthesize_batch(jax.random.PRNGKey(5), 2, SMALL, rir_chunk=2048)
    clean = np.asarray(b.speech_spec)
    echoed = np.asarray(b.echoed_spec)
    assert np.abs(clean - echoed).max() > 1e-6
