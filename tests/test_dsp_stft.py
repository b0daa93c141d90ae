"""Golden tests for the STFT frontend against torch.stft (the kernel inside
the reference's torchaudio.transforms.Spectrogram, genereate_dataset.py:90-91)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import dsp


def _torchaudio_spectrogram(x: np.ndarray, n_fft=400, hop=160, power=None):
    """torchaudio.transforms.Spectrogram(normalized=True, power=None) equivalent
    built from torch.stft, used as the golden oracle (torchaudio itself is not
    installed in this image)."""
    window = torch.hann_window(n_fft, dtype=torch.float64)
    spec = torch.stft(
        torch.from_numpy(x).to(torch.float64),
        n_fft=n_fft,
        hop_length=hop,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    spec = spec / window.pow(2).sum().sqrt()
    if power is not None:
        spec = spec.abs().pow(power)
    return spec.numpy()


def test_stft_matches_torch_complex():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32)
    ours = np.asarray(dsp.stft(jnp.asarray(x), n_fft=400, hop_length=160, normalized=True))
    golden = _torchaudio_spectrogram(x)
    assert ours.shape == golden.shape == (201, 101)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_power_spectrogram_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(80000).astype(np.float32)
    ours = np.asarray(dsp.spectrogram(jnp.asarray(x), power=2.0))
    golden = _torchaudio_spectrogram(x, power=2.0)
    assert ours.shape == (201, 501)  # reference sample geometry pre-truncation
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-6)


def test_stft_batched_matches_loop():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 8000)).astype(np.float32)
    batched = np.asarray(dsp.stft(jnp.asarray(x), n_fft=400, hop_length=160, normalized=True))
    for i in range(3):
        single = np.asarray(
            dsp.stft(jnp.asarray(x[i]), n_fft=400, hop_length=160, normalized=True)
        )
        np.testing.assert_allclose(batched[i], single, rtol=1e-6, atol=1e-7)


def test_istft_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(16000).astype(np.float32)
    spec = dsp.stft(jnp.asarray(x), n_fft=400, hop_length=160, normalized=True)
    y = np.asarray(
        dsp.istft(spec, n_fft=400, hop_length=160, normalized=True, length=16000)
    )
    np.testing.assert_allclose(y, x, rtol=1e-3, atol=1e-4)


def test_griffin_lim_recovers_sinusoid():
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mag = dsp.spectrogram(jnp.asarray(x), power=2.0)
    y = dsp.griffin_lim(mag, jax.random.PRNGKey(0), n_iter=32, length=16000)
    mag_y = np.asarray(dsp.spectrogram(y, power=2.0))
    # Phase-agnostic check: recovered magnitude close to target.
    err = np.linalg.norm(mag_y - np.asarray(mag)) / np.linalg.norm(np.asarray(mag))
    assert err < 0.15


def test_power_to_db_matches_librosa_formula():
    rng = np.random.default_rng(4)
    s = np.abs(rng.standard_normal((20, 30))).astype(np.float32) ** 2
    ours = np.asarray(dsp.power_to_db(jnp.asarray(s)))
    log_spec = 10.0 * np.log10(np.maximum(1e-10, s))
    golden = np.maximum(log_spec, log_spec.max() - 80.0)
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)
