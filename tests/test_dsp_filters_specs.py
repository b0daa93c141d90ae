"""Tests for FFT convolution (vs scipy), the Habets high-pass scan (vs a
direct loop), and the spectrogram feature math (vs the reference formulas
re-executed in torch)."""

import numpy as np
import scipy.signal as ss
import torch

import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import dsp


def test_fft_convolve_modes_match_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype(np.float32)
    h = rng.standard_normal(257).astype(np.float32)
    for mode in ("full", "same", "valid"):
        ours = np.asarray(dsp.fft_convolve(jnp.asarray(x), jnp.asarray(h), mode=mode))
        golden = ss.convolve(x, h, mode=mode)
        np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)


def test_fft_convolve_batched():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 500)).astype(np.float32)
    h = rng.standard_normal(100).astype(np.float32)
    ours = np.asarray(dsp.fft_convolve(jnp.asarray(x), jnp.asarray(h), mode="same"))
    for i in range(4):
        np.testing.assert_allclose(
            ours[i], ss.convolve(x[i], h, mode="same"), rtol=1e-3, atol=1e-4
        )


def test_highpass_matches_sequential_loop():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(2048).astype(np.float32)
    fs = 16000
    W = 2 * np.pi * 100.0 / fs
    R1 = np.exp(-W)
    B1, B2, A1 = 2 * R1 * np.cos(W), -R1 * R1, -(1 + R1)
    Y = np.zeros(3)
    golden = np.zeros_like(x)
    for i in range(len(x)):
        Y[2], Y[1] = Y[1], Y[0]
        Y[0] = B1 * Y[1] + B2 * Y[2] + x[i]
        golden[i] = Y[0] + A1 * Y[1] + R1 * Y[2]
    ours = np.asarray(dsp.highpass_habets(jnp.asarray(x), fs))
    # f32 FFT convolution precision: ~2e-4 relative to signal scale
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=2e-3 * np.abs(golden).max())


def test_wiener_and_ratio_match_reference_formulas():
    """Re-execute the exact torch expressions from genereate_dataset.py:41-46."""
    rng = np.random.default_rng(3)
    f, t = 31, 17
    speech = (rng.standard_normal((f, t)) + 1j * rng.standard_normal((f, t))).astype(
        np.complex64
    )
    echoed = (rng.standard_normal((f, t)) + 1j * rng.standard_normal((f, t))).astype(
        np.complex64
    )
    ts, te = torch.from_numpy(speech), torch.from_numpy(echoed)
    g_ratio = np.divide(speech, echoed + 1e-8)
    g_ratio = np.divide(g_ratio, np.abs(g_ratio).max())
    g_wiener = (
        torch.sum(te * np.conjugate(ts), dim=1)
        / (torch.sum(ts * np.conjugate(ts), dim=1) + 1e-8)
    ).abs().pow(2).numpy()

    ours_ratio = np.asarray(dsp.rir_spec_ratio(jnp.asarray(speech), jnp.asarray(echoed)))
    ours_wiener = np.asarray(dsp.wiener_estimate(jnp.asarray(speech), jnp.asarray(echoed)))
    np.testing.assert_allclose(ours_ratio, g_ratio, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_wiener, g_wiener, rtol=1e-3, atol=1e-5)


def test_znorm_matches_torch_unbiased_std():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((8, 201, 500)).astype(np.float32)
    tx = torch.from_numpy(x)
    golden = (
        (tx - tx.mean(dim=1, keepdim=True)) / (tx.std(dim=1, keepdim=True) + 1e-8)
    ).numpy()
    ours = np.asarray(dsp.znorm(jnp.asarray(x), axis=1))
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)


def test_source_coordinates_match_reference():
    """specsdataset.py:38-45 get_source_coordinates."""
    theta = np.array(0.7)
    receiver = np.array([2.5, 1.5, 1.5])
    room = np.array([4.0, 5.0, 3.0])
    golden = np.minimum(
        receiver + np.array([np.cos(theta), np.sin(theta), 1.0]), room
    )
    ours = np.asarray(
        dsp.source_coordinates(jnp.asarray(theta), jnp.asarray(receiver), jnp.asarray(room))
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-6)
