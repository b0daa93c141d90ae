"""STFT / iSTFT / Griffin-Lim frontend, as pure jittable JAX ops.

TPU-native replacement for the reference's torchaudio STFT frontend
(reference: scripts/genereate_dataset.py:90-91 builds
``torchaudio.transforms.Spectrogram(n_fft=400, hop_length=160, power=None,
center=True, pad=0, normalized=True)``; notebooks use ``InverseSpectrogram``
and Griffin-Lim for audio resynthesis).

Semantics matched:
  * framing with ``center=True`` reflect-padding (torch.stft default)
  * periodic Hann window (torch.hann_window default)
  * ``normalized=True`` means torchaudio's ``"window"`` mode: divide the
    complex STFT by ``sqrt(sum(window**2))``
  * one-sided spectrum: ``n_fft//2 + 1`` frequency bins, layout (..., F, T)

Everything here is shape-static and jit/vmap friendly: a batch of waveforms
becomes one fused pad + gather + rfft, which XLA maps onto the TPU's FFT
path; no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp

__all__ = [
    "hann_window",
    "stft",
    "istft",
    "spectrogram",
    "inverse_spectrogram",
    "griffin_lim",
    "power_to_db",
]


def hann_window(win_length: int, periodic: bool = True, dtype=jnp.float32) -> jax.Array:
    """Hann window; ``periodic=True`` matches ``torch.hann_window`` default."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n, dtype=dtype) / (n - 1)))
    return w[:win_length] if periodic else w


def _frame(x: jax.Array, n_fft: int, hop_length: int, center: bool, pad_mode: str) -> jax.Array:
    """Slice ``x`` (..., L) into overlapping frames (..., T, n_fft)."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    length = x.shape[-1]
    num_frames = 1 + (length - n_fft) // hop_length
    idx = (
        jnp.arange(num_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )  # (T, n_fft), static
    return x[..., idx]


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "center", "normalized", "pad_mode")
)
def stft(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    window: Optional[jax.Array] = None,
    center: bool = True,
    normalized: Union[bool, str] = False,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex one-sided STFT of ``x`` (..., L) -> (..., F=n_fft//2+1, T).

    Matches ``torch.stft(..., return_complex=True, onesided=True)`` followed by
    torchaudio's normalization convention (``normalized=True`` == "window").
    """
    if window is None:
        window = hann_window(n_fft, dtype=x.dtype)
    frames = _frame(x, n_fft, hop_length, center, pad_mode)  # (..., T, n_fft)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)  # (..., T, F)
    if normalized is True or normalized == "window":
        spec = spec / jnp.sqrt(jnp.sum(window**2))
    elif normalized == "frame_length":
        spec = spec / jnp.sqrt(n_fft)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, T)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "center", "normalized", "length")
)
def istft(
    spec: jax.Array,
    n_fft: int,
    hop_length: int,
    window: Optional[jax.Array] = None,
    center: bool = True,
    normalized: Union[bool, str] = False,
    length: Optional[int] = None,
) -> jax.Array:
    """Inverse STFT via windowed overlap-add with COLA normalization.

    ``spec`` is (..., F, T) complex as produced by :func:`stft`.
    """
    if window is None:
        window = hann_window(n_fft)
    spec = jnp.swapaxes(spec, -1, -2)  # (..., T, F)
    if normalized is True or normalized == "window":
        spec = spec * jnp.sqrt(jnp.sum(window**2))
    elif normalized == "frame_length":
        spec = spec * jnp.sqrt(n_fft)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (..., T, n_fft)
    frames = frames * window

    num_frames = frames.shape[-2]
    out_len = (num_frames - 1) * hop_length + n_fft
    pos = jnp.arange(num_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, num_frames, n_fft))

    def _ola(fr):
        return jnp.zeros(out_len, frames.dtype).at[pos].add(fr)

    y = jax.vmap(_ola)(flat)
    wsq = jnp.zeros(out_len, frames.dtype).at[pos].add(jnp.broadcast_to(window**2, pos.shape))
    y = y / jnp.maximum(wsq, 1e-11)
    if center:
        y = y[..., n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        y = y[..., :length]
        if y.shape[-1] < length:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
    return y.reshape(batch_shape + y.shape[-1:])


def spectrogram(
    x: jax.Array,
    n_fft: int = 400,
    hop_length: int = 160,
    power: Optional[float] = None,
    normalized: Union[bool, str] = True,
    center: bool = True,
) -> jax.Array:
    """torchaudio.transforms.Spectrogram equivalent (genereate_dataset.py:90-91).

    ``power=None`` returns the complex STFT; ``power=2.0`` the power spectrum.
    """
    spec = stft(x, n_fft=n_fft, hop_length=hop_length, center=center, normalized=normalized)
    if power is None:
        return spec
    return jnp.abs(spec) ** power


def inverse_spectrogram(
    spec: jax.Array,
    n_fft: int = 400,
    hop_length: int = 160,
    normalized: Union[bool, str] = True,
    center: bool = True,
    length: Optional[int] = None,
) -> jax.Array:
    """torchaudio.transforms.InverseSpectrogram equivalent (complex input)."""
    return istft(
        spec, n_fft=n_fft, hop_length=hop_length, center=center, normalized=normalized, length=length
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "n_iter", "power", "normalized", "length"),
)
def griffin_lim(
    magnitude: jax.Array,
    key: jax.Array,
    n_fft: int = 400,
    hop_length: int = 160,
    n_iter: int = 32,
    power: float = 2.0,
    momentum: float = 0.99,
    normalized: Union[bool, str] = True,
    length: Optional[int] = None,
) -> jax.Array:
    """Griffin-Lim phase recovery (reference resynthesis path, sout_test.py:25-30).

    ``magnitude`` is a (possibly power-) spectrogram (..., F, T). The iteration
    runs as a ``lax.fori_loop`` so the whole reconstruction compiles to one
    XLA program.
    """
    mag = magnitude ** (1.0 / power)
    angle = jax.random.uniform(key, mag.shape, minval=0.0, maxval=2.0 * jnp.pi)
    spec = mag * jnp.exp(1j * angle).astype(jnp.complex64)

    def project(s):
        y = istft(s, n_fft=n_fft, hop_length=hop_length, normalized=normalized, length=length)
        return stft(y, n_fft=n_fft, hop_length=hop_length, normalized=normalized)

    def body(_, carry):
        spec, prev = carry
        rebuilt = project(spec)
        update = rebuilt - (momentum / (1.0 + momentum)) * prev
        phase = update / jnp.maximum(jnp.abs(update), 1e-16)
        # Keep the time-frame count consistent with the input magnitude.
        phase = phase[..., : mag.shape[-1]]
        return mag * phase, rebuilt

    spec, _ = jax.lax.fori_loop(0, n_iter, body, (spec, jnp.zeros_like(spec)))
    return istft(spec, n_fft=n_fft, hop_length=hop_length, normalized=normalized, length=length)


def power_to_db(s: jax.Array, ref: float = 1.0, amin: float = 1e-10, top_db: float = 80.0) -> jax.Array:
    """librosa.power_to_db equivalent (used by visualization, visualization.py:15)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, s))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec
