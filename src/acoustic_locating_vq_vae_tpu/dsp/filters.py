"""Convolution and recursive filters as jittable XLA ops.

Replaces the reference's CPU ``scipy.signal.convolve(waveform, h_RIR, 'same')``
(scripts/genereate_dataset.py:38) with a batched FFT convolution, and the
Habets rir-generator's sequential C++ high-pass IIR with a parallel
(associative-scan) linear recurrence so it runs in O(log n) depth on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fft_convolve", "highpass_habets"]


@functools.partial(jax.jit, static_argnames=("mode",))
def fft_convolve(x: jax.Array, h: jax.Array, mode: str = "same") -> jax.Array:
    """Linear convolution of ``x`` (..., N) with ``h`` (..., M) along the last axis.

    Matches ``scipy.signal.convolve`` output selection:
      * ``full`` -> length N+M-1
      * ``same`` -> length N, centered (this is what the reference uses to
        echo speech through the RIR, genereate_dataset.py:38)
      * ``valid``-> length max(N,M) - min(N,M) + 1
    Broadcasting over leading batch dims is supported.
    """
    n = x.shape[-1]
    m = h.shape[-1]
    full = n + m - 1
    # Power-of-two-ish FFT size keeps the XLA FFT fast.
    fft_len = 1 << (full - 1).bit_length()
    xf = jnp.fft.rfft(x, fft_len)
    hf = jnp.fft.rfft(h, fft_len)
    y = jnp.fft.irfft(xf * hf, fft_len)[..., :full]
    if mode == "full":
        return y
    if mode == "same":
        start = (m - 1) // 2
        return y[..., start : start + n]
    if mode == "valid":
        out_len = max(n, m) - min(n, m) + 1
        return y[..., min(n, m) - 1 : min(n, m) - 1 + out_len]
    raise ValueError(f"unknown mode {mode!r}")


@functools.partial(jax.jit, static_argnames=("fs",))
def highpass_habets(x: jax.Array, fs: int) -> jax.Array:
    """The rir-generator post high-pass filter (100 Hz), exactly as in the
    Habets image-source C++ core that the reference's pip dependency wraps
    (pyproject.toml:44 -> rir.generate, enabled by default).

    The C++ loop is the 2nd-order recursion
        y[n]   = x[n] + B1*y[n-1] + B2*y[n-2]
        out[n] = y[n] + A1*y[n-1] + R1*y[n-2]
    — a causal LTI filter. Rather than serializing the recursion (or paying
    the f32 error of a tree-composed affine scan, which the differentiating
    MA stage amplifies), we use the closed-form impulse response of the AR
    part — poles at R1*e^{+-iW}, so h_ar[n] = R1^n sin((n+1)W)/sin(W) — apply
    the MA taps analytically, and FFT-convolve. Exact, O(n log n), and fully
    parallel on TPU. The impulse response decays like R1^n (R1 ~ 0.96 at
    16 kHz), far below f32 epsilon within the signal length.

    ``x``: (..., N) impulse response(s).
    """
    w = 2.0 * jnp.pi * 100.0 / fs
    r1 = jnp.exp(-w)
    a1 = -(1.0 + r1)

    n = x.shape[-1]
    m = jnp.arange(n, dtype=jnp.float32)
    # AR impulse response in f64-free closed form: compute log-domain for the
    # geometric decay to avoid underflow warnings, then the sinusoid factor.
    h_ar = jnp.exp(m * jnp.log(r1)) * jnp.sin((m + 1.0) * w) / jnp.sin(w)
    h_full = (
        h_ar
        + a1 * jnp.concatenate([jnp.zeros(1), h_ar[:-1]])
        + r1 * jnp.concatenate([jnp.zeros(2), h_ar[:-2]])
    )
    out = fft_convolve(x.astype(jnp.float32), h_full, mode="full")[..., :n]
    return out.astype(x.dtype)
