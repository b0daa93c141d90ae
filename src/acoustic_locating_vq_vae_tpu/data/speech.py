"""Speech sources for the synthetic pipeline.

The reference draws utterances from LibriSpeech train-clean-100 via
torchaudio (genereate_dataset.py:93). This environment has no network and no
torchaudio, so the framework ships three sources:

  * :func:`synthetic_speech_batch` — an on-device, jittable source-filter
    speech surrogate (pitch-contoured harmonic voicing + formant-shaped
    noise bursts). Spectrally structured enough to train the VQ-VAEs and to
    benchmark with; NOT real speech — swap in a real corpus for research use.
  * :func:`load_wav_dir` — reads 16 kHz wavs from a directory (scipy); THE
    corpus interface the CLI exposes (--wav-dir).
  * :func:`load_librispeech` — walks a LibriSpeech checkout's on-disk
    layout without torchaudio (wav via scipy; flac via optional soundfile)
    and returns the same pool contract as load_wav_dir.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["synthetic_speech_batch", "load_wav_dir", "load_librispeech"]


@functools.partial(jax.jit, static_argnames=("batch", "num_samples", "fs"))
def synthetic_speech_batch(
    key: jax.Array, batch: int, num_samples: int = 80000, fs: int = 16000
) -> jax.Array:
    """Generate (batch, num_samples) speech-like waveforms on device.

    Source-filter construction, fully vectorized:
      * voiced excitation: 12 harmonics of a slowly wandering f0 in
        [90, 240] Hz with 1/h rolloff;
      * unvoiced excitation: white noise;
      * voicing mix and overall energy modulated by smooth random envelopes
        (syllable-rate, ~4 Hz);
      * three random formant resonances applied in the frequency domain.
    """
    k_f0, k_ph, k_noise, k_env, k_voic, k_formant = jax.random.split(key, 6)

    t = jnp.arange(num_samples) / fs  # (N,)

    # f0 contour: base pitch per sample + slow sinusoidal wander.
    f0_base = jax.random.uniform(k_f0, (batch, 1), minval=90.0, maxval=240.0)
    k1, k2 = jax.random.split(k_ph)
    wander_rate = jax.random.uniform(k1, (batch, 1), minval=0.5, maxval=3.0)
    wander_phase = jax.random.uniform(k2, (batch, 1), maxval=2 * jnp.pi)
    f0 = f0_base * (1.0 + 0.08 * jnp.sin(2 * jnp.pi * wander_rate * t + wander_phase))
    phase = 2 * jnp.pi * jnp.cumsum(f0, axis=1) / fs  # (B, N)

    harmonics = jnp.arange(1, 13)[:, None, None]  # (H, 1, 1)
    voiced = jnp.sum(jnp.sin(harmonics * phase[None]) / harmonics, axis=0)  # (B, N)

    noise = jax.random.normal(k_noise, (batch, num_samples)) * 0.5

    # Smooth syllable-rate envelopes from low-pass-interpolated control points.
    n_ctrl = max(2, int(num_samples / fs * 8))  # 8 control points per second

    def smooth_env(k, lo, hi):
        ctrl = jax.random.uniform(k, (batch, n_ctrl), minval=lo, maxval=hi)
        xp = jnp.linspace(0.0, num_samples - 1, n_ctrl)
        return jax.vmap(lambda c: jnp.interp(jnp.arange(num_samples, dtype=jnp.float32), xp, c))(
            ctrl
        )

    energy = smooth_env(k_env, 0.05, 1.0) ** 2
    voicing = smooth_env(k_voic, 0.0, 1.0)

    excitation = energy * (voicing * voiced + (1.0 - voicing) * noise)

    # Formant filter: product of three random resonances, applied via rfft.
    freqs = jnp.fft.rfftfreq(num_samples, 1.0 / fs)  # (N/2+1,)
    kf1, kf2 = jax.random.split(k_formant)
    centers = jax.random.uniform(kf1, (batch, 3, 1), minval=300.0, maxval=3400.0)
    bws = jax.random.uniform(kf2, (batch, 3, 1), minval=80.0, maxval=300.0)
    resp = jnp.sum(1.0 / (1.0 + ((freqs[None, None, :] - centers) / bws) ** 2), axis=1)
    tilt = 1.0 / (1.0 + (freqs / 2000.0) ** 2)  # gentle -12 dB/oct above 2 kHz
    spec = jnp.fft.rfft(excitation, axis=1) * (0.2 + resp) * tilt
    wave = jnp.fft.irfft(spec, n=num_samples, axis=1)

    # Normalize to unit peak like typical corpus audio.
    peak = jnp.max(jnp.abs(wave), axis=1, keepdims=True)
    return (wave / (peak + 1e-8)).astype(jnp.float32)


def load_wav_dir(path: str, num_samples: int, limit: Optional[int] = None) -> np.ndarray:
    """Load (n, num_samples) float32 from all wavs in ``path`` (crop/pad)."""
    from scipy.io import wavfile

    files = sorted(f for f in os.listdir(path) if f.lower().endswith(".wav"))
    if limit:
        files = files[:limit]
    out = []
    for f in files:
        _, data = wavfile.read(os.path.join(path, f))
        if data.dtype.kind == "i":
            data = data.astype(np.float32) / np.iinfo(data.dtype).max
        data = np.asarray(data, np.float32)
        if data.ndim > 1:
            data = data.mean(axis=1)
        if len(data) < num_samples:
            data = np.pad(data, (0, num_samples - len(data)))
        out.append(data[:num_samples])
    if not out:
        raise FileNotFoundError(f"no wav files in {path}")
    return np.stack(out)


def load_librispeech(
    root: str,
    url: str = "train-clean-100",
    num_samples: int = 80000,
    limit: Optional[int] = None,
) -> np.ndarray:
    """Load a (n, num_samples) float32 speech pool from a LibriSpeech
    checkout — the reference's corpus source (genereate_dataset.py:93) —
    WITHOUT torchaudio: walks the standard on-disk layout

        <root>/LibriSpeech/<url>/<speaker>/<chapter>/<spk>-<chp>-<utt>.flac

    (``<root>/<url>/...`` also accepted), decoding ``.flac`` via soundfile
    when importable and ``.wav`` via scipy always (``flac --decode`` or any
    converter produces the wav twin of the layout). Utterances are
    mono-mixed, zero-padded/cropped to ``num_samples``, ordered by path, and
    returned in the same pool contract as :func:`load_wav_dir` — pass the
    result as ``speech_pool`` / the per-stage ``--wav-dir`` machinery's
    input to ``make_dataset``."""
    candidates = [os.path.join(root, "LibriSpeech", url), os.path.join(root, url)]
    base = next((c for c in candidates if os.path.isdir(c)), None)
    if base is None:
        raise FileNotFoundError(
            f"no LibriSpeech split {url!r} under {root!r} (tried {candidates})"
        )

    files = []
    for dirpath, _dirnames, filenames in sorted(os.walk(base)):
        for f in sorted(filenames):
            if f.lower().endswith((".flac", ".wav")):
                files.append(os.path.join(dirpath, f))
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no .flac/.wav utterances under {base}")

    try:
        import soundfile  # optional: flac decoding
    except ImportError:
        soundfile = None

    out = []
    for path in files:
        if path.lower().endswith(".wav"):
            from scipy.io import wavfile

            _, data = wavfile.read(path)
            if data.dtype.kind == "i":
                data = data.astype(np.float32) / np.iinfo(data.dtype).max
        else:
            if soundfile is not None:
                data, _ = soundfile.read(path, dtype="float32")
            else:
                # Built-in pure-Python FLAC decoder (round 5): hermetic
                # images (like this one) have no soundfile/torchaudio/flac
                # at all, which previously made the reference's LibriSpeech
                # corpus role (genereate_dataset.py:93) undecodable here.
                # Slower than soundfile (~1-3 s per 10 s utterance) but
                # dependency-free and CRC-verified.
                from .flac import read_flac

                data, _ = read_flac(path)
        data = np.asarray(data, np.float32)
        if data.ndim > 1:
            data = data.mean(axis=1)
        if len(data) < num_samples:
            data = np.pad(data, (0, num_samples - len(data)))
        out.append(data[:num_samples])
    return np.stack(out)
