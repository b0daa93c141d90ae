"""Audio resynthesis sanity checks (C24: sout_test.py, sound_from_datapoint
.ipynb) — spectrogram -> waveform via Griffin-Lim or inverse STFT, plus a
reconstruction-quality metric, all as jittable ops plus a wav writer."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.config import DatasetConfig
from ..dsp import griffin_lim, inverse_spectrogram, spectrogram

__all__ = ["audio_from_power_spec", "audio_from_complex_spec", "spectral_snr_db", "write_wav"]


def audio_from_power_spec(
    power_spec: jnp.ndarray,
    key: jax.Array,
    config: DatasetConfig = DatasetConfig(),
    n_iter: int = 32,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Griffin-Lim phase recovery from a power spectrogram (sout_test.py:25-30)."""
    return griffin_lim(
        power_spec, key, n_fft=config.NFFT, hop_length=config.HOP_LENGTH,
        n_iter=n_iter, power=2.0, normalized=True, length=length,
    )


def audio_from_complex_spec(
    spec: jnp.ndarray, config: DatasetConfig = DatasetConfig(), length: Optional[int] = None
) -> jnp.ndarray:
    """Exact inversion of a complex STFT (sound_from_datapoint.ipynb cell 6)."""
    return inverse_spectrogram(
        spec, n_fft=config.NFFT, hop_length=config.HOP_LENGTH, normalized=True, length=length
    )


def spectral_snr_db(reference_power: jnp.ndarray, estimate_power: jnp.ndarray) -> jnp.ndarray:
    """SNR between two power spectrograms in dB (resynthesis quality check)."""
    num = jnp.sum(reference_power**2)
    den = jnp.sum((reference_power - estimate_power) ** 2) + 1e-12
    return 10.0 * jnp.log10(num / den)


def write_wav(path: str, audio: np.ndarray, fs: int = 16000) -> None:
    """Write 16-bit PCM (handle_rir_dataset_example.ipynb cell 5 equivalent)."""
    from scipy.io import wavfile

    audio = np.asarray(audio)
    peak = np.abs(audio).max()
    if peak > 0:
        audio = audio / peak * 0.95
    wavfile.write(path, fs, (audio * 32767).astype(np.int16))
