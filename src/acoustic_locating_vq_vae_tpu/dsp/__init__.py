"""DSP layer: STFT frontend, FFT convolution, image-source RIR synthesis,
and spectrogram feature math — all pure jittable JAX/XLA ops."""

from .filters import fft_convolve, highpass_habets
from .rir import beta_from_rt60, beta_from_rt60_traced, generate_rir, generate_rir_batch
from .specs import rir_spec_ratio, source_coordinates, wiener_estimate, znorm
from .stft import (
    griffin_lim,
    hann_window,
    inverse_spectrogram,
    istft,
    power_to_db,
    spectrogram,
    stft,
)

__all__ = [
    "fft_convolve",
    "highpass_habets",
    "beta_from_rt60",
    "beta_from_rt60_traced",
    "generate_rir",
    "generate_rir_batch",
    "rir_spec_ratio",
    "source_coordinates",
    "wiener_estimate",
    "znorm",
    "griffin_lim",
    "hann_window",
    "inverse_spectrogram",
    "istft",
    "power_to_db",
    "spectrogram",
    "stft",
]
