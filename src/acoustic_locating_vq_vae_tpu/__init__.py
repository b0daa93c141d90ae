"""acoustic_locating_vq_vae_tpu — TPU-native acoustic-localization VQ-VAE framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference ``guy3540/Acoustic_Locating_VQ-VAE``: single-microphone
acoustic source localization via two vector-quantized VAEs (speech content +
room-impulse-response content) over synthetic speech-times-RIR spectrograms,
composed into an echoed-speech reconstruction model, with an MLP regressor
recovering the source angle from RIR codebook encodings.

Subpackages
-----------
dsp       STFT/iSTFT/Griffin-Lim, FFT convolution, image-source RIR synthesis
ops       NN building blocks: conv stacks, residuals, jitter, vector quantizer
models    ConvolutionalVQVAE, EchoedSpeechReconModel, LocationModule
data      on-device synthetic data pipeline + reference-compatible datasets
train     the single mesh-sharded training loop and the five stage task specs
parallel  device mesh / sharding helpers
eval      location comparison, latent analysis, audio resynthesis
utils     checkpointing (Orbax), config, profiling, visualization
"""

__version__ = "0.1.0"

from . import data, dsp, eval, models, ops, parallel, train, utils

__all__ = [
    "data",
    "dsp",
    "eval",
    "models",
    "ops",
    "parallel",
    "train",
    "utils",
    "__version__",
]
