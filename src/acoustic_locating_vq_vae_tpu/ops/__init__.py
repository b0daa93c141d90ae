"""NN building blocks (L2 of the reference layer map, SURVEY.md §1):
conv stacks, residual blocks, latent jitter, and the vector quantizer."""

from .conv import Conv1d, ConvTranspose1d, Dense
from .initializers import kaiming_uniform_relu, torch_default_bias, torch_default_weight
from .jitter import Jitter, jitter
from .residual import Residual, ResidualStack
from .vq import VectorQuantizer, VQOutput, nearest_codebook

__all__ = [
    "Conv1d",
    "ConvTranspose1d",
    "Dense",
    "kaiming_uniform_relu",
    "torch_default_bias",
    "torch_default_weight",
    "Jitter",
    "jitter",
    "Residual",
    "ResidualStack",
    "VectorQuantizer",
    "VQOutput",
    "nearest_codebook",
]
