"""Model layer (L3 of the reference layer map): the two VQ-VAEs, the echoed
speech composite, and the location regressor."""

from .conv_vqvae import ConvolutionalEncoder, ConvolutionalVQVAE, DeconvolutionalDecoder
from .echoed_speech import EchoedSpeechReconModel
from .location import JointLocationModel, LocationModule

__all__ = [
    "ConvolutionalEncoder",
    "ConvolutionalVQVAE",
    "DeconvolutionalDecoder",
    "EchoedSpeechReconModel",
    "LocationModule",
    "JointLocationModel",
]
