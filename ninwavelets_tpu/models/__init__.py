from ..ops.bank import WaveletMode
from .base import WaveletBase
from .zoo import Haar, MexicanHat, Morlet, Morse, MorseMNE, Shannon

__all__ = ["WaveletBase", "WaveletMode", "Morse", "MorseMNE", "Morlet",
           "Haar", "MexicanHat", "Shannon"]
