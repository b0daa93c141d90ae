"""Native (C++) runtime components.

``ism`` — host-side image-source RIR synthesis, the C++ counterpart of the
XLA op in dsp/rir.py (see ism.cpp). Compiled on first use with g++ (cached
in ``_build/``), bound via ctypes; falls back with a clear error when no
toolchain is present."""

from .ism import generate_rir_native, is_available, num_threads

__all__ = ["generate_rir_native", "is_available", "num_threads"]
