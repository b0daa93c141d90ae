"""ctypes binding + on-demand build of the native ISM library (ism.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Union

import numpy as np

__all__ = ["generate_rir_native", "is_available", "num_threads", "build"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libism.so")
_SRC = os.path.join(_HERE, "ism.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def build(force: bool = False) -> str:
    """Compile ism.cpp -> _build/libism.so with g++ (OpenMP when available)."""
    if os.path.exists(_LIB_PATH) and not force and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # retry without OpenMP / march flags (portable fallback)
        cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            raise RuntimeError(f"native ISM unavailable: {_build_error}")
        try:
            path = build()
            lib = ctypes.CDLL(path)
        except Exception as e:  # toolchain missing / build failed
            _build_error = str(e)
            raise RuntimeError(f"native ISM unavailable: {e}") from e
        lib.ism_generate.restype = ctypes.c_int
        lib.ism_generate.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ism_num_threads.restype = ctypes.c_int
        lib.ism_num_threads.argtypes = []
        _lib = lib
        return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def num_threads() -> int:
    return int(_load().ism_num_threads())


def generate_rir_native(
    sources: np.ndarray,
    receiver: Sequence[float],
    room: Sequence[float],
    nsample: int,
    fs: float,
    rt60: Optional[float] = None,
    beta: Union[None, float, Sequence[float]] = None,
    c: float = 340.0,
    order: int = -1,
    hp: bool = True,
) -> np.ndarray:
    """Batched host-side RIR synthesis. ``sources``: (B, 3) or (3,) meters.
    Returns (B, nsample) float64. Same argument semantics as
    dsp.generate_rir (and rir.generate of the reference's pip package)."""
    from ..dsp.rir import beta_from_rt60

    if (rt60 is None) == (beta is None):
        raise ValueError("specify exactly one of rt60 / beta")
    if beta is None:
        beta6 = np.full(6, beta_from_rt60(room, rt60, c))
    elif np.ndim(beta) == 0:
        beta6 = np.full(6, float(beta))
    else:
        beta6 = np.asarray(beta, np.float64)
        if beta6.shape != (6,):
            raise ValueError("beta must be scalar or length-6")

    src = np.ascontiguousarray(np.atleast_2d(np.asarray(sources, np.float64)))
    if src.shape[1] != 3:
        raise ValueError(f"sources must be (B, 3), got {src.shape}")
    recv = np.ascontiguousarray(np.asarray(receiver, np.float64))
    rm = np.ascontiguousarray(np.asarray(room, np.float64))
    out = np.zeros((src.shape[0], nsample), np.float64)

    lib = _load()
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.ism_generate(
        dptr(src), src.shape[0], dptr(recv), dptr(rm),
        dptr(np.ascontiguousarray(beta6)), float(c), float(fs),
        int(nsample), int(order), int(bool(hp)), dptr(out),
    )
    if rc != 0:
        raise RuntimeError(f"ism_generate failed with code {rc}")
    return out[0] if np.ndim(sources) == 1 else out
