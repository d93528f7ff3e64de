"""ctypes loader for the native SA-IS suffix-array builder.

Compiles sais.cpp with the system C++ compiler on first use (cached as
a .so next to the source); falls back to the numpy prefix-doubling
implementation if no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sysconfig

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sais.cpp")
_SO = os.path.join(_HERE, "_sais.so")
_lib = None
_tried = False


def _build() -> str | None:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True,
                       timeout=120)
        return _SO
    except (OSError, subprocess.SubprocessError) as e:
        log.warning("native sais build failed (%s); using numpy "
                    "fallback", e)
        return None


def get_sais():
    """Return a callable(T int32[n], K) -> SA int32[n], or None."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    so = _SO if (os.path.exists(_SO)
                 and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)) \
        else _build()
    if so is None:
        return None
    try:
        dll = ctypes.CDLL(so)
    except OSError as e:
        log.warning("native sais load failed (%s)", e)
        return None
    fn = dll.hmmufotu_sais
    fn.restype = ctypes.c_int32
    fn.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int32,
    ]

    def sais(T: np.ndarray, K: int) -> np.ndarray:
        T = np.ascontiguousarray(T, dtype=np.int32)
        SA = np.empty(len(T), dtype=np.int32)
        rc = fn(T, SA, len(T), K)
        if rc != 0:
            raise RuntimeError("native sais failed")
        return SA

    _lib = sais
    return _lib
