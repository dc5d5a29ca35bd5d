"""ctypes binding for the C++ reference LDPC BP decoder (csrc/ldpc_ref.cc).

The shared library is compiled on first use with g++ -O3 into the package's
build/ directory and cached; environments without a toolchain degrade
gracefully (native_available() -> False and tests skip).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "csrc", "ldpc_ref.cc")
        build = os.path.join(here, "build")
        os.makedirs(build, exist_ok=True)
        so = os.path.join(build, "libldpc_ref.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", so, src],
                    check=True, capture_output=True)
            except (OSError, subprocess.CalledProcessError):
                return None
        lib = ctypes.CDLL(so)
        lib.ldpc_bp_decode.restype = ctypes.c_int
        lib.ldpc_bp_decode.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def ldpc_bp_decode_ref(code, llr: np.ndarray, max_iter: int = 100,
                       min_sum: bool = False) -> np.ndarray:
    """Decode one or more codewords with the C++ oracle.

    code: ldpc.code.LdpcCode; llr (n,) or (B, n) float; returns int8 bits of
    the same leading shape."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native ldpc_ref unavailable (no g++?)")
    llr = np.atleast_2d(np.asarray(llr, dtype=np.float64))
    B, n = llr.shape
    m, dc_max = code.ck_cols.shape
    ck = np.ascontiguousarray(code.ck_cols, dtype=np.int32)
    out = np.zeros((B, n), dtype=np.int8)
    for b in range(B):
        lib.ldpc_bp_decode(m, n, dc_max, ck,
                           np.ascontiguousarray(llr[b]), max_iter,
                           1 if min_sum else 0, out[b])
    return out[0] if out.shape[0] == 1 and llr.ndim == 1 else out
