"""ctypes loader for the native C++ helpers (graceful Python fallback).

The reference implements its data path in C (parse_HITRAN_file.c); this
build keeps a native fast path for the same hot spot — the fixed-width
record scan over the ~700 MB production HITRAN databases — compiled from
``native/hitran_parser.cpp`` (``make -C native hitran``).  All public
entry points fall back to the pure-Python implementations when the shared
library isn't built, so nothing here is load-bearing for correctness.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_NAME = "libgrtcode_hitran.so"
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")

_lib = None
_tried = False


def _load(build_if_missing: bool = False):
    global _lib, _tried
    if _lib is not None or (_tried and not build_if_missing):
        return _lib
    _tried = True
    path = os.path.join(_NATIVE_DIR, _LIB_NAME)
    if not os.path.exists(path) and build_if_missing:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "hitran"],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.grt_parse_par.restype = ctypes.c_int64
    lib.grt_parse_par.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int64] + [ctypes.c_void_p] * 8
    _lib = lib
    return _lib


def available(build_if_missing: bool = False) -> bool:
    return _load(build_if_missing) is not None


def parse_par_native(path: str, mol_id: int, w0: float = -1.0,
                     wn: float = -1.0):
    """Parse raw per-line fields with the native scanner.

    Returns (iso, vnn, s0, yair, yself, en, n, d) numpy arrays, or None
    when the native library is unavailable.  Raises on parse errors
    (matching the Python parser's ValueError behavior).
    """
    lib = _load()
    if lib is None:
        return None
    size = os.path.getsize(path)
    capacity = max(size // 161 + 2, 16)
    iso = np.empty(capacity, np.int32)
    arrs = [np.empty(capacity, np.float64) for _ in range(7)]
    # Window disabled when w0 > wn (the Python parser's negative default).
    lo, hi = (w0, wn) if not (w0 < 0 and wn < 0) else (1.0, 0.0)
    n = lib.grt_parse_par(
        path.encode(), int(mol_id), float(lo), float(hi),
        ctypes.c_int64(capacity),
        iso.ctypes.data_as(ctypes.c_void_p),
        *[a.ctypes.data_as(ctypes.c_void_p) for a in arrs])
    if n == -1:
        raise OSError(f"cannot open {path}")
    if n < 0:
        raise ValueError(f"bad record in {path} (native rc {n})")
    vnn, s0, yair, yself, en, nexp, d = arrs
    return (iso[:n], vnn[:n], s0[:n], yair[:n], yself[:n], en[:n],
            nexp[:n], d[:n])
