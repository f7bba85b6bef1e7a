"""ctypes bindings for the native host runtime (phyrt.cc).

Lazily compiles libphyrt.so with g++ on first use; callers fall back to the
numpy/pure-python implementations when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "phyrt.cc")
_SO = os.path.join(_DIR, "libphyrt.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                 "-o", _SO], check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.phyrt_find_triggers_lag.restype = ctypes.c_int64
        lib.phyrt_find_triggers_lag.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.phyrt_crc32.restype = ctypes.c_uint32
        lib.phyrt_crc32.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.c_int64]
        lib.phyrt_pack_bits.restype = None
        lib.phyrt_pack_bits.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                        ctypes.c_int64,
                                        ctypes.POINTER(ctypes.c_uint8)]
        lib.phyrt_deagg.restype = ctypes.c_int64
        lib.phyrt_deagg.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def find_triggers(x: np.ndarray, thresh: float = 0.5, plateau: int = 20,
                  min_gap: int = 400, max_out: int = 65536, lag: int = 16
                  ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    iq = np.ascontiguousarray(
        np.stack([np.real(x), np.imag(x)], axis=-1), dtype=np.float32)
    out = np.zeros(max_out, dtype=np.int64)
    n = lib.phyrt_find_triggers_lag(
        iq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        thresh, plateau, min_gap, lag,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_out)
    return out[:n].copy()


def crc32(data: bytes) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    if len(buf) == 0:
        return 0
    return int(lib.phyrt_crc32(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf)))


def pack_bits(bits: np.ndarray) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    b = np.ascontiguousarray(bits, dtype=np.uint8)
    out = np.zeros(len(b) // 8, dtype=np.uint8)
    lib.phyrt_pack_bits(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(b),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()


def deagg(psdu: bytes, vht: bool = True, max_sub: int = 64
          ) -> Optional[List[Tuple[int, int, bool]]]:
    """Returns [(offset, length, fcs_ok)] of A-MPDU subframes."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(bytes(psdu), dtype=np.uint8)
    offs = np.zeros(max_sub, dtype=np.int64)
    lens = np.zeros(max_sub, dtype=np.int64)
    oks = np.zeros(max_sub, dtype=np.uint8)
    n = lib.phyrt_deagg(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        1 if vht else 0,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        oks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), max_sub)
    return [(int(offs[i]), int(lens[i]), bool(oks[i])) for i in range(n)]
