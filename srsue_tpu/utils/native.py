"""ctypes bindings for the native C++ host-path library
(native/srsue_native.cc). Builds on first use if the toolchain is
available; every entry point has a pure-Python fallback so the framework
runs without a compiler (functions here return None when native code is
unavailable and callers fall back)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsrsue_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.gold_sequence.argtypes = [
        ctypes.c_uint32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
    ]
    lib.turbo_encode.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
    ]
    lib.conv_encode.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
    ]
    lib.crc_bits.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ctypes.c_int32, ctypes.c_uint32, ctypes.c_int32,
    ]
    lib.crc_bits.restype = ctypes.c_uint32
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def gold_sequence(c_init: int, length: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(length, np.uint8)
    lib.gold_sequence(c_init & 0x7FFFFFFF, length, out)
    return out


def turbo_encode(bits: np.ndarray, perm: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    k = len(bits)
    out = np.empty(3 * (k + 4), np.uint8)
    lib.turbo_encode(
        np.ascontiguousarray(bits, np.uint8),
        np.ascontiguousarray(perm, np.int32), k, out,
    )
    return out.reshape(3, k + 4)


def conv_encode(bits: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    n = len(bits)
    out = np.empty(3 * n, np.uint8)
    lib.conv_encode(np.ascontiguousarray(bits, np.uint8), n, out)
    return out.reshape(3, n)


def crc_bits(bits: np.ndarray, poly: int, order: int) -> int | None:
    lib = _load()
    if lib is None:
        return None
    b = np.ascontiguousarray(bits, np.uint8)
    return int(lib.crc_bits(b, len(b), poly, order))
