"""ctypes bindings for the native C++ `.nice` codec (nice_ref.cpp).

Auto-builds libniceref.so with g++ on first import.  The native codec is
byte-identical to the numpy spec codec (same deterministic Huffman) and is
the framework's fast serial encoder/decoder (SURVEY §7.1.2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nice_ref.cpp")
_LIB = os.path.join(_DIR, "libniceref.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.nice_encode.restype = ctypes.c_int64
        lib.nice_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.nice_decode.restype = ctypes.c_int64
        lib.nice_decode.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
        lib.nice_read_header.restype = ctypes.c_int32
        lib.nice_read_header.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.nice_free.restype = None
        lib.nice_free.argtypes = [ctypes.c_void_p]
        lib.nice_code_lengths.restype = None
        lib.nice_code_lengths.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        _lib = lib
        return lib


def encode_native(img: np.ndarray) -> bytes:
    """Serial C++ encode: (H, W, 3) uint8 -> .nice bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 image")
    if img.shape[1] < 4:
        raise ValueError("width must be >= 4 (SURVEY A.8.7)")
    lib = get_lib()
    img = np.ascontiguousarray(img)
    out_ptr = ctypes.c_void_p()
    n = lib.nice_encode(
        img.ctypes.data_as(ctypes.c_void_p),
        img.shape[1],
        img.shape[0],
        ctypes.byref(out_ptr),
    )
    if n < 0:
        raise ValueError(f"nice_encode failed: {n}")
    try:
        return ctypes.string_at(out_ptr, n)
    finally:
        lib.nice_free(out_ptr)


def decode_native(data: bytes) -> np.ndarray:
    """Serial C++ decode: .nice bytes -> (H, W, 3) uint8."""
    lib = get_lib()
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    ch = ctypes.c_uint8()
    if lib.nice_read_header(data, len(data), ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch)) != 0:
        raise ValueError("truncated .nice header")
    if ch.value != 3:
        raise ValueError("only channels=3 decode is defined (SURVEY A.8.3)")
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    rc = lib.nice_decode(data, len(data), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"nice_decode failed: {rc}")
    return out


def code_lengths_native(counts: np.ndarray) -> np.ndarray:
    """Deterministic Huffman lengths via C++ (identical to format.huffman)."""
    lib = get_lib()
    counts = np.ascontiguousarray(counts, dtype=np.uint64)
    out = np.zeros(counts.shape[0], dtype=np.uint8)
    lib.nice_code_lengths(
        counts.ctypes.data_as(ctypes.c_void_p),
        counts.shape[0],
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
