"""Native host runtime (C++ via ctypes).

The reference's host paths (data loading, block IO) are native Rust; the
framework's equivalents live in ``fastio.cpp`` and are compiled on first
use with the system g++ into a cached shared object. Everything degrades
gracefully: if no compiler is available the pure-Python/numpy fallbacks in
``utils`` are used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastio.cpp")
_SO = os.path.join(
    os.path.expanduser(os.environ.get("HNSW_NATIVE_CACHE", "~/.cache/hnsw_rs_tpu")),
    "fastio.so",
)
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.glove_shape.restype = ctypes.c_int
        lib.glove_shape.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.glove_parse.restype = ctypes.c_int64
        lib.glove_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.pread_block.restype = ctypes.c_int64
        lib.pread_block.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


WORD_CAP = 64


def load_glove_native(path: str, limit: int = 0):
    """Native GloVe text parse -> (words, float32[N, d]) or None if the
    native library is unavailable (callers fall back to Python)."""
    lib = get_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    d = ctypes.c_int64()
    if lib.glove_shape(path.encode(), limit, ctypes.byref(n), ctypes.byref(d)) != 0:
        return None
    n, d = n.value, d.value
    if n <= 0 or d <= 0:
        return None
    out = np.empty((n, d), np.float32)
    words_buf = ctypes.create_string_buffer(n * WORD_CAP)
    got = lib.glove_parse(
        path.encode(), n, d,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        words_buf, WORD_CAP,
    )
    if got < 0:
        if got == -2:
            raise ValueError(f"ragged GloVe row in {path}")
        return None
    raw = words_buf.raw
    words = [
        raw[i * WORD_CAP : (i + 1) * WORD_CAP].split(b"\0", 1)[0].decode("utf-8", "replace")
        for i in range(got)
    ]
    return words, out[:got]


def pread_block(path: str, offset: int, nbytes: int) -> np.ndarray | None:
    """Positioned block read via the native lib (pread), or None."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(nbytes, np.uint8)
    got = lib.pread_block(
        path.encode(), offset, nbytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if got < 0:
        return None
    return out[:got]
