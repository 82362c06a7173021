# -*- coding: utf-8 -*-
"""ctypes bridge to the native host library (native/fddm_native.cc).

Lazy build-on-first-use: if `native/libfddm_native.so` is missing and a C++
toolchain is available, it is compiled with `make -C native`; every entry
point has a pure-Python fallback so the framework never hard-depends on the
toolchain.  (pybind11 is not available in this image; the C ABI + ctypes is
the binding layer.)
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfddm_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True, capture_output=True, timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.levenshtein_u32.restype = ctypes.c_int32
        lib.levenshtein_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
        ]
        lib.levenshtein_batch_u32.restype = None
        lib.levenshtein_batch_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u32(seq: Sequence) -> np.ndarray:
    if isinstance(seq, str):
        return np.frombuffer(seq.encode("utf-32-le"), dtype=np.uint32).copy()
    # word sequences: hash words into u32 ids
    return np.asarray([hash(w) & 0xFFFFFFFF for w in seq], np.uint32)


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Edit distance over strings (chars) or token sequences (words)."""
    lib = _load()
    aa, bb = _as_u32(a), _as_u32(b)
    if lib is None:
        return _levenshtein_py(aa, bb)
    return int(lib.levenshtein_u32(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb),
    ))


def levenshtein_batch(refs: List[Sequence], hyps: List[Sequence]) -> np.ndarray:
    lib = _load()
    a_arrs = [_as_u32(r) for r in refs]
    b_arrs = [_as_u32(h) for h in hyps]
    if lib is None:
        return np.asarray([_levenshtein_py(a, b) for a, b in zip(a_arrs, b_arrs)], np.int32)
    a_offs = np.zeros(len(a_arrs) + 1, np.int64)
    b_offs = np.zeros(len(b_arrs) + 1, np.int64)
    np.cumsum([len(x) for x in a_arrs], out=a_offs[1:])
    np.cumsum([len(x) for x in b_arrs], out=b_offs[1:])
    a_flat = np.concatenate(a_arrs) if a_arrs else np.zeros(0, np.uint32)
    b_flat = np.concatenate(b_arrs) if b_arrs else np.zeros(0, np.uint32)
    a_flat = np.ascontiguousarray(a_flat, np.uint32)
    b_flat = np.ascontiguousarray(b_flat, np.uint32)
    out = np.zeros(len(a_arrs), np.int32)
    lib.levenshtein_batch_u32(
        a_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        a_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        b_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(a_arrs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def _levenshtein_py(a: np.ndarray, b: np.ndarray) -> int:
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = np.arange(m + 1, dtype=np.int32)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, np.int32)
        cur[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        for j in range(1, m + 1):
            if cur[j] > cur[j - 1] + 1:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[m])
