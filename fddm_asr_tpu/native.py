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
        if _so_is_stale():
            try:
                # flock serialises concurrent processes (sweep workers,
                # train + serve) so none dlopens a half-relinked .so.  The
                # mtime gate above keeps the common fresh-.so case free of
                # a per-process `make` exec (1-core container, many short
                # test subprocesses).
                import fcntl

                with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lock:
                    fcntl.flock(lock, fcntl.LOCK_EX)
                    subprocess.run(
                        ["make", "-C", _NATIVE_DIR, "-s"],
                        check=True, capture_output=True, timeout=120,
                    )
            except (OSError, subprocess.SubprocessError):
                if not os.path.exists(_SO_PATH):
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
        try:
            lib.bpe_new.restype = ctypes.c_void_p
            lib.bpe_new.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32, ctypes.c_int32,
            ]
            lib.bpe_free.restype = None
            lib.bpe_free.argtypes = [ctypes.c_void_p]
            lib.bpe_encode_batch.restype = ctypes.c_int64
            lib.bpe_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
        except AttributeError:  # stale .so built before bpe_* existed
            pass
        _lib = lib
        return _lib


def _so_is_stale() -> bool:
    """True when the .so is missing or older than any source/Makefile."""
    try:
        so_mtime = os.path.getmtime(_SO_PATH)
    except OSError:
        return True
    for name in os.listdir(_NATIVE_DIR):
        if name.endswith((".cc", ".h")) or name == "Makefile":
            try:
                if os.path.getmtime(os.path.join(_NATIVE_DIR, name)) > so_mtime:
                    return True
            except OSError:
                return True
    return False


def available() -> bool:
    return _load() is not None


def _as_u32(seq: Sequence, vocab: Optional[dict] = None) -> np.ndarray:
    if isinstance(seq, str):
        return np.frombuffer(seq.encode("utf-32-le"), dtype=np.uint32).copy()
    # word sequences: intern words to sequential ids (exact — truncated
    # hash(w) values can collide, silently scoring a substitution as a
    # match).  The vocab dict must be SHARED across the two sides of one
    # comparison so equal words get equal ids.
    if vocab is None:
        vocab = {}
    return np.asarray([vocab.setdefault(w, len(vocab)) for w in seq],
                      np.uint32)


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Edit distance over strings (chars) or token sequences (words)."""
    lib = _load()
    vocab: dict = {}
    aa, bb = _as_u32(a, vocab), _as_u32(b, vocab)
    if lib is None:
        return _levenshtein_py(aa, bb)
    return int(lib.levenshtein_u32(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb),
    ))


def levenshtein_batch(refs: List[Sequence], hyps: List[Sequence]) -> np.ndarray:
    lib = _load()
    # ids need only within-pair consistency (distances are per-pair)
    vocabs = [dict() for _ in refs]
    a_arrs = [_as_u32(r, v) for r, v in zip(refs, vocabs)]
    b_arrs = [_as_u32(h, v) for h, v in zip(hyps, vocabs)]
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


class BpeEncoder:
    """Native BPE merge-loop encoder over a piece table (native bpe_* ABI).

    Construct with the tokenizer's piece table; ``encode_batch`` takes
    POST-normalization texts (dummy prefix added, spaces already escaped to
    U+2581 — i.e. the exact string spm.py hands its merge loop) and returns
    per-text id lists.  Returns None from ``create`` when the native library
    (or the bpe_* symbols) is unavailable; callers fall back to the Python
    codec, which implements the identical algorithm.
    """

    def __init__(self, lib, handle):
        self._lib = lib
        self._handle = handle

    @classmethod
    def create(cls, pieces: Sequence[str], scores: Sequence[float],
               types: Sequence[int], unk_id: int) -> Optional["BpeEncoder"]:
        lib = _load()
        if lib is None or not hasattr(lib, "bpe_new"):
            return None
        blobs = [p.encode("utf-8") for p in pieces]
        offs = np.zeros(len(blobs) + 1, np.int64)
        np.cumsum([len(b) for b in blobs], out=offs[1:])
        concat = b"".join(blobs)
        sc = np.ascontiguousarray(scores, np.float64)
        ty = np.ascontiguousarray(types, np.uint8)
        handle = lib.bpe_new(
            concat, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ty.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(blobs), int(unk_id),
        )
        if not handle:
            return None
        return cls(lib, handle)

    def encode_batch(self, texts: Sequence[str]) -> List[List[int]]:
        blobs = [t.encode("utf-8") for t in texts]
        offs = np.zeros(len(blobs) + 1, np.int64)
        np.cumsum([len(b) for b in blobs], out=offs[1:])
        concat = b"".join(blobs)
        # one id per codepoint is the worst case
        cap = max(1, sum(len(t) for t in texts))
        out = np.zeros(cap, np.int32)
        counts = np.zeros(max(1, len(blobs)), np.int32)
        total = self._lib.bpe_encode_batch(
            self._handle, concat,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(blobs),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if total < 0:  # capacity miscount: should be impossible
            raise RuntimeError("bpe_encode_batch capacity exceeded")
        res: List[List[int]] = []
        pos = 0
        for c in counts[: len(blobs)]:
            res.append(out[pos: pos + int(c)].tolist())
            pos += int(c)
        return res

    def encode(self, text: str) -> List[int]:
        return self.encode_batch([text])[0]

    def __del__(self):
        try:
            self._lib.bpe_free(self._handle)
        except Exception:
            pass
