# -*- coding: utf-8 -*-
"""Frozen-encoder feature cache for training.

The encoder is frozen (reference train.py:318-319 runs WavLM in eval mode
and excludes it from the optimizer) yet dominates train-step FLOPs — the
reference recomputes the identical forward for every utterance in every
epoch.  This cache computes the acoustic condition ``c`` ONCE per utterance
and lets every later epoch feed it straight to the decoder step, skipping
the WavLM forward entirely at identical numerics (tested bit-exact on CPU).

Layout under ``<dir>/<split>/``:
  feats.npy  — np.memmap [N, S, d]; bfloat16 is stored as uint16 bit
               patterns (numpy has no bf16) and bitcast back on read
  meta.json  — shape, dtype, and a fingerprint (manifest identity + a
               cheap encoder-param checksum) so a stale cache is refused
               instead of silently corrupting training.

TPU mapping (SURVEY §3.1): the host boundary stays at the data iterator —
cached rows are gathered on host per batch and device_put alongside the
tokens; HBM sees [B, S, d] activations instead of [B, T_wav] waveforms plus
a full WavLM forward.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

__all__ = ["FeatureCache", "build_cache", "cache_exists"]

_META = "meta.json"
_FEATS = "feats.npy"


def _dtype_token(dtype) -> str:
    import jax.numpy as jnp

    return "bfloat16" if dtype == jnp.bfloat16 else np.dtype(dtype).name


def _storage_dtype(token: str):
    return np.uint16 if token == "bfloat16" else np.dtype(token)


def param_checksum(params) -> float:
    """Cheap encoder-weight fingerprint: sum of |leaf| means."""
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    total = 0.0
    for leaf in leaves[:: max(1, len(leaves) // 16)]:  # sample up to ~16
        total += float(np.mean(np.abs(np.asarray(leaf, np.float32))))
    return round(total, 6)


def _manifest_digest(manifest_path: str) -> str:
    """md5 of the manifest bytes plus (size, mtime) of every referenced
    clip.  Path + count alone would miss re-preprocessed audio written to
    the SAME manifest/clip paths — the cache would silently serve features
    of the old audio while tokens come from the new manifest."""
    import hashlib

    h = hashlib.md5()
    try:
        with open(manifest_path, "rb") as f:
            data = f.read()
    except OSError:
        return "unreadable"
    h.update(data)
    try:
        records = json.loads(data.decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        records = []
    for rec in records if isinstance(records, list) else []:
        p = rec.get("processed_path") if isinstance(rec, dict) else None
        if p and os.path.exists(p):
            st = os.stat(p)
            h.update(f"{os.path.basename(p)}:{st.st_size}:"
                     f"{st.st_mtime_ns}".encode())
    return h.hexdigest()


def fingerprint(manifest_path: str, n: int, checksum: float,
                masked: bool = False) -> dict:
    fp = {
        "manifest": os.path.abspath(manifest_path),
        "n": n,
        "encoder_checksum": checksum,
        "content": _manifest_digest(manifest_path),
    }
    # masked caches (model.encoder.condition_mask) run WavLM self-attention
    # with the per-utterance attention mask — different feature VALUES, so
    # they must not be interchanged with unmasked caches.  The key is only
    # present when True to keep pre-existing unmasked caches valid.
    if masked:
        fp["masked"] = True
    return fp


def cache_exists(cache_dir: str, split: str) -> bool:
    d = os.path.join(cache_dir, split)
    return os.path.exists(os.path.join(d, _META)) and os.path.exists(
        os.path.join(d, _FEATS))


class FeatureCache:
    """Random-access reader over a precomputed feats memmap."""

    def __init__(self, cache_dir: str, split: str,
                 expect_fingerprint: Optional[dict] = None):
        d = os.path.join(cache_dir, split)
        with open(os.path.join(d, _META)) as f:
            self.meta = json.load(f)
        if expect_fingerprint is not None:
            got = self.meta["fingerprint"]
            if got != expect_fingerprint:
                raise ValueError(
                    f"stale feature cache at {d}: fingerprint {got} != "
                    f"expected {expect_fingerprint}; delete the cache dir "
                    "or point data.cache_features elsewhere"
                )
        self.dtype_token = self.meta["dtype"]
        shape = tuple(self.meta["shape"])
        self._mm = np.lib.format.open_memmap(
            os.path.join(d, _FEATS), mode="r")
        assert self._mm.shape == shape, (self._mm.shape, shape)

    @property
    def shape(self):
        return tuple(self.meta["shape"])

    def rows(self, indices: Sequence[int]) -> np.ndarray:
        """[B, S, d] in the ORIGINAL dtype (bf16 bit patterns restored)."""
        out = np.ascontiguousarray(self._mm[np.asarray(indices)])
        if self.dtype_token == "bfloat16":
            import ml_dtypes

            return out.view(ml_dtypes.bfloat16)
        return out


def build_cache(
    cache_dir: str,
    split: str,
    dataset,
    encode_fn,
    batch_size: int = 8,
    manifest_path: str = "",
    checksum: float = 0.0,
    log_every: int = 0,
    masked: bool = False,
) -> None:
    """Run ``encode_fn(wave [B, T]) -> c [B, S, d]`` over the dataset in
    manifest order and persist the memmap + meta.  With ``masked=True`` the
    encode_fn is called as ``encode_fn(wave, lengths)`` so WavLM runs with
    its attention mask (condition_mask-consistent features)."""
    import logging

    d = os.path.join(cache_dir, split)
    os.makedirs(d, exist_ok=True)
    n = len(dataset)
    mm = None
    dtype_token = None
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        waves = np.stack([dataset[i]["wave"] for i in idxs])
        if masked:
            lengths = np.asarray([dataset[i]["wave_length"] for i in idxs],
                                 np.int32)
            c = np.asarray(encode_fn(waves, lengths))
        else:
            c = np.asarray(encode_fn(waves))
        if mm is None:
            import jax.numpy as jnp

            dtype_token = ("bfloat16" if c.dtype == jnp.bfloat16
                           else np.dtype(c.dtype).name)
            store = _storage_dtype(dtype_token)
            mm = np.lib.format.open_memmap(
                os.path.join(d, _FEATS), mode="w+", dtype=store,
                shape=(n,) + c.shape[1:])
        if dtype_token == "bfloat16":
            c = c.view(np.uint16)
        mm[idxs[0]: idxs[-1] + 1] = c
        if log_every and (start // batch_size) % log_every == 0:
            logging.info(f"feature cache {split}: {idxs[-1] + 1}/{n}")
    mm.flush()
    meta = {
        "shape": list(mm.shape), "dtype": dtype_token,
        "fingerprint": fingerprint(manifest_path, n, checksum, masked=masked),
    }
    with open(os.path.join(d, _META), "w") as f:
        json.dump(meta, f, indent=1)
