# -*- coding: utf-8 -*-
"""Host-side data pipeline: manifest dataset + prefetching batcher.

Behavioral reference: train.py's CVZhTWDataset (lines 86-161) — manifest JSON
records, entries filtered to existing `processed_path`, waveform loaded at
16 kHz and zero-padded/truncated to 20 s (320 k samples), text tokenized with
optional bos/eos and padded/truncated to max_len.

Fixes folded in (SURVEY quirks):
  * #2: the reference reads `item['normalized_sentence']`, a field its own
    preprocessor never writes; here `text` -> `sentence` ->
    `normalized_sentence` fallback order accepts both real preprocess output
    and hand-built manifests.
  * The batcher is a seeded, multi-threaded prefetch pipeline (the reference
    uses a single-process DataLoader with num_workers=0) — audio decode is
    IO-bound, so a small thread pool overlaps host IO with TPU compute.

TPU-first: every batch has a fixed shape (wave [B, T_max], tokens [B, L]),
so one compiled train step serves the whole run.  Per-example lengths ride
along for mask construction (the reference trains mask-free on the audio
side; passing lengths is opt-in at the train-loop level).  For data
parallelism, `shard` restricts the sampled indices to this host's slice.
"""
from __future__ import annotations

import json
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from fddm_asr_tpu.data.audio_io import load_audio

__all__ = ["ManifestDataset", "make_batches", "Batch"]


@dataclass
class Batch:
    wave: np.ndarray        # [B, T_max] float32
    wave_lengths: np.ndarray  # [B] int32 (valid samples before padding)
    tokens: np.ndarray      # [B, L] int32 (x0, padded with pad_id)
    token_lengths: np.ndarray  # [B] int32
    indices: Optional[np.ndarray] = None  # [B] dataset indices (feature cache)


class ManifestDataset:
    """Loads `data/processed/{split}.json`-style manifests."""

    def __init__(
        self,
        json_file: str,
        tokenizer,
        max_len: int = 128,
        pad_id: int = 0,
        bos_id: Optional[int] = None,
        eos_id: Optional[int] = None,
        max_audio_seconds: float = 20.0,
        sample_rate: int = 16000,
        filter_missing: bool = True,
    ) -> None:
        with open(json_file, "r", encoding="utf-8") as f:
            self.data = json.load(f)
        self.tokenizer = tokenizer
        self.max_len = int(max_len)
        self.pad_id = int(pad_id)
        self.bos_id = bos_id
        self.eos_id = eos_id
        self.sample_rate = int(sample_rate)
        self.max_audio_samples = int(max_audio_seconds * sample_rate)

        self.valid_indices: List[int] = []
        for i, item in enumerate(self.data):
            p = item.get("processed_path")
            if not filter_missing or (p and os.path.exists(p)):
                self.valid_indices.append(i)

    def __len__(self) -> int:
        return len(self.valid_indices)

    @staticmethod
    def text_of(item: Dict) -> str:
        for key in ("text", "sentence", "normalized_sentence"):
            if item.get(key):
                return item[key]
        return ""

    def tokenize(self, text: str) -> np.ndarray:
        tokens = list(self.tokenizer.encode(text))
        if self.bos_id is not None:
            tokens = [self.bos_id] + tokens
        if self.eos_id is not None:
            tokens = tokens + [self.eos_id]
        length = min(len(tokens), self.max_len)
        out = np.full((self.max_len,), self.pad_id, np.int32)
        out[:length] = tokens[:length]
        return out, length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.data[self.valid_indices[idx]]
        wav, _sr = load_audio(item["processed_path"], target_sr=self.sample_rate, mono=True)
        n = min(len(wav), self.max_audio_samples)
        wave = np.zeros((self.max_audio_samples,), np.float32)
        wave[:n] = wav[:n]
        tokens, tok_len = self.tokenize(self.text_of(item))
        return {
            "wave": wave,
            "wave_length": np.int32(n),
            "tokens": tokens,
            "token_length": np.int32(tok_len),
        }


def shard_example_count(
    n: int, batch_size: int, shard: Optional[Sequence[int]],
    drop_last: bool = False,
) -> int:
    """How many examples make_batches(batch_size, shard, drop_last) yields
    for THIS host out of n total — must mirror its block-sharding exactly
    (used to weight cross-host eval metrics)."""
    if shard is None:
        return (n // batch_size) * batch_size if drop_last else n
    host, num_hosts = shard
    global_bs = batch_size * num_hosts
    if drop_last:
        n = (n // global_bs) * global_bs
    full, rem = divmod(n, global_bs)
    tail = max(0, min(batch_size, rem - host * batch_size))
    return full * batch_size + tail


def make_batches(
    dataset: ManifestDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = True,
    num_workers: int = 4,
    prefetch: int = 2,
    shard: Optional[Sequence[int]] = None,  # (host_id, num_hosts)
) -> Iterator[Batch]:
    """Yield fixed-shape batches with threaded decode + background prefetch.

    Shuffling is seeded per (seed, epoch) so every host in a data-parallel run
    draws the same global order before sharding — deterministic resume.

    Sharding is CONTIGUOUS WITHIN EACH GLOBAL BATCH: host h's k-th batch is
    rows [h*B, (h+1)*B) of the k-th global batch of size B*num_hosts.  With
    the host-major data-axis layout of parallel.distributed.make_global_mesh
    this makes the assembled global batch BIT-IDENTICAL to the
    single-process batch (the same row order), so losses reproduce exactly
    across process counts.  (A strided order[h::H] shard would cover the
    same examples but permute rows, re-pairing examples with per-position
    corruption noise.)
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng((seed, epoch)).permutation(n)
    if shard is not None:
        host, num_hosts = shard
        global_bs = batch_size * num_hosts
        if drop_last:
            order = order[: (len(order) // global_bs) * global_bs]
        batches = [
            g[host * batch_size : (host + 1) * batch_size]
            for g in (order[i : i + global_bs]
                      for i in range(0, len(order), global_bs))
        ]
        batches = [b for b in batches if len(b)]
    else:
        if drop_last:
            order = order[: (len(order) // batch_size) * batch_size]
        batches = [order[i : i + batch_size]
                   for i in range(0, len(order), batch_size)]
    if not batches:
        return
    q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that re-checks `stop` — a consumer that abandons the
        generator early (e.g. max_steps_per_epoch) must not leave the
        producer blocked in q.put forever (thread + batch-memory leak)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        # one pool for the producer's lifetime (a fresh executor per batch
        # paid thread spawn/join serialized with decode on the 1-core box)
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            def collate(idxs) -> Batch:
                items = list(pool.map(dataset.__getitem__, idxs))
                return Batch(
                    wave=np.stack([it["wave"] for it in items]),
                    wave_lengths=np.stack([it["wave_length"] for it in items]),
                    tokens=np.stack([it["tokens"] for it in items]),
                    token_lengths=np.stack([it["token_length"] for it in items]),
                    indices=np.asarray(idxs, np.int64),
                )

            try:
                for idxs in batches:
                    if stop.is_set() or not _put(collate(idxs)):
                        return
            except BaseException as e:
                # Surface collate failures (e.g. a WAV deleted after the
                # init-time existence check) in the CONSUMER: swallowing
                # them here would silently truncate the epoch — and in
                # multi-host runs desync this host's step count from its
                # peers, hanging the next collective with no cause.
                failure[0] = e
                return
            finally:
                if not _put(None):  # normal end-of-data sentinel
                    try:  # consumer already gone; don't block on a full queue
                        q.put_nowait(None)
                    except queue.Full:
                        pass

    failure: list = [None]
    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                if failure[0] is not None:
                    raise RuntimeError(
                        "data pipeline worker failed mid-epoch"
                    ) from failure[0]
                break
            yield batch
    finally:
        stop.set()
