#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Batching HTTP inference server for FDDM-ASR-TPU.

Production-style serving front-end over FDDMPipeline: concurrent HTTP
requests are gathered by a background batcher into device batches (dynamic
batching with a max-wait window), padded to duration buckets so every batch
shape reuses ONE compiled program per bucket (remote XLA compiles cost
30-60 s in this environment — see inference.py's CSV bucketing, which this
mirrors), and answered with the reference's result-JSON schema
(/root/reference/inference.py:247-255: wav/text/ids/T_infer/r/greedy/
posterior_mode).

The reference has no serving layer (SURVEY §1: "no serving layer"); this is
framework surface beyond parity, built TPU-first: batches ride the same
jitted transcribe program as bench.py, and JAX async dispatch overlaps the
next batch's host work with device execution.

Endpoints:
  POST /v1/transcribe   body = WAV bytes (Content-Type: audio/wav), or
                        JSON {"path": "/abs/file.wav"}; optional query
                        params seq_len/T_infer/r are fixed server-wide.
                        ?stream=1 streams NDJSON over chunked transfer:
                        one line per long-form window as it completes
                        (chunk_index/chunk_count tags), then the aggregate
                        result as the final line.
  POST /v1/transcribe/stream
                        TRUE streaming: the client pushes raw pcm16/f32
                        audio (Transfer-Encoding: chunked or fixed-length)
                        and NDJSON partial transcripts flow back over the
                        same response while later audio is still uploading.
                        ?format=pcm16|f32, ?window-seconds=<float>.
  GET  /healthz         liveness + config echo
  GET  /stats           request counts, latency percentiles, batch sizes,
                        audio seconds served, running RTFx

Usage:
  python serve.py --config cfg.yaml --ckpt ckpts/best_model.orbax \
      [--port 8080] [--max-batch 16] [--max-wait-ms 20] [--device cpu]
"""
from __future__ import annotations

import argparse
import collections
import io
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np

from fddm_asr_tpu import CONV_RECEPTIVE_FIELD  # import-light (no jax)


class FDDMHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a listen backlog sized for bursty clients.

    socketserver's default request_queue_size is 5: a wave of N>5
    simultaneous connects (exactly what a saturated batching client
    produces) overflows the backlog and the kernel RESETS the excess
    connections before accept() ever sees them."""

    request_queue_size = 128


class _Request:
    __slots__ = ("wave", "name", "done", "result", "t_enqueue")

    def __init__(self, wave: np.ndarray, name: str):
        self.wave = wave
        self.name = name
        self.done = threading.Event()
        self.result = None
        self.t_enqueue = time.perf_counter()


class BatchingEngine:
    """Gathers requests into bucketed device batches and transcribes them.

    One background thread owns the device; HTTP threads only enqueue and
    wait.  This honors the one-TPU-client constraint by construction and
    keeps all compiled-shape decisions in one place.
    """

    def __init__(self, pipeline, sampling: dict, seq_len: int,
                 max_batch: int = 16, max_wait_ms: float = 20.0,
                 bucket_seconds: float = 1.0, max_seconds: float = 30.0,
                 batch_multiple: int = 1,
                 request_timeout_s: float = 600.0,
                 pipeline_depth: int = 2):
        self.pipeline = pipeline
        # per-request wait bound; the FIRST request on a fresh server also
        # waits out param placement + the remote XLA compile, which can
        # exceed 600 s for flagship programs in this environment — serving
        # CLIs expose it as --request-timeout-s
        self.request_timeout_s = request_timeout_s
        self.sampling = sampling
        self.seq_len = seq_len
        self.max_batch = max_batch
        # device-mesh data-axis divisibility: batch buckets are rounded up
        # to this (a power of two — mesh axes are), so sharded batches
        # always split evenly across the data axis
        self.batch_multiple = max(1, batch_multiple)
        if max_batch % self.batch_multiple:
            raise ValueError(
                f"--max-batch {max_batch} must be a multiple of the mesh "
                f"data-axis size {self.batch_multiple}")
        self.max_wait_s = max_wait_ms / 1e3
        # batches concurrently in flight on the device (>= 1): while the
        # oldest batch's results are pulled + decoded + answered, up to
        # depth-1 younger batches keep the device busy.  2 = classic double
        # buffering; the serve bench sweep (docs/bench_serve_r03.json)
        # measures the knee — deeper only helps while host-side work per
        # batch exceeds device time per batch
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.bucket = int(bucket_seconds * 16000)
        self.max_samples = int(max_seconds * 16000)
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self.stats_lock = threading.Lock()
        self.stats = {
            "requests": 0, "errors": 0, "batches": 0,
            "audio_seconds": 0.0, "device_seconds": 0.0,
            "batch_size_sum": 0,
            # per-batch stage time sums (seconds): pad+build host work,
            # async dispatch call, blocked-on-results wait, decode+respond
            # — /stats exposes per-batch means so engine overhead is
            # measurable in production, not guessed at
            "t_pad": 0.0, "t_dispatch": 0.0, "t_wait": 0.0, "t_respond": 0.0,
            # bounded: percentiles over the most RECENT window only
            "latencies_ms": collections.deque(maxlen=1000),
        }
        self._stop = threading.Event()
        self._rng_counter = 0
        # (Bp, T) shapes dispatched at least once: dispatching a COLD shape
        # blocks in trace + remote compile, so the loop answers any ready
        # batch first (see _loop); warmup pre-populates this
        self._warm_shapes: set = set()
        # end of the last finalized window — device_seconds accounts the
        # UNION of in-flight windows, not their (overlapping) sum
        self._busy_until = 0.0
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def _bucket_batch_size(self, n: int) -> int:
        """Padded batch size for n queued requests: next power of two,
        rounded UP to a batch_multiple multiple (a pow2 is not necessarily
        one when the mesh data axis is e.g. 3), capped at max_batch (a
        validated multiple — the cap keeps the divisibility guarantee)."""
        pow2 = 1 << max(0, (n - 1).bit_length())
        bm = self.batch_multiple
        return min(self.max_batch, -(-max(pow2, bm) // bm) * bm)

    # ------------------------------------------------------------------ api
    def _plan_requests(self, wave: np.ndarray, name: str) -> List[_Request]:
        """Split audio longer than max_seconds into window requests — they
        coalesce into the same device batches as everyone else's traffic
        (long-form handling rides the dynamic batcher; cf. inference.py
        --chunk-seconds for the offline equivalent)."""
        wave = np.asarray(wave, np.float32)
        if len(wave) <= self.max_samples:
            chunks = [wave]
        else:
            # cuts land at the quietest 25 ms frame near each window edge
            # (speech pauses), not mid-word — see plan_silence_chunks
            from fddm_asr_tpu.data.audio_io import plan_silence_chunks

            chunks = [wave[s:e]
                      for s, e in plan_silence_chunks(wave, self.max_samples)]
        return [
            _Request(self._to_wire(c),
                     name if len(chunks) == 1 else f"{name}#chunk{i}")
            for i, c in enumerate(chunks)
        ]

    def _to_wire(self, wave: np.ndarray) -> np.ndarray:
        """Convert float audio to the pipeline wire dtype AT INGESTION so
        the cost lands in HTTP/client threads, not the serial engine loop
        (mulaw companding measured ~335 ms/batch in-loop)."""
        enc = getattr(self.pipeline, "input_encoding", "f32")
        if enc == "f32":
            return wave
        from fddm_asr_tpu.data.wire import encode_wire

        return encode_wire(wave, enc)

    def _enqueue(self, reqs: List[_Request]) -> None:
        for r in reqs:
            self.q.put(r)
        if self._stop.is_set():
            # raced with shutdown(): its one-shot drain may already have
            # passed — fail these requests here instead of blocking below
            for r in reqs:
                if not r.done.is_set():
                    r.result = {"wav": r.name, "error": "server shutting down"}
                    r.done.set()

    def _aggregate(self, name: str, results: List[dict],
                   window_samples: Optional[int] = None) -> dict:
        errs = [r for r in results if "error" in r]
        if errs:
            return {"wav": name, "error": errs[0]["error"]}
        if len(results) == 1:
            return results[0]
        first = results[0]
        # the ACTUAL commit window: a StreamingSession may run a smaller
        # window-seconds than the engine max — clients align partial
        # transcripts to audio offsets with this
        win = self.max_samples if window_samples is None else window_samples
        return {
            "wav": name,
            "text": "".join(r["text"] for r in results),
            "chunks": [r["text"] for r in results],
            "ids": [r["ids"] for r in results],
            "chunk_seconds": win / 16000.0,
            "T_infer": first["T_infer"], "r": first["r"],
            "greedy": first["greedy"],
            "posterior_mode": first["posterior_mode"],
        }

    def submit(self, wave: np.ndarray, name: str,
               timeout_s: Optional[float] = None) -> dict:
        """Transcribe one utterance (blocking); long audio is windowed via
        _plan_requests and the window texts joined."""
        timeout_s = self.request_timeout_s if timeout_s is None else timeout_s
        if self._stop.is_set():
            return {"wav": name, "error": "server shutting down"}
        reqs = self._plan_requests(wave, name)
        self._enqueue(reqs)
        for r in reqs:
            if not r.done.wait(timeout=timeout_s):
                return {"wav": name, "error": f"timed out after {timeout_s}s"}
        return self._aggregate(name, [r.result for r in reqs])

    def submit_stream(self, wave: np.ndarray, name: str,
                      timeout_s: Optional[float] = None):
        """Streaming variant: yields one result dict per window IN ORDER as
        windows complete (each tagged chunk_index/chunk_count), then the
        exact aggregate submit() would have returned as the FINAL item.
        Long recordings surface partial transcripts while later windows are
        still on the device."""
        timeout_s = self.request_timeout_s if timeout_s is None else timeout_s
        if self._stop.is_set():
            yield {"wav": name, "error": "server shutting down"}
            return
        reqs = self._plan_requests(wave, name)
        self._enqueue(reqs)
        results = []
        for i, r in enumerate(reqs):
            if not r.done.wait(timeout=timeout_s):
                yield {"wav": name, "error": f"timed out after {timeout_s}s"}
                return
            results.append(r.result)
            if "error" in r.result:
                break
            yield {**r.result, "chunk_index": i, "chunk_count": len(reqs)}
        yield self._aggregate(name, results)

    def shutdown(self):
        self._stop.set()
        self.thread.join(timeout=5)
        # complete anything still queued so no HTTP thread hangs
        while True:
            try:
                req = self.q.get_nowait()
            except queue.Empty:
                break
            req.result = {"wav": req.name, "error": "server shutting down"}
            req.done.set()

    # ------------------------------------------------------------ internals
    def _gather(self, first_timeout: float = 0.2) -> List[_Request]:
        try:
            first = self.q.get(timeout=first_timeout)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self.q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _plan_shape(self, batch: List[_Request]) -> tuple:
        """Padded (Bp, T) for a gathered batch — the compiled-program key.

        One duration bucket per batch: pad to the longest request's bucket.
        Rounding up to a bucket multiple can overshoot max_samples when
        max_samples is not itself a multiple of the bucket (e.g. exported
        buckets 5 s and 12 s: an 11 s request would round to 15 s and no
        exported module covers it).  Requests are already chunked to
        <= max_samples, so clamping keeps T >= longest while staying
        inside the largest program."""
        longest = max(len(r.wave) for r in batch)
        T = max(-(-max(longest, 1) // self.bucket) * self.bucket,
                CONV_RECEPTIVE_FIELD)
        T = min(T, max(self.max_samples, CONV_RECEPTIVE_FIELD))
        return self._bucket_batch_size(len(batch)), T

    def _dispatch(self, batch: List[_Request]):
        """Pad/bucket a gathered batch and ENQUEUE it on the device;
        returns a finalize() that blocks on and decodes the results.

        One duration bucket per batch: pad to the longest request's bucket
        so co-batched shorter clips share the program.  The BATCH dim is
        also bucketed (next power of two, capped at max_batch): without it
        every distinct concurrency level compiles its own program — at this
        environment's 30-60 s+ remote-compile latency that is a
        first-request stall per level.  Pad rows carry 0.1 s of silence
        (never all-masked) and are sliced off at finalize; rows are
        independent on device."""
        import jax

        t_start = time.perf_counter()
        Bp, T = self._plan_shape(batch)
        # compact wire dtypes halve/quarter the host->device bytes (the
        # measured serving bottleneck through the relay): pcm16 is exact
        # for 16-bit-PCM sources, mulaw8 is telephone-grade (data/wire.py)
        enc = getattr(self.pipeline, "input_encoding", "f32")
        if enc == "f32":
            wave = np.zeros((Bp, T), np.float32)
        else:
            from fddm_asr_tpu.data.wire import silence_value, wire_dtype

            # NOT zeros: a zero mulaw byte is -1.0 full-scale DC
            wave = np.full((Bp, T), silence_value(enc), wire_dtype(enc))
        for i, r in enumerate(batch):
            # rows were wire-encoded at ingestion (_to_wire)
            wave[i, : len(r.wave)] = r.wave
        lengths = np.full((Bp,), min(1600, T), np.int64)
        for i, r in enumerate(batch):
            # Clamp to one conv-frame's receptive field: shorter lengths
            # yield ZERO encoder frames, whose all-masked attention rows
            # would reach the decoder (inference.py guards its rows
            # identically).  Sub-frame uploads and long-form tail chunks
            # hit this.
            lengths[i] = max(len(r.wave), CONV_RECEPTIVE_FIELD)
        self._rng_counter += 1
        # AOT-exported pipelines seed jax.random.key INSIDE the compiled
        # module — pass the raw counter (takes_seed)
        rng = (self._rng_counter
               if getattr(self.pipeline, "takes_seed", False)
               else jax.random.key(self._rng_counter))
        async_fn = getattr(self.pipeline, "transcribe_with_ids_async", None)
        t_pad = time.perf_counter()
        if async_fn is not None:
            fin = async_fn(wave, lengths, seq_len=self.seq_len, rng=rng,
                           with_confidence=True, **self.sampling)
        else:
            fin = lambda: self.pipeline.transcribe_with_ids(  # noqa: E731
                wave, lengths, seq_len=self.seq_len, rng=rng,
                with_confidence=True, **self.sampling)
        t_disp = time.perf_counter()
        with self.stats_lock:
            self.stats["t_pad"] += t_pad - t_start
            self.stats["t_dispatch"] += t_disp - t_pad
        return fin

    def _finalize(self, batch: List[_Request], fin, t0: float) -> None:
        try:
            t_call = time.perf_counter()
            texts_ids = fin()[: len(batch)]
            now = time.perf_counter()
            t_wait = now - t_call
            # engine-busy time: union of in-flight windows (double-buffered
            # batches overlap — summing raw dispatch->finalize walls would
            # double-count and under-report /stats rtfx).  Single-threaded:
            # only the loop thread finalizes.
            device_s = now - max(t0, self._busy_until)
            self._busy_until = now
            for r, (text, ids, conf) in zip(batch, texts_ids):
                r.result = {
                    "wav": r.name, "text": text,
                    "ids": ids,
                    "confidence": round(conf, 6),
                    "T_infer": self.sampling.get("T_infer"),
                    "r": self.sampling.get("r"),
                    "greedy": self.sampling.get("greedy", True),
                    "posterior_mode": self.sampling.get("posterior_mode", "average"),
                }
                if self.sampling.get("num_candidates", 1) > 1:
                    r.result["num_candidates"] = self.sampling["num_candidates"]
                r.done.set()
            with self.stats_lock:
                self.stats["requests"] += len(batch)
                self.stats["batches"] += 1
                # actual request audio only (not batch-pad rows)
                self.stats["audio_seconds"] += (
                    sum(len(r.wave) for r in batch) / 16000.0)
                self.stats["device_seconds"] += device_s
                self.stats["batch_size_sum"] += len(batch)
                self.stats["t_wait"] += t_wait
                self.stats["t_respond"] += time.perf_counter() - now
                self.stats["latencies_ms"].extend(
                    (now - r.t_enqueue) * 1e3 for r in batch
                )
        except Exception as e:  # noqa: BLE001 - per-batch fault isolation
            self._fail(batch, e)

    def _fail(self, batch: List[_Request], e: Exception) -> None:
        for r in batch:
            if not r.done.is_set():
                r.result = {"wav": r.name, "error": str(e)}
                r.done.set()
        with self.stats_lock:
            self.stats["errors"] += len(batch)

    def _loop(self):
        # PIPELINED DISPATCH: enqueue up to pipeline_depth batches on the
        # device (JAX async dispatch returns once the work is enqueued)
        # before blocking on the OLDEST batch's results, so device execution
        # overlaps the host-side gather + pad + decode + HTTP work of the
        # batches behind it.  depth=2 is classic double buffering; deeper
        # keeps the device saturated when per-batch host work (tokenizer
        # decode, response writing) rivals per-batch device time.
        # Per-request result order is preserved (finalize in dispatch order).
        inflight = collections.deque()  # of (batch, finalize, t0)
        while not self._stop.is_set():
            # with batches in flight, don't idle-wait long for new traffic —
            # their finalize is the priority; the max_wait window still
            # coalesces any queued requests while the device runs
            batch = self._gather(first_timeout=0.005 if inflight else 0.2)
            if batch:
                if inflight and self._plan_shape(batch) not in self._warm_shapes:
                    # COLD shape: _dispatch would block in trace + remote
                    # XLA compile (30 s .. minutes here) with already-
                    # computed results head-of-line blocked behind it —
                    # answer everything in flight before starting the compile
                    while inflight:
                        self._finalize(*inflight.popleft())
                t0 = time.perf_counter()
                try:
                    inflight.append((batch, self._dispatch(batch), t0))
                    self._warm_shapes.add(self._plan_shape(batch))
                except Exception as e:  # noqa: BLE001 - per-batch isolation
                    self._fail(batch, e)
            # drain ONE batch per iteration: when the pipe is full, or no
            # new traffic arrived (answer waiting clients — their next
            # requests re-fill the queue while younger batches still run)
            if len(inflight) >= self.pipeline_depth or (inflight and not batch):
                self._finalize(*inflight.popleft())
        while inflight:
            self._finalize(*inflight.popleft())

    def stats_snapshot(self) -> dict:
        with self.stats_lock:
            lat = sorted(self.stats["latencies_ms"])  # recent window (<=1000)
            snap = {
                "requests": self.stats["requests"],
                "errors": self.stats["errors"],
                "batches": self.stats["batches"],
                "audio_seconds": round(self.stats["audio_seconds"], 2),
                "mean_batch_size": (
                    round(self.stats["batch_size_sum"] / self.stats["batches"], 2)
                    if self.stats["batches"] else 0.0
                ),
                "rtfx": (
                    round(self.stats["audio_seconds"] / self.stats["device_seconds"], 1)
                    if self.stats["device_seconds"] > 0 else None
                ),
                # mean per-batch stage times: where an engine cycle goes
                "stage_ms": (
                    {k: round(1e3 * self.stats["t_" + k]
                              / self.stats["batches"], 1)
                     for k in ("pad", "dispatch", "wait", "respond")}
                    if self.stats["batches"] else None
                ),
            }
            if lat:
                snap["latency_ms"] = {
                    "p50": round(lat[len(lat) // 2], 1),
                    "p95": round(lat[int(len(lat) * 0.95)], 1),
                    "max": round(lat[-1], 1),
                }
            return snap


class StreamingSession:
    """Incremental (true streaming) recognition over the batching engine.

    ``feed(samples)`` buffers 16 kHz float32 audio as it arrives from the
    client; whenever more than one window of samples is buffered the session
    commits a chunk cut at the quietest 25 ms frame near the window edge —
    the SAME greedy left-to-right decision ``plan_silence_chunks`` makes
    offline (each of its cuts needs only ``win`` samples of lookahead), so a
    fully-fed session at the engine's default window produces byte-identical
    chunks to ``engine.submit`` on the whole recording.  Committed chunks
    are ordinary engine requests: they coalesce into the same dynamic device
    batches as everyone else's traffic.

    ``poll()`` yields completed window results in order without blocking
    (partial transcripts flow while the client is still uploading);
    ``finish()`` flushes the tail window, yields the remaining results, then
    the exact aggregate ``submit`` would have returned.

    ``window_seconds`` trades latency for context: smaller windows commit —
    and therefore transcribe — sooner, at the cost of less audio per chunk.
    It is clamped to the engine's max window so compiled-shape buckets are
    unchanged.
    """

    _FRAME = 400  # 25 ms @ 16 kHz, matching plan_silence_chunks

    def __init__(self, engine: BatchingEngine, name: str,
                 window_seconds: Optional[float] = None,
                 timeout_s: Optional[float] = None):
        self.engine = engine
        self.name = name
        win = (engine.max_samples if window_seconds is None
               else int(float(window_seconds) * 16000))
        # >= 2 frames so the cut search has room; <= engine window so every
        # committed chunk fits the existing duration buckets / programs
        self.win = max(2 * self._FRAME, min(win, engine.max_samples))
        self.timeout_s = (engine.request_timeout_s
                          if timeout_s is None else timeout_s)
        self._tail = np.zeros((0,), np.float32)
        self._reqs: List[_Request] = []
        self._emitted = 0       # windows already yielded by poll()
        self._results: List[dict] = []
        self._finished = False
        self._errored = False   # first window error seen; surfaced once,
        #                         as finish()'s aggregate (same contract as
        #                         engine.submit_stream)

    # -------------------------------------------------------------- input
    def feed(self, samples: np.ndarray) -> None:
        """Append audio; commit every full window (leaving < win+1 samples
        buffered) at the cut plan_silence_chunks would pick (shared
        ``silence_cut`` decision)."""
        if self._finished:
            raise RuntimeError("feed() after finish()")
        if self._errored:
            # the stream already failed; don't burn device time on windows
            # whose results can never be aggregated
            self._tail = np.zeros((0,), np.float32)
            return
        from fddm_asr_tpu.data.audio_io import silence_cut

        samples = np.asarray(samples, np.float32).reshape(-1)
        if samples.size:
            self._tail = np.concatenate([self._tail, samples])
        win = self.win
        while len(self._tail) > win:
            cut = silence_cut(self._tail[:win], win, frame=self._FRAME)
            self._commit(self._tail[:cut].copy())
            self._tail = self._tail[cut:]

    def _commit(self, wave: np.ndarray) -> None:
        # a cut implies at least one more chunk follows, so chunked naming
        # is decided here exactly as _plan_requests does with full knowledge
        req = _Request(self.engine._to_wire(wave),
                       f"{self.name}#chunk{len(self._reqs)}")
        self._reqs.append(req)
        self.engine._enqueue([req])

    # ------------------------------------------------------------- output
    def poll(self):
        """Yield results for consecutively completed windows (non-blocking).
        A window error stops the partial stream — it surfaces exactly once,
        as finish()'s aggregate, matching engine.submit_stream."""
        while (not self._errored and self._emitted < len(self._reqs)
               and self._reqs[self._emitted].done.is_set()):
            req = self._reqs[self._emitted]
            self._results.append(req.result)
            self._emitted += 1
            if "error" in req.result:
                self._errored = True
                return
            yield {**req.result, "chunk_index": self._emitted - 1}

    def finish(self):
        """Flush the buffered tail, drain remaining windows in order, then
        yield the aggregate result (identical to ``engine.submit``)."""
        self._finished = True
        if self._errored:
            yield self.engine._aggregate(self.name, self._results,
                                         window_samples=self.win)
            return
        if not self._reqs:
            # sole chunk: plain name, matching _plan_requests' single-chunk
            # naming (the tail may be empty — same silence-clamp path as an
            # empty upload)
            req = _Request(self.engine._to_wire(self._tail), self.name)
            self._reqs.append(req)
            self.engine._enqueue([req])
        else:
            self._commit(self._tail)
        self._tail = np.zeros((0,), np.float32)
        n = len(self._reqs)
        while self._emitted < n:
            req = self._reqs[self._emitted]
            if not req.done.wait(timeout=self.timeout_s):
                yield {"wav": self.name,
                       "error": f"timed out after {self.timeout_s}s"}
                return
            self._results.append(req.result)
            if "error" in req.result:
                self._emitted += 1
                break
            yield {**req.result, "chunk_index": self._emitted,
                   "chunk_count": n}
            self._emitted += 1
        yield self.engine._aggregate(self.name, self._results,
                                     window_samples=self.win)


class _PcmStreamDecoder:
    """Incremental raw-PCM byte decoder (network chunks can split samples)."""

    def __init__(self, fmt: str):
        if fmt not in ("pcm16", "f32"):
            raise ValueError(f"unsupported stream format {fmt!r} "
                             "(use pcm16 or f32)")
        self.fmt = fmt
        self.width = 2 if fmt == "pcm16" else 4
        self._carry = b""

    def decode(self, data: bytes) -> np.ndarray:
        data = self._carry + data
        usable = len(data) - len(data) % self.width
        self._carry = data[usable:]
        buf = data[:usable]
        if self.fmt == "pcm16":
            return np.frombuffer(buf, "<i2").astype(np.float32) / 32768.0
        return np.frombuffer(buf, "<f4").astype(np.float32)


def _decode_wav_bytes(body: bytes, target_sr: int = 16000) -> np.ndarray:
    from fddm_asr_tpu.data.audio_io import load_wav, resample

    data, sr = load_wav(io.BytesIO(body))
    if data.ndim > 1:
        data = data.mean(axis=0)
    if sr != target_sr:
        data = resample(data, sr, target_sr)
    return np.asarray(data, np.float32)


def make_handler(engine: BatchingEngine, config_echo: dict,
                 audio_root: Optional[str] = None,
                 loopback_only_paths: bool = False):
    """audio_root: allowlisted directory for JSON {"path": ...} requests.
    When None and the server is bound beyond loopback, path mode is
    disabled entirely (any HTTP client could otherwise read and probe
    arbitrary server-side files)."""
    root = os.path.realpath(audio_root) if audio_root else None

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, obj: dict):
            if code >= 400:
                # error replies may leave request-body bytes unread (e.g. a
                # rejected streaming upload); on a keep-alive connection the
                # next request line would then be parsed out of raw audio —
                # drop the connection instead
                self.close_connection = True
            payload = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        # one chunked-NDJSON writer for BOTH streaming endpoints (?stream=1
        # and /v1/transcribe/stream) so the wire format cannot diverge
        def _ndjson_start(self):
            self.send_response(200)
            self.send_header("Content-Type",
                             "application/x-ndjson; charset=utf-8")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

        def _ndjson_line(self, obj: dict):
            data = (json.dumps(obj, ensure_ascii=False) + "\n"
                    ).encode("utf-8")
            self.wfile.write(b"%X\r\n" % len(data) + data + b"\r\n")
            self.wfile.flush()

        def _ndjson_end(self):
            self.wfile.write(b"0\r\n\r\n")

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._reply(200, {"status": "ok", **config_echo})
            elif self.path.startswith("/stats"):
                self._reply(200, engine.stats_snapshot())
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path.startswith("/v1/transcribe/stream"):
                self._ingest_stream_reply()
                return
            if not self.path.startswith("/v1/transcribe"):
                self._reply(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n)
                ctype = (self.headers.get("Content-Type") or "").lower()
                if ctype.startswith("application/json"):
                    req = json.loads(body.decode("utf-8"))
                    path = os.path.realpath(str(req["path"]))
                    if root is not None:
                        if not (path == root or path.startswith(root + os.sep)):
                            self._reply(403, {"error": "path outside --audio-root"})
                            return
                    elif loopback_only_paths:
                        self._reply(403, {
                            "error": "path mode disabled on non-loopback "
                                     "bind; set --audio-root or upload WAV "
                                     "bytes"})
                        return
                    from fddm_asr_tpu.data.audio_io import load_audio

                    try:
                        wave, _ = load_audio(path, target_sr=16000, mono=True)
                    except Exception:  # noqa: BLE001 — don't leak fs details
                        self._reply(400, {"error": "could not read audio at "
                                                   "requested path"})
                        return
                    name = path
                else:
                    wave = _decode_wav_bytes(body)
                    name = f"<upload:{n}B>"
            except Exception as e:  # noqa: BLE001 - bad request isolation
                self._reply(400, {"error": f"bad request: {e}"})
                return
            from urllib.parse import parse_qs, urlsplit

            query = parse_qs(urlsplit(self.path).query)
            if query.get("stream", ["0"])[-1] in ("1", "true"):
                self._stream_reply(wave, name)
                return
            result = engine.submit(wave, name)
            self._reply(200 if "error" not in result else 500, result)

        def _stream_reply(self, wave, name):
            """POST /v1/transcribe?stream=1 — NDJSON over chunked transfer:
            one line per long-form window as it completes (tagged
            chunk_index/chunk_count), then the aggregate result (the exact
            object the non-streaming path returns) as the last line.
            Partial transcripts reach the client while later windows are
            still on the device."""
            self._ndjson_start()
            try:
                for res in engine.submit_stream(wave, name):
                    self._ndjson_line(res)
                self._ndjson_end()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away mid-stream; device work completes

        # ----------------------------------------------- incremental input
        def _iter_request_body(self, blocksize: int = 32768):
            """Yield the request body incrementally.  BaseHTTPRequestHandler
            does NOT decode Transfer-Encoding: chunked (clients streaming
            live audio can't know Content-Length upfront), so the chunk
            framing is parsed here; fixed-length bodies stream in blocks."""
            te = (self.headers.get("Transfer-Encoding") or "").lower()
            if "chunked" in te:
                while True:
                    line = self.rfile.readline(1024).split(b";")[0].strip()
                    try:
                        size = int(line or b"0", 16)
                    except ValueError:
                        raise ValueError("malformed chunked encoding: "
                                         f"bad chunk-size line {line!r}")
                    if size < 0:
                        raise ValueError("malformed chunked encoding: "
                                         "negative chunk size")
                    if size == 0:
                        while self.rfile.readline(1024).strip():
                            pass  # trailers
                        return
                    remaining = size
                    while remaining:
                        data = self.rfile.read(min(blocksize, remaining))
                        if not data:
                            return
                        remaining -= len(data)
                        yield data
                    self.rfile.read(2)  # CRLF after each chunk
            else:
                n = int(self.headers.get("Content-Length", "0"))
                while n > 0:
                    data = self.rfile.read(min(blocksize, n))
                    if not data:
                        return
                    n -= len(data)
                    yield data

        def _ingest_stream_reply(self):
            """POST /v1/transcribe/stream — TRUE streaming recognition:
            the client pushes raw audio (chunked transfer encoding or a
            fixed-length body) and NDJSON partial transcripts flow back
            over the SAME response while later audio is still uploading.

            Query params: format=pcm16|f32 (little-endian mono 16 kHz;
            default pcm16), window-seconds=<float> (commit/latency window,
            clamped to the server's --max-seconds).  Each line is one
            committed window's result tagged chunk_index (chunk_count once
            known); the final line is the aggregate the non-streaming
            endpoint would return for the whole recording."""
            from urllib.parse import parse_qs, urlsplit

            query = parse_qs(urlsplit(self.path).query)
            try:
                dec = _PcmStreamDecoder(
                    query.get("format", ["pcm16"])[-1].lower())
                ws = query.get("window-seconds", [None])[-1]
                ws = None if ws is None else float(ws)
            except ValueError as e:
                self._reply(400, {"error": f"bad request: {e}"})
                return
            session = StreamingSession(
                engine, f"<stream:{dec.fmt}>", window_seconds=ws)
            # bound every blocking body read: a client that stalls mid-chunk
            # without closing would otherwise pin this handler thread (and
            # the session's buffered audio) forever — classic slowloris
            self.connection.settimeout(engine.request_timeout_s)
            self._ndjson_start()
            try:
                for data in self._iter_request_body():
                    session.feed(dec.decode(data))
                    for res in session.poll():
                        self._ndjson_line(res)
                for res in session.finish():
                    self._ndjson_line(res)
                self._ndjson_end()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away; committed windows complete anyway
            except (ValueError, TimeoutError) as e:
                # malformed chunk framing / stalled upload after the 200 was
                # sent: surface the error in-band and drop the connection
                # (the body is in an unknown state — it cannot be reused)
                self.close_connection = True
                try:
                    self._ndjson_line({"wav": session.name,
                                       "error": f"stream aborted: {e}"})
                    self._ndjson_end()
                except OSError:
                    pass

    return Handler


class ExportedEngineAdapter:
    """FDDMPipeline-shaped front for an AOT artifact (fddm_asr_tpu.aot).

    seq_len and sampling are baked into the exported modules, so the
    engine's per-call values are ignored here; the engine is constructed
    from the artifact meta so they always agree.  takes_seed tells the
    engine to pass its rng counter as a raw int (the exported module calls
    jax.random.key(seed) internally — same key the live engine would use,
    so transcripts match a live server at identical shapes and counters).
    """

    takes_seed = True

    def __init__(self, exported):
        self.ep = exported
        self.input_encoding = getattr(exported, "input_encoding", "f32")

    def transcribe_with_ids(self, wave, lengths=None, seq_len=None,
                            rng=0, with_confidence=False, **_sampling):
        return self.ep.transcribe_with_ids(
            wave, lengths, seed=int(rng), with_confidence=with_confidence)

    def transcribe_with_ids_async(self, wave, lengths=None, seq_len=None,
                                  rng=0, with_confidence=False, **_sampling):
        return self.ep.transcribe_with_ids_async(
            wave, lengths, seed=int(rng), with_confidence=with_confidence)


def _build_exported_server(args) -> ThreadingHTTPServer:
    import warnings

    from fddm_asr_tpu.aot import ExportedPipeline

    if getattr(args, "mesh", ""):
        raise SystemExit("--exported artifacts are pre-lowered; pass --mesh "
                         "to scripts/export_model.py instead")
    if getattr(args, "num_candidates", 1) > 1:
        raise SystemExit("--num-candidates needs the live pipeline "
                         "(--config/--ckpt): exported artifacts bake their "
                         "sampling and batch shapes")
    ep = ExportedPipeline.load(args.exported)
    meta = ep.meta
    # the artifact's baked input_encoding always wins — a conflicting
    # --wire-dtype would otherwise be silently ignored (clients would
    # companded-encode for the wrong decoder)
    flag_wire = getattr(args, "wire_dtype", None)
    baked_wire = getattr(ep, "input_encoding", "f32")
    if flag_wire and flag_wire != "f32" and flag_wire != baked_wire:
        raise SystemExit(
            f"--wire-dtype {flag_wire} conflicts with the exported "
            f"artifact's baked input encoding '{baked_wire}' — the wire "
            "format is fixed at export time (scripts/export_model.py "
            "--input-encoding); drop the flag or re-export")
    if not meta.get("use_condition_mask"):
        warnings.warn(
            "artifact was exported with --condition-mask off: co-batched "
            "padding can alter transcripts (export serving artifacts with "
            "--condition-mask on)", stacklevel=2)
    # union with LOADED native executables: an artifact may carry e.g. a
    # B=32 serving bucket only as a fused-kernel native module
    buckets = sorted({tuple(bn) for bn in meta["buckets"]}
                     | set(getattr(ep, "native", {})))
    batches = sorted({b for b, _ in buckets})
    samples = sorted({n for _, n in buckets})
    # fallbacks mirror aot.resolve_sampling (what the module actually baked
    # in) — current artifacts always record the resolved dict, but format-
    # version-1 artifacts written via the library API may carry partial dicts
    sampling = {
        "T_infer": meta["sampling"].get("T_infer", 20),
        "r": meta["sampling"].get("r", 5),
        "greedy": meta["sampling"].get("greedy", True),
        "posterior_mode": meta["sampling"].get("posterior_mode", "map"),
    }
    # sharded artifacts: batch buckets were validated at export to divide
    # the data axis; keep the engine's buckets aligned the same way
    mesh_meta = meta.get("mesh") or {}
    data_ways = 1
    if mesh_meta:
        axes = dict(zip(mesh_meta["axis_names"], mesh_meta["shape"]))
        data_ways = int(axes.get("data", 1))
    max_batch = max(batches)
    if getattr(args, "max_batch", None):
        if args.max_batch not in batches:
            raise SystemExit(
                f"--max-batch {args.max_batch} is not an exported batch "
                f"bucket (artifact has {batches})")
        max_batch = args.max_batch
    engine = BatchingEngine(
        ExportedEngineAdapter(ep), sampling, meta["seq_len"],
        max_batch=max_batch, max_wait_ms=args.max_wait_ms,
        bucket_seconds=min(samples) / 16000.0,
        max_seconds=max(samples) / 16000.0,
        batch_multiple=data_ways,
        request_timeout_s=getattr(args, "request_timeout_s", 600.0),
        pipeline_depth=getattr(args, "pipeline_depth", 2),
    )
    echo = {"model": "fddm-asr-tpu", "exported": args.exported,
            "seq_len": meta["seq_len"], **sampling,
            "max_batch": max_batch,
            # buckets served by a deserialized fused-kernel executable
            # (vs recompiled StableHLO) — perf-relevant, so surfaced
            "native_buckets": sorted(list(bn) for bn in ep.native)}
    loopback = args.host in ("127.0.0.1", "localhost", "::1")
    server = FDDMHTTPServer(
        (args.host, args.port),
        make_handler(engine, echo,
                     audio_root=getattr(args, "audio_root", None),
                     loopback_only_paths=not loopback))
    server.engine = engine
    if getattr(args, "warmup_seconds", None):
        # exported modules still compile at first .call on this relay —
        # warmup matters just as much as for the live pipeline
        _warmup(engine, args.warmup_seconds, max_batch)
    return server


def build_server(args) -> ThreadingHTTPServer:
    if getattr(args, "exported", None):
        return _build_exported_server(args)
    if not (args.config and args.ckpt):
        raise SystemExit("either --exported or both --config and --ckpt "
                         "are required")
    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from fddm_asr_tpu.tokenizer import load_tokenizer

    cfg = load_config(args.config)
    tokenizer = load_tokenizer(args.tokenizer or cfg.data.tokenizer_path)
    import jax.numpy as jnp

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
        getattr(args, "dtype", "config"))  # None -> config's model.dtype
    pipeline = FDDMPipeline.from_config(
        cfg, ckpt_path=args.ckpt, tokenizer=tokenizer,
        use_condition_mask=True,  # bucket padding must not alter transcripts
        dtype=dtype,
    )
    # engine wire-encodes at ingestion; _encode expands in-program
    pipeline.input_encoding = getattr(args, "wire_dtype", "f32")
    data_ways = 1
    if getattr(args, "mesh", ""):
        from train import parse_mesh
        from fddm_asr_tpu.parallel import make_mesh

        mesh = make_mesh(parse_mesh(args.mesh))
        pipeline.apply_mesh(mesh, seq_parallel=getattr(args, "seq_parallel", False))
        data_ways = int(mesh.shape.get("data", 1))
    inf = cfg.get("inference", {})
    sampling = {
        "T_infer": args.T_infer or inf.get("T_infer", 20),
        "r": args.r or inf.get("r", 5),
        "greedy": True,
        # passed through to the sampler AND echoed in results — must agree
        "posterior_mode": inf.get("posterior_mode", "average"),
    }
    if float(inf.get("repeat_penalty", 0.0)) > 0.0:
        # opt-in repetition-penalized final read-out (sampler.
        # argmax_repeat_penalized); config-driven so a model served with it
        # was evaluated with it
        sampling["repeat_penalty"] = float(inf["repeat_penalty"])
    if getattr(args, "num_candidates", 1) > 1:
        # best-of-N decoding (pipeline.transcribe_with_ids num_candidates):
        # candidates fold into the device batch, highest-confidence wins
        sampling["num_candidates"] = int(args.num_candidates)
    seq_len = args.seq_len or cfg.data.get("max_len", 64)
    engine = BatchingEngine(
        pipeline, sampling, seq_len,
        max_batch=args.max_batch or 16, max_wait_ms=args.max_wait_ms,
        bucket_seconds=args.bucket_seconds, max_seconds=args.max_seconds,
        batch_multiple=data_ways,
        request_timeout_s=getattr(args, "request_timeout_s", 600.0),
        pipeline_depth=getattr(args, "pipeline_depth", 2),
    )
    echo = {"model": "fddm-asr-tpu", "seq_len": seq_len, **sampling,
            "max_batch": args.max_batch or 16}
    # '' binds INADDR_ANY (all interfaces) — that is NOT loopback.
    loopback = args.host in ("127.0.0.1", "localhost", "::1")
    server = FDDMHTTPServer(
        (args.host, args.port),
        make_handler(engine, echo, audio_root=getattr(args, "audio_root", None),
                     loopback_only_paths=not loopback))
    server.engine = engine  # for tests / shutdown
    if getattr(args, "warmup_seconds", None):
        _warmup(engine, args.warmup_seconds, args.max_batch or 16)
    return server


def _warmup(engine: BatchingEngine, seconds_list: str, max_batch: int) -> None:
    """Pre-compile the hot programs before serving traffic.

    For each duration bucket in the comma-separated list, runs one silent
    batch at EVERY batch-bucket level the engine can produce (pow2 rounded
    to the mesh batch_multiple, up to max_batch) — sustained dynamic
    batching hits all of them, and any level left cold stalls mid-traffic
    for a full remote compile (this poisoned early live-serving
    benchmarks: B=1 and B=16 were warm but B=2/4/8 compiled in-window).
    The smallest bucket is batch_multiple, not 1 — under a data-sharded
    mesh a B=1 batch is both unshardable and a shape the engine never
    produces.  With the persistent compile cache this costs one remote
    compile per (B, T) ever; without warmup the first request at each
    shape stalls 30-60 s+."""
    import jax

    # mirror _dispatch exactly — with_confidence=True (real traffic always
    # sets it, and the device-confidence program is jitted separately from
    # the sampler: warming only the sampler leaves a compile mid-traffic)
    # and the raw-seed convention of AOT adapters.  rng counter untouched so
    # warmed and unwarmed servers still produce identical transcripts at the
    # same counter (CLAUDE.md serving invariant).
    takes_seed = getattr(engine.pipeline, "takes_seed", False)
    rng = 0 if takes_seed else jax.random.key(0)
    # mirror _dispatch's WIRE dtype too: a --wire-dtype pcm16/mulaw8 server
    # dispatches int16/uint8 buffers, and the encode program retraces per
    # input dtype — warming the f32 program would leave every real shape
    # cold (and falsely mark it warm for the cold-shape guard)
    enc = getattr(engine.pipeline, "input_encoding", "f32")
    if enc == "f32":
        wire_np = np.float32
        fill = 0
    else:
        from fddm_asr_tpu.data.wire import silence_value, wire_dtype

        wire_np = wire_dtype(enc)
        fill = silence_value(enc)
    for sec in (float(s) for s in str(seconds_list).split(",") if s):
        T = min(-(-int(sec * 16000) // engine.bucket) * engine.bucket,
                max(engine.max_samples, CONV_RECEPTIVE_FIELD))
        for B in sorted({engine._bucket_batch_size(n)
                         for n in range(1, max_batch + 1)}):
            t0 = time.perf_counter()
            wave = np.full((B, T), fill, wire_np)
            lengths = np.full((B,), min(1600, T), np.int64)
            engine.pipeline.transcribe_with_ids(
                wave, lengths, seq_len=engine.seq_len, rng=rng,
                with_confidence=True, **engine.sampling)
            engine._warm_shapes.add((B, T))
            # print: serve.py runs with an unconfigured root logger
            print(f"warmup B={B} T={T / 16000:.0f}s: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="FDDM-ASR-TPU inference server")
    ap.add_argument("--config", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--exported", default=None,
                    help="serve an AOT artifact (scripts/export_model.py) "
                         "instead of --config/--ckpt: modules are "
                         "pre-lowered, so cold start is one deserialize; "
                         "seq_len/sampling/buckets come from the artifact "
                         "meta and the corresponding flags are ignored")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=None,
                    help="largest device batch (default 16 for live "
                         "serving; for --exported artifacts the default is "
                         "the artifact's largest bucket — pass a smaller "
                         "value to cap it, e.g. for latency or a "
                         "throughput-vs-batch sweep)")
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="device batches in flight at once (1 = no "
                         "overlap, 2 = double buffering); deeper keeps the "
                         "device busy while older batches are decoded and "
                         "answered, at a small latency cost")
    ap.add_argument("--bucket-seconds", type=float, default=1.0)
    ap.add_argument("--max-seconds", type=float, default=30.0,
                    help="chunk window for long-form audio: longer uploads "
                         "are split into windows of this size (cut at the "
                         "quietest 25 ms frame near each edge), batched "
                         "alongside regular traffic, and the texts joined. "
                         "Each window decodes at most --seq-len tokens "
                         "(default: the model's data.max_len training cap) "
                         "— lower this if dense speech saturates seq_len")
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--T-infer", type=int, default=None)
    ap.add_argument("--r", type=int, default=None)
    ap.add_argument("--num-candidates", type=int, default=1,
                    help="best-of-N decoding: N trajectories per utterance "
                         "(folded into the device batch), highest-confidence "
                         "candidate served (live serving only — exported "
                         "artifacts bake their sampling)")
    ap.add_argument("--mesh", default="",
                    help="device-mesh spec for multi-chip serving, e.g. "
                         "data=4,model=2 — batch buckets round up to the "
                         "data-axis size (must divide --max-batch)")
    ap.add_argument("--seq-parallel", action="store_true",
                    help="with --mesh model=N>1: ring-attention sequence "
                         "parallelism in the encoder (see inference.py)")
    ap.add_argument("--device", default=None, help="cpu forces the CPU backend")
    ap.add_argument("--wire-dtype", choices=["f32", "pcm16", "mulaw8"],
                    default="f32",
                    help="wire dtype for batch audio uploads on the LIVE "
                         "serving path (exported artifacts bake theirs at "
                         "export --input-encoding): pcm16 halves, mulaw8 "
                         "quarters host->device bytes; pcm16 is lossless "
                         "for 16-bit-PCM sources, mulaw8 is telephone-"
                         "grade (see fddm_asr_tpu/data/wire.py)")
    ap.add_argument("--dtype", choices=["config", "bfloat16", "float32"],
                    default="config",
                    help="model compute dtype (live serving); config honors "
                         "the YAML's model.dtype — bfloat16 is the TPU "
                         "production setting")
    ap.add_argument("--request-timeout-s", type=float, default=600.0,
                    help="per-request wait bound; raise for fresh flagship "
                         "servers whose first request waits out the remote "
                         "XLA compile (can exceed 10 min here)")
    ap.add_argument("--warmup-seconds", default=None,
                    help="comma-separated duration buckets (e.g. '5,10,20') "
                         "to pre-compile at startup (every batch bucket up "
                         "to --max-batch each) so requests never stall on "
                         "the remote compile mid-traffic")
    ap.add_argument("--audio-root", default=None,
                    help="allowlisted directory for JSON {'path': ...} "
                         "requests; without it path mode only works on a "
                         "loopback bind")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.device == "cpu":
        from fddm_asr_tpu.runtime import force_cpu

        force_cpu()
    from fddm_asr_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    server = build_server(args)
    print(json.dumps({"serving": f"http://{args.host}:{server.server_address[1]}",
                      "endpoints": ["/v1/transcribe", "/v1/transcribe/stream",
                                    "/healthz", "/stats"]}))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.engine.shutdown()


if __name__ == "__main__":
    main()
