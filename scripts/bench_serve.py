#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Serving-layer load benchmark: saturated RTFx + request latency under
concurrent traffic through the real HTTP stack.

Complements bench.py (single jitted-program throughput): this measures what
a DEPLOYMENT delivers — dynamic batching efficiency (mean batch size vs
offered concurrency), end-to-end request latency percentiles, and the
engine's device-side RTFx — by standing up serve.py in-process and firing
N concurrent synthetic utterances at it for a fixed wall-clock window.

Prints one JSON line:
  {"metric": "serve_rtfx", "value": ..., "unit": "audio_s/s",
   "latency_ms": {...}, "mean_batch_size": ..., "requests": ...,
   "offered_concurrency": ..., "platform": ...}

`--stream` benches the TRUE-streaming endpoint (POST /v1/transcribe/stream)
instead: each client pushes pcm16 over a chunked upload (optionally paced at
`--pace` x real time) while reading NDJSON partials off the same socket, and
the line reports the latencies that matter for live audio —
time-to-first-partial from stream start and finalization latency after the
last byte (p50/p95), plus the same saturated RTFx.

Usage (defaults bench the flagship config on the default backend):
  python scripts/bench_serve.py --config <cfg> --ckpt <ckpt> \
      [--concurrency 8] [--duration-s 30] [--audio-seconds 10] [--device cpu] \
      [--stream [--pace 1.0] [--window-seconds 2.0] [--chunk-ms 100]]

The reference has no serving layer (SURVEY §2.1) — there is no reference
number to compare against; bench_train/bench.py carry the model-level
anchors.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import struct
import sys
import threading
import time
import urllib.request
import wave as wave_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _wav_bytes(seconds: float, seed: int, sr: int = 16000) -> bytes:
    import numpy as np

    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(int(seconds * sr)) * 3000).astype("<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _percentiles(vals, pts=(50, 95)):
    import numpy as np

    if not vals:
        return {f"p{p}": None for p in pts}
    return {f"p{p}": round(float(np.percentile(vals, p)), 1) for p in pts}


def stream_post(host: str, port: int, pcm: bytes, *,
                window_seconds=None, pace: float = 0.0,
                chunk_ms: float = 100.0, timeout_s: float = 300.0,
                fmt: str = "pcm16", on_line=None) -> dict:
    """One POST /v1/transcribe/stream over a raw socket, reading NDJSON
    partials CONCURRENTLY with the chunked upload (http.client cannot read a
    response before the request body ends, so the duplex path is hand-rolled
    here exactly as a live-audio client would).

    pcm is little-endian int16 mono 16 kHz.  ``pace`` throttles the upload
    to ``pace`` x real time (0 = firehose).  Returns per-request timings:
    time-to-first-partial from the first byte sent, finalization latency
    after the last byte, partial count, and the final aggregate object.
    """
    import socket

    path = f"/v1/transcribe/stream?format={fmt}"
    if window_seconds is not None:
        path += f"&window-seconds={window_seconds}"
    byte_rate = 32000 if fmt == "pcm16" else 64000  # 16 kHz mono
    sock = socket.create_connection((host, port), timeout=timeout_s)
    try:
        sock.sendall((
            f"POST {path} HTTP/1.1\r\n"
            f"Host: {host}\r\n"
            "Transfer-Encoding: chunked\r\n"
            "Content-Type: application/octet-stream\r\n\r\n"
        ).encode())

        rec = {"lines": [], "t_lines": [], "status": None, "complete": False,
               "error_body": None}

        def reader():
            f = sock.makefile("rb")
            status = f.readline()
            rec["status"] = int(status.split()[1]) if status else None
            headers = {}
            while True:
                h = f.readline().strip()
                if not h:
                    break
                k, _, v = h.partition(b":")
                headers[k.strip().lower()] = v.strip()
            chunked = (headers.get(b"transfer-encoding", b"").lower()
                       == b"chunked")
            if rec["status"] != 200 or not chunked:
                # error replies come with Content-Length, not chunking —
                # read the body so the caller can surface the server's
                # JSON error instead of a chunk-parse crash
                n = int(headers.get(b"content-length", b"0") or b"0")
                rec["error_body"] = f.read(n).decode("utf-8", "replace")
                return
            # server frames one NDJSON line per chunk (_ndjson_line)
            buf = b""
            while True:
                size_line = f.readline()
                if not size_line:
                    break  # EOF without terminal chunk: incomplete
                size = int(size_line.split(b";")[0].strip() or b"0", 16)
                if size == 0:
                    rec["complete"] = True
                    break
                buf += f.read(size)
                f.read(2)  # CRLF
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if line.strip():
                        rec["t_lines"].append(time.perf_counter())
                        obj = json.loads(line)
                        rec["lines"].append(obj)
                        if on_line is not None:
                            on_line(obj)

        rt = threading.Thread(target=reader, daemon=True)
        t0 = time.perf_counter()
        rt.start()
        # upload in chunk_ms slices of audio
        width = 2 if fmt == "pcm16" else 4
        step = max(width,
                   int(byte_rate * chunk_ms / 1000.0) // width * width)
        try:
            for i in range(0, len(pcm), step):
                blk = pcm[i:i + step]
                sock.sendall(b"%X\r\n" % len(blk) + blk + b"\r\n")
                if pace > 0:
                    # sleep off whatever real-time budget this slice has left
                    due = t0 + (i + len(blk)) / byte_rate / pace
                    delay = due - time.perf_counter()
                    if delay > 0:
                        time.sleep(delay)
            sock.sendall(b"0\r\n\r\n")
        except OSError:
            # server rejected mid-upload (early error response closes the
            # socket) — let the reader's captured reply explain, not the pipe
            rt.join(timeout=10.0)
            raise RuntimeError(
                f"server closed stream: status={rec['status']} "
                f"body={rec['error_body'] or rec['lines'][-1:]}") from None
        t_eos = time.perf_counter()
        rt.join(timeout=timeout_s)
        if rt.is_alive():
            raise TimeoutError("streaming response did not finish")
        if rec["status"] != 200 or rec["error_body"] is not None:
            raise RuntimeError(f"stream failed: status={rec['status']} "
                               f"body={rec['error_body']!r}")
        if not rec["complete"]:
            # EOF before the terminal 0-chunk: the last partial must NOT be
            # mistaken for the final aggregate
            raise RuntimeError(
                "stream ended without terminal chunk (connection dropped); "
                f"got {len(rec['lines'])} lines")
        if not rec["lines"]:
            raise RuntimeError("stream failed: no response lines")
        final = rec["lines"][-1]
        if "error" in final:
            raise RuntimeError(f"stream error: {final['error']}")
        partials = rec["lines"][:-1]
        return {
            "first_partial_ms": ((rec["t_lines"][0] - t0) * 1e3
                                 if partials else None),
            "final_after_eos_ms": (rec["t_lines"][-1] - t_eos) * 1e3,
            "upload_s": t_eos - t0,
            "partials": len(partials),
            "final": final,
        }
    finally:
        sock.close()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--exported", default=None,
                    help="bench an AOT artifact (serve.py --exported) "
                         "instead of --config/--ckpt; cold_start_s then "
                         "measures deserialize instead of trace+compile")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--concurrency", type=int, default=8,
                    help="closed-loop clients (each fires its next request "
                         "as soon as the previous returns)")
    ap.add_argument("--duration-s", type=float, default=30.0,
                    help="measurement window after warmup")
    ap.add_argument("--audio-seconds", type=float, default=10.0)
    ap.add_argument("--max-batch", type=int, default=None,
                    help="serve.py --max-batch (default: 16 live, the "
                         "artifact's largest bucket for --exported)")
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="engine batches in flight at once (serve.py "
                         "--pipeline-depth); sweep this with --max-batch "
                         "and --concurrency to find the throughput knee")
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--T-infer", type=int, default=None)
    ap.add_argument("--r", type=int, default=None)
    ap.add_argument("--mesh", default="")
    ap.add_argument("--seq-parallel", action="store_true")
    ap.add_argument("--device", default=None)
    ap.add_argument("--direct", action="store_true",
                    help="drive BatchingEngine.submit directly (no HTTP, "
                         "no WAV decode): isolates engine+device capacity "
                         "from the Python HTTP stack on 1-core hosts")
    ap.add_argument("--stream", action="store_true",
                    help="bench POST /v1/transcribe/stream (duplex chunked "
                         "upload + NDJSON partials) instead of the batch "
                         "endpoint")
    ap.add_argument("--pace", type=float, default=0.0,
                    help="throttle each upload to PACE x real time "
                         "(0 = as fast as possible); 1.0 emulates live "
                         "microphone audio")
    ap.add_argument("--window-seconds", type=float, default=None,
                    help="streaming commit window; must be < --audio-seconds "
                         "for partials to exist (defaults to the server's "
                         "max window)")
    ap.add_argument("--chunk-ms", type=float, default=100.0,
                    help="upload slice size in audio milliseconds")
    ap.add_argument("--repeats", type=int, default=1,
                    help="N consecutive measured windows on the same warm "
                         "server; reports per-window values + median/IQR. "
                         "Single windows here are NOT quotable: identical "
                         "configs measured 87-1114 audio_s/s across relay "
                         "weather (docs/bench_serve_r03.json)")
    ap.add_argument("--concurrency-sweep", default=None,
                    help="comma list of offered concurrencies (e.g. "
                         "'1,2,4,8,16'): one result row each at fixed "
                         "pipeline depth — the throughput-vs-concurrency "
                         "knee curve.  Overrides --concurrency")
    args = ap.parse_args(argv)
    if args.exported and (args.config or args.ckpt):
        ap.error("--exported and --config/--ckpt are mutually exclusive "
                 "(they select different serving paths)")

    if args.device and args.device.startswith("cpu"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from fddm_asr_tpu.runtime import enable_compile_cache

    enable_compile_cache()  # remote compiles are 30 s-10 min; persist them

    import serve

    # first-request cold start waits out param placement + the remote XLA
    # compile — give it the same generous bound serve.py users would set
    timeout_s = 1800.0
    if args.exported:
        srv_argv = (["--exported", args.exported, "--port", "0",
                    "--max-wait-ms", str(args.max_wait_ms),
                    "--pipeline-depth", str(args.pipeline_depth),
                    "--request-timeout-s", str(timeout_s)]
                    + (["--max-batch", str(args.max_batch)]
                       if args.max_batch else []))
    elif args.config and args.ckpt:
        srv_argv = ([
            "--config", args.config, "--ckpt", args.ckpt,
            "--port", "0", "--max-batch", str(args.max_batch or 16),
            "--max-wait-ms", str(args.max_wait_ms),
            "--pipeline-depth", str(args.pipeline_depth),
            "--request-timeout-s", str(timeout_s),
        ] + (["--tokenizer", args.tokenizer] if args.tokenizer else [])
          + (["--seq-len", str(args.seq_len)] if args.seq_len else [])
          + (["--T-infer", str(args.T_infer)] if args.T_infer else [])
          + (["--r", str(args.r)] if args.r else [])
          + (["--mesh", args.mesh] if args.mesh else [])
          + (["--seq-parallel"] if args.seq_parallel else [])
          # server-side warmup compiles EVERY batch-bucket level at this
          # duration before traffic; without it the intermediate pow2
          # buckets (B=2/4/8) compile mid-window and poison the numbers
          + ["--warmup-seconds", str(args.audio_seconds)])
    else:
        ap.error("either --exported or both --config and --ckpt")
    srv_args = serve.parse_args(srv_argv)
    t_boot = time.perf_counter()
    srv = serve.build_server(srv_args)
    build_s = time.perf_counter() - t_boot
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    if args.stream:
        _bench_stream(args, srv, t_boot, build_s, timeout_s)
        return
    if args.direct:
        _bench_direct(args, srv, t_boot, build_s)
        return
    body = _wav_bytes(args.audio_seconds, seed=0)

    def post():
        req = urllib.request.Request(
            base + "/v1/transcribe", data=body,
            headers={"Content-Type": "audio/wav"})
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as r:
                return json.loads(r.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            # surface the engine's error body — a blind "HTTP 500" hides
            # the actual device/compile failure
            raise RuntimeError(
                f"server returned {e.code}: {e.read().decode('utf-8')}"
            ) from None

    # warmup: compile every (duration-bucket, batch-bucket) shape the run
    # will touch — one solo request (B=1) and one full-concurrency wave.
    # The first request is the cold start: with --exported it pays a
    # deserialize, a live pipeline pays trace + (remote) compile.
    post()
    first_request_s = time.perf_counter() - t_boot
    warm_errors = []

    def _warm():
        try:
            post()
        except Exception as e:
            warm_errors.append(str(e))

    warm = [threading.Thread(target=_warm) for _ in range(args.concurrency)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    if warm_errors:
        raise RuntimeError(
            f"{len(warm_errors)} warm-phase request(s) failed — buckets are "
            f"cold, aborting before the measured window: {warm_errors[0]}")

    sweep = ([int(c) for c in args.concurrency_sweep.split(",")]
             if args.concurrency_sweep else [args.concurrency])
    for concurrency in sweep:
        windows = [
            _measured_window(post, srv, concurrency, args.duration_s)
            for _ in range(max(1, args.repeats))
        ]
        vals = sorted(w["value"] for w in windows)
        n = len(vals)
        snap = srv.engine.stats_snapshot()
        result = {
            "metric": "serve_rtfx",
            # wall-clock RTFx of the whole serving stack under load (audio
            # seconds transcribed per second, batching + HTTP included).
            # With --repeats > 1 the headline value is the MEDIAN of N
            # windows (steady-state methodology: single windows swing with
            # relay weather; the per-window wait_ms column is the covariate)
            "value": vals[n // 2],
            "unit": "audio_s/s",
            "windows": [w["value"] for w in windows],
            "window_wait_ms": [w.get("wait_ms") for w in windows],
            "iqr": ([vals[n // 4], vals[(3 * n) // 4]] if n >= 4 else None),
            "engine_rtfx_device": snap.get("rtfx"),
            "stage_ms": snap.get("stage_ms"),
            "latency_ms": snap.get("latency_ms"),
            "mean_batch_size": snap.get("mean_batch_size"),
            "requests": sum(w["requests"] for w in windows),
            "errors": sum(w["errors"] for w in windows),
            "offered_concurrency": concurrency,
            "pipeline_depth": args.pipeline_depth,
            "audio_seconds_per_request": args.audio_seconds,
            "cold_start_s": {"build": round(build_s, 2),
                             "first_request": round(first_request_s, 2)},
            "serving": "exported" if args.exported else "live",
            "platform": jax.devices()[0].platform,
        }
        print(json.dumps(result), flush=True)
    srv.shutdown()
    srv.engine.shutdown()


def _stage_sum_ms(snap, stage: str) -> float:
    """Cumulative per-stage milliseconds from a stats snapshot (the snapshot
    exposes the running MEAN; mean x batches recovers the sum)."""
    if not snap.get("stage_ms") or not snap.get("batches"):
        return 0.0
    return snap["stage_ms"].get(stage, 0.0) * snap["batches"]


def _measured_window(post, srv, concurrency: int, duration_s: float) -> dict:
    """One measured window at a given offered concurrency; returns the
    window's wall-clock audio_s/s plus its mean per-batch device-wait ms —
    the relay-weather covariate that explains window-to-window spread."""
    baseline = srv.engine.stats_snapshot()
    stop = time.time() + duration_s

    def client():
        while time.time() < stop:
            post()

    clients = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.time()
    for t in clients:
        t.start()
    for t in clients:
        t.join()
    wall = time.time() - t0
    snap = srv.engine.stats_snapshot()
    audio_s = snap["audio_seconds"] - baseline["audio_seconds"]
    d_batches = snap["batches"] - baseline["batches"]
    d_wait = _stage_sum_ms(snap, "wait") - _stage_sum_ms(baseline, "wait")
    return {
        "value": round(audio_s / wall, 1) if wall > 0 else 0.0,
        "requests": snap["requests"] - baseline["requests"],
        "errors": snap["errors"] - baseline["errors"],
        "wait_ms": round(d_wait / d_batches, 1) if d_batches else None,
    }


def _bench_stream(args, srv, t_boot, build_s, timeout_s):
    """Closed-loop streaming load: each client repeatedly streams one
    utterance through /v1/transcribe/stream, reading partials while
    uploading.  Reports saturated RTFx + the live-audio latencies."""
    import numpy as np

    import jax

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(int(args.audio_seconds * 16000))
           * 3000).astype("<i2").tobytes()
    host, port = "127.0.0.1", srv.server_address[1]
    kw = dict(window_seconds=args.window_seconds, pace=args.pace,
              chunk_ms=args.chunk_ms, timeout_s=timeout_s)

    # cold start: the first stream compiles/deserializes its duration
    # bucket; then one full-concurrency wave warms every batch bucket
    stream_post(host, port, pcm, **kw)
    first_request_s = time.perf_counter() - t_boot
    warm_errors = []

    def _warm():
        try:
            stream_post(host, port, pcm, **kw)
        except Exception as e:  # a cold bucket would poison the window
            warm_errors.append(str(e))

    warm = [threading.Thread(target=_warm) for _ in range(args.concurrency)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    if warm_errors:
        raise RuntimeError(
            f"{len(warm_errors)} warm-phase stream(s) failed — buckets are "
            f"cold, aborting before the measured window: {warm_errors[0]}")
    baseline = srv.engine.stats_snapshot()

    stop = time.time() + args.duration_s
    records, errors = [], []
    lock = threading.Lock()

    def client():
        while time.time() < stop:
            try:
                r = stream_post(host, port, pcm, **kw)
                with lock:
                    records.append(r)
            except Exception as e:  # keep the window honest: count, go on
                with lock:
                    errors.append(str(e))

    clients = [threading.Thread(target=client)
               for _ in range(args.concurrency)]
    t0 = time.time()
    for t in clients:
        t.start()
    for t in clients:
        t.join()
    wall = time.time() - t0

    snap = srv.engine.stats_snapshot()
    audio_s = snap["audio_seconds"] - baseline["audio_seconds"]
    first = [r["first_partial_ms"] for r in records
             if r["first_partial_ms"] is not None]
    result = {
        "metric": "serve_stream_rtfx",
        "value": round(audio_s / wall, 1) if wall > 0 else 0.0,
        "unit": "audio_s/s",
        # what a live-audio user feels: first partial after stream start,
        # and the wait for the final transcript once the mic closes
        "first_partial_ms": _percentiles(first),
        "final_after_eos_ms": _percentiles(
            [r["final_after_eos_ms"] for r in records]),
        "partials_per_stream": (round(float(np.mean(
            [r["partials"] for r in records])), 2) if records else None),
        "streams": len(records),
        "errors": len(errors) + (snap["errors"] - baseline["errors"]),
        "mean_batch_size": snap.get("mean_batch_size"),
        "offered_concurrency": args.concurrency,
        "audio_seconds_per_request": args.audio_seconds,
        "pace": args.pace,
        "window_seconds": args.window_seconds,
        "cold_start_s": {"build": round(build_s, 2),
                         "first_request": round(first_request_s, 2)},
        "serving": "exported" if args.exported else "live",
        "platform": jax.devices()[0].platform,
    }
    if errors:
        result["first_error"] = errors[0]
    print(json.dumps(result))
    srv.shutdown()
    srv.engine.shutdown()




def _bench_direct(args, srv, t_boot, build_s):
    """Engine-level load: concurrency threads call engine.submit with
    pre-decoded float32 audio.  No sockets, no WAV parse, no JSON — the
    number is what the batching engine + device deliver; the delta vs the
    default (HTTP) mode is the Python web-stack cost on this host."""
    import numpy as np

    import jax

    eng = srv.engine
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(int(args.audio_seconds * 16000)) * 0.1
            ).astype(np.float32)

    eng.submit(wave, "warm0.wav")
    first_request_s = time.perf_counter() - t_boot
    warm_errors = []

    def _warm():
        r = eng.submit(wave, "warm.wav")
        if "error" in r:
            warm_errors.append(r["error"])

    warm = [threading.Thread(target=_warm) for _ in range(args.concurrency)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    if warm_errors:
        raise RuntimeError(f"warm-phase failed: {warm_errors[0]}")
    baseline = eng.stats_snapshot()

    stop = time.time() + args.duration_s

    def client(i):
        while time.time() < stop:
            r = eng.submit(wave, f"c{i}.wav")
            if "error" in r:
                raise RuntimeError(r["error"])

    clients = [threading.Thread(target=client, args=(i,))
               for i in range(args.concurrency)]
    t0 = time.time()
    for t in clients:
        t.start()
    for t in clients:
        t.join()
    wall = time.time() - t0

    snap = eng.stats_snapshot()
    audio_s = snap["audio_seconds"] - baseline["audio_seconds"]
    print(json.dumps({
        "metric": "serve_direct_rtfx",
        "value": round(audio_s / wall, 1) if wall > 0 else 0.0,
        "unit": "audio_s/s",
        "stage_ms": snap.get("stage_ms"),
        "latency_ms": snap.get("latency_ms"),
        "mean_batch_size": snap.get("mean_batch_size"),
        "requests": snap["requests"] - baseline["requests"],
        "errors": snap["errors"] - baseline["errors"],
        "offered_concurrency": args.concurrency,
        "audio_seconds_per_request": args.audio_seconds,
        "pipeline_depth": args.pipeline_depth,
        "max_batch": args.max_batch,
        "cold_start_s": {"build": round(build_s, 2),
                         "first_request": round(first_request_s, 2)},
        "serving": ("exported" if args.exported else "live") + "+direct",
        "platform": jax.devices()[0].platform,
    }))
    srv.shutdown()
    eng.shutdown()


if __name__ == "__main__":
    main()
