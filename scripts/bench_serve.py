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

Usage (defaults bench the flagship config on the default backend):
  python scripts/bench_serve.py --config <cfg> --ckpt <ckpt> \
      [--concurrency 8] [--duration-s 30] [--audio-seconds 10] [--device cpu]

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
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--T-infer", type=int, default=None)
    ap.add_argument("--r", type=int, default=None)
    ap.add_argument("--mesh", default="")
    ap.add_argument("--seq-parallel", action="store_true")
    ap.add_argument("--device", default=None)
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
        srv_argv = ["--exported", args.exported, "--port", "0",
                    "--max-wait-ms", str(args.max_wait_ms),
                    "--request-timeout-s", str(timeout_s)]
    elif args.config and args.ckpt:
        srv_argv = ([
            "--config", args.config, "--ckpt", args.ckpt,
            "--port", "0", "--max-batch", str(args.max_batch),
            "--max-wait-ms", str(args.max_wait_ms),
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
    warm = [threading.Thread(target=post) for _ in range(args.concurrency)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    baseline = srv.engine.stats_snapshot()

    stop = time.time() + args.duration_s

    def client():
        while time.time() < stop:
            post()

    clients = [threading.Thread(target=client) for _ in range(args.concurrency)]
    t0 = time.time()
    for t in clients:
        t.start()
    for t in clients:
        t.join()
    wall = time.time() - t0

    snap = srv.engine.stats_snapshot()
    requests = snap["requests"] - baseline["requests"]
    audio_s = snap["audio_seconds"] - baseline["audio_seconds"]
    result = {
        "metric": "serve_rtfx",
        # wall-clock RTFx of the whole serving stack under load (audio
        # seconds transcribed per second, batching + HTTP included)
        "value": round(audio_s / wall, 1) if wall > 0 else 0.0,
        "unit": "audio_s/s",
        "engine_rtfx_device": snap.get("rtfx"),
        "latency_ms": snap.get("latency_ms"),
        "mean_batch_size": snap.get("mean_batch_size"),
        "requests": requests,
        "errors": snap["errors"] - baseline["errors"],
        "offered_concurrency": args.concurrency,
        "audio_seconds_per_request": args.audio_seconds,
        "cold_start_s": {"build": round(build_s, 2),
                         "first_request": round(first_request_s, 2)},
        "serving": "exported" if args.exported else "live",
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))
    srv.shutdown()
    srv.engine.shutdown()


if __name__ == "__main__":
    main()
