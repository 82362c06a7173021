#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Reference client for the true-streaming endpoint (serve.py
POST /v1/transcribe/stream).

Streams a WAV file to the server as raw pcm16 over a chunked upload —
optionally paced at a real-time factor to emulate live microphone audio —
and prints each NDJSON partial transcript the moment it arrives, then the
final aggregate.  Timing summary (time-to-first-partial, post-EOS
finalization latency) goes to stderr so stdout stays machine-parseable.

Usage:
  python scripts/stream_client.py --url http://127.0.0.1:8000 \
      --wav clip.wav [--pace 1.0] [--window-seconds 5] [--chunk-ms 100]

The duplex HTTP mechanics live in scripts/bench_serve.py::stream_post
(http.client cannot read a response while the request body is still
uploading, so the socket is hand-rolled there); this CLI is the
single-stream, human-facing wrapper around the same code path the
benchmark exercises.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from urllib.parse import urlsplit

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", required=True,
                    help="server base URL, e.g. http://127.0.0.1:8000")
    ap.add_argument("--wav", required=True, help="input WAV (any sample "
                    "rate; resampled to 16 kHz mono before upload)")
    ap.add_argument("--pace", type=float, default=1.0,
                    help="upload at PACE x real time (0 = as fast as "
                         "possible); default 1.0 emulates live audio")
    ap.add_argument("--window-seconds", type=float, default=None,
                    help="commit window (server clamps to its max)")
    ap.add_argument("--chunk-ms", type=float, default=100.0,
                    help="upload slice size in audio milliseconds")
    ap.add_argument("--timeout-s", type=float, default=600.0)
    args = ap.parse_args(argv)

    import numpy as np

    from fddm_asr_tpu.data.audio_io import load_audio
    from scripts.bench_serve import stream_post

    samples, _sr = load_audio(args.wav, target_sr=16000)
    pcm = (np.clip(samples, -1.0, 1.0) * 32767).astype("<i2").tobytes()

    u = urlsplit(args.url)
    host, port = u.hostname, u.port or 80

    def show(obj):
        print(json.dumps(obj, ensure_ascii=False), flush=True)

    rec = stream_post(host, port, pcm,
                      window_seconds=args.window_seconds, pace=args.pace,
                      chunk_ms=args.chunk_ms, timeout_s=args.timeout_s,
                      on_line=show)
    print(json.dumps({
        "audio_s": round(len(samples) / 16000.0, 2),
        "upload_s": round(rec["upload_s"], 2),
        "partials": rec["partials"],
        "first_partial_ms": (None if rec["first_partial_ms"] is None
                             else round(rec["first_partial_ms"], 1)),
        "final_after_eos_ms": round(rec["final_after_eos_ms"], 1),
    }), file=sys.stderr)
    return rec["final"]


if __name__ == "__main__":
    main()
