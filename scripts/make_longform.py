#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Build a long-form (multi-minute) test utterance from a manifest.

Concatenates manifest clips with short silence gaps into ONE WAV plus its
combined reference transcript — the input for the long-form chunked
inference datapoint (inference.py --chunk-seconds / --chunk-align silence):
the silence gaps give the silence-aligned chunker real cut points, the way
inter-sentence pauses do in real long recordings.

Usage:
  python scripts/make_longform.py --manifest val.json --out long.wav \
      --minutes 5 [--gap-ms 300] [--seed 0]
Prints a JSON line with the wav path, duration, and reference text.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--out", required=True, help="output WAV path")
    ap.add_argument("--minutes", type=float, default=5.0,
                    help="target duration (clips repeat if needed)")
    ap.add_argument("--gap-ms", type=float, default=300.0,
                    help="silence between clips")
    ap.add_argument("--seed", type=int, default=0,
                    help="clip order shuffle seed")
    ap.add_argument("--sr", type=int, default=16000)
    args = ap.parse_args(argv)

    import numpy as np

    from fddm_asr_tpu.data.audio_io import load_audio, save_wav

    records = json.load(open(args.manifest, encoding="utf-8"))
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(records))

    target = int(args.minutes * 60 * args.sr)
    gap = np.zeros(int(args.gap_ms / 1e3 * args.sr), np.float32)
    pieces, texts, total = [], [], 0
    i = 0
    while True:
        rec = records[int(order[i % len(order)])]
        wav, _ = load_audio(rec["processed_path"], target_sr=args.sr,
                            mono=True)
        if pieces and total + len(wav) > target:
            break  # never truncate mid-clip: audio and ref must agree
        pieces += [wav.astype(np.float32), gap]
        texts.append(rec.get("text") or rec.get("sentence") or "")
        total += len(wav) + len(gap)
        i += 1
    long_wav = np.concatenate(pieces)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_wav(args.out, long_wav, args.sr)

    ref = "".join(texts)
    meta = {
        "wav": os.path.abspath(args.out),
        "seconds": round(len(long_wav) / args.sr, 1),
        "clips": i,
        "ref_text": ref,
        "manifest": args.manifest,
        "seed": args.seed,
    }
    ref_path = args.out + ".ref.json"
    with open(ref_path, "w", encoding="utf-8") as f:
        json.dump(meta, f, ensure_ascii=False)
    print(json.dumps({k: v for k, v in meta.items() if k != "ref_text"}
                     | {"ref_chars": len(ref), "ref_json": ref_path},
                     ensure_ascii=False))


if __name__ == "__main__":
    main()
