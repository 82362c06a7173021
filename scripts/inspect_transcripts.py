#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Decode a manifest with a trained checkpoint and show ref vs hyp per
utterance — the failure-mode diagnosis tool for convergence runs.

The two round-1 documented failure signatures look identical in aggregate
CER but completely different here:
  * constant-token collapse (L_fd-dominated, logits driven uniform):
    every hyp is the same token repeated (often all-unk / empty);
  * insertion floor (missing eos / free-running tail): hyps contain the
    right content followed by garbage insertions, CER ~2-5.

Usage:
  python scripts/inspect_transcripts.py --config run.yaml \
      --ckpt ckpts/best_model.orbax [--manifest val.json] [--n 8] \
      [--json out.json]
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
    ap.add_argument("--config", required=True, help="training config.yaml")
    ap.add_argument("--ckpt", required=True, help="orbax dir or .pt checkpoint")
    ap.add_argument("--manifest", default=None,
                    help="default: the config's data.val_json")
    ap.add_argument("--n", type=int, default=8, help="utterances to decode")
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--T-infer", type=int, default=None)
    ap.add_argument("--r", type=int, default=None)
    ap.add_argument("--device", default=None, help="cpu to force CPU backend")
    ap.add_argument("--json", default=None, help="also write a JSON artifact")
    args = ap.parse_args(argv)

    from fddm_asr_tpu.runtime import enable_compile_cache, force_cpu

    if args.device == "cpu":
        force_cpu()
    enable_compile_cache()

    import numpy as np

    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.data.audio_io import load_audio
    from fddm_asr_tpu.eval import calculate_cer
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from fddm_asr_tpu.tokenizer import load_tokenizer

    cfg = load_config(args.config)
    manifest = args.manifest or cfg.data.get("val_json")
    if not manifest or not os.path.exists(manifest):
        sys.exit(f"manifest not found: {manifest!r}")
    tokenizer = load_tokenizer(cfg.data.tokenizer_path)
    T_infer = args.T_infer or cfg.get("inference", {}).get("T_infer", 20)
    r = args.r or cfg.get("inference", {}).get("r", 5)
    seq_len = args.seq_len or cfg.data.get("max_len", 64)

    records = json.load(open(manifest, encoding="utf-8"))[: args.n]
    waves, refs = [], []
    for rec in records:
        wav, _ = load_audio(rec["processed_path"], target_sr=16000, mono=True)
        waves.append(wav)
        refs.append(rec.get("text") or rec.get("sentence") or "")
    T = max(len(w) for w in waves)
    batch = np.zeros((len(waves), T), np.float32)
    lengths = np.asarray([len(w) for w in waves])
    for i, w in enumerate(waves):
        batch[i, : len(w)] = w

    pipe = FDDMPipeline.from_config(cfg, ckpt_path=args.ckpt,
                                    tokenizer=tokenizer)
    import jax

    c, c_mask = pipe.encode_waveform(batch, lengths)
    ids, p = pipe.sample(jax.random.key(0), c, seq_len, c_mask,
                         T_infer=T_infer, r=r, greedy=True)
    hyps = [pipe.ids_to_text(ids[i]) for i in range(ids.shape[0])]
    # posterior shape stats: uniform-collapse shows entropy ~ ln(K) with a
    # tiny argmax margin; a confidently-wrong model shows low entropy
    p = np.asarray(p, np.float64)
    ent = float(np.mean(-(p * np.log(p + 1e-12)).sum(-1)))
    top2 = np.sort(p, axis=-1)[..., -2:]
    margin = float(np.mean(top2[..., 1] - top2[..., 0]))

    rows = []
    for ref, hyp in zip(refs, hyps):
        cer = calculate_cer(ref, hyp)
        rows.append({"ref": ref, "hyp": hyp, "cer": round(cer, 4)})
        print(f"CER {cer:6.3f} | ref: {ref!r}")
        print(f"           | hyp: {hyp!r}")

    cers = [r_["cer"] for r_ in rows]
    # collapse diagnosis: distinct non-empty hyps == 1 means every
    # utterance decodes to the same string — the uniform-logits signature
    distinct = len({r_["hyp"] for r_ in rows})
    summary = {
        "n": len(rows), "mean_cer": round(float(np.mean(cers)), 4),
        "distinct_hyps": distinct,
        "constant_collapse": distinct == 1,
        "empty_hyps": sum(1 for r_ in rows if not r_["hyp"]),
        "p_x0_entropy": round(ent, 4),
        "p_x0_entropy_uniform": round(float(np.log(p.shape[-1])), 4),
        "p_x0_argmax_margin": round(margin, 6),
        "T_infer": T_infer, "r": r, "seq_len": seq_len,
        "ckpt": args.ckpt,
    }
    print(json.dumps(summary, ensure_ascii=False))
    if args.json:
        with open(args.json, "w", encoding="utf-8") as f:
            json.dump({"summary": summary, "rows": rows}, f,
                      ensure_ascii=False, indent=1)


if __name__ == "__main__":
    main()
