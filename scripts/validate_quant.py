#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Quantization validation harness: full-precision vs int8-MXU inference.

Loads one trained checkpoint twice — once with the stock encoder, once with
``wavlm_config.quant_dense="int8"`` (fddm_asr_tpu/ops/quant.py) — runs
jumpy-sampling transcription over a manifest, and reports per-variant CER
plus transcript agreement between the two.  This is the evidence gate for
enabling int8 on a deployment: the quantized encoder must not change
transcripts (or must change CER within a stated budget).

Usage:
  python scripts/validate_quant.py --config synth/config.yaml \
      --ckpt synth/ckpts/best_model.orbax --manifest synth/data/processed/test.json
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
    ap.add_argument("--manifest", required=True, help="manifest JSON with wav paths + text")
    ap.add_argument("--seq-len", type=int, default=None, help="default: data.max_len")
    ap.add_argument("--T-infer", type=int, default=None)
    ap.add_argument("--r", type=int, default=None)
    ap.add_argument("--device", default=None, help="cpu to force the CPU backend")
    ap.add_argument("--variants", default="fp,int8",
                    help="comma list; first is the baseline (fp|int8|int8_fused)")
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
    tokenizer = load_tokenizer(cfg.data.tokenizer_path)
    T_infer = args.T_infer or cfg.get("inference", {}).get("T_infer", 20)
    r = args.r or cfg.get("inference", {}).get("r", 5)
    seq_len = args.seq_len or cfg.data.get("max_len", 64)

    records = json.load(open(args.manifest, encoding="utf-8"))
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

    names = [v.strip() for v in args.variants.split(",") if v.strip()]
    # pcm16/mulaw8 gate the serving WIRE encodings (data/wire.py): the same
    # fp pipeline fed the host encode->decode roundtrip of its input — the
    # transcript-quality evidence for quoting lossy-wire serving throughput
    # (pcm16 is lossless for PCM-originated audio; mulaw8 is ~35-38 dB SNR)
    allowed = {"fp", "int8", "int8_fused", "int8_all", "pcm16", "mulaw8"}
    unknown = [n for n in names if n not in allowed]
    if unknown:
        sys.exit(f"unknown --variants {unknown}; allowed: {sorted(allowed)}")

    def _wire_roundtrip(wave_f32, encoding):
        from fddm_asr_tpu.data.wire import encode_wire, mulaw_decode_np

        coded = encode_wire(wave_f32, encoding)
        if encoding == "pcm16":
            return coded.astype(np.float32) / 32768.0
        return mulaw_decode_np(coded)

    variants = {}
    pipe_cache = {}
    for name in names:
        if name in ("pcm16", "mulaw8"):
            enc_quant, dec_quant = "none", "none"
            feed = _wire_roundtrip(batch, name)
        else:
            # "fp" = full precision; "int8"/"int8_fused" quantize the
            # encoder; "int8_all" quantizes encoder AND decoder
            enc_quant = "none" if name == "fp" else ("int8" if name == "int8_all" else name)
            dec_quant = "int8" if name == "int8_all" else "none"
            feed = batch
        vcfg = cfg.updated({"model": {
            "quant_dense": dec_quant,
            "encoder": {"wavlm_config": {"quant_dense": enc_quant}},
        }})
        # wire variants share the stock-fp pipeline — one build, one jit
        if (enc_quant, dec_quant) not in pipe_cache:
            pipe_cache[(enc_quant, dec_quant)] = FDDMPipeline.from_config(
                vcfg, ckpt_path=args.ckpt, tokenizer=tokenizer)
        pipe = pipe_cache[(enc_quant, dec_quant)]
        texts = pipe.transcribe(
            feed, lengths, seq_len=seq_len, T_infer=T_infer, r=r, greedy=True,
        )
        cer = float(np.mean([calculate_cer(rf, hy) for rf, hy in zip(refs, texts)]))
        variants[name] = {"texts": texts, "cer": cer}

    fp = variants[names[0]]
    report = {"n": len(refs), f"cer_{names[0]}": round(fp["cer"], 4)}
    diffs = []
    for name in names[1:]:
        q = variants[name]
        agree = float(np.mean([a == b for a, b in zip(fp["texts"], q["texts"])]))
        report[f"cer_{name}"] = round(q["cer"], 4)
        report[f"transcript_agreement_{name}" if len(names) > 2 else "transcript_agreement"] = round(agree, 4)
        diffs += [
            {"ref": rf, names[0]: a, name: b}
            for rf, a, b in zip(refs, fp["texts"], q["texts"]) if a != b
        ]
    report["disagreements"] = diffs[:10]
    report.update({"T_infer": T_infer, "r": r, "seq_len": seq_len})
    print(json.dumps(report, ensure_ascii=False))


if __name__ == "__main__":
    main()
