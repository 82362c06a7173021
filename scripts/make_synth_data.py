#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Generate a tiny synthetic dataset + tokenizer + config for E2E smoke runs.

Creates under --out (default ./synth):
  data/processed/{train,validation,test}.json/.csv  (manifest schema of
      reference preprocess.py:515-525)
  data/processed/clips/*.wav                        (sine/noise mixtures)
  data/tokenizer/toy/spm_toy.{model,vocab} + vocab.json
  config.yaml                                       (tiny model + tiny WavLM)

Usage: python scripts/make_synth_data.py --out /tmp/synth --n 16
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTENCES = [
    "我們可以一起交流",
    "台灣的高速公路很大",
    "我們在台灣交流",
    "高速公路可以交流",
    "我們的交流道很大",
    "沒有問題可以交流",
    "一個大的交流道",
    "我們有一個問題",
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="synth")
    ap.add_argument("--n", type=int, default=16, help="utterances per split")
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--vocab-size", type=int, default=96)
    args = ap.parse_args(argv)

    from fddm_asr_tpu.data.audio_io import save_wav
    from fddm_asr_tpu.tokenizer.train_bpe import train_bpe, write_artifacts

    out = os.path.abspath(args.out)
    clips = os.path.join(out, "data/processed/clips")
    tok_dir = os.path.join(out, "data/tokenizer/toy")
    os.makedirs(clips, exist_ok=True)
    os.makedirs(tok_dir, exist_ok=True)

    # tokenizer ------------------------------------------------------------
    # cap piece length so sentences tokenize to several tokens (a toy vocab
    # over 8 sentences would otherwise merge each whole sentence into one
    # piece, degenerating the sequence-modeling task)
    model = train_bpe(SENTENCES * 10, vocab_size=args.vocab_size, max_piece_length=2)
    prefix = os.path.join(tok_dir, "spm_toy")
    write_artifacts(model, prefix, vocab_json_path=os.path.join(tok_dir, "vocab.json"))

    # audio + manifests ----------------------------------------------------
    rng = np.random.default_rng(0)
    sr = 16000
    for split in ("train", "validation", "test"):
        records = []
        for i in range(args.n):
            text = SENTENCES[i % len(SENTENCES)]
            t = np.arange(int(args.seconds * sr)) / sr
            f0 = 200 + 50 * (i % 8)
            wav = 0.3 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(len(t))
            path = os.path.join(clips, f"{split}_{i:03d}.wav")
            save_wav(path, wav.astype(np.float32), sr)
            records.append({
                "path": path, "sentence": text, "text": text,
                "duration": args.seconds, "processed_path": path,
                "language": "zh-TW", "dataset": "synth", "split": split,
                "audio_hash": None,
            })
        jpath = os.path.join(out, f"data/processed/{split}.json")
        json.dump(records, open(jpath, "w", encoding="utf-8"), ensure_ascii=False, indent=1)
        with open(jpath.replace(".json", ".csv"), "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=list(records[0].keys()))
            w.writeheader()
            w.writerows(records)

    # config ---------------------------------------------------------------
    config = f"""seed: 7
data:
  sample_rate: 16000
  max_seconds: {args.seconds}
  pad_id: 0
  max_len: 24
  train_json: {out}/data/processed/train.json
  val_json: {out}/data/processed/validation.json
  test_json: {out}/data/processed/test.json
  tokenizer_path: {prefix}.model
  vocab_size: {args.vocab_size}
model:
  d_model: 32
  nhead: 4
  num_layers: 2
  dim_ff: 64
  dropout: 0.1
  encoder:
    wavlm_name: tiny
    freeze: true
    proj: linear
    pooling: none
  projector:
    d_proj: 16
diffusion:
  T: 50
  beta_max: 0.2
inference:
  T_infer: 8
  r: 4
optim:
  batch_size: 4
  lr: 2.0e-4
  weight_decay: 0.01
  num_epochs: 1
  grad_accum_steps: 1
  warmup_steps: 0
  dtype: float32
lfd:
  lambda_offdiag: 5.0e-3
  n_step_fd: 2
  tau: 1.0
log:
  log_every: 2
  ckpt_dir: {out}/ckpts
"""
    with open(os.path.join(out, "config.yaml"), "w") as f:
        f.write(config)

    # convergence recipe --------------------------------------------------
    # The smoke config above runs 1 epoch; this variant is the measured
    # recipe that actually LEARNS the toy corpus end to end (val CER ~0.03
    # by epoch ~250 on one v5e chip; see README).  The deltas matter:
    #   * eos_id set -> fixed-seq_len decoding terminates (without eos the
    #     decode never stops and CER floors on trailing insertions);
    #   * a strong schedule (T=20, beta_max=0.6) -> enough corrupted
    #     positions per step for the posterior-KL to carry signal at toy
    #     scale (the KL is x0hat-insensitive where x_t == x0);
    #   * T_infer == T_train -> exact-mode sampling (which walks the
    #     TRAINING beta table with inference-axis t, reference quirk #4)
    #     stays calibrated.
    convergence = f"""base_config: {out}/config.yaml
data:
  eos_id: 2
diffusion:
  T: 20
  beta_max: 0.6
inference:
  T_infer: 20
  r: 5
  greedy: true
  sampling_mode: exact
optim:
  lr: 1.0e-3
  num_epochs: 300
  mask_pad_loss: true
log:
  log_every: 20
"""
    with open(os.path.join(out, "config_convergence.yaml"), "w") as f:
        f.write(convergence)
    print(f"synthetic dataset ready under {out}")
    print(f"  smoke config:       {out}/config.yaml  (1 epoch)")
    print(f"  convergence recipe: {out}/config_convergence.yaml  "
          "(300 epochs; reaches val CER ~0.03 on the toy corpus)")


if __name__ == "__main__":
    main()
