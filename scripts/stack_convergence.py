#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Integrated round-2 training-stack convergence artifact.

Runs the calibrated toy convergence recipe (scripts/cer_parity_experiment.py
— the one whose rebuild side reaches val CER 0.0) with the round-2
training features enabled AT ONCE, to demonstrate they compose:

  * sparse KL (training default),
  * frozen-encoder feature cache (data.cache_features),
  * EMA weights + EMA eval/export (optim.ema_decay, f32),
  * bf16 Adam first moment (optim.adam_mu_dtype),
  * async orbax checkpointing (log.async_checkpoint),
  * metrics JSONL telemetry (log.metrics_jsonl),
  * early stopping armed (large patience — must NOT fire spuriously).

Measured ablations on this knife-edge toy (700 epochs, val CER):
  io-only 0.0 @ ep595 · +EMA(f32) 0.0 @ ep525 · +bf16 mu 0.0 @ ep560
  · +bf16 EMA STORAGE 0.91 (!) · +cosine decay on top 1.86 (!)
Two knobs are therefore EXCLUDED here and documented rather than broken:
`optim.ema_dtype: bfloat16` rounds the weights eval/export actually uses
(bf16's ~3 significant digits flips the toy's near-tie argmaxes — at
wavlm-large scale the rounding is ~1 ulp of bf16 compute noise), and
cosine decay under-trains a recipe calibrated for constant lr at a fixed
epoch budget.  Both remain opt-in features with identity/unit tests.

Writes docs/stack_convergence_r02.json:
  {"best_val_cer": ..., "best_epoch": ..., "final_val_cer": ...,
   "epochs_run": ..., "seconds": ..., "features": [...], "ablations": ...}

Usage: python scripts/stack_convergence.py [--out DIR] [--epochs 700]
(CPU: ~5 min on the 1-core box; the recipe itself is backend-calibrated,
see CLAUDE.md learning-dynamics notes.)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FEATURES = [
    "kl_impl=sparse(default)", "cache_features", "ema_decay=0.99+ema_eval",
    "adam_mu_dtype=bfloat16",
    "async_checkpoint", "metrics_jsonl", "early_stop_patience=60(armed)",
]

# measured on this recipe, 700 epochs (see module docstring)
ABLATIONS = {
    "io_only": {"best_val_cer": 0.0, "best_epoch": 595},
    "io+ema_f32": {"best_val_cer": 0.0, "best_epoch": 525},
    "io+ema_f32+mu_bf16": {"best_val_cer": 0.0, "best_epoch": 560},
    "io+ema_BF16_storage+mu_bf16": {"best_val_cer": 0.91, "note":
        "bf16 EMA storage rounds the evaluated weights — excluded"},
    "full+cosine": {"best_val_cer": 1.86, "note":
        "decayed lr under-trains the constant-lr-calibrated recipe — excluded"},
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/stackconv")
    ap.add_argument("--epochs", type=int, default=700)
    ap.add_argument("--eval-every", type=int, default=5)
    args = ap.parse_args(argv)

    # ASSIGN, don't setdefault: sitecustomize pre-sets JAX_PLATFORMS=axon in
    # this environment, and the toy recipe is CPU-calibrated anyway
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from scripts.cer_parity_experiment import experiment_config, prepare
    from fddm_asr_tpu.config import Config
    from fddm_asr_tpu.train_lib import run_training, setup_logging

    setup_logging(os.path.join(args.out, "logs"))
    vocab_json = prepare(args.out, n=16, seconds=1.0)
    raw = experiment_config(args.out, vocab_json, args.epochs)
    raw["data"]["cache_features"] = os.path.join(args.out, "feat_cache")
    raw["optim"].update({
        "ema_decay": 0.99, "ema_eval": True,
        "adam_mu_dtype": "bfloat16",
        "early_stop_patience": 60,
    })
    raw["log"].update({
        "ckpt_dir": os.path.join(args.out, "ckpts"),
        "async_checkpoint": True, "metrics_jsonl": True,
        "eval_every": args.eval_every,
    })

    t0 = time.time()
    summary = run_training(Config(raw), raw_cfg=raw,
                           eval_every=args.eval_every)
    result = {
        "best_val_cer": summary["best_val_cer"],
        "best_epoch": summary["best_epoch"],
        "final_val_cer": summary["val_cer"],
        "epochs_run": summary["epoch"],
        "early_stopped": bool(summary.get("early_stopped")),
        "seconds": round(time.time() - t0, 1),
        "features": FEATURES,
        "recipe": "scripts/cer_parity_experiment.experiment_config",
        "ablations": ABLATIONS,
    }
    dest = os.path.join(REPO, "docs", "stack_convergence_r02.json")
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
