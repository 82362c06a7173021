# -*- coding: utf-8 -*-
"""Profile the encoder-fine-tuning train step (freeze=false) on device.

Builds the same program as `bench_train.py --finetune`, traces a few steps,
and aggregates per-op device time via profile_step.aggregate — the tool that
located the round-1 inference hotspots.

Usage: python scripts/profile_finetune.py [--batch 16] [--top 30]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from profile_step import aggregate  # noqa: E402  (same scripts/ dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/jaxtrace_ft")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat-policy", default="full", choices=["full", "dots"])
    ap.add_argument("--no-dropout", action="store_true")
    args = ap.parse_args()

    from fddm_asr_tpu.config import Config
    from fddm_asr_tpu.models.projection import (
        SpeechProjector, TextEmbedding, TextProjector,
    )
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from fddm_asr_tpu.train_lib import TrainState, make_optimizer, make_train_step

    K, d_proj, d_model = 8000, 256, 768
    wavlm_over = {}
    if args.no_remat:
        wavlm_over["remat_layers"] = False
    if args.remat_policy != "full":
        wavlm_over["remat_policy"] = args.remat_policy
    if args.no_dropout:
        wavlm_over.update(hidden_dropout=0.0, attention_dropout=0.0,
                          activation_dropout=0.0, feat_proj_dropout=0.0)
    cfg = Config({
        "seed": 0,
        "data": {"vocab_size": K, "pad_id": 3, "max_len": args.max_len},
        "model": {
            "d_model": d_model, "nhead": 12, "num_layers": 6, "dim_ff": 2048,
            "dropout": 0.0 if args.no_dropout else 0.1,
            "encoder": {"wavlm_name": "microsoft/wavlm-large", "freeze": False,
                        "proj": "linear", "pooling": "none",
                        "wavlm_config": wavlm_over},
            "projector": {"d_proj": d_proj},
        },
        "diffusion": {"T": 200, "beta_max": 0.2},
        "optim": {"batch_size": args.batch, "lr": 2e-4, "weight_decay": 0.01,
                  "dtype": "bfloat16"},
        "lfd": {"lambda_offdiag": 5e-3, "n_step_fd": 4, "tau": 1.0},
        "log": {"log_every": 50, "ckpt_dir": "/tmp/bench_train"},
    })

    class _Tok:
        def encode(self, text):
            return [5, 6, 7]

    pipeline = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), dtype=jnp.bfloat16)
    s_proj = SpeechProjector(d_proj=d_proj, dtype=jnp.bfloat16)
    t_embed = TextEmbedding(d_out=d_proj, mode="logits", dtype=jnp.bfloat16)
    t_proj = TextProjector(d_proj=d_proj, dtype=jnp.bfloat16)
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    sp = s_proj.init(r1, jnp.zeros((1, 4, d_model)))
    te = t_embed.init(r2, jnp.zeros((1, 4, K)))
    tp = t_proj.init(r3, jnp.zeros((1, 4, d_proj)))
    tx = make_optimizer(cfg, train_encoder=True)
    params0 = (pipeline.decoder_params, sp, te, tp, pipeline.encoder_params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), decoder=params0[0], s_proj=params0[1],
        t_embed=params0[2], t_proj=params0[3], opt_state=tx.init(params0),
        encoder=pipeline.encoder_params,
    )
    step = make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg,
                           train_encoder=True)

    B, T_wav = args.batch, int(args.seconds * 16000)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T_wav)), jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(1).integers(4, K, (B, args.max_len)), jnp.int32)

    state, m = step(state, wave, x0, jax.random.key(1), False)
    jax.block_until_ready(m["total_loss"])
    import time
    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, m = step(state, wave, x0, jax.random.key(10 + i), False)
        print("loss", float(m["total_loss"]))
        ts.append(time.perf_counter() - t0)
    print("step_s", min(ts))
    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            state, m = step(state, wave, x0, jax.random.key(2 + i), False)
            jax.block_until_ready(m["total_loss"])
    aggregate(args.out, args.top)


if __name__ == "__main__":
    main()
