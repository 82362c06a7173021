#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Training-step throughput benchmark (flagship config, synthetic batch).

Measures the jitted train step — frozen WavLM-large forward + diffusion KL
(+ optional L_fd) + AdamW update over the d768x6 decoder — on the default
backend.  Prints one JSON line with examples/s and step seconds.

    python scripts/bench_train.py [--batch 8] [--seconds 20] [--lfd]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--lfd", action="store_true", help="include the L_fd step variant")
    ap.add_argument("--quant", default="none",
                    help="encoder quant_dense for the frozen forward: none|int8|int8_fused")
    ap.add_argument("--model", default="base", choices=["base", "paper"],
                    help="decoder geometry: base=d768x6, paper=d1024x12 (253M, scanned)")
    ap.add_argument("--cached", action="store_true",
                    help="feature-cache step: precomputed encoder output c "
                         "fed straight to the decoder step (skips the WavLM "
                         "forward — the frozen-encoder training fast path)")
    ap.add_argument("--finetune", action="store_true",
                    help="fine-tune the encoder: freeze=false, WavLM fwd+bwd "
                         "inside the step, remat'd scanned layers, encoder "
                         "params in the optimizer (5th group)")
    ap.add_argument("--no-dropout", action="store_true",
                    help="zero all encoder dropouts (profiling showed the "
                         "[B,H,S,S] attention-dropout masks cost ~50%% of the "
                         "fine-tune step; SpecAugment is the cheap WavLM "
                         "regularizer)")
    ap.add_argument("--specaugment", type=float, default=0.0, metavar="PROB",
                    help="SpecAugment mask_time_prob for --finetune "
                         "(e.g. 0.065; spans of 10 frames)")
    ap.add_argument("--lora", type=int, default=0, metavar="RANK",
                    help="with --finetune: LoRA adapters of this rank "
                         "instead of full encoder fine-tuning (optimizer/"
                         "EMA state O(rank*d); base stays frozen)")
    ap.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                    help="EMA of the trained params inside the step "
                         "(optim.ema_decay)")
    ap.add_argument("--decoder-remat", action="store_true",
                    help="rematerialize the scanned decoder blocks in "
                         "backprop (paper-scale memory lever; requires "
                         "--model paper or any scan_blocks geometry)")
    ap.add_argument("--remat-policy", default="full", choices=["full", "dots"],
                    help="--finetune remat: full=save nothing (default), "
                         "dots=save projection/FFN matmul outputs and "
                         "recompute only attention+elementwise in backprop "
                         "(more HBM, faster backward scan)")
    ap.add_argument("--device", default=None,
                    help="cpu forces the CPU backend (env var alone is not "
                         "enough — sitecustomize bakes the TPU platform "
                         "into jax.config)")
    args = ap.parse_args(argv)
    if args.device and args.device.startswith("cpu"):
        from fddm_asr_tpu.runtime import force_cpu

        force_cpu()
    if args.finetune and (args.cached or args.quant != "none"):
        ap.error("--finetune excludes --cached and --quant (grads flow "
                 "through the encoder)")
    if args.lora and not args.finetune:
        ap.error("--lora requires --finetune")

    from fddm_asr_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fddm_asr_tpu.config import Config
    from fddm_asr_tpu.models.projection import SpeechProjector, TextEmbedding, TextProjector
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from fddm_asr_tpu.train_lib import TrainState, make_optimizer, make_train_step

    K, d_proj = 8000, 256
    if args.model == "paper":
        d_model, nhead, n_layers, dim_ff, scan_blocks = 1024, 16, 12, 4096, True
    else:
        d_model, nhead, n_layers, dim_ff, scan_blocks = 768, 12, 6, 2048, False
    cfg = Config({
        "seed": 0,
        "data": {"vocab_size": K, "pad_id": 3, "max_len": args.max_len},
        "model": {
            "d_model": d_model, "nhead": nhead, "num_layers": n_layers,
            "dim_ff": dim_ff, "scan_blocks": scan_blocks or args.decoder_remat,
            "remat_blocks": args.decoder_remat,
            "dropout": 0.1,
            "encoder": {"wavlm_name": "microsoft/wavlm-large",
                        "freeze": not args.finetune,
                        "lora_rank": args.lora,
                        "proj": "linear", "pooling": "none",
                        "mask_time_prob": args.specaugment,
                        # int8 on the frozen encoder is training-valid: no
                        # grads flow through it (tests/test_quant.py)
                        "wavlm_config": dict(
                            {"quant_dense": args.quant,
                             "remat_policy": args.remat_policy},
                            **({"hidden_dropout": 0.0,
                                "attention_dropout": 0.0,
                                "activation_dropout": 0.0,
                                "feat_proj_dropout": 0.0}
                               if args.no_dropout else {}))},
            "projector": {"d_proj": d_proj},
        },
        "diffusion": {"T": 200, "beta_max": 0.2},
        "optim": {"batch_size": args.batch, "lr": 2e-4, "weight_decay": 0.01,
                  "ema_decay": args.ema, "dtype": "bfloat16"},
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
    rng = jax.random.key(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    sp = s_proj.init(r1, jnp.zeros((1, 4, d_model)))
    te = t_embed.init(r2, jnp.zeros((1, 4, K)))
    tp = t_proj.init(r3, jnp.zeros((1, 4, d_proj)))

    tx = make_optimizer(cfg, train_encoder=args.finetune)
    params0 = (pipeline.decoder_params, sp, te, tp)
    if args.finetune:
        if args.lora:
            from fddm_asr_tpu.models.lora import init_lora
            enc_train_p = init_lora(jax.random.key(7),
                                    pipeline.encoder_params, args.lora)
        else:
            enc_train_p = pipeline.encoder_params
        params0 = params0 + (enc_train_p,)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        decoder=params0[0], s_proj=params0[1], t_embed=params0[2], t_proj=params0[3],
        opt_state=tx.init(params0),
        encoder=params0[4] if args.finetune else None,
        ema=(jax.tree.map(jnp.array, params0) if args.ema > 0 else None),
    )
    train_step = make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg,
                                 cached_features=args.cached,
                                 train_encoder=args.finetune)

    B, T_wav = args.batch, int(args.seconds * 16000)
    wave = jnp.asarray(np.random.default_rng(0).standard_normal((B, T_wav)), jnp.float32)
    x0 = jnp.asarray(np.random.default_rng(1).integers(4, K, (B, args.max_len)), jnp.int32)

    if args.cached:
        enc = jax.jit(lambda p, w: pipeline.encoder.apply(
            p, w, None, deterministic=True)[0])
        c = enc(pipeline.encoder_params, wave)
        jax.block_until_ready(c)

        def step(state, key):
            return train_step(state, c, x0, key, args.lfd)
    elif args.finetune and args.lora:
        def step(state, key):
            return train_step(state, pipeline.encoder_params, wave, x0, key,
                              args.lfd)
    elif args.finetune:
        def step(state, key):
            return train_step(state, wave, x0, key, args.lfd)
    else:
        def step(state, key):
            return train_step(state, pipeline.encoder_params, wave, x0, key,
                              args.lfd)

    t0 = time.perf_counter()
    state, metrics = step(state, jax.random.key(1))
    jax.block_until_ready(metrics["total_loss"])
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = step(state, jax.random.key(2 + i))
        jax.block_until_ready(metrics["total_loss"])
        times.append(time.perf_counter() - t0)
    step_s = min(times)

    # MFU: compiled-program FLOPs (XLA cost analysis) / wall step time /
    # peak.  v5e bf16 peak is 197 TFLOP/s (not 394 — that's int8); override
    # with BENCH_PEAK_TFLOPS for other parts.  Counts executed FLOPs, so a
    # remat'd step reports the recompute it actually runs.
    tflops_per_s = mfu_pct = None
    try:
        # lower the ALREADY-JITTED step with params threaded as arguments:
        # jit of the `step` closure would embed the encoder params (and
        # batch) as HLO constants — a second multi-GB program the remote
        # compile service rejects with HTTP 413 (CLAUDE.md)
        key0 = jax.random.key(0)
        if args.cached:
            lowered = train_step.lower(state, c, x0, key0, args.lfd)
        elif args.finetune and not args.lora:
            lowered = train_step.lower(state, wave, x0, key0, args.lfd)
        else:
            lowered = train_step.lower(state, pipeline.encoder_params, wave,
                                       x0, key0, args.lfd)
        cost = lowered.compile().cost_analysis()
        fl = float((cost or {}).get("flops", 0.0))
        if fl > 0:
            tflops_per_s = fl / step_s / 1e12
            peaks = {"TPU v5 lite": 197.0, "TPU v5e": 197.0}
            peak = float(os.environ.get(
                "BENCH_PEAK_TFLOPS",
                peaks.get(jax.devices()[0].device_kind, 0)) or 0)
            if peak:
                mfu_pct = round(100.0 * tflops_per_s / peak, 2)
            tflops_per_s = round(tflops_per_s, 2)
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass

    print(json.dumps({
        "metric": "train_step_examples_per_s",
        "value": round(B / step_s, 2),
        "unit": "examples_per_second",
        "batch": B,
        "audio_seconds": args.seconds,
        "step_seconds": round(step_s, 4),
        "tflops_per_s": tflops_per_s,
        "mfu_pct": mfu_pct,
        "compile_seconds": round(compile_s, 1),
        "lfd": args.lfd,
        "cached_features": args.cached,
        "platform": jax.devices()[0].platform,
        "finetune": args.finetune,
        "config": (("FINE-TUNED" if args.finetune else "frozen")
                   + f" wavlm-large + d{d_model}x{n_layers} decoder, KL, AdamW, bf16")
                  + (f" enc-quant-{args.quant}" if args.quant != "none" else "")
                  + (" feature-cache" if args.cached else "")
                  + (" remat" if args.finetune else "")
                  + (f" lora-r{args.lora}" if args.lora else "")
                  + (" decoder-remat" if args.decoder_remat else "")
                  + (f" ema={args.ema}" if args.ema else "")
                  + (" no-dropout" if args.no_dropout else "")
                  + (f" specaug={args.specaugment}" if args.specaugment else "")
                  + (f" remat={args.remat_policy}"
                     if args.remat_policy != "full" else ""),
    }))


if __name__ == "__main__":
    main()
