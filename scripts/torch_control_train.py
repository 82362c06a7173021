#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Torch-reference control run on the words corpus (VERDICT r04 item 1b).

Trains the REFERENCE decoder (imported by path from /root/reference, never
copied) with the reference SchedulerAdapter.kl_term on the SAME precomputed
WavLM features + tokens as the stalled JAX flagship run, under the corrected
recipe (AdamW lr 2e-4, warmup 1000, B=4, dropout 0, pure KL).  If torch's
train KL descends where JAX's stalls, the rebuild has a bug; if both stall,
the task/recipe is the limiting factor (settles framework-vs-task).

Features come from the JAX feature cache (bf16 memmap) — the torch decoder
consumes the identical acoustic condition the JAX decoder saw.

    python scripts/torch_control_train.py \
        --cache /tmp/words/feature_cache/train \
        --config /tmp/words/config_flagship_r04.yaml \
        --steps 6000 --out /tmp/words/r05/torch_control
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"
sys.path.insert(0, REPO)


def load_ref_train():
    spec = importlib.util.spec_from_file_location(
        "_reference_train", os.path.join(REFERENCE_ROOT, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_reference_train"] = mod
    sys.path.insert(0, REFERENCE_ROOT)
    spec.loader.exec_module(mod)
    return mod


def load_features(cache_dir: str) -> np.ndarray:
    import ml_dtypes

    meta = json.load(open(os.path.join(cache_dir, "meta.json")))
    raw = np.load(os.path.join(cache_dir, "feats.npy"), mmap_mode="r")
    if meta["dtype"] == "bfloat16":
        return np.asarray(raw).view(ml_dtypes.bfloat16).astype(np.float32)
    return np.asarray(raw, np.float32)


def load_tokens(cfg) -> np.ndarray:
    from fddm_asr_tpu.data.dataset import ManifestDataset
    from fddm_asr_tpu.tokenizer import load_tokenizer

    data = cfg.data
    ds = ManifestDataset(
        data["train_json"], load_tokenizer(data["tokenizer_path"]),
        max_len=data["max_len"], pad_id=data.get("pad_id", 0),
        eos_id=data.get("eos_id"), bos_id=data.get("bos_id"),
        max_audio_seconds=data.get("max_seconds", 20),
        sample_rate=data.get("sample_rate", 16000),
    )
    return np.stack([ds[i]["tokens"] for i in range(len(ds))]).astype(np.int64)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True, help=".../feature_cache/train")
    ap.add_argument("--config", required=True)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--weight-decay", type=float, default=0.01)
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", required=True)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--save-final", action="store_true",
                    help="torch.save the final decoder state_dict to "
                         "<out>/final.pt (post-hoc probes, warm starts)")
    args = ap.parse_args(argv)

    import torch

    torch.set_num_threads(args.threads)
    torch.manual_seed(args.seed)

    from fddm_asr_tpu.config import load_config

    cfg = load_config(args.config)
    os.makedirs(args.out, exist_ok=True)
    mpath = os.path.join(args.out, "metrics.jsonl")
    mfh = open(mpath, "a", buffering=1)

    feats = load_features(args.cache)          # [N, S, d] f32
    tokens = load_tokens(cfg)                  # [N, L] int64
    N, S, d = feats.shape
    L = tokens.shape[1]
    print(f"features {feats.shape}, tokens {tokens.shape}", flush=True)

    sys.path.insert(0, REFERENCE_ROOT)
    from models.denoise_decoder import DenoisingTransformerDecoder as RefDecoder
    from fddm.sched.diffusion_scheduler import (
        DiscreteDiffusionScheduler as RefScheduler,
    )

    ref_train = load_ref_train()

    V = int(cfg.data["vocab_size"])
    T = int(cfg.diffusion["T"])
    model_cfg = cfg.model
    dec = RefDecoder(
        vocab_size=V, d_model=int(model_cfg["d_model"]),
        nhead=int(model_cfg["nhead"]), num_layers=int(model_cfg["num_layers"]),
        dim_ff=int(model_cfg["dim_ff"]), dropout=args.dropout,
        max_len=max(64, L), pad_id=int(cfg.data.get("pad_id", 0)),
        pos_emb_type="rope", use_film=True,
    )
    n_params = sum(p.numel() for p in dec.parameters())
    print(f"reference decoder params: {n_params/1e6:.1f}M", flush=True)
    sched = RefScheduler(K=V, T=T, device=torch.device("cpu"),
                         beta_max=float(cfg.diffusion.get("beta_max", 0.2)))
    adapter = ref_train.SchedulerAdapter(sched)

    opt = torch.optim.AdamW(dec.parameters(), lr=args.lr,
                            weight_decay=args.weight_decay)

    feats_t = torch.from_numpy(feats)
    tokens_t = torch.from_numpy(tokens)
    pad_id = int(cfg.data.get("pad_id", 0))

    # fixed probe set for the deterministic eval-mode KL (sampled val_kl
    # analogue): first 32 rows, fixed t ladder, fixed corruption draw
    probe_idx = torch.arange(min(32, N))
    g_eval = torch.Generator().manual_seed(123)
    probe_t = torch.randint(1, T + 1, (len(probe_idx),), generator=g_eval)
    torch.manual_seed(321)
    probe_xt = adapter.sample_q(tokens_t[probe_idx], probe_t)

    eos_id = int(cfg.data.get("eos_id", 2))

    def eval_kl(train_mode: bool = False):
        """Probe-set KL (+ argmax-eos fraction) in eval OR train mode.

        The round-4 JAX pathology signature is a MODE-DEPENDENT fit: with
        dropout 0.1 the trained state scores far better with dropout
        ACTIVE than deterministically, and the deterministic argmax
        collapses to all-eos.  Running the identical fixed probe in both
        modes here answers whether the torch reference shares the
        property (VERDICT r04 item 4)."""
        dec.train() if train_mode else dec.eval()
        tot, nb, eos_n, pos_n = 0.0, 0, 0, 0
        with torch.no_grad():
            for s in range(0, len(probe_idx), args.batch_size):
                sl = probe_idx[s: s + args.batch_size]
                xt, t = probe_xt[s: s + args.batch_size], probe_t[s: s + args.batch_size]
                x0 = tokens_t[sl]
                logits = dec(xt, t, feats_t[sl], x_mask=(x0 != pad_id),
                             c_mask=None)
                tot += float(adapter.kl_term(xt, x0, logits, t,
                                             (x0 != pad_id)))
                nb += 1
                am = logits.argmax(-1)
                m = x0 != pad_id
                eos_n += int(((am == eos_id) & m).sum())
                pos_n += int(m.sum())
        dec.train()
        return tot / max(1, nb), eos_n / max(1, pos_n)

    rng = np.random.default_rng(args.seed)
    step, epoch = 0, 0
    t_start = time.time()
    run_loss = []
    while step < args.steps:
        epoch += 1
        order = rng.permutation(N)
        for s in range(0, N - args.batch_size + 1, args.batch_size):
            idx = torch.from_numpy(order[s: s + args.batch_size].copy())
            x0 = tokens_t[idx]
            c = feats_t[idx]
            t = torch.randint(1, T + 1, (len(idx),))
            xt = adapter.sample_q(x0, t)
            x_mask = x0 != pad_id
            logits = dec(xt, t, c, x_mask=x_mask, c_mask=None)
            loss = adapter.kl_term(xt, x0, logits, t, x_mask)
            opt.zero_grad(set_to_none=True)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(dec.parameters(), 1.0)
            lr_t = args.lr * min(1.0, (step + 1) / max(1, args.warmup))
            for grp in opt.param_groups:
                grp["lr"] = lr_t
            opt.step()
            step += 1
            run_loss.append(float(loss))
            if step % args.log_every == 0:
                avg = float(np.mean(run_loss[-args.log_every:]))
                el = time.time() - t_start
                print(f"step={step} epoch={epoch} kl={avg:.4f} "
                      f"lr={lr_t:.2e} {step/el:.2f} it/s", flush=True)
                mfh.write(json.dumps({
                    "kind": "step", "step": step, "epoch": epoch,
                    "train_kl": avg, "lr": lr_t, "ts": time.time()}) + "\n")
            if step % args.eval_every == 0:
                ek, eos_frac = eval_kl()
                rec = {"kind": "eval", "step": step, "epoch": epoch,
                       "eval_kl": ek, "eval_eos_frac": eos_frac,
                       "ts": time.time()}
                if args.dropout > 0:
                    tk, teos = eval_kl(train_mode=True)
                    rec["trainmode_kl"] = tk
                    rec["trainmode_eos_frac"] = teos
                    print(f"step={step} EVAL kl={ek:.4f} eos={eos_frac:.3f} "
                          f"trainmode_kl={tk:.4f}", flush=True)
                else:
                    print(f"step={step} EVAL kl={ek:.4f} "
                          f"eos={eos_frac:.3f}", flush=True)
                mfh.write(json.dumps(rec) + "\n")
            if step >= args.steps:
                break
    ek, eos_frac = eval_kl()
    rec = {"kind": "final", "step": step, "eval_kl": ek,
           "eval_eos_frac": eos_frac, "ts": time.time()}
    if args.dropout > 0:
        tk, teos = eval_kl(train_mode=True)
        rec["trainmode_kl"] = tk
        rec["trainmode_eos_frac"] = teos
    mfh.write(json.dumps(rec) + "\n")
    if args.save_final:
        torch.save(dec.state_dict(), os.path.join(args.out, "final.pt"))
    print(f"done: {step} steps, final eval kl={ek:.4f}", flush=True)


if __name__ == "__main__":
    main()
