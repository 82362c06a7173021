#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Dual-mode (train/eval) probe KL for a JAX checkpoint (VERDICT r04 item 4).

The round-4 pathology: a flagship decoder trained WITH dropout 0.1 scores
far better with dropout ACTIVE (train mode) than deterministically, and the
deterministic argmax collapses to all-eos.  This probe makes that
measurable for any checkpoint: it scores a fixed corrupted probe set from
the cached-feature train split in BOTH modes and reports the KLs plus the
argmax-eos fraction — the exact JAX mirror of the dual-mode probe in
scripts/torch_control_train.py, so a torch control and a JAX twin can be
compared side by side.

    JAX_PLATFORMS=cpu python scripts/dropout_mode_probe.py \
        --config /tmp/words4/config_dropout_twin.yaml \
        --ckpt /tmp/words4/ckpts_jax_dropout/best \
        --cache /tmp/words4/feature_cache/train --out probe.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("FDDM_PROBE_PLATFORM", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="orbax dir or .pt; omit for a random-init probe "
                         "(smoke / untrained baseline)")
    ap.add_argument("--cache", required=True, help=".../feature_cache/train")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--n-probe", type=int, default=32)
    ap.add_argument("--n-dropout-draws", type=int, default=4,
                    help="train-mode KL is averaged over this many "
                         "independent dropout masks")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from fddm_asr_tpu import diffusion as D
    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from scripts.torch_control_train import load_features, load_tokens

    cfg = load_config(args.config)
    pipe = FDDMPipeline.from_config(cfg, ckpt_path=args.ckpt,
                                    dtype=jnp.float32)
    feats = load_features(args.cache)
    tokens = load_tokens(cfg)
    n = min(args.n_probe, len(tokens))
    feats, tokens = feats[:n], tokens[:n]
    pad_id = int(cfg.data.get("pad_id", 0))
    eos_id = int(cfg.data.get("eos_id", 2))
    T = int(cfg.diffusion["T"])

    key = jax.random.PRNGKey(args.seed)
    k_t, k_xt, k_drop = jax.random.split(key, 3)
    probe_t = jax.random.randint(k_t, (n,), 1, T + 1)
    probe_xt = D.sample_xt_tokens(pipe.sched, k_xt, jnp.asarray(tokens),
                                  probe_t)

    def score(deterministic: bool, drop_key):
        tot, nb, eos_n, pos_n = 0.0, 0, 0, 0
        for s in range(0, n, args.batch_size):
            sl = slice(s, s + args.batch_size)
            x0 = jnp.asarray(tokens[sl])
            xt, t = probe_xt[sl], probe_t[sl]
            x_mask = x0 != pad_id
            kwargs = {}
            if not deterministic:
                drop_key, sub = jax.random.split(drop_key)
                kwargs = {"rngs": {"dropout": sub}}
            logits = pipe.decoder.apply(
                pipe.decoder_params, xt, t, jnp.asarray(feats[sl]),
                x_mask, None, deterministic=deterministic, **kwargs)
            tot += float(D.kl_term(pipe.sched, xt, x0, logits, t, x_mask))
            nb += 1
            am = jnp.argmax(logits, -1)
            eos_n += int(jnp.sum((am == eos_id) & x_mask))
            pos_n += int(jnp.sum(x_mask))
        return tot / max(1, nb), eos_n / max(1, pos_n)

    eval_kl, eval_eos = score(True, k_drop)
    tks, teos_last = [], None
    for i in range(args.n_dropout_draws):
        tk, teos_last = score(False, jax.random.fold_in(k_drop, i))
        tks.append(tk)
    out = {
        "ckpt": args.ckpt,
        "n_probe": n,
        "eval_kl": eval_kl,
        "eval_eos_frac": eval_eos,
        "trainmode_kl_mean": float(np.mean(tks)),
        "trainmode_kl_per_draw": tks,
        "trainmode_eos_frac": teos_last,
        "mode_gap": eval_kl - float(np.mean(tks)),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
