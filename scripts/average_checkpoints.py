#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Average the weights of several checkpoints into one (classic ASR trick).

Averaging the last-k epoch checkpoints (or any explicit list) typically
recovers most of EMA's variance reduction post-hoc — useful when a run was
trained without optim.ema_decay.  Works on BOTH checkpoint formats:
reference-schema `.pt` files and this framework's orbax dirs (mixing them
in one invocation is fine — everything is normalised through
checkpoint.load_checkpoint_any first).  The output is a reference-schema
`.pt` (decoder + 3 projection heads), loadable by inference.py here and by
the reference's own inference.py.

Usage:
  python scripts/average_checkpoints.py --out avg.pt ck/ep005.pt ck/ep006.pt ...
  python scripts/average_checkpoints.py --out avg.pt --last 5 --ckpt-dir ck/

The reference has no equivalent (it keeps only per-epoch + best-CER saves,
/root/reference/train.py:629-673); this composes with its artifacts.
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _tree_avg(trees):
    import numpy as np

    def avg(*leaves):
        stack = [np.asarray(l, dtype=np.float64) for l in leaves]
        return (sum(stack) / len(stack)).astype(np.asarray(leaves[0]).dtype)

    import jax

    return jax.tree.map(avg, *trees)


def collect_last(ckpt_dir: str, k: int):
    """The newest k epoch checkpoints (epNNN.pt preferred, else .orbax)."""
    eps = {}
    for p in glob.glob(os.path.join(ckpt_dir, "ep*")):
        m = re.match(r"ep(\d+)\.(pt|orbax)$", os.path.basename(p))
        if not m:
            continue
        n, kind = int(m.group(1)), m.group(2)
        # prefer .pt (host-light); orbax only if no .pt for that epoch
        if n not in eps or kind == "pt":
            eps[n] = p
    if not eps:
        raise SystemExit(f"no epNNN checkpoints under {ckpt_dir}")
    return [eps[n] for n in sorted(eps)[-k:]]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="*", help="explicit checkpoint paths")
    ap.add_argument("--out", required=True, help="output .pt path")
    ap.add_argument("--last", type=int, default=0,
                    help="with --ckpt-dir: average the newest N epochs")
    ap.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args(argv)

    paths = list(args.ckpts)
    if args.last:
        if not args.ckpt_dir:
            raise SystemExit("--last requires --ckpt-dir")
        paths += collect_last(args.ckpt_dir, args.last)
    if len(paths) < 2:
        raise SystemExit("need at least two checkpoints to average")

    from fddm_asr_tpu.checkpoint import export_reference_ckpt, load_checkpoint_any

    loaded = [load_checkpoint_any(p) for p in paths]
    parts = {}
    for key in ("decoder", "s_proj", "t_embed", "t_proj"):
        trees = [ck.get(key) for ck in loaded]
        if any(t is None for t in trees):
            if key == "decoder":
                raise SystemExit("every checkpoint must carry a decoder")
            parts[key] = None
            continue
        parts[key] = _tree_avg(trees)

    export_reference_ckpt(
        os.path.abspath(args.out),
        parts["decoder"],
        parts["s_proj"], parts["t_embed"], parts["t_proj"],
        epoch=max(int(ck.get("epoch") or 0) for ck in loaded),
        step=max(int(ck.get("step") or 0) for ck in loaded),
    )
    print(f"averaged {len(paths)} checkpoints -> {args.out}")
    for p in paths:
        print(f"  {p}")


if __name__ == "__main__":
    main()
