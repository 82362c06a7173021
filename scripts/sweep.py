#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Hyperparameter sweep runner for fddm_sweep.yaml-style search spaces.

The reference ships a sweep spec with NO executor (SURVEY §5); this runner
makes it real:

    python scripts/sweep.py --sweep configs/fddm_sweep.yaml --trials 8 \
        [--mode random|grid] [--max-steps-per-epoch 50] [--dry-run]

Search-space leaves are {distribution: log_uniform|uniform|categorical,
min/max or values}; everything else is passed through as fixed overrides on
the base_config.  Each trial trains with `fddm_asr_tpu.train_lib.run_training`
and results land in <out>/trial_NNN/{config.yaml,result.json} plus a summary
table ranked by val CER.
"""
from __future__ import annotations

import argparse
import copy
import itertools
import json
import math
import os
import sys
from typing import Any, Dict, Iterator, List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def is_search_leaf(node: Any) -> bool:
    return isinstance(node, dict) and "distribution" in node


def iter_search_leaves(space: Dict, prefix=()) -> Iterator[Tuple[Tuple[str, ...], Dict]]:
    for key, val in space.items():
        if key == "base_config":
            continue
        if is_search_leaf(val):
            yield prefix + (key,), val
        elif isinstance(val, dict):
            yield from iter_search_leaves(val, prefix + (key,))


def sample_leaf(leaf: Dict, rng: np.random.Generator) -> Any:
    dist = leaf["distribution"]
    if dist == "categorical":
        values = leaf["values"]
        return values[int(rng.integers(len(values)))]
    lo, hi = float(leaf["min"]), float(leaf["max"])
    if dist == "log_uniform":
        return float(np.exp(rng.uniform(math.log(lo), math.log(hi))))
    if dist == "uniform":
        return float(rng.uniform(lo, hi))
    raise ValueError(f"unknown distribution {dist}")


def grid_leaf(leaf: Dict, n: int = 3) -> List[Any]:
    if leaf["distribution"] == "categorical":
        return list(leaf["values"])
    lo, hi = float(leaf["min"]), float(leaf["max"])
    if leaf["distribution"] == "log_uniform":
        return [float(x) for x in np.exp(np.linspace(math.log(lo), math.log(hi), n))]
    return [float(x) for x in np.linspace(lo, hi, n)]


def set_path(tree: Dict, path: Tuple[str, ...], value: Any) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def materialise(space: Dict, assignment: Dict[Tuple[str, ...], Any]) -> Dict:
    """Fixed (non-search) overrides + the sampled assignment."""
    def strip(node):
        if is_search_leaf(node):
            return None
        if isinstance(node, dict):
            out = {k: strip(v) for k, v in node.items() if k != "base_config"}
            return {k: v for k, v in out.items() if v is not None}
        return node

    overrides = strip(space) or {}
    for path, value in assignment.items():
        set_path(overrides, path, value)
    return overrides


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", type=str, required=True)
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--mode", choices=["random", "grid"], default="random")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="sweeps/run")
    ap.add_argument("--max-steps-per-epoch", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None, help="override num_epochs")
    ap.add_argument("--device", type=str, default=None)
    ap.add_argument("--mesh", type=str, default="",
                    help="mesh spec for each trial, e.g. data=8 or data=4,model=2")
    ap.add_argument("--dry-run", action="store_true",
                    help="print sampled configs without training")
    args = ap.parse_args(argv)

    if args.device and args.device.startswith("cpu"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    space = yaml.safe_load(open(args.sweep, encoding="utf-8"))
    base_path = space.get("base_config")
    if not base_path or not os.path.exists(base_path):
        print(f"base_config missing: {base_path}", file=sys.stderr)
        sys.exit(1)

    leaves = list(iter_search_leaves(space))
    rng = np.random.default_rng(args.seed)

    if args.mode == "grid":
        axes = [grid_leaf(leaf) for _, leaf in leaves]
        combos = list(itertools.product(*axes))[: args.trials]
        assignments = [
            {path: v for (path, _), v in zip(leaves, combo)} for combo in combos
        ]
    else:
        assignments = [
            {path: sample_leaf(leaf, rng) for path, leaf in leaves}
            for _ in range(args.trials)
        ]

    from fddm_asr_tpu.config import load_config, load_yaml

    os.makedirs(args.out, exist_ok=True)
    results = []
    for i, assignment in enumerate(assignments):
        overrides = materialise(space, assignment)
        if args.epochs:
            overrides.setdefault("optim", {})["num_epochs"] = args.epochs
        trial_dir = os.path.join(args.out, f"trial_{i:03d}")
        os.makedirs(trial_dir, exist_ok=True)
        overrides.setdefault("log", {})["ckpt_dir"] = os.path.join(trial_dir, "ckpts")

        cfg = load_config(base_path, overrides=overrides)
        with open(os.path.join(trial_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg.to_dict(), f)
        printable = {"/".join(p): v for p, v in assignment.items()}
        print(f"[trial {i}] {printable}")
        if args.dry_run:
            continue

        from fddm_asr_tpu.train_lib import run_training, setup_logging

        setup_logging(os.path.join(trial_dir, "logs"))
        try:
            from train import parse_mesh

            summary = run_training(
                cfg, raw_cfg=cfg.to_dict(),
                mesh_spec=parse_mesh(args.mesh),
                max_steps_per_epoch=args.max_steps_per_epoch,
                export_pt=False,
            )
        except Exception as e:
            summary = {"error": str(e)}
        summary["assignment"] = printable
        with open(os.path.join(trial_dir, "result.json"), "w") as f:
            json.dump(summary, f, indent=2, default=float)
        results.append((i, summary))

    if results:
        ranked = sorted(
            results,
            key=lambda r: r[1].get("best_val_cer") if r[1].get("best_val_cer") is not None else float("inf"),
        )
        print("\n== sweep ranking (by best val CER) ==")
        for i, summary in ranked:
            print(f"trial {i:03d}: val_cer={summary.get('best_val_cer')} "
                  f"{summary.get('assignment')}")
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump([{"trial": i, **s} for i, s in ranked], f, indent=2, default=float)


if __name__ == "__main__":
    main()
