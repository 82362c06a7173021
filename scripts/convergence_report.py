#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Distill a train.py log into a convergence artifact JSON.

    python scripts/convergence_report.py --log train.log --out report.json \
        [--config cfg.yaml] [--note "..."]

Parses the reference-format epoch summary lines
(`[Epoch N Summary] train_loss=... | val_cer=...`) into a curve plus the
best-so-far CER, and records the recipe config inline so the artifact is
self-describing.  Used for docs/convergence_*.json records.
"""
from __future__ import annotations

import argparse
import json
import re
import sys

_LINE = re.compile(r"\[Epoch (\d+) Summary\] (.+)$")
_KV = re.compile(r"(\w+)=([\d.eE+-]+|nan|inf)")


def parse_log(path: str):
    """Generic `key=value | key=value` epoch-summary parser — tolerates any
    field set/order (train_cer and val_kl were added after the original
    fixed-order regex, which silently dropped the fields behind them)."""
    curve = []
    for line in open(path, encoding="utf-8", errors="replace"):
        m = _LINE.search(line)
        if not m:
            continue
        row = {"epoch": int(m.group(1))}
        for k, v in _KV.findall(m.group(2)):
            try:
                row[k] = float(v)
            except ValueError:
                continue
        curve.append(row)
    return curve


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None,
                    help="YAML recipe to embed (resolved text)")
    ap.add_argument("--note", default="")
    args = ap.parse_args(argv)

    curve = parse_log(args.log)
    if not curve:
        sys.exit(f"no epoch summaries found in {args.log}")
    evals = [r for r in curve if "val_cer" in r]
    best = min(evals, key=lambda r: r["val_cer"]) if evals else None
    report = {
        "note": args.note,
        "epochs_run": curve[-1]["epoch"],
        "best_val_cer": best["val_cer"] if best else None,
        "best_epoch": best["epoch"] if best else None,
        "final": curve[-1],
        "eval_curve": evals,
        "train_loss_curve": [
            {"epoch": r["epoch"], "train_loss": r["train_loss"]}
            for r in curve],
    }
    if args.config:
        report["recipe_yaml"] = open(args.config, encoding="utf-8").read()
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=1, ensure_ascii=False)
    print(json.dumps({"out": args.out, "epochs": report["epochs_run"],
                      "best_val_cer": report["best_val_cer"],
                      "best_epoch": report["best_epoch"]}))


if __name__ == "__main__":
    main()
