#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Distill the torch-control run + JAX twin arms into one comparison
artifact (VERDICT r04 item 1b): train-KL trajectories at matched step
counts, torch reference vs JAX rebuild under the corrected recipe on the
same cached features.

    python scripts/torch_control_report.py \
        --torch /tmp/words/r05/torch_control/metrics.jsonl \
        --jax /tmp/words/r05/ckpts_armTIbf16/metrics.jsonl \
        --out docs/torch_control_r05.json
"""
import argparse
import json


def load_jsonl(path):
    return [json.loads(l) for l in open(path, encoding="utf-8")]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True)
    ap.add_argument("--jax", required=True, nargs="+",
                    help="one or more JAX metrics.jsonl (label=path or path)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--note", default="")
    args = ap.parse_args(argv)

    t_rows = load_jsonl(args.torch)
    t_steps = [(r["step"], r["train_kl"]) for r in t_rows
               if r.get("kind") == "step"]
    t_eval = [(r["step"], r["eval_kl"]) for r in t_rows
              if r.get("kind") == "eval"]

    out = {
        "note": args.note,
        "torch": {
            "last_step": t_steps[-1][0] if t_steps else 0,
            "train_kl_curve": [
                {"step": s, "kl": round(k, 4)} for s, k in t_steps
                if s % 200 == 0],
            "eval_kl_curve": [
                {"step": s, "kl": round(k, 4)} for s, k in t_eval],
        },
        "jax": {},
    }
    for spec in args.jax:
        label, _, path = spec.rpartition("=")
        label = label or "jax"
        rows = load_jsonl(path)
        # JAX logs per-epoch averages; convert epochs to steps via the step
        # rows' (step, epoch) pairs
        steps = [r for r in rows if r.get("kind") == "step"]
        epochs = [r for r in rows if r.get("kind") == "epoch"]
        spe = (steps[-1]["step"] / steps[-1]["epoch"]) if steps else 0
        out["jax"][label] = {
            "steps_per_epoch": round(spe, 1),
            "train_loss_curve": [
                {"step": int(r["epoch"] * spe), "epoch": r["epoch"],
                 "kl": round(r["train_loss"], 4)}
                for r in epochs if r["epoch"] % 5 == 0],
        }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"out": args.out,
                      "torch_last_step": out["torch"]["last_step"]}))


if __name__ == "__main__":
    main()
