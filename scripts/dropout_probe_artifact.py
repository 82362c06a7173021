#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Bank the round-5 dropout-mode-dependent-fit artifact (VERDICT r04 item 4).

Collects the torch-reference dropout-0.1 control trajectory (dual-mode
probe KLs from scripts/torch_control_train.py) and the JAX twin's
checkpoint probes (scripts/dropout_mode_probe.py outputs) into
docs/dropout_probe_r05.json.

    python scripts/dropout_probe_artifact.py \
        --torch /tmp/words4/torch_dropout/metrics.jsonl \
        --jax-metrics /tmp/words4/ckpts_jax_dropout/metrics.jsonl \
        --jax-probe ep050=/tmp/words4/probe_ep050.json [...] \
        --out docs/dropout_probe_r05.json
"""
import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True)
    ap.add_argument("--jax-metrics", required=True)
    ap.add_argument("--jax-probe", nargs="*", default=[],
                    help="label=path of dropout_mode_probe.py outputs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--note", default="")
    args = ap.parse_args(argv)

    t_rows = [json.loads(l) for l in open(args.torch, encoding="utf-8")]
    t_eval = [
        {"step": r["step"],
         "train_kl_running": None,
         "eval_kl": round(r["eval_kl"], 4),
         "eval_eos_frac": round(r.get("eval_eos_frac", float("nan")), 4),
         "trainmode_kl": round(r["trainmode_kl"], 4)
         if "trainmode_kl" in r else None}
        for r in t_rows if r.get("kind") in ("eval", "final")
    ]
    steps = {r["step"]: r["train_kl"] for r in t_rows if r.get("kind") == "step"}
    for e in t_eval:
        if e["step"] in steps:
            e["train_kl_running"] = round(steps[e["step"]], 4)

    j_rows = [json.loads(l) for l in open(args.jax_metrics, encoding="utf-8")]
    j_curve = [
        {"epoch": r["epoch"], "train_loss": round(r["train_loss"], 4),
         **({"val_kl": round(r["val_kl"], 4)}
            if r.get("val_kl") is not None else {})}
        for r in j_rows if r.get("kind") == "epoch"
    ]
    probes = {}
    for spec in args.jax_probe:
        label, _, path = spec.partition("=")
        probes[label] = json.load(open(path))

    out = {
        "note": args.note,
        "torch_dropout01": {"eval_curve": t_eval},
        "jax_twin_dropout01": {
            "epoch_curve": [r for r in j_curve if r["epoch"] % 10 == 0
                            or "val_kl" in r],
            "ckpt_probes": probes,
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
