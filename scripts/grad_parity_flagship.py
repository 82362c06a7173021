#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Bank the flagship-shape gradient-parity artifact (VERDICT r04 item 1a).

Runs the torch-vs-JAX gradient comparison at flagship shapes (d768x6,
S=1000, L=44, f32) for both KL implementations and writes
docs/grad_parity_r05.json with per-tensor relative errors.

    JAX_PLATFORMS=cpu python scripts/grad_parity_flagship.py
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from test_grad_parity import grad_parity_case

    out = {"note": ("torch reference (denoise_decoder + SchedulerAdapter."
                    "kl_term) vs JAX rebuild, one backward at flagship "
                    "shapes d768x6 S=1000 L=44 B=2 f32, identical weights "
                    "and batch; rel_err = ||g_jax - g_torch|| / ||g_torch|| "
                    "per tensor"),
           "shapes": {"V": 96, "d_model": 768, "layers": 6, "nhead": 12,
                      "dim_ff": 2048, "B": 2, "L": 44, "S": 1000,
                      "T": 20, "beta_max": 0.6},
           "cases": {}}
    for impl in ("dense", "sparse"):
        errs, loss_j, loss_t = grad_parity_case(
            V=96, Dm=768, H=12, LAYERS=6, FF=2048, B=2, L=44, S=1000,
            T=20, beta_max=0.6, kl_impl=impl,
        )
        worst = sorted(errs.items(), key=lambda kv: -kv[1])[:5]
        out["cases"][impl] = {
            "loss_jax": loss_j, "loss_torch": loss_t,
            "loss_rel_err": abs(loss_j - loss_t) / max(1e-30, abs(loss_t)),
            "n_tensors": len(errs),
            "max_rel_err": max(errs.values()),
            "worst5": {k: v for k, v in worst},
        }
        print(impl, out["cases"][impl]["max_rel_err"], flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "grad_parity_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
