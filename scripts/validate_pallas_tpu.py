#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Validate + micro-benchmark the Pallas fused gated-attention kernel on TPU.

Runs the Pallas kernel against the XLA reference on wavlm-large-shaped inputs
(B x 999 frames x 16 heads x 64) and reports max abs error + timings.

    python scripts/validate_pallas_tpu.py [--batch 8] [--frames 999]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fddm_asr_tpu.ops.flash_attention import (
    wavlm_gated_attention_packed,
    wavlm_gated_attention_packed_flash,
    wavlm_gated_attention_pallas,
    wavlm_gated_attention_xla,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=999)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--kernel", default="v1",
                    choices=["v1", "packed", "flash", "train"],
                    help="v1=[B,H,L,dh] kernel, packed=head-packed "
                         "resident-K, flash=k-block running softmax "
                         "(unbounded Lk — use --frames 8192), train=custom-"
                         "VJP fwd+bwd kernels (validates all 5 gradients)")
    ap.add_argument("--block-k", type=int, default=512)
    ap.add_argument("--train-block-k", type=int, default=None,
                    help="dK/dV block for --kernel train (default: the "
                         "kernel's own 256)")
    args = ap.parse_args(argv)

    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU; the pallas kernel requires TPU", file=sys.stderr)

    B, L, H, dh = args.batch, args.frames, args.heads, args.dh
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H, dh)), dtype)
    k = jnp.asarray(rng.standard_normal((B, L, H, dh)), dtype)
    v = jnp.asarray(rng.standard_normal((B, L, H, dh)), dtype)
    bias = jnp.asarray(rng.standard_normal((H, L, L)), jnp.float32)
    gate = jnp.asarray(rng.uniform(1.0, 2.0, (B, H, L)), jnp.float32)
    mask = jnp.asarray(np.arange(L)[None, :] < (L - np.arange(B) * 7)[:, None])

    if args.kernel == "train":
        return validate_train(args, q, k, v, bias, gate, mask)

    xla_fn = jax.jit(wavlm_gated_attention_xla)
    if args.kernel == "v1":
        pal_fn = jax.jit(wavlm_gated_attention_pallas)
    else:
        HD = H * dh

        def packed(fn, **kw):
            def run(q, k, v, bias, gate, mask):
                out = fn(q.reshape(B, L, HD), k.reshape(B, L, HD),
                         v.reshape(B, L, HD), bias, gate, mask,
                         num_heads=H, **kw)
                return out.reshape(B, L, H, dh)
            return jax.jit(run)

        pal_fn = (packed(wavlm_gated_attention_packed)
                  if args.kernel == "packed"
                  else packed(wavlm_gated_attention_packed_flash,
                              block_k=args.block_k))

    ref = jax.block_until_ready(xla_fn(q, k, v, bias, gate, mask))
    out = jax.block_until_ready(pal_fn(q, k, v, bias, gate, mask))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"max abs err {err:.3e} (rel {rel:.3e})")

    def timeit(fn):
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q, k, v, bias, gate, mask))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_xla = timeit(xla_fn)
    t_pal = timeit(pal_fn)
    print(f"xla  : {t_xla*1e3:8.2f} ms")
    print(f"pallas: {t_pal*1e3:8.2f} ms  ({t_xla/t_pal:.2f}x)")
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-4
    assert rel < tol, f"kernel mismatch: rel err {rel}"
    print("Pallas kernel validation passed.")


def validate_train(args, q, k, v, bias, gate, mask):
    """Validate the custom-VJP fused attention: forward + all 5 grads vs the
    XLA path, and time one fwd+bwd step of each."""
    import time

    from fddm_asr_tpu.ops.flash_attention import (
        wavlm_gated_attention_packed_trainable,
    )

    B, L, H, dh = args.batch, args.frames, args.heads, args.dh
    HD = H * dh
    rng = np.random.default_rng(1)
    cot = jnp.asarray(rng.standard_normal((B, L, HD)), q.dtype)
    qp, kp, vp = (x.reshape(B, L, HD) for x in (q, k, v))

    def loss_xla(q, k, v, b, g):
        out = wavlm_gated_attention_xla(
            q.reshape(B, L, H, dh), k.reshape(B, L, H, dh),
            v.reshape(B, L, H, dh), b, g, mask)
        return jnp.sum(out.reshape(B, L, HD).astype(jnp.float32)
                       * cot.astype(jnp.float32))

    def loss_fused(q, k, v, b, g):
        # --train-block-k exercises non-default dK/dV tilings, e.g.
        # --frames 384 --train-block-k 256 = the Lk % block_k != 0
        # geometry whose tail rows the grid used to skip
        kw = ({"block_k": args.train_block_k}
              if args.train_block_k else {})
        out = wavlm_gated_attention_packed_trainable(
            q, k, v, b, g, mask, num_heads=H, **kw)
        return jnp.sum(out.astype(jnp.float32) * cot.astype(jnp.float32))

    gx_fn = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3, 4)))
    gf_fn = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4)))
    lx, gx = jax.block_until_ready(gx_fn(qp, kp, vp, bias, gate))
    lf, gf = jax.block_until_ready(gf_fn(qp, kp, vp, bias, gate))
    tol = 3e-2 if q.dtype == jnp.bfloat16 else 2e-4
    rel_l = abs(float(lx) - float(lf)) / max(abs(float(lx)), 1e-9)
    print(f"loss xla {float(lx):.4f} fused {float(lf):.4f} (rel {rel_l:.2e})")
    worst = 0.0
    for name, a, b in zip(("dq", "dk", "dv", "dbias", "dgate"), gx, gf):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.max(np.abs(a)), 1e-9)
        rel = float(np.max(np.abs(a - b)) / scale)
        worst = max(worst, rel)
        print(f"{name:6s} max rel err {rel:.3e}")

    def timeit(fn):
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(qp, kp, vp, bias, gate)
            float(jnp.sum(out[0]))  # force remote execution
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_xla = timeit(gx_fn)
    t_fused = timeit(gf_fn)
    print(f"fwd+bwd xla  : {t_xla*1e3:8.2f} ms")
    print(f"fwd+bwd fused: {t_fused*1e3:8.2f} ms  ({t_xla/t_fused:.2f}x)")
    assert rel_l < tol and worst < tol, f"grad mismatch: {worst}"
    print("Trainable kernel validation passed.")


if __name__ == "__main__":
    main()
