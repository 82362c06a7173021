# -*- coding: utf-8 -*-
"""int8 MXU probe at WavLM-large FFN shapes (v5e) — all modes in one tool.

    python scripts/probe_int8.py --mode xla       # bf16 vs XLA dynamic-quant
    python scripts/probe_int8.py --mode pure      # bare int8 matmul / +dequant
    python scripts/probe_int8.py --mode variants  # quant/epilogue variants
    python scripts/probe_int8.py --mode fused     # ops/quant fused Pallas vs XLA

Measured anchors that shaped the shipped int8 path (CLAUDE.md):
pure int8 matmul 379 TOPS, +f32 dequant 329, XLA full dynamic path
~245-255, fused Pallas 288 per-op but a LOSS end-to-end (pallas_call breaks
XLA epilogue fusion) — trust only e2e RTFx.

Each timed program chains N data-dependent matmul pairs (D->F->D) so
device time dominates the ~30 ms axon-relay dispatch; an empty-program
calibration is subtracted (block_until_ready can return before remote
execution finishes — always pull a device scalar).
"""
import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

B, L, D, F = 32, 1024, 1024, 4096
ROWS = B * L


def timeit(fn, *args, iters=6):
    out = fn(*args)
    float(jnp.sum(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def quant_rows(x):
    sx = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True).astype(jnp.float32), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def quant_cols(w):
    sw = jnp.maximum(jnp.max(jnp.abs(w), 0, keepdims=True).astype(jnp.float32), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def mm_q(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def _calibrate(x):
    @jax.jit
    def empty(x):
        return x[0, :8] * 1

    t = timeit(empty, x)
    print(f"empty program: {t*1e3:.2f} ms")
    return t


def _bf16_inputs(key=0):
    r1, r2, r3 = jax.random.split(jax.random.key(key), 3)
    x = jax.random.normal(r1, (ROWS, D), jnp.bfloat16)
    w1 = jax.random.normal(r2, (D, F), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(r3, (F, D), jnp.bfloat16) * 0.02
    return x, w1, w2


def mode_xla(n_chain):
    """bf16 chain vs XLA dynamic-quant int8 chain (the shipped path)."""
    x, w1, w2 = _bf16_inputs()

    def int8_mm(x, wq, sw):
        xq, sx = quant_rows(x)
        y = mm_q(xq, wq)
        return (y.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)

    @jax.jit
    def chain_bf16(x, w1, w2):
        def body(i, x):
            return ((x @ w1) @ w2) * 0.5
        return lax.fori_loop(0, n_chain, body, x)

    @jax.jit
    def chain_int8(x, w1, w2):
        w1q, s1 = quant_cols(w1)
        w2q, s2 = quant_cols(w2)

        def body(i, x):
            return int8_mm(int8_mm(x, w1q, s1), w2q, s2) * 0.5

        return lax.fori_loop(0, n_chain, body, x)

    t_empty = _calibrate(x)
    flops = 2 * ROWS * D * F * 2 * n_chain
    t = timeit(chain_bf16, x, w1, w2) - t_empty
    print(f"bf16 chain: {t*1e3:.1f} ms  {flops/t/1e12:.1f} TFLOP/s")
    t = timeit(chain_int8, x, w1, w2) - t_empty
    print(f"int8 chain: {t*1e3:.1f} ms  {flops/t/1e12:.1f} Teff/s (incl dyn quant)")


def mode_pure(n_chain):
    """Bare int8 MXU rate, then +f32 scale epilogue (no activation quant)."""
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    xq = jax.random.randint(r1, (ROWS, D), -127, 128, jnp.int8)
    w1q = jax.random.randint(r2, (D, F), -127, 128, jnp.int8)
    w2q = jax.random.randint(r3, (F, D), -127, 128, jnp.int8)

    @jax.jit
    def chain_pure(xq, w1q, w2q):
        def body(i, x):
            h = mm_q(x, w1q).astype(jnp.int8)   # truncating cast, no scales
            return mm_q(h, w2q).astype(jnp.int8)
        return lax.fori_loop(0, n_chain, body, xq)

    @jax.jit
    def chain_deq_only(xq, w1q, w2q):
        sx = jnp.full((ROWS, 1), 0.01, jnp.float32)
        sw1 = jnp.full((1, F), 0.01, jnp.float32)
        sw2 = jnp.full((1, D), 0.01, jnp.float32)

        def body(i, x):
            h = (mm_q(x, w1q).astype(jnp.float32) * sx * sw1).astype(jnp.int8)
            return (mm_q(h, w2q).astype(jnp.float32) * sx * sw2).astype(jnp.int8)
        return lax.fori_loop(0, n_chain, body, xq)

    @jax.jit
    def empty(x):
        return x[0, :8].astype(jnp.int32) * 1

    t_empty = timeit(empty, xq)
    ops = 2 * ROWS * D * F * 2 * n_chain
    t = timeit(chain_pure, xq, w1q, w2q) - t_empty
    print(f"pure int8 matmul : {t*1e3:.1f} ms  {ops/t/1e12:.1f} TOPS")
    t = timeit(chain_deq_only, xq, w1q, w2q) - t_empty
    print(f"+f32 scale epilog: {t*1e3:.1f} ms  {ops/t/1e12:.1f} TOPS")


def mode_variants(n_chain):
    """Quant/epilogue variants of the dynamic int8 step."""
    x, w1, w2 = _bf16_inputs()

    def chain(step):
        @jax.jit
        def f(x, w1, w2):
            w1q, s1 = quant_cols(w1)
            w2q, s2 = quant_cols(w2)

            def body(i, x):
                return step(step(x, w1q, s1), w2q, s2) * 0.5

            return lax.fori_loop(0, n_chain, body, x)
        return f

    def v1(x, wq, sw):  # per-row f32 scales, f32 dequant (baseline)
        xq, sx = quant_rows(x)
        return (mm_q(xq, wq).astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)

    def v2(x, wq, sw):  # bf16 dequant chain (cheaper epilogue writes)
        sx = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-4) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        return mm_q(xq, wq).astype(jnp.bfloat16) * sx.astype(jnp.bfloat16) * sw.astype(jnp.bfloat16)

    def v3(x, wq, sw):  # per-TENSOR activation scale (cheapest quant)
        sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-4) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        return mm_q(xq, wq).astype(jnp.bfloat16) * sx.astype(jnp.bfloat16) * sw.astype(jnp.bfloat16)

    def v4(x, wq, sw):  # no round/clip (quant-op cost share)
        sx = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-4) * (1.0 / 127.0)
        xq = (x / sx).astype(jnp.int8)
        return mm_q(xq, wq).astype(jnp.bfloat16) * sx.astype(jnp.bfloat16) * sw.astype(jnp.bfloat16)

    t_empty = _calibrate(x)
    flops = 2 * ROWS * D * F * 2 * n_chain
    for name, step in [("v1 f32 deq", v1), ("v2 bf16 deq", v2),
                       ("v3 per-tensor", v3), ("v4 no-round", v4)]:
        t = timeit(chain(step), x, w1, w2) - t_empty
        print(f"{name}: {t*1e3:.1f} ms  {flops/t/1e12:.1f} Teff/s")


def mode_fused(n_chain):
    """ops/quant int8_matmul (XLA) vs int8_matmul_fused (Pallas) vs bf16."""
    from fddm_asr_tpu.ops.quant import int8_matmul, int8_matmul_fused

    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(r1, (ROWS, D), jnp.bfloat16)
    w1 = jax.random.normal(r2, (D, F), jnp.float32) * 0.03
    w2 = jax.random.normal(r3, (F, D), jnp.float32) * 0.03

    def chain(mm):
        @jax.jit
        def f(x, w1, w2):
            h = x
            for _ in range(n_chain):
                h = mm(mm(h, w1), w2)
            return h
        return f

    t_empty = _calibrate(x)
    ops = 2 * ROWS * D * F * 2 * n_chain
    for name, mm in (
        ("bf16 ", lambda a, b: a.astype(jnp.bfloat16) @ b.astype(jnp.bfloat16)),
        ("xla  ", lambda a, b: int8_matmul(a, b, out_dtype=jnp.bfloat16)),
        ("fused", lambda a, b: int8_matmul_fused(a, b, out_dtype=jnp.bfloat16)),
    ):
        t = timeit(chain(mm), x, w1, w2) - t_empty
        print(f"{name}: {t*1e3:7.1f} ms  {ops/t/1e12:6.1f} Teff/s")


def main(argv=None):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["xla", "pure", "variants", "fused"],
                    default="xla")
    ap.add_argument("--n-chain", type=int, default=None,
                    help="matmul pairs per program (default 48; fused 24)")
    args = ap.parse_args(argv)
    n_chain = args.n_chain or (24 if args.mode == "fused" else 48)
    {"xla": mode_xla, "pure": mode_pure,
     "variants": mode_variants, "fused": mode_fused}[args.mode](n_chain)


if __name__ == "__main__":
    main()
