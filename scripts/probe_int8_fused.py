# -*- coding: utf-8 -*-
"""Fused-vs-XLA int8 dense path at WavLM-large FFN shapes (TPU).

Compares three implementations of the same dynamic-quant matmul chain
(x[32k,1024] @ w1[1024,4096] -> @ w2[4096,1024], N_CHAIN times):
  * xla   — ops/quant.int8_matmul (XLA materializes xq in HBM)
  * fused — ops/quant.int8_matmul_fused (Pallas: quantize in VMEM)
  * bf16  — plain bf16 matmuls (the full-precision anchor)
Anchors: pure int8 matmul = 379 TOPS, +f32 dequant = 329, XLA dynamic
path = 245 (scripts/probe_int8_pure.py / probe_int8.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from fddm_asr_tpu.ops.quant import int8_matmul, int8_matmul_fused  # noqa: E402

N_CHAIN = 24


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


def main():
    B, L, D, F = 32, 1024, 1024, 4096
    rows = B * L
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(r1, (rows, D), jnp.bfloat16)
    w1 = jax.random.normal(r2, (D, F), jnp.float32) * 0.03
    w2 = jax.random.normal(r3, (F, D), jnp.float32) * 0.03

    def chain(mm):
        @jax.jit
        def f(x, w1, w2):
            h = x
            for _ in range(N_CHAIN):
                h = mm(h, w1)
                h = mm(h, w2)
            return h
        return f

    @jax.jit
    def empty(x):
        return x[0, :8] * 1

    t_empty = timeit(empty, x)
    ops = 2 * rows * D * F * 2 * N_CHAIN

    for name, mm in (
        ("bf16 ", lambda a, b: (a.astype(jnp.bfloat16) @ b.astype(jnp.bfloat16))),
        ("xla  ", lambda a, b: int8_matmul(a, b, out_dtype=jnp.bfloat16)),
        ("fused", lambda a, b: int8_matmul_fused(a, b, out_dtype=jnp.bfloat16)),
    ):
        t = timeit(chain(mm), x, w1, w2) - t_empty
        print(f"{name}: {t*1e3:7.1f} ms  {ops/t/1e12:6.1f} Teff/s")


if __name__ == "__main__":
    main()
