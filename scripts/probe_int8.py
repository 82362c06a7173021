# -*- coding: utf-8 -*-
"""Microbenchmark: int8 MXU matmul vs bf16 at WavLM FFN shapes (v5e).

Decides whether a dynamic-quantized int8 dense path is worth building:
v5e peak is 394 TOPS int8 vs 197 TFLOP/s bf16.  The axon relay adds ~30 ms
dispatch per program, so each timed program chains N data-dependent
matmul pairs (D->F->D) to make device time dominate.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

N_CHAIN = 48


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


def int8_mm(x, wq, sw):
    xq, sx = quant_rows(x)
    y = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)


def main():
    B, L, D, F = 32, 1024, 1024, 4096
    rows = B * L
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(r1, (rows, D), jnp.bfloat16)
    w1 = jax.random.normal(r2, (D, F), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(r3, (F, D), jnp.bfloat16) * 0.02

    @jax.jit
    def chain_bf16(x, w1, w2):
        def body(i, x):
            return ((x @ w1) @ w2) * 0.5
        return lax.fori_loop(0, N_CHAIN, body, x)

    @jax.jit
    def chain_int8(x, w1, w2):
        w1q, s1 = quant_cols(w1)
        w2q, s2 = quant_cols(w2)

        def body(i, x):
            h = int8_mm(x, w1q, s1)
            return int8_mm(h, w2q, s2) * 0.5

        return lax.fori_loop(0, N_CHAIN, body, x)

    @jax.jit
    def empty(x):
        return x[0, :8] * 1.0

    t_empty = timeit(empty, x)
    print(f"empty program: {t_empty*1e3:.2f} ms")
    flops = 2 * rows * D * F * 2 * N_CHAIN  # 2 matmuls per chain step

    t = timeit(chain_bf16, x, w1, w2) - t_empty
    print(f"bf16 chain: {t*1e3:.1f} ms  {flops/t/1e12:.1f} TFLOP/s")

    t = timeit(chain_int8, x, w1, w2) - t_empty
    print(f"int8 chain: {t*1e3:.1f} ms  {flops/t/1e12:.1f} Teff/s (incl dyn quant)")


if __name__ == "__main__":
    main()
