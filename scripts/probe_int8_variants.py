# -*- coding: utf-8 -*-
"""Epilogue/quant variants for the int8 dense path (see probe_int8.py)."""
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


def quant_cols(w):
    sw = jnp.maximum(jnp.max(jnp.abs(w), 0, keepdims=True).astype(jnp.float32), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def mm_q(xq, wq):
    return lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def main():
    B, L, D, F = 32, 1024, 1024, 4096
    rows = B * L
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(r1, (rows, D), jnp.bfloat16)
    w1 = jax.random.normal(r2, (D, F), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(r3, (F, D), jnp.bfloat16) * 0.02

    def chain(step):
        @jax.jit
        def f(x, w1, w2):
            w1q, s1 = quant_cols(w1)
            w2q, s2 = quant_cols(w2)

            def body(i, x):
                return step(step(x, w1q, s1), w2q, s2) * 0.5

            return lax.fori_loop(0, N_CHAIN, body, x)
        return f

    # v1: per-row f32 scales, f32 dequant (baseline from probe_int8)
    def v1(x, wq, sw):
        sx = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True).astype(jnp.float32), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        y = mm_q(xq, wq)
        return (y.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)

    # v2: bf16 dequant chain (cheaper epilogue writes)
    def v2(x, wq, sw):
        sx = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-4) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        y = mm_q(xq, wq)
        return y.astype(jnp.bfloat16) * sx.astype(jnp.bfloat16) * sw.astype(jnp.bfloat16)

    # v3: per-TENSOR activation scale (scalar; cheapest quant+epilogue)
    def v3(x, wq, sw):
        sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-4) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        y = mm_q(xq, wq)
        return y.astype(jnp.bfloat16) * (sx.astype(jnp.bfloat16)) * sw.astype(jnp.bfloat16)

    # v4: no round/clip (truncating cast; tests quant-op cost share)
    def v4(x, wq, sw):
        sx = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-4) * (1.0 / 127.0)
        xq = (x / sx).astype(jnp.int8)
        y = mm_q(xq, wq)
        return y.astype(jnp.bfloat16) * sx.astype(jnp.bfloat16) * sw.astype(jnp.bfloat16)

    @jax.jit
    def empty(x):
        return x[0, :8] * 1.0

    t_empty = timeit(empty, x)
    flops = 2 * rows * D * F * 2 * N_CHAIN
    for name, step in [("v1 f32 deq", v1), ("v2 bf16 deq", v2),
                       ("v3 per-tensor", v3), ("v4 nocliproundd", v4)]:
        t = timeit(chain(step), x, w1, w2) - t_empty
        print(f"{name}: {t*1e3:.1f} ms  {flops/t/1e12:.1f} Teff/s")


if __name__ == "__main__":
    main()
