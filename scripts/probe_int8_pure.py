# -*- coding: utf-8 -*-
"""Pure int8 MXU matmul rate (no quant/dequant epilogue).

Separates the int8 story: if xq @ wq alone runs near the 394 TOPS peak,
the ~245 Teff/s of the full dynamic path (probe_int8.py) is epilogue-bound
and a fused Pallas kernel (quant+matmul+dequant in VMEM) is worth building;
if the bare matmul is itself ~250, XLA's int8 MXU mapping is the ceiling.
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


def main():
    B, L, D, F = 32, 1024, 1024, 4096
    rows = B * L
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    xq = jax.random.randint(r1, (rows, D), -127, 128, jnp.int8)
    w1q = jax.random.randint(r2, (D, F), -127, 128, jnp.int8)
    w2q = jax.random.randint(r3, (F, D), -127, 128, jnp.int8)

    def mm(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @jax.jit
    def chain_pure(xq, w1q, w2q):
        def body(i, x):
            h = mm(x, w1q).astype(jnp.int8)   # truncating cast, no scales
            return mm(h, w2q).astype(jnp.int8)
        return lax.fori_loop(0, N_CHAIN, body, xq)

    @jax.jit
    def chain_deq_only(xq, w1q, w2q):
        # int8 matmul + f32 scale epilogue, but NO activation re-quant pass
        sx = jnp.full((rows, 1), 0.01, jnp.float32)
        sw1 = jnp.full((1, F), 0.01, jnp.float32)
        sw2 = jnp.full((1, D), 0.01, jnp.float32)

        def body(i, x):
            h = (mm(x, w1q).astype(jnp.float32) * sx * sw1).astype(jnp.int8)
            return (mm(h, w2q).astype(jnp.float32) * sx * sw2).astype(jnp.int8)
        return jax.lax.fori_loop(0, N_CHAIN, body, xq)

    @jax.jit
    def empty(x):
        return x[0, :8].astype(jnp.int32) * 1

    t_empty = timeit(empty, xq)
    ops = 2 * rows * D * F * 2 * N_CHAIN
    t = timeit(chain_pure, xq, w1q, w2q) - t_empty
    print(f"pure int8 matmul : {t*1e3:.1f} ms  {ops/t/1e12:.1f} TOPS")
    t = timeit(chain_deq_only, xq, w1q, w2q) - t_empty
    print(f"+f32 scale epilog: {t*1e3:.1f} ms  {ops/t/1e12:.1f} TOPS")


if __name__ == "__main__":
    main()
