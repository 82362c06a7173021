# -*- coding: utf-8 -*-
"""Micro-benchmark of the WavLM conv front-end variants on the default backend.

Times the 7-layer conv stack (B x 20 s waveform, bf16) under combinations of
LayerNorm statistics dtype (f32 like flax vs bf16) and GELU flavour (exact erf
vs tanh approximation), plus the convs alone, to locate the elementwise cost
identified in the round-1 profile (~40 ms of LN/GELU on the 64k-position
early feature maps).

Usage: python scripts/profile_frontend.py [--batch 16] [--seconds 20]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# wavlm-large front-end geometry
CONV_DIM = (512,) * 7
CONV_KERNEL = (10, 3, 3, 3, 3, 2, 2)
CONV_STRIDE = (5, 2, 2, 2, 2, 2, 2)
EPS = 1e-5


def make_params(rng):
    params = []
    cin = 1
    for dim, k in zip(CONV_DIM, CONV_KERNEL):
        rng, r1 = jax.random.split(rng)
        w = (jax.random.normal(r1, (k, cin, dim), jnp.float32) * 0.05).astype(jnp.bfloat16)
        b = jnp.zeros((dim,), jnp.bfloat16)
        scale = jnp.ones((dim,), jnp.bfloat16)
        shift = jnp.zeros((dim,), jnp.bfloat16)
        params.append((w, b, scale, shift))
        cin = dim
    return params


def ln(x, scale, shift, stats_dtype):
    xs = x.astype(stats_dtype)
    m = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.mean(jax.lax.square(xs), axis=-1, keepdims=True) - jax.lax.square(m)
    y = (xs - m) * jax.lax.rsqrt(var + EPS)
    y = y * scale.astype(stats_dtype) + shift.astype(stats_dtype)
    return y.astype(x.dtype)


def frontend(params, wave, *, stats_dtype, gelu_approx, with_ln=True, with_gelu=True):
    x = wave[..., None].astype(jnp.bfloat16)
    for (w, b, scale, shift), s in zip(params, CONV_STRIDE):
        x = jax.lax.conv_general_dilated(
            x, w, (s,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.bfloat16,
        ) + b
        if with_ln:
            x = ln(x, scale, shift, stats_dtype)
        if with_gelu:
            x = jax.nn.gelu(x, approximate=gelu_approx)
    return x


def time_fn(fn, *args, iters=5):
    # Reduce on device and pull the scalar to host each iteration: through the
    # remote-relay backend, block_until_ready alone has been observed to
    # return before execution completes.
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args).astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    return min(times), out


def conv_mm(x, w, b, stride):
    """Conv as sum-of-strided-matmuls: y = sum_j x[:, j::s] @ w[j].

    Avoids XLA's 1-D conv lowering; each tap is a plain [B*L, C]x[C, D] MXU
    matmul over a strided view.
    """
    k = w.shape[0]
    L_out = (x.shape[1] - k) // stride + 1
    y = None
    for j in range(k):
        xj = jax.lax.slice_in_dim(x, j, j + (L_out - 1) * stride + 1, stride, 1)
        t = jnp.einsum("blc,cd->bld", xj, w[j], preferred_element_type=jnp.bfloat16)
        y = t if y is None else y + t
    return y + b


def frontend_mm(params, wave, *, gelu_approx):
    x = wave[..., None].astype(jnp.bfloat16)
    for i, ((w, b, scale, shift), s) in enumerate(zip(params, CONV_STRIDE)):
        if i == 0:  # cin=1: conv is bandwidth-trivial, keep the conv lowering
            x = jax.lax.conv_general_dilated(
                x, w, (s,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.bfloat16,
            ) + b
        else:
            x = conv_mm(x, w, b, s)
        x = ln(x, scale, shift, jnp.float32)
        x = jax.nn.gelu(x, approximate=gelu_approx)
    return x


def per_layer(params, wave):
    """Time each conv layer alone on its real input shape."""
    x = wave[..., None].astype(jnp.bfloat16)
    for i, ((w, b, scale, shift), s) in enumerate(zip(params, CONV_STRIDE)):
        def one(x, w=w, b=b, s=s):
            return jax.lax.conv_general_dilated(
                x, w, (s,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.bfloat16,
            ) + b
        def one_mm(x, w=w, b=b, s=s):
            return conv_mm(x, w, b, s)
        dt, out = time_fn(jax.jit(one), x)
        if i == 0:
            dt_mm = float("nan")
        else:
            dt_mm, out_mm = time_fn(jax.jit(one_mm), x)
        print(f"  conv{i} in={tuple(x.shape)} k={w.shape[0]} s={s}: "
              f"conv {dt * 1e3:7.2f} ms   mm {dt_mm * 1e3:7.2f} ms")
        x = out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=20)
    ap.add_argument("--per-layer", action="store_true")
    args = ap.parse_args()

    rng = jax.random.key(0)
    params = make_params(rng)
    wave = jax.random.normal(rng, (args.batch, int(args.seconds * 16000)), jnp.float32) * 0.1

    # relay/dispatch overhead: a near-zero-work program, timed the same way
    overhead, _ = time_fn(jax.jit(lambda x: x[:, :8, :] + 1.0), wave[..., None])
    print(f"{'dispatch_overhead':26s} {overhead * 1e3:8.2f} ms")

    if args.per_layer:
        per_layer(params, wave)

    for name, approx in (("mm_frontend_erf", False), ("mm_frontend_tanh", True)):
        fn = jax.jit(functools.partial(frontend_mm, gelu_approx=approx))
        dt, _ = time_fn(fn, params, wave)
        print(f"{name:26s} {dt * 1e3:8.2f} ms")

    variants = {
        "conv_only": dict(stats_dtype=jnp.float32, gelu_approx=False, with_ln=False, with_gelu=False),
        "conv_gelu_only": dict(stats_dtype=jnp.float32, gelu_approx=False, with_ln=False),
        "f32stats_erf (current)": dict(stats_dtype=jnp.float32, gelu_approx=False),
        "f32stats_tanh": dict(stats_dtype=jnp.float32, gelu_approx=True),
        "bf16stats_erf": dict(stats_dtype=jnp.bfloat16, gelu_approx=False),
        "bf16stats_tanh": dict(stats_dtype=jnp.bfloat16, gelu_approx=True),
    }
    ref = None
    for name, kw in variants.items():
        fn = jax.jit(functools.partial(frontend, **kw))
        dt, out = time_fn(fn, params, wave)
        if name == "f32stats_erf (current)":
            ref = np.asarray(out, np.float32)
        err = ""
        if ref is not None and kw.get("with_ln", True) and kw.get("with_gelu", True):
            diff = np.abs(np.asarray(out, np.float32) - ref)
            err = f"  max|Δ|={diff.max():.3e} mean|Δ|={diff.mean():.3e}"
        print(f"{name:26s} {dt * 1e3:8.2f} ms{err}")


if __name__ == "__main__":
    main()
