# -*- coding: utf-8 -*-
"""Fused conv1d + LayerNorm + GELU Pallas kernel for the WavLM feature
extractor ("layer"-norm variant).

Device profiling (CLAUDE.md) shows the extractor front-end costs a large
share of the inference step at B=16: XLA materialises the [B, 64000, 512]-
scale feature maps for the conv, again for the f32 LayerNorm statistics, and
again for normalise+GELU.  This kernel performs, per (batch, time-block)
program: window DMA -> patch gather (reshape-based; Mosaic has no strided
vector loads) -> patch matmul (MXU) -> row LayerNorm (f32) -> exact GELU —
one HBM read of the input, one write of the output.

Geometry handling:
  * layer 0 (kernel 10 / stride 5 / C_in 1) is reframed host-side as
    kernel 2 / stride 1 over 5-sample frames ([B, T, 1] -> [B, T//5, 5]),
    identical arithmetic, 128-lane-friendlier;
  * layers 1-4: kernel 3 / stride 2;  layers 5-6: kernel 2 / stride 2.
  All satisfy k - s <= s, which the reshape patch-gather requires.

Windows of consecutive blocks overlap by (k-s) rows, which BlockSpec tiling
cannot express, so the input stays in ANY/HBM memory space and each program
DMAs its own [block_t*s + (k-s), Cin] window into VMEM scratch.

`conv_ln_gelu` dispatches: Pallas on TPU, XLA reference elsewhere.  Numerics
parity is tested in TPU interpret mode on CPU (tests/test_conv_frontend.py)
and on hardware by scripts/validate_pallas_tpu.py --conv.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _gelu_f32(x, tanh: bool = False):
    return jax.nn.gelu(x, approximate=tanh)


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |err| < 1.5e-7 (f32).

    Mosaic has no erf/erfc lowering; this keeps the kernel's GELU within
    bf16 resolution of the exact-erf definition.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel(x, tanh: bool = False):
    """Kernel-side GELU: exact-erf via the polynomial erf, or the tanh
    approximation (matching jax.nn.gelu(approximate=True) bit-for-bit —
    Mosaic lowers tanh natively)."""
    if tanh:
        c = np.float32(np.sqrt(2.0 / np.pi))
        return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))
    return 0.5 * x * (1.0 + _erf_poly(x * np.float32(1.0 / np.sqrt(2.0))))


def conv_ln_gelu_xla(
    x: jnp.ndarray,            # [B, T, Cin]
    w: jnp.ndarray,            # [k, Cin, Cout]
    b: Optional[jnp.ndarray],  # [Cout] or None
    ln_scale: jnp.ndarray,     # [Cout]
    ln_bias: jnp.ndarray,      # [Cout]
    stride: int,
    eps: float = 1e-5,
    gelu_tanh: bool = False,
) -> jnp.ndarray:
    """Reference semantics: VALID conv -> LayerNorm(channels) -> GELU
    (exact erf by default; tanh when WavLMConfig.gelu_approx_tanh)."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    out32 = out.astype(jnp.float32)
    mean = jnp.mean(out32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(out32 - mean), axis=-1, keepdims=True)
    normed = (out32 - mean) * jax.lax.rsqrt(var + eps)
    normed = normed * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    return _gelu_f32(normed, gelu_tanh).astype(x.dtype)


_OVERLAP = 32  # sublane-aligned rows fetched from the next block (>= any s)


def _make_kernel(block_t: int, k: int, s: int, cin: int, eps: float, out_dtype,
                 gelu_tanh: bool = False):
    """Kernel over Pallas-pipelined blocks (automatic double buffering).

    Inputs per program: base tile [block_t*s, cin] and a small _OVERLAP-row
    tile from the next block — BlockSpec-fed, so Pallas overlaps their DMA
    with the previous program's compute (the manual-DMA variant of this
    kernel serialised copy/compute and measured ~7% SLOWER than XLA).
    """

    def kernel(base_ref, next_ref, w_ref, b_ref, scale_ref, bias_ref, out_ref):
        base2d = base_ref[0]  # [block_t*s, cin]
        base = base2d.reshape(block_t, s * cin)
        out = jax.lax.dot_general(
            base, w_ref[: s * cin, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if k > s:
            # shifted tile rows [s, block_t*s + s): tail of base + head of next
            shifted = jnp.concatenate(
                [base2d[s:], next_ref[0, :s]], axis=0
            ).reshape(block_t, s * cin)
            out = out + jax.lax.dot_general(
                shifted[:, : (k - s) * cin], w_ref[s * cin :, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out = out + b_ref[...].astype(jnp.float32)
        mean = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(out - mean), axis=-1, keepdims=True)
        normed = (out - mean) * jax.lax.rsqrt(var + eps)
        normed = normed * scale_ref[...].astype(jnp.float32)
        normed = normed + bias_ref[...].astype(jnp.float32)
        out_ref[0] = _gelu_kernel(normed, gelu_tanh).astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("stride", "block_t", "interpret",
                                              "gelu_tanh"))
def conv_ln_gelu_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    stride: int,
    block_t: int = 512,
    interpret: bool = False,
    eps: float = 1e-5,
    gelu_tanh: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, Cin = x.shape
    k, cin_w, Cout = w.shape
    assert cin_w == Cin and k - stride <= stride, (k, stride, Cin)
    s = stride
    T_out = (T - k) // s + 1
    n_blocks = -(-T_out // block_t)
    T_out_pad = n_blocks * block_t
    bs = block_t * s  # base tile rows
    assert bs % _OVERLAP == 0, (block_t, s)
    # input must cover n_blocks base tiles plus the overlap tile read one
    # block ahead (the last program reads a zero-padded phantom tile)
    T_need = n_blocks * bs + _OVERLAP
    if T_need > T:
        x = jnp.pad(x, ((0, 0), (0, T_need - T), (0, 0)))
    if b is None:
        b = jnp.zeros((Cout,), jnp.float32)
    w2 = w.reshape(k * Cin, Cout)

    ratio = bs // _OVERLAP
    kernel = _make_kernel(block_t, k, s, Cin, eps, x.dtype, gelu_tanh)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T_out_pad, Cout), x.dtype),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, bs, Cin), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec(
                (1, _OVERLAP, Cin), lambda bi, ti: (bi, (ti + 1) * ratio, 0)
            ),
            pl.BlockSpec((k * Cin, Cout), lambda bi, ti: (0, 0)),
            pl.BlockSpec((Cout,), lambda bi, ti: (0,)),
            pl.BlockSpec((Cout,), lambda bi, ti: (0,)),
            pl.BlockSpec((Cout,), lambda bi, ti: (0,)),
        ],
        out_specs=pl.BlockSpec((1, block_t, Cout), lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(x, x, w2, b, ln_scale, ln_bias)
    return out[:, :T_out, :]


def conv_ln_gelu(
    x, w, b, ln_scale, ln_bias, stride: int,
    force_xla: bool = False, interpret: bool = False, gelu_tanh: bool = False,
) -> jnp.ndarray:
    """Dispatch wrapper; reframes the waveform layer (k=10, s=5, Cin=1)."""
    k, Cin, Cout = w.shape
    use_pallas = interpret or (not force_xla and jax.default_backend() != "cpu")
    if use_pallas and Cin == 1 and stride > 1 and k % stride == 0:
        # frames of `stride` samples: conv(k, s) == conv(k//s, 1) over frames
        B, T, _ = x.shape
        T_f = T // stride
        xf = x[:, : T_f * stride, 0].reshape(B, T_f, stride)
        wf = w.reshape(k // stride, stride, Cout)
        x, w, stride = xf, wf, 1
        k, Cin, Cout = w.shape
    # Mosaic DMA/scratch wants a 128-aligned channel dim; narrow-channel
    # layers (the waveform layer) stay on the XLA path — interpret mode
    # exercises the kernel on all geometries regardless.
    if not use_pallas or (Cin % 128 != 0 and not interpret):
        return conv_ln_gelu_xla(x, w, b, ln_scale, ln_bias, stride,
                                gelu_tanh=gelu_tanh)
    return conv_ln_gelu_pallas(x, w, b, ln_scale, ln_bias, stride,
                               interpret=interpret, gelu_tanh=gelu_tanh)
