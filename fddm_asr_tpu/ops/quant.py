# -*- coding: utf-8 -*-
"""Dynamic int8 dense layer for the frozen acoustic encoder (inference).

The v5e MXU runs int8 matmuls at 2x its bf16 rate (394 vs 197 TOPS peak).
Measured through XLA at WavLM FFN shapes ([32k, 1024] x [1024, 4096],
scripts/probe_int8.py): 245 Teff/s for the full dynamic-quant pipeline vs
185 TFLOP/s bf16 — a 1.32x matmul speedup, worth ~10% end-to-end on the
flagship transcribe step (FFN + QKV/out projections are ~49 ms of ~130 ms).

Scheme — symmetric dynamic quantization, chosen so NO calibration data and
NO checkpoint changes are needed:

  * weights: per-output-channel scale ``sw = max|w[:, j]| / 127`` computed
    from the full-precision kernel at trace time inside the jitted program
    (the quant pass is O(din*dout), ~0.003% of the matmul FLOPs, and is
    loop-invariant under ``lax.scan`` so XLA hoists it out of the scanned
    encoder body);
  * activations: per-row (per token) scale ``sx = max|x[b, l, :]| / 127``;
  * accumulate int8 x int8 -> int32 on the MXU
    (``preferred_element_type=int32``), dequantize with the rank-1 outer
    scale ``sx * sw`` in f32, cast back to the layer dtype.

``Int8Dense`` keeps nn.Dense's exact parameter layout (``kernel`` [din,
dout] f32, ``bias`` [dout]) so quantized and full-precision configurations
load the same checkpoints and share the HF weight converter.

This is an inference-path optimization for the FROZEN WavLM encoder
(reference freezes it: /root/reference/models/acoustic_encoder.py:49-51);
no gradients flow through it, so straight-through estimators are not
needed.  Off by default — the f32 parity suite and reference-compat paths
run full precision; enable via ``WavLMConfig.quant_dense="int8"``.
"""
from __future__ import annotations

from typing import Any, Optional

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dtype = Any


def quantize_rows_int8(x: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-row int8 quantization along the last axis.

    Returns ``(xq int8, scale f32)`` with ``scale`` shaped like ``x`` but
    with a size-1 last axis, such that ``xq * scale ~= x``.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0)
    return xq.astype(jnp.int8), scale


def quantize_cols_int8(w: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-output-channel int8 quantization of a [din, dout] kernel."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, eps) * (1.0 / 127.0)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127.0, 127.0)
    return wq.astype(jnp.int8), scale


def int8_matmul(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_dtype: Dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """``x @ kernel (+ bias)`` through the int8 MXU path.

    ``x`` [..., din] any float dtype; ``kernel`` [din, dout] full precision.
    Quantizes both operands on the fly (see module docstring) and returns
    ``out_dtype``.
    """
    xq, sx = quantize_rows_int8(x)
    wq, sw = quantize_cols_int8(kernel)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _fused_kernel(x_ref, wq_ref, sw_ref, bias_ref, out_ref, xq_ref, sx_ref,
                  *, out_dtype, eps):
    """Pallas body: per-row quantize (once per row-block) + int8 MXU matmul
    + f32 dequant/bias epilogue, all in VMEM.

    Grid is (M, N) with N innermost; the x block's index_map depends only on
    the M index, so Mosaic keeps it resident across the N sweep and the
    quantization runs once per row-block (guarded by ``j == 0``), its result
    parked in VMEM scratch.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _quantize_rows():
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        scale = jnp.maximum(amax, eps) * (1.0 / 127.0)
        xq_ref[...] = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
        sx_ref[...] = scale

    acc = jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...]
    if bias_ref is not None:
        y = y + bias_ref[...]
    out_ref[...] = y.astype(out_dtype)


def int8_matmul_fused(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_dtype: Dtype = jnp.bfloat16,
    *,
    block_m: int = 512,
    block_n: int = 512,
    eps: float = 1e-8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused-quantization variant of :func:`int8_matmul` (single Pallas pass).

    Numerics are identical to the XLA path (same symmetric per-row/
    per-channel scheme, int32 accumulation, f32 epilogue); the difference is
    that the activation quantization never round-trips HBM: XLA materializes
    ``xq`` (an extra read+write of the activations plus a separate abs-max
    reduction pass, measured at ~245 Teff/s vs the 379 TOPS pure-int8-matmul
    rate on v5e — scripts/probe_int8.py --mode pure), while here the row-block is
    quantized once in VMEM and consumed in place by the MXU.

    Weight quantization stays outside the kernel: it is loop-invariant under
    ``lax.scan`` over encoder layers, so XLA hoists it out of the scanned
    body exactly as in the unfused path.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    *lead, din = x.shape
    dout = kernel.shape[1]
    rows = 1
    for d in lead:
        rows *= d
    if rows == 0:  # empty batch: match nn.Dense's shape semantics
        return jnp.zeros((*lead, dout), out_dtype)
    x2 = x.reshape(rows, din)

    wq, sw = quantize_cols_int8(kernel)

    # clamp blocks to the (padded) problem, keeping TPU tile alignment:
    # sublane multiples of 8 for the row block, lane multiples of 128 for
    # the output-channel block
    block_m = min(block_m, -(-rows // 8) * 8)
    block_n = min(block_n, -(-dout // 128) * 128)

    # fit the working set under the TPU's ~16 MB scoped-VMEM limit
    # (double-buffered x/w/out blocks + xq/sx scratch + int32 acc + f32 y)
    def _vmem_bytes(bm, bn):
        x_bytes = 2 if x2.dtype == jnp.bfloat16 else 4
        return (2 * bm * din * x_bytes + bm * din      # x in (x2) + xq scratch
                + 2 * din * bn                          # wq in (x2)
                + 2 * bm * bn * 2                       # out (x2)
                + bm * bn * 8)                          # acc int32 + y f32

    vmem_budget = 13 * 2**20  # measured sweet spot (probe_int8.py --mode fused)
    # shrink while PRESERVING tile alignment (sublane x8 / lane x128)
    while block_m > 64 and _vmem_bytes(block_m, block_n) > vmem_budget:
        block_m = max(64, (block_m // 2 // 8) * 8)
    while block_n > 128 and _vmem_bytes(block_m, block_n) > vmem_budget:
        block_n = max(128, (block_n // 2 // 128) * 128)
    pad_m = (-rows) % block_m
    pad_n = (-dout) % block_n
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    if pad_n:
        wq = jnp.pad(wq, ((0, 0), (0, pad_n)))
        sw = jnp.pad(sw, ((0, 0), (0, pad_n)))
    M, N = x2.shape[0], wq.shape[1]

    operands = [x2, wq, sw]
    in_specs = [
        pl.BlockSpec((block_m, din), lambda i, j: (i, 0)),
        pl.BlockSpec((din, block_n), lambda i, j: (0, j)),
        pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
    ]
    if bias is not None:
        b2 = bias.astype(jnp.float32).reshape(1, dout)
        if pad_n:
            b2 = jnp.pad(b2, ((0, 0), (0, pad_n)))
        operands.append(b2)
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j: (0, j)))
        body = functools.partial(_fused_kernel, out_dtype=out_dtype, eps=eps)
    else:
        def body(x_ref, wq_ref, sw_ref, out_ref, xq_ref, sx_ref):
            return _fused_kernel(
                x_ref, wq_ref, sw_ref, None, out_ref, xq_ref, sx_ref,
                out_dtype=out_dtype, eps=eps,
            )

    out = pl.pallas_call(
        body,
        grid=(M // block_m, N // block_n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, din), jnp.int8),
            pltpu.VMEM((block_m, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    if pad_m or pad_n:
        out = out[:rows, :dout]
    return out.reshape(*lead, dout)


class Int8Dense(nn.Module):
    """Drop-in nn.Dense replacement running its matmul on the int8 MXU.

    Parameter layout is bit-identical to ``nn.Dense`` (``kernel`` [din,
    features], optional ``bias`` [features]) so checkpoints are
    interchangeable with the full-precision configuration.  ``fused=True``
    routes through the single-pass Pallas kernel (int8_matmul_fused).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias else None
        )
        if self.fused:
            return int8_matmul_fused(x, kernel, bias, out_dtype=self.dtype)
        return int8_matmul(x, kernel, bias, out_dtype=self.dtype)
