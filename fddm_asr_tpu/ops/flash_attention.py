# -*- coding: utf-8 -*-
"""Pallas TPU attention kernels.

`wavlm_gated_attention` fuses WavLM's gated relative-position-bias attention
into one VMEM-resident kernel per (batch, head, q-block):

    scores = (q k^T) / sqrt(dh) + gate * pos_bias + key_mask
    out    = softmax(scores) v

The XLA path materialises the gated bias [B, H, L, L] in HBM (for
wavlm-large at B=8, S=1024: ~0.5 GB written + read back) and a second
[B, H, L, L] for the attention weights; the fused kernel streams both through
VMEM — the dominant HBM-bandwidth saving of the encoder stack.  The shared
`pos_bias` [H, L, L] stays in HBM and each program DMAs only its
[q_block, Lk] slice.

Two VMEM regimes:

  * **Resident-K kernel** (`wavlm_gated_attention_packed`): at FDDM audio
    lengths (20 s -> 999 frames, padded to 1024 lanes) a full key row
    [Lk, dh] plus a [bq, Lk] score tile fit comfortably in VMEM (~1 MB at
    bf16), so each program holds K/V whole.  Fastest at flagship shapes;
    VMEM-bounded at Lk ≈ 4096.
  * **Flash kernel** (`wavlm_gated_attention_packed_flash`): classic
    blockwise running-softmax — a k-block grid axis (innermost) with
    per-row max/sum/accumulator scratch carried across k-steps, so Lk is
    UNBOUNDED (tested to 8192; the long-context story SURVEY §5 assigns
    here).  The dispatcher flips to it automatically past the resident-K
    VMEM cliff.

Remaining long-context ceiling: the model's position bias is materialised
as [H, L, L] in HBM (O(L²)) by the caller.  It is a Toeplitz-of-buckets
matrix (depends only on i-j), so the next step — if ever needed past
L~16k — is passing the [H, 2L-1] diagonal form and reconstructing each
[bq, bk] block in-kernel (log2(bq) barrel-shift rolls); documented, not
built: at FDDM scale the bias DMA is already amortised across the batch by
grid ordering.

All kernels have a pure-XLA reference fallback used on CPU and in tests; the
pallas path activates only on TPU backends (tests drive the flash kernel in
interpret mode on CPU; scripts/validate_pallas_tpu.py re-validates on TPU).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = float(np.finfo(np.float32).min)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def wavlm_gated_attention_xla(
    q: jnp.ndarray,        # [B, L, H, dh]
    k: jnp.ndarray,        # [B, L, H, dh]
    v: jnp.ndarray,        # [B, L, H, dh]
    pos_bias: jnp.ndarray,  # [H, L, L]
    gate: jnp.ndarray,      # [B, H, L]
    key_mask: Optional[jnp.ndarray] = None,  # [B, L] True=keep
) -> jnp.ndarray:
    """Reference XLA implementation (numerics target for the kernel)."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    scores = scores + gate[..., None].astype(jnp.float32) * pos_bias[None].astype(jnp.float32)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref, out_ref, *, scale):
    # blocks: q [1, 1, bq, dh], k/v [1, 1, Lk, dh], bias [1, bq, Lk],
    # gate [1, 1, bq, 1], mask [1, 1, Lk] (int8), out [1, 1, bq, dh]
    # scale folded into the small q block (saves a [bq, Lk] pass)
    q = q_ref[0, 0] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, Lk]
    gate = gate_ref[0, 0].astype(jnp.float32)  # [bq, 1] — keep 2D for Mosaic
    scores = scores + gate * bias_ref[0].astype(jnp.float32)
    mask = mask_ref[0] != 0  # [1, Lk] — keep 2D for Mosaic
    scores = jnp.where(mask, scores, _NEG_INF)
    # row softmax in f32; reciprocal-multiply instead of a [bq, Lk] divide
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s_inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    weights = (e * s_inv).astype(v.dtype)
    out_ref[0, 0] = jax.lax.dot_general(
        weights, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def wavlm_gated_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_bias: jnp.ndarray,
    gate: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    block_q: int = 512,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H, dh = q.shape
    Lq = _round_up(L, block_q)
    Lk = _round_up(L, 128)

    # [B, H, L, dh] layout for blocking; pad to tile boundaries
    def bhld(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        return jnp.pad(x, ((0, 0), (0, 0), (0, Lq - L), (0, 0)))

    qt, kt, vt = bhld(q), bhld(k), bhld(v)
    kt = kt[:, :, :Lk] if Lq >= Lk else jnp.pad(kt, ((0, 0), (0, 0), (0, Lk - Lq), (0, 0)))
    vt = vt[:, :, :Lk] if Lq >= Lk else jnp.pad(vt, ((0, 0), (0, 0), (0, Lk - Lq), (0, 0)))
    bias_p = jnp.pad(pos_bias, ((0, 0), (0, Lq - L), (0, Lk - L)))
    # gate [B, H, Lq, 1] / mask [B, 1, Lk]: trailing singleton dims keep the
    # Pallas "last two block dims divisible-or-full" lowering rule satisfied
    gate_p = jnp.pad(gate, ((0, 0), (0, 0), (0, Lq - L)))[..., None]
    if key_mask is None:
        key_mask = jnp.ones((B, L), bool)
    mask_p = jnp.pad(key_mask.astype(jnp.int8), ((0, 0), (0, Lk - L)))[:, None, :]

    scale = 1.0 / float(np.sqrt(dh))
    # Grid order (h, i, b) — batch innermost — keeps the [bq, Lk] f32 slice
    # of the shared position bias RESIDENT across all B programs (pallas
    # skips the DMA when the index map is unchanged between consecutive
    # steps).  The naive (b, h, i) order re-fetched the bias per batch
    # element: ~1 GB/layer of HBM traffic at B=16, the kernel's real
    # bottleneck on v5e.  k/v are re-fetched per program instead, which a
    # large block_q amortises (Lk*dh bf16 = 128 KB vs the 2 MB bias block).
    grid = (H, Lq // block_q, B)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Lk, dh), lambda h, i, b: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Lk, dh), lambda h, i, b: (b, h, 0, 0)),
            pl.BlockSpec((1, block_q, Lk), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Lk), lambda h, i, b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh), lambda h, i, b: (b, h, i, 0)),
    )(qt, kt, vt, bias_p, gate_p, mask_p)
    out = out[:, :, :L]  # [B, H, L, dh]
    return jnp.transpose(out, (0, 2, 1, 3))


def _kernel_packed(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref, out_ref,
                   *, scale, dh):
    # blocks: q [1, bq, 2*dh], k/v [1, Lk, 2*dh], bias [1, 2, bq, Lk],
    # gate [1, 1, bq, 2], mask [1, 1, Lk] (int8), out [1, bq, 2*dh]
    mask = mask_ref[0] != 0  # [1, Lk]
    outs = []
    for j in range(2):
        q = q_ref[0, :, j * dh:(j + 1) * dh] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0, :, j * dh:(j + 1) * dh]
        v = v_ref[0, :, j * dh:(j + 1) * dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, Lk]
        gate = gate_ref[0, 0, :, j:j + 1].astype(jnp.float32)  # [bq, 1]
        scores = scores + gate * bias_ref[0, j].astype(jnp.float32)
        scores = jnp.where(mask, scores, _NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        s_inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        weights = (e * s_inv).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            weights, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype))
    out_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q"))
def wavlm_gated_attention_packed(
    q: jnp.ndarray,        # [B, L, H*dh] — natural Dense-output layout
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_bias: jnp.ndarray,  # [H, L, L] (f32)
    gate: jnp.ndarray,      # [B, H, L]
    key_mask: Optional[jnp.ndarray] = None,  # [B, L] True=keep
    num_heads: int = 16,
    block_q: int = 512,
) -> jnp.ndarray:
    """Fused gated attention over head-PACKED q/k/v.

    v2 of the kernel: consumes q/k/v exactly as the qkv projections produce
    them ([B, L, H*dh]) and writes the output in the same layout, so XLA
    inserts NO transposes/reshape-copies around the call — the v1 wrapper's
    per-layer [B,H,L,dh] relayouts + pads cost ~26 ms/step at B=16 on v5e.
    Each program handles TWO heads (2*dh = 128 lanes satisfies the Mosaic
    lane-blocking rule for dh=64); the per-head lane sub-slices are cheap
    in-register relayouts.  Grid order (head-pair, q-block, batch) keeps the
    f32 bias block resident across the batch (see v1 comment).  When L is a
    multiple of 128 (seq_pad_multiple=128 in the encoder) every jnp.pad here
    is zero-width and elided.
    """
    from jax.experimental import pallas as pl

    B, L, HD = q.shape
    H = num_heads
    dh = HD // H
    assert H % 2 == 0 and dh * H == HD
    Lq = _round_up(L, block_q)
    Lk = _round_up(L, 128)
    padq = ((0, 0), (0, Lq - L), (0, 0))
    qp = jnp.pad(q, padq)
    kp = jnp.pad(k, ((0, 0), (0, Lk - L), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lk - L), (0, 0)))
    # bias [H, L, L] -> [H//2, 2, Lq, Lk]; gate [B, H, L] -> [B, H//2, Lq, 2]
    bias_p = jnp.pad(pos_bias, ((0, 0), (0, Lq - L), (0, Lk - L)))
    bias_p = bias_p.reshape(H // 2, 2, Lq, Lk)
    gate_p = jnp.pad(gate, ((0, 0), (0, 0), (0, Lq - L)))
    gate_p = jnp.transpose(gate_p.reshape(B, H // 2, 2, Lq), (0, 1, 3, 2))
    if key_mask is None:
        key_mask = jnp.ones((B, L), bool)
    mask_p = jnp.pad(key_mask.astype(jnp.int8), ((0, 0), (0, Lk - L)))[:, None, :]

    scale = 1.0 / float(np.sqrt(dh))
    grid = (H // 2, Lq // block_q, B)
    out = pl.pallas_call(
        functools.partial(_kernel_packed, scale=scale, dh=dh),
        out_shape=jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * dh), lambda h, i, b: (b, i, h)),
            pl.BlockSpec((1, Lk, 2 * dh), lambda h, i, b: (b, 0, h)),
            pl.BlockSpec((1, Lk, 2 * dh), lambda h, i, b: (b, 0, h)),
            pl.BlockSpec((1, 2, block_q, Lk), lambda h, i, b: (h, 0, i, 0)),
            pl.BlockSpec((1, 1, block_q, 2), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Lk), lambda h, i, b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 2 * dh), lambda h, i, b: (b, i, h)),
    )(qp, kp, vp, bias_p, gate_p, mask_p)
    return out[:, :L]


def _kernel_packed_flash(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref,
                         out_ref, m_ref, l_ref, acc_ref, *, scale, dh, nk):
    """Blockwise running-softmax body; grid (head-pair, q-block, batch,
    k-block) with the k axis INNERMOST so the scratch accumulators carry
    across k-steps of one (h, i, b) program family.

    blocks: q [1, bq, 2dh], k/v [1, bk, 2dh], bias [1, 2, bq, bk],
    gate [1, 1, bq, 2], mask [1, 1, bk] (int8), out [1, bq, 2dh];
    scratch (f32): m/l [2, bq, 1], acc [2, bq, dh].
    """
    from jax.experimental import pallas as pl

    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        # finite "neg-inf": -inf would produce exp(-inf - -inf) = nan on
        # the first not-yet-seen row; with the finite min float the
        # correction underflows to exactly 0 instead
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mask = mask_ref[0] != 0  # [1, bk]
    for h in range(2):
        q = q_ref[0, :, h * dh:(h + 1) * dh] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0, :, h * dh:(h + 1) * dh]
        v = v_ref[0, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        gate = gate_ref[0, 0, :, h:h + 1].astype(jnp.float32)  # [bq, 1]
        s = s + gate * bias_ref[0, h].astype(jnp.float32)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[h]                             # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)                # [bq, 1]
        p = jnp.exp(s - m_new)                        # [bq, bk] f32
        l_ref[h] = l_ref[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[h] = acc_ref[h] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[h] = m_new

    @pl.when(j == nk - 1)
    def _finish():
        outs = []
        for h in range(2):
            # fully-masked rows (pad queries, sliced off by the wrapper)
            # have l == 0; clamp to avoid 0/0
            l = jnp.maximum(l_ref[h], jnp.asarray(1e-30, jnp.float32))
            outs.append((acc_ref[h] * (1.0 / l)).astype(out_ref.dtype))
        out_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "block_k",
                                             "interpret"))
def wavlm_gated_attention_packed_flash(
    q: jnp.ndarray,        # [B, L, H*dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_bias: jnp.ndarray,  # [H, L, L] (f32)
    gate: jnp.ndarray,      # [B, H, L]
    key_mask: Optional[jnp.ndarray] = None,  # [B, L] True=keep
    num_heads: int = 16,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash (k-block running-softmax) variant of the packed kernel.

    Unbounded Lk: VMEM holds only [bq, bk] tiles + [bq, dh] accumulators.
    Same operand layouts and numerics target as
    `wavlm_gated_attention_packed`; preferred automatically past the
    resident-K VMEM cliff (see `wavlm_gated_attention_heads_packed`).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, HD = q.shape
    H = num_heads
    dh = HD // H
    assert H % 2 == 0 and dh * H == HD
    block_q = min(block_q, _round_up(L, 128))
    block_k = min(block_k, _round_up(L, 128))
    Lq = _round_up(L, block_q)
    Lk = _round_up(L, block_k)
    qp = jnp.pad(q, ((0, 0), (0, Lq - L), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Lk - L), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lk - L), (0, 0)))
    bias_p = jnp.pad(pos_bias, ((0, 0), (0, Lq - L), (0, Lk - L)))
    bias_p = bias_p.reshape(H // 2, 2, Lq, Lk)
    gate_p = jnp.pad(gate, ((0, 0), (0, 0), (0, Lq - L)))
    gate_p = jnp.transpose(gate_p.reshape(B, H // 2, 2, Lq), (0, 1, 3, 2))
    if key_mask is None:
        key_mask = jnp.ones((B, L), bool)
    mask_p = jnp.pad(key_mask.astype(jnp.int8), ((0, 0), (0, Lk - L)))[:, None, :]

    scale = 1.0 / float(np.sqrt(dh))
    nk = Lk // block_k
    grid = (H // 2, Lq // block_q, B, nk)
    out = pl.pallas_call(
        functools.partial(_kernel_packed_flash, scale=scale, dh=dh, nk=nk),
        out_shape=jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * dh), lambda h, i, b, j: (b, i, h)),
            pl.BlockSpec((1, block_k, 2 * dh), lambda h, i, b, j: (b, j, h)),
            pl.BlockSpec((1, block_k, 2 * dh), lambda h, i, b, j: (b, j, h)),
            pl.BlockSpec((1, 2, block_q, block_k), lambda h, i, b, j: (h, 0, i, j)),
            pl.BlockSpec((1, 1, block_q, 2), lambda h, i, b, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k), lambda h, i, b, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 2 * dh), lambda h, i, b, j: (b, i, h)),
        scratch_shapes=[
            pltpu.VMEM((2, block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((2, block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((2, block_q, dh), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(qp, kp, vp, bias_p, gate_p, mask_p)
    return out[:, :L]


# ---------------------------------------------------------------------------
# Trainable fused attention: forward-with-logsumexp + flash-style backward.
#
# Training mode (deterministic=False) previously fell back to the XLA path,
# which materialises the gated bias AND the attention probabilities as
# [B, H, L, L] HBM tensors in BOTH directions — at B=16 x 20 s (L=999,
# wavlm-large) that is ~0.5 GB per tensor per layer per pass, the dominant
# HBM traffic of the fine-tune step (scripts/profile_finetune.py).  The
# kernels below keep every [bq, Lk] tile in VMEM:
#
#   forward:  out = softmax(scale*q k^T + gate*bias + mask) v, plus the
#             row logsumexp (LSE) needed to reconstruct P in the backward.
#   backward: with P = exp(S - LSE) recomputed blockwise,
#             dV     = P^T dO
#             dP     = dO V^T
#             dS     = P * (dP - delta),  delta = rowsum(dO * O)
#             dQ     = scale * dS K           (kernel A, with dgate)
#             dK     = scale * dS^T Q         (kernel B)
#             dgate  = rowsum(dS * bias)      (kernel A)
#             dbias  = sum_b dS * gate        (kernel B, accumulated across
#                                              the batch grid axis)
#
# Gradients are exact for the masked softmax: masked keys have S = -inf in
# both passes, so P and dS vanish there; padded query rows receive zero
# cotangents (dO is zero-padded), so dP = delta = 0 kills their dS.
# Only the resident-K regime (L <= _RESIDENT_K_MAX) is fused — FDDM trains
# at ~1k frames; longer audio falls back to XLA (chunked training is the
# documented long-context path).
# ---------------------------------------------------------------------------


def _kernel_packed_fwd_lse(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref,
                           out_ref, lse_ref, *, scale, dh):
    """`_kernel_packed` + row logsumexp output [*, bq, 2] (f32)."""
    mask = mask_ref[0] != 0  # [1, Lk]
    outs, lses = [], []
    for j in range(2):
        q = q_ref[0, :, j * dh:(j + 1) * dh] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0, :, j * dh:(j + 1) * dh]
        v = v_ref[0, :, j * dh:(j + 1) * dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, Lk]
        gate = gate_ref[0, 0, :, j:j + 1].astype(jnp.float32)  # [bq, 1]
        scores = scores + gate * bias_ref[0, j].astype(jnp.float32)
        scores = jnp.where(mask, scores, _NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        l = jnp.maximum(l, jnp.asarray(1e-30, jnp.float32))
        weights = (e * (1.0 / l)).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            weights, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype))
        lses.append(m + jnp.log(l))
    out_ref[0] = jnp.concatenate(outs, axis=-1)
    lse_ref[0, 0] = jnp.concatenate(lses, axis=-1)


def _kernel_packed_bwd_dq(q_ref, k_ref, v_ref, bias_ref, gate_ref, lse_ref,
                          delta_ref, do_ref, mask_ref, dq_ref, dgate_ref,
                          *, scale, dh):
    """dQ + dgate for one (head-pair, q-block, batch) program."""
    mask = mask_ref[0] != 0  # [1, Lk]
    dqs, dgs = [], []
    for h in range(2):
        q = q_ref[0, :, h * dh:(h + 1) * dh]
        k = k_ref[0, :, h * dh:(h + 1) * dh]
        v = v_ref[0, :, h * dh:(h + 1) * dh]
        do = do_ref[0, :, h * dh:(h + 1) * dh]
        gate = gate_ref[0, 0, :, h:h + 1].astype(jnp.float32)   # [bq, 1]
        lse = lse_ref[0, 0, :, h:h + 1]                         # [bq, 1]
        delta = delta_ref[0, 0, :, h:h + 1]                     # [bq, 1]
        bias = bias_ref[0, h].astype(jnp.float32)               # [bq, Lk]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.asarray(scale, jnp.float32)
        s = s + gate * bias
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp(s - lse)                                    # [bq, Lk] f32
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                       # [bq, Lk]
        ds = p * (dp - delta)
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.asarray(scale, jnp.float32)
        dqs.append(dq.astype(dq_ref.dtype))
        dgs.append(jnp.sum(ds * bias, axis=-1, keepdims=True))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)
    dgate_ref[0, 0] = jnp.concatenate(dgs, axis=-1)


def _kernel_packed_bwd_dkv(q_ref, k_ref, v_ref, bias_ref, gate_ref, lse_ref,
                           delta_ref, do_ref, mask_ref,
                           dk_ref, dv_ref, dbias_ref, *, scale, dh):
    """dK + dV + dbias for one (head-pair, k-block, batch) program.

    The batch grid axis is INNERMOST and the dbias output block's index map
    ignores it, so the block stays resident in VMEM across all B programs
    and accumulates sum_b dS*gate (same revisiting trick the forward uses
    for the bias INPUT)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(2)
    mask = mask_ref[0] != 0  # [1, bk]
    dks, dvs, dbs = [], [], []
    for h in range(2):
        q = q_ref[0, :, h * dh:(h + 1) * dh]                    # [Lq, dh]
        k = k_ref[0, :, h * dh:(h + 1) * dh]                    # [bk, dh]
        v = v_ref[0, :, h * dh:(h + 1) * dh]
        do = do_ref[0, :, h * dh:(h + 1) * dh]                  # [Lq, dh]
        gate = gate_ref[0, 0, :, h:h + 1].astype(jnp.float32)   # [Lq, 1]
        lse = lse_ref[0, 0, :, h:h + 1]
        delta = delta_ref[0, 0, :, h:h + 1]
        bias = bias_ref[0, h].astype(jnp.float32)               # [Lq, bk]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.asarray(scale, jnp.float32)
        s = s + gate * bias
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp(s - lse)                                    # [Lq, bk]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                       # [Lq, bk]
        ds = p * (dp - delta)
        dk = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.asarray(scale, jnp.float32)                     # [bk, dh]
        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [bk, dh]
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
        dbs.append(ds * gate)                                   # [Lq, bk]
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)
    db = jnp.stack(dbs)  # [2, Lq, bk] f32

    @pl.when(b == 0)
    def _init():
        dbias_ref[0] = db

    @pl.when(b > 0)
    def _acc():
        dbias_ref[0] = dbias_ref[0] + db


def _train_layout(q, k, v, pos_bias, gate, key_mask, num_heads, block_q):
    """Pad/pack operands into the kernel layouts (shared fwd/bwd)."""
    B, L, HD = q.shape
    H = num_heads
    dh = HD // H
    Lq = _round_up(L, block_q)
    Lk = _round_up(L, 128)
    qp = jnp.pad(q, ((0, 0), (0, Lq - L), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Lk - L), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lk - L), (0, 0)))
    bias_p = jnp.pad(pos_bias, ((0, 0), (0, Lq - L), (0, Lk - L)))
    bias_p = bias_p.reshape(H // 2, 2, Lq, Lk)
    gate_p = jnp.pad(gate, ((0, 0), (0, 0), (0, Lq - L)))
    gate_p = jnp.transpose(gate_p.reshape(B, H // 2, 2, Lq), (0, 1, 3, 2))
    if key_mask is None:
        key_mask = jnp.ones((B, L), bool)
    mask_p = jnp.pad(key_mask.astype(jnp.int8), ((0, 0), (0, Lk - L)))[:, None, :]
    return qp, kp, vp, bias_p, gate_p, mask_p, (B, L, HD, H, dh, Lq, Lk)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "interpret"))
def _train_forward(q, k, v, pos_bias, gate, key_mask, num_heads, block_q,
                   interpret):
    from jax.experimental import pallas as pl

    qp, kp, vp, bias_p, gate_p, mask_p, dims = _train_layout(
        q, k, v, pos_bias, gate, key_mask, num_heads, block_q)
    B, L, HD, H, dh, Lq, Lk = dims
    scale = 1.0 / float(np.sqrt(dh))
    grid = (H // 2, Lq // block_q, B)
    out, lse = pl.pallas_call(
        functools.partial(_kernel_packed_fwd_lse, scale=scale, dh=dh),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
            jax.ShapeDtypeStruct((B, H // 2, Lq, 2), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * dh), lambda h, i, b: (b, i, h)),
            pl.BlockSpec((1, Lk, 2 * dh), lambda h, i, b: (b, 0, h)),
            pl.BlockSpec((1, Lk, 2 * dh), lambda h, i, b: (b, 0, h)),
            pl.BlockSpec((1, 2, block_q, Lk), lambda h, i, b: (h, 0, i, 0)),
            pl.BlockSpec((1, 1, block_q, 2), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Lk), lambda h, i, b: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, 2 * dh), lambda h, i, b: (b, i, h)),
            pl.BlockSpec((1, 1, block_q, 2), lambda h, i, b: (b, h, i, 0)),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias_p, gate_p, mask_p)
    return out[:, :L], out, lse


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_q", "block_k",
                                    "interpret"))
def _train_backward(q, k, v, pos_bias, gate, key_mask, out_p, lse, dout,
                    num_heads, block_q, block_k, interpret):
    from jax.experimental import pallas as pl

    qp, kp, vp, bias_p, gate_p, mask_p, dims = _train_layout(
        q, k, v, pos_bias, gate, key_mask, num_heads, block_q)
    B, L, HD, H, dh, Lq, Lk = dims
    scale = 1.0 / float(np.sqrt(dh))
    dop = jnp.pad(dout, ((0, 0), (0, Lq - L), (0, 0)))
    # delta = per-head rowsum(dO * O), packed like gate/lse: [B, H/2, Lq, 2]
    prod = (dop.astype(jnp.float32) * out_p.astype(jnp.float32))
    delta = prod.reshape(B, Lq, H // 2, 2, dh).sum(-1)
    delta = jnp.transpose(delta, (0, 2, 1, 3))

    grid_q = (H // 2, Lq // block_q, B)
    dq, dgate_p = pl.pallas_call(
        functools.partial(_kernel_packed_bwd_dq, scale=scale, dh=dh),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
            jax.ShapeDtypeStruct((B, H // 2, Lq, 2), jnp.float32),
        ),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * dh), lambda h, i, b: (b, i, h)),
            pl.BlockSpec((1, Lk, 2 * dh), lambda h, i, b: (b, 0, h)),
            pl.BlockSpec((1, Lk, 2 * dh), lambda h, i, b: (b, 0, h)),
            pl.BlockSpec((1, 2, block_q, Lk), lambda h, i, b: (h, 0, i, 0)),
            pl.BlockSpec((1, 1, block_q, 2), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 2), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 2), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, block_q, 2 * dh), lambda h, i, b: (b, i, h)),
            pl.BlockSpec((1, 1, Lk), lambda h, i, b: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, 2 * dh), lambda h, i, b: (b, i, h)),
            pl.BlockSpec((1, 1, block_q, 2), lambda h, i, b: (b, h, i, 0)),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias_p, gate_p, lse, delta, dop, mask_p)

    # Lk is a multiple of 128 but not necessarily of block_k (e.g. L=384
    # pads to Lk=384; block_k=256 would floor-divide the grid to one step
    # and leave the tail 128 key rows' dk/dv uninitialized and their dbias
    # columns unaccumulated).  Shrink block_k to a divisor of Lk so the
    # grid tiles every key row.
    block_k = math.gcd(min(block_k, Lk), Lk)
    grid_k = (H // 2, Lk // block_k, B)
    dk, dv, dbias_p = pl.pallas_call(
        functools.partial(_kernel_packed_bwd_dkv, scale=scale, dh=dh),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lk, HD), k.dtype),
            jax.ShapeDtypeStruct((B, Lk, HD), v.dtype),
            jax.ShapeDtypeStruct((H // 2, 2, Lq, Lk), jnp.float32),
        ),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec((1, Lq, 2 * dh), lambda h, j, b: (b, 0, h)),
            pl.BlockSpec((1, block_k, 2 * dh), lambda h, j, b: (b, j, h)),
            pl.BlockSpec((1, block_k, 2 * dh), lambda h, j, b: (b, j, h)),
            pl.BlockSpec((1, 2, Lq, block_k), lambda h, j, b: (h, 0, 0, j)),
            pl.BlockSpec((1, 1, Lq, 2), lambda h, j, b: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Lq, 2), lambda h, j, b: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Lq, 2), lambda h, j, b: (b, h, 0, 0)),
            pl.BlockSpec((1, Lq, 2 * dh), lambda h, j, b: (b, 0, h)),
            pl.BlockSpec((1, 1, block_k), lambda h, j, b: (b, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, 2 * dh), lambda h, j, b: (b, j, h)),
            pl.BlockSpec((1, block_k, 2 * dh), lambda h, j, b: (b, j, h)),
            pl.BlockSpec((1, 2, Lq, block_k), lambda h, j, b: (h, 0, 0, j)),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias_p, gate_p, lse, delta, dop, mask_p)

    dq = dq[:, :L]
    dk = dk[:, :L]
    dv = dv[:, :L]
    dbias = dbias_p.reshape(H, Lq, Lk)[:, :L, :L].astype(pos_bias.dtype)
    dgate = jnp.transpose(dgate_p, (0, 1, 3, 2)).reshape(B, H, Lq)
    dgate = dgate[:, :, :L].astype(gate.dtype)
    return dq, dk, dv, dbias, dgate


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _gated_attention_train(q, k, v, pos_bias, gate, key_mask,
                           num_heads, block_q, block_k, interpret):
    out, _, _ = _train_forward(q, k, v, pos_bias, gate, key_mask,
                               num_heads=num_heads, block_q=block_q,
                               interpret=interpret)
    return out


def _gated_attention_train_fwd(q, k, v, pos_bias, gate, key_mask,
                               num_heads, block_q, block_k, interpret):
    out, out_p, lse = _train_forward(q, k, v, pos_bias, gate, key_mask,
                                     num_heads=num_heads, block_q=block_q,
                                     interpret=interpret)
    return out, (q, k, v, pos_bias, gate, key_mask, out_p, lse)


def _gated_attention_train_bwd(num_heads, block_q, block_k, interpret,
                               res, dout):
    q, k, v, pos_bias, gate, key_mask, out_p, lse = res
    dq, dk, dv, dbias, dgate = _train_backward(
        q, k, v, pos_bias, gate, key_mask, out_p, lse, dout,
        num_heads=num_heads, block_q=block_q, block_k=block_k,
        interpret=interpret)
    return dq, dk, dv, dbias, dgate, None


_gated_attention_train.defvjp(_gated_attention_train_fwd,
                              _gated_attention_train_bwd)


def wavlm_gated_attention_packed_trainable(
    q: jnp.ndarray,        # [B, L, H*dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_bias: jnp.ndarray,  # [H, L, L]
    gate: jnp.ndarray,      # [B, H, L]
    key_mask: Optional[jnp.ndarray] = None,  # [B, L] True=keep
    num_heads: int = 16,
    block_q: int = 512,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused gated attention (fwd + flash-style bwd kernels).

    block_k bounds the dK/dV kernel's VMEM stack: its bias input block AND
    dbias output block are both [2, Lq, block_k] f32, so at Lq=1024 a 512
    block needs ~20 MB scoped VMEM (> the 16 MB limit); 256 fits.

    Same operand layouts and forward numerics as
    `wavlm_gated_attention_packed`; additionally registers a custom VJP so
    the backward pass never materialises [B, H, L, L] tensors in HBM.
    Gradients flow to q, k, v, pos_bias, and gate (None for key_mask).
    """
    B, L, HD = q.shape
    block_q = min(block_q, _round_up(L, 128))
    return _gated_attention_train(q, k, v, pos_bias, gate, key_mask,
                                  num_heads, block_q, block_k, interpret)


# resident-K kernel holds [Lk, 2dh] K/V + [bq, Lk] scores per program;
# past this Lk the VMEM working set outgrows ~16 MB and the flash kernel
# takes over in the dispatcher
_RESIDENT_K_MAX = 4096


def wavlm_gated_attention(
    q, k, v, pos_bias, gate, key_mask=None, force_xla: bool = False
) -> jnp.ndarray:
    """Dispatch: Pallas on TPU backends, XLA elsewhere."""
    if not force_xla and jax.default_backend() not in ("cpu",):
        try:
            return wavlm_gated_attention_pallas(q, k, v, pos_bias, gate, key_mask)
        except Exception:  # pragma: no cover - conservative fallback
            pass
    return wavlm_gated_attention_xla(q, k, v, pos_bias, gate, key_mask)


def wavlm_gated_attention_heads_packed(
    q, k, v, pos_bias, gate, key_mask=None, num_heads: int = 16,
    force_xla: bool = False,
) -> jnp.ndarray:
    """Dispatch for head-packed [B, L, H*dh] operands.

    TPU: resident-K kernel at FDDM lengths, flash (k-block) kernel past the
    VMEM cliff (L > 4096) — so long audio needs no --chunk-seconds crutch.
    """
    B, L, HD = q.shape
    dh = HD // num_heads
    if not force_xla and jax.default_backend() not in ("cpu",) and dh == 64:
        try:
            if L > _RESIDENT_K_MAX:
                return wavlm_gated_attention_packed_flash(
                    q, k, v, pos_bias, gate, key_mask, num_heads=num_heads
                )
            return wavlm_gated_attention_packed(
                q, k, v, pos_bias, gate, key_mask, num_heads=num_heads
            )
        except Exception:  # pragma: no cover - conservative fallback
            pass
    def split(x):
        return x.reshape(B, L, num_heads, dh)
    out = wavlm_gated_attention_xla(
        split(q), split(k), split(v), pos_bias, gate, key_mask
    )
    return out.reshape(B, L, HD)


def wavlm_gated_attention_heads_packed_trainable(
    q, k, v, pos_bias, gate, key_mask=None, num_heads: int = 16,
    force_xla: bool = False,
) -> jnp.ndarray:
    """Training-mode dispatch for head-packed [B, L, H*dh] operands.

    TPU at resident-K lengths: the custom-VJP fused kernels (no [B, H, L, L]
    HBM tensors in either pass).  CPU / long L / non-WavLM head geometry:
    the XLA reference path, which JAX differentiates natively.  Do NOT route
    through this when attention dropout is active — the fused kernels
    compute exact-softmax gradients only."""
    B, L, HD = q.shape
    dh = HD // num_heads
    if (not force_xla and jax.default_backend() not in ("cpu",)
            and dh == 64 and num_heads % 2 == 0 and L <= _RESIDENT_K_MAX):
        try:
            return wavlm_gated_attention_packed_trainable(
                q, k, v, pos_bias, gate, key_mask, num_heads=num_heads
            )
        except Exception:  # pragma: no cover - conservative fallback
            pass

    def split(x):
        return x.reshape(B, L, num_heads, dh)
    out = wavlm_gated_attention_xla(
        split(q), split(k), split(v), pos_bias, gate, key_mask
    )
    return out.reshape(B, L, HD)
