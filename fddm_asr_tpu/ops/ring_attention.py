# -*- coding: utf-8 -*-
"""Sequence-parallel ring attention for WavLM's gated rel-pos attention.

Completes the SP/CP row of SURVEY §2.2: the reference has no parallelism at
all, and round 1 covered long context with a single-device flash kernel
(`ops/flash_attention.py`) + chunked inference.  This module shards the
FRAME axis itself across a mesh axis, so one utterance's encoder pass can
span several chips — the classic ring-attention construction (Liu et al.,
blockwise parallel transformers) expressed the JAX way:

  * every tensor enters as a GLOBAL array sharded on the sequence axis
    (`PartitionSpec(..., axis, ...)`); `jax.shard_map` gives each device its
    local q block plus the resident k/v/mask block;
  * k/v/key-mask blocks rotate around the ring with `jax.lax.ppermute`
    (neighbor exchange over ICI — bandwidth-optimal, no all-gather of the
    full sequence anywhere);
  * each device folds incoming blocks into a flash-style running softmax
    (f32 max/sum/accumulator, identical math to
    `ops/flash_attention._kernel_packed_flash`), so per-device memory is
    O(L_local · L_local) for one score tile, never O(L²);
  * WavLM's position bias [H, L, L] is sharded on the QUERY-row axis
    (each device holds [H, L_local, L]) and the column block for the
    currently-resident keys is sliced per ring step; the per-query gate
    [B, H, L] is local by construction.

Numerics match `wavlm_gated_attention_xla` (the target the Pallas kernels
are also pinned to): scores in f32, masked keys at float32-min, fully-masked
rows degrade to a uniform average exactly like the XLA softmax.

The per-block inner product runs as plain XLA einsum — at ring-step
granularity the blocks are large matmuls that XLA tiles onto the MXU
directly, and the surrounding running-softmax updates fuse into their
epilogues; the Pallas path stays single-device where its VMEM residency
wins (CLAUDE.md round-1 profile).

Reference behavioral spec: /root/reference/models/wavlm semantics via HF
(see models/wavlm.py:363-460); the reference itself is single-device
(SURVEY §2.2), so this file cites design intent, not reference code.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = float(np.finfo(np.float32).min)

__all__ = ["ring_gated_attention"]


def _ring_body(q, k, v, bias_rows, gate, key_mask, *, axis: str, scale: float):
    """Per-device shard_map body.

    q, k, v:   [B, l, H, dh] local blocks (l = L / ring size)
    bias_rows: [H, l, L]     this device's query rows, ALL key columns
    gate:      [B, H, l]     per-query gate (local)
    key_mask:  [B, l] bool   this device's key block validity
    """
    n = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    B, l, H, dh = q.shape

    qf = q.astype(jnp.float32) * scale
    # running-softmax state, f32 throughout (matches the flash kernel)
    m = jnp.full((B, H, l), -jnp.inf, jnp.float32)
    s = jnp.zeros((B, H, l), jnp.float32)
    acc = jnp.zeros((B, l, H, dh), jnp.float32)

    perm = [(i, (i - 1) % n) for i in range(n)]  # receive from the right

    def fold(carry, step):
        m, s, acc, k_blk, v_blk, mask_blk = carry
        block_id = (my + step) % n  # global origin of the resident k block
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32)
        )  # [B, H, l, l]
        bias_blk = jax.lax.dynamic_slice_in_dim(
            bias_rows, block_id * l, l, axis=2
        )  # [H, l, l]
        scores = scores + gate.astype(jnp.float32)[..., None] * bias_blk.astype(
            jnp.float32
        )[None]
        scores = jnp.where(mask_blk[:, None, None, :], scores, _NEG_INF)

        m_new = jnp.maximum(m, scores.max(axis=-1))
        # exp(-inf - -inf) never occurs: m_new is finite once any block (even
        # a fully-masked one at float32-min) has been folded.
        corr = jnp.exp(m - m_new)  # [B, H, l]
        e = jnp.exp(scores - m_new[..., None])  # [B, H, l, l]
        s = s * corr + e.sum(axis=-1)
        acc = acc * jnp.transpose(corr, (0, 2, 1))[..., None] + jnp.einsum(
            "bhqk,bkhd->bqhd", e, v_blk.astype(jnp.float32)
        )
        # rotate k/v/mask one hop (the last rotation is redundant but keeps
        # the loop body uniform for lax.scan; one extra [B,l,H,dh] permute)
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        mask_blk = jax.lax.ppermute(mask_blk, axis, perm)
        return (m_new, s, acc, k_blk, v_blk, mask_blk), None

    (m, s, acc, *_), _ = jax.lax.scan(
        fold, (m, s, acc, k, v, key_mask), jnp.arange(n)
    )
    # fully-masked rows: every e == 1 (scores == m == float32-min), so
    # s == L and the output is the uniform v average — same as XLA softmax.
    out = acc / jnp.transpose(s, (0, 2, 1))[..., None]
    return out.astype(q.dtype)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "batch_axis")
)
def ring_gated_attention(
    q: jnp.ndarray,         # [B, L, H, dh], L sharded on `axis`
    k: jnp.ndarray,         # [B, L, H, dh]
    v: jnp.ndarray,         # [B, L, H, dh]
    pos_bias: jnp.ndarray,  # [H, L, L], row (query) axis sharded
    gate: jnp.ndarray,      # [B, H, L]
    key_mask: Optional[jnp.ndarray],  # [B, L] True=keep; None = all-keep
    *,
    mesh: Mesh,
    axis: str = "model",
    batch_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Sequence-parallel gated attention; out [B, L, H, dh] sharded like q.

    `axis` is the ring (sequence) mesh axis; `batch_axis` additionally
    shards the batch dimension (dp × sp composition) and may be None.
    L must divide evenly by mesh.shape[axis].
    """
    B, L, H, dh = q.shape
    ring = mesh.shape[axis]
    if L % ring != 0:
        raise ValueError(f"L={L} not divisible by ring size {ring}")
    scale = 1.0 / float(np.sqrt(dh))
    if key_mask is None:
        key_mask = jnp.ones((B, L), bool)

    ba = batch_axis
    qkv_spec = P(ba, axis, None, None)
    body = functools.partial(_ring_body, axis=axis, scale=scale)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            qkv_spec, qkv_spec, qkv_spec,
            P(None, axis, None),   # bias: query rows sharded, columns full
            P(ba, None, axis),     # gate: per-query
            P(ba, axis),           # key mask travels with the k block
        ),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return fn(q, k, v, pos_bias, gate, key_mask)
