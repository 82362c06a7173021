# -*- coding: utf-8 -*-
"""Attention kernels.

`dot_product_attention` is the portable XLA path used by every model; it is
numerically equivalent to torch.nn.MultiheadAttention's core (scale 1/sqrt(dh),
masked key padding, softmax-weight dropout).  The Pallas flash-attention
kernel (`fddm_asr_tpu.ops.flash_attention`) plugs in through the same
signature for long-sequence TPU runs.

Masked keys score float32-min rather than -inf, matching the Pallas and ring
kernels: exp(min - max) underflows to exactly 0 for any row with a valid key
(bit-identical to the -inf mask there), while a fully-masked row degrades to
a uniform average instead of softmax(all -inf) = NaN.  Rows with zero valid
keys arise for real inputs (audio < 400 samples has zero conv frames), and a
NaN there would poison the whole batch through LayerNorm.

Shapes: q [B, Lq, H, Dh]; k, v [B, Lk, H, Dh] -> out [B, Lq, H, Dh].
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,   # [B, Lk] True=keep
    bias: Optional[jnp.ndarray] = None,       # [B or 1, H, Lq, Lk] additive
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    # [B, H, Lq, Lk] scores in f32 for a stable softmax.
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    weights = weights.astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
