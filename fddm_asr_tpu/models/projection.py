# -*- coding: utf-8 -*-
"""Projection heads for the L_fd cross-modal decorrelation loss.

Behavioral reference: /root/reference/models/projection.py —
MLP (14-24), SpeechProjector (26-32), TextEmbedding (34-47),
TextProjector (49-55).  TextEmbedding applies a bias-free Linear to
softmax(logits), i.e. a soft embedding over the predicted distribution.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MLP(nn.Module):
    """0-or-1-hidden-layer MLP (reference lines 14-24)."""

    dim_out: int
    hidden: int = 0
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.hidden > 0:
            x = nn.Dense(self.hidden, dtype=self.dtype, name="net_0")(x)
            x = nn.gelu(x, approximate=False) if self.act == "gelu" else nn.relu(x)
            return nn.Dense(self.dim_out, dtype=self.dtype, name="net_2")(x)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="net_0")(x)


class SpeechProjector(nn.Module):
    """h_phi_a: [B, S, d_in] -> [B, S, d_proj]."""

    d_proj: int
    hidden: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        return MLP(self.d_proj, self.hidden, dtype=self.dtype, name="proj")(c)


class TextEmbedding(nn.Module):
    """g_omega: soft embedding of the predicted x_0 distribution.

    mode="logits" softmaxes the input first; "probs" uses it as-is.
    """

    d_out: int
    mode: str = "logits"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        probs = nn.softmax(dist, axis=-1) if self.mode == "logits" else dist
        return nn.Dense(self.d_out, use_bias=False, dtype=self.dtype, name="proj")(probs)


class TextProjector(nn.Module):
    """h_phi_b: [B, L, d_in] -> [B, L, d_proj]."""

    d_proj: int
    hidden: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z_text: jnp.ndarray) -> jnp.ndarray:
        return MLP(self.d_proj, self.hidden, dtype=self.dtype, name="proj")(z_text)
