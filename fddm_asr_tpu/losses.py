# -*- coding: utf-8 -*-
"""Training losses.

`lfd_loss` — Barlow-Twins-style cross-modal feature decorrelation (paper §3.2).
Behavioral reference: /root/reference/losses/fddm_losses.py (_standardize
18-27, lfd_loss 29-58).  The diffusion KL lives in
`fddm_asr_tpu.diffusion.kl_term`.
"""
from __future__ import annotations

import jax.numpy as jnp


def _standardize(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Standardise along the batch axis (per token position, per channel)."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)  # biased, matching torch unbiased=False
    return (x - mean) / jnp.sqrt(var + eps)


def lfd_loss(
    z_a: jnp.ndarray,  # [B, T, D] speech features (SpeechProjector output)
    z_b: jnp.ndarray,  # [B, T, D] text features (TextProjector output)
    lambda_offdiag: float = 5.0e-3,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """L_fd = sum_j (1 - C_jj)^2 + lambda * sum_{j != k} C_jk^2 with
    C = Za~^T Zb~ / (B*T) over batch-standardised, token-flattened features."""
    B, T, D = z_a.shape
    za = _standardize(z_a.astype(jnp.float32), eps).reshape(B * T, D)
    zb = _standardize(z_b.astype(jnp.float32), eps).reshape(B * T, D)
    C = (za.T @ zb) / (B * T)  # [D, D]
    diag = jnp.diagonal(C)
    loss_diag = jnp.sum((1.0 - diag) ** 2)
    loss_off = jnp.sum(C**2) - jnp.sum(diag**2)
    return loss_diag + lambda_offdiag * loss_off


def align_speech_to_text(z_speech: jnp.ndarray, L: int) -> jnp.ndarray:
    """Truncate or edge-pad the speech axis to length L (train.py:381-387)."""
    S = z_speech.shape[1]
    if S >= L:
        return z_speech[:, :L, :]
    pad = jnp.repeat(z_speech[:, -1:, :], L - S, axis=1)
    return jnp.concatenate([z_speech, pad], axis=1)
