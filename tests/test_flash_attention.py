# -*- coding: utf-8 -*-
"""Fused gated-attention kernel tests (XLA reference path; the Pallas path is
numerically validated on TPU by scripts/validate_pallas_tpu.py since the
kernel only lowers on TPU backends)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel
from fddm_asr_tpu.ops.flash_attention import (
    wavlm_gated_attention_heads_packed,
    wavlm_gated_attention_xla,
)

B, L, H, dh = 2, 9, 4, 8


def _inputs(rng):
    q = rng.standard_normal((B, L, H, dh)).astype(np.float32)
    k = rng.standard_normal((B, L, H, dh)).astype(np.float32)
    v = rng.standard_normal((B, L, H, dh)).astype(np.float32)
    bias = rng.standard_normal((H, L, L)).astype(np.float32)
    gate = rng.uniform(1.0, 2.0, (B, H, L)).astype(np.float32)
    mask = np.ones((B, L), bool)
    mask[1, -3:] = False
    return q, k, v, bias, gate, mask


def test_xla_path_matches_manual(rng):
    q, k, v, bias, gate, mask = _inputs(rng)
    out = wavlm_gated_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bias), jnp.asarray(gate), jnp.asarray(mask),
    )
    # manual dense computation
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dh)
    scores = scores + gate[..., None] * bias[None]
    scores = np.where(mask[:, None, None, :], scores, -1e30)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", w, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_heads_packed_dispatch_matches_split(rng):
    """[B, L, H*dh] packed dispatch == split-head XLA reference (CPU path)."""
    q, k, v, bias, gate, mask = _inputs(rng)
    ref = wavlm_gated_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bias), jnp.asarray(gate), jnp.asarray(mask),
    ).reshape(B, L, H * dh)
    packed = wavlm_gated_attention_heads_packed(
        jnp.asarray(q.reshape(B, L, H * dh)),
        jnp.asarray(k.reshape(B, L, H * dh)),
        jnp.asarray(v.reshape(B, L, H * dh)),
        jnp.asarray(bias), jnp.asarray(gate), jnp.asarray(mask), num_heads=H,
    )
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("L,block_q,block_k,with_mask", [
    (256, 128, 128, True),    # multi k-block, ragged mask
    (256, 128, 128, False),
    (200, 128, 128, True),    # L not a block multiple: padded keys masked
    (384, 128, 256, True),    # Lk not a multiple of block_k
])
def test_flash_kernel_matches_xla(rng, L, block_q, block_k, with_mask):
    """k-block running-softmax kernel (interpret mode on CPU) == XLA
    reference, including padded/masked keys across block boundaries."""
    from fddm_asr_tpu.ops.flash_attention import wavlm_gated_attention_packed_flash

    Hh, dhh, Bb = 2, 64, 2  # dh=64 like WavLM; H even for head pairing
    q = rng.standard_normal((Bb, L, Hh, dhh)).astype(np.float32)
    k = rng.standard_normal((Bb, L, Hh, dhh)).astype(np.float32)
    v = rng.standard_normal((Bb, L, Hh, dhh)).astype(np.float32)
    bias = rng.standard_normal((Hh, L, L)).astype(np.float32)
    gate = rng.uniform(1.0, 2.0, (Bb, Hh, L)).astype(np.float32)
    mask = np.ones((Bb, L), bool)
    if with_mask:
        mask[1, L // 3:] = False  # masked span crosses k-block boundaries

    ref = wavlm_gated_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bias), jnp.asarray(gate), jnp.asarray(mask),
    ).reshape(Bb, L, Hh * dhh)
    out = wavlm_gated_attention_packed_flash(
        jnp.asarray(q.reshape(Bb, L, Hh * dhh)),
        jnp.asarray(k.reshape(Bb, L, Hh * dhh)),
        jnp.asarray(v.reshape(Bb, L, Hh * dhh)),
        jnp.asarray(bias), jnp.asarray(gate), jnp.asarray(mask),
        num_heads=Hh, block_q=block_q, block_k=block_k, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_flag_preserves_wavlm_output(rng):
    """fused_attention=True on CPU dispatches to the XLA fallback and must
    reproduce the default path exactly."""
    import torch  # noqa: F401  (keeps import ordering consistent with other tests)

    cfg = WavLMConfig.tiny_for_tests()
    model = WavLMModel(cfg)
    wav = rng.standard_normal((2, 3200)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(wav))
    base = model.apply(params, jnp.asarray(wav), deterministic=True)

    cfg_fused = dataclasses.replace(cfg, fused_attention=True)
    fused = WavLMModel(cfg_fused).apply(params, jnp.asarray(wav), deterministic=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=1e-5)
