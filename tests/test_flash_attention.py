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


@pytest.mark.parametrize("L,block_q,block_k,with_mask", [
    (256, 128, 128, True),    # multi q/k-block, ragged mask
    (200, 128, 128, True),    # L not a block multiple: padded rows/keys
    (200, 256, 128, False),   # single q-block (block_q clamped to Lq)
    (384, 128, 256, True),    # Lk % block_k != 0: dK/dV grid must still
                              # tile the tail key block (regression: the
                              # grid used to floor-divide, leaving rows
                              # 256-383 of dk/dv uninitialized)
])
def test_trainable_kernel_grads_match_xla(rng, L, block_q, block_k, with_mask):
    """custom-VJP fused attention (interpret mode on CPU): forward AND all
    five gradients (dq, dk, dv, dbias, dgate) == the XLA reference path."""
    from fddm_asr_tpu.ops.flash_attention import (
        wavlm_gated_attention_packed_trainable,
    )

    Hh, dhh, Bb = 2, 64, 2
    q = rng.standard_normal((Bb, L, Hh, dhh)).astype(np.float32)
    k = rng.standard_normal((Bb, L, Hh, dhh)).astype(np.float32)
    v = rng.standard_normal((Bb, L, Hh, dhh)).astype(np.float32)
    bias = rng.standard_normal((Hh, L, L)).astype(np.float32)
    gate = rng.uniform(1.0, 2.0, (Bb, Hh, L)).astype(np.float32)
    mask = np.ones((Bb, L), bool)
    if with_mask:
        mask[1, L // 3:] = False
    cot = rng.standard_normal((Bb, L, Hh * dhh)).astype(np.float32)
    maskj = jnp.asarray(mask)
    cotj = jnp.asarray(cot)

    def loss_xla(q, k, v, b, g):
        out = wavlm_gated_attention_xla(q, k, v, b, g, maskj)
        return jnp.sum(out.reshape(Bb, L, Hh * dhh) * cotj)

    def loss_fused(q, k, v, b, g):
        out = wavlm_gated_attention_packed_trainable(
            q, k, v, b, g, maskj, num_heads=Hh,
            block_q=block_q, block_k=block_k, interpret=True)
        return jnp.sum(out * cotj)

    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bias), jnp.asarray(gate))
    lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(q.reshape(Bb, L, Hh * dhh)),
        jnp.asarray(k.reshape(Bb, L, Hh * dhh)),
        jnp.asarray(v.reshape(Bb, L, Hh * dhh)),
        jnp.asarray(bias), jnp.asarray(gate))
    np.testing.assert_allclose(float(lx), float(lf), rtol=1e-5)
    for name, a, b in zip(("dq", "dk", "dv", "dbias", "dgate"), gx, gf):
        a = np.asarray(a)
        b = np.asarray(b)
        if name in ("dq", "dk", "dv"):
            a = a.reshape(b.shape)
        scale = max(np.max(np.abs(a)), 1e-9)
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-4,
                                   err_msg=name)


def test_trainable_dispatch_cpu_falls_back_to_xla(rng):
    """On CPU the trainable dispatcher must route to the XLA path and be
    differentiable end-to-end (grads finite, forward == reference)."""
    from fddm_asr_tpu.ops.flash_attention import (
        wavlm_gated_attention_heads_packed_trainable,
    )

    q, k, v, bias, gate, mask = _inputs(rng)
    ref = wavlm_gated_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bias), jnp.asarray(gate), jnp.asarray(mask),
    ).reshape(B, L, H * dh)

    def f(qp):
        return jnp.sum(wavlm_gated_attention_heads_packed_trainable(
            qp, jnp.asarray(k.reshape(B, L, H * dh)),
            jnp.asarray(v.reshape(B, L, H * dh)),
            jnp.asarray(bias), jnp.asarray(gate), jnp.asarray(mask),
            num_heads=H) ** 2)

    out = wavlm_gated_attention_heads_packed_trainable(
        jnp.asarray(q.reshape(B, L, H * dh)),
        jnp.asarray(k.reshape(B, L, H * dh)),
        jnp.asarray(v.reshape(B, L, H * dh)),
        jnp.asarray(bias), jnp.asarray(gate), jnp.asarray(mask), num_heads=H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    g = jax.grad(f)(jnp.asarray(q.reshape(B, L, H * dh)))
    assert np.isfinite(np.asarray(g)).all()


def test_fused_training_mode_grads_match_default_path(rng):
    """WavLM with fused_attention=True in TRAINING mode (deterministic=False,
    attention_dropout=0) must produce the same loss and grads as the default
    attention path — on CPU both resolve to XLA, pinning the dispatch
    semantics and mask plumbing."""
    import dataclasses

    base = dataclasses.replace(
        WavLMConfig.tiny_for_tests(),
        hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0,
    )
    # tiny config has H=4, dh=8 — exercises the packed-dispatch fallback
    wave = jnp.asarray(rng.standard_normal((2, 3200)), jnp.float32)
    model_def = WavLMModel(base)
    model_fused = WavLMModel(dataclasses.replace(base, fused_attention=True))
    params = model_def.init(jax.random.key(0), wave)

    def make_loss(model):
        def loss(p):
            out = model.apply(p, wave, deterministic=False,
                              rngs={"dropout": jax.random.key(1)})
            return jnp.sum(out * out)
        return loss

    l0, g0 = jax.value_and_grad(make_loss(model_def))(params)
    l1, g1 = jax.value_and_grad(make_loss(model_fused))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    scale = max(float(jnp.max(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g0))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5 * scale)


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
