# -*- coding: utf-8 -*-
"""Parity: L_fd loss + projection heads vs the reference torch implementations."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import REFERENCE_ROOT, has_reference

from fddm_asr_tpu.losses import align_speech_to_text, lfd_loss
from fddm_asr_tpu.models.projection import SpeechProjector, TextEmbedding, TextProjector
from fddm_asr_tpu.convert.torch_ckpt import projection_params_from_state_dict

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")

B, L, S, D, DP, V = 3, 8, 11, 16, 12, 40


def test_lfd_loss_parity(rng):
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from losses.fddm_losses import lfd_loss as ref_lfd

    za = rng.standard_normal((B, L, DP)).astype(np.float32)
    zb = rng.standard_normal((B, L, DP)).astype(np.float32)
    theirs = float(ref_lfd(torch.tensor(za), torch.tensor(zb), lambda_offdiag=5e-3))
    ours = float(lfd_loss(jnp.asarray(za), jnp.asarray(zb), lambda_offdiag=5e-3))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_projection_heads_parity(rng):
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from models.projection import (
        SpeechProjector as RefS,
        TextEmbedding as RefE,
        TextProjector as RefT,
    )

    torch.manual_seed(1)
    ref_s, ref_e, ref_t = RefS(D, DP), RefE(V, DP, mode="logits"), RefT(DP, DP)
    for m in (ref_s, ref_e, ref_t):
        m.eval()

    c = rng.standard_normal((B, S, D)).astype(np.float32)
    logits = rng.standard_normal((B, L, V)).astype(np.float32)
    with torch.no_grad():
        z_speech_ref = ref_s(torch.tensor(c)).numpy()
        z_text_ref = ref_t(ref_e(torch.tensor(logits))).numpy()

    sp = {"params": projection_params_from_state_dict(ref_s.state_dict(), "s_proj")}
    te = {"params": projection_params_from_state_dict(ref_e.state_dict(), "t_embed")}
    tp = {"params": projection_params_from_state_dict(ref_t.state_dict(), "t_proj")}
    z_speech = SpeechProjector(d_proj=DP).apply(sp, jnp.asarray(c))
    z_text = TextProjector(d_proj=DP).apply(
        tp, TextEmbedding(d_out=DP, mode="logits").apply(te, jnp.asarray(logits))
    )
    np.testing.assert_allclose(np.asarray(z_speech), z_speech_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_text), z_text_ref, atol=1e-5)


def test_align_speech_to_text():
    z = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    # truncate
    out = align_speech_to_text(z, 4)
    assert out.shape == (2, 4, 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(z[:, :4]))
    # edge-pad with last frame
    out = align_speech_to_text(z, 7)
    assert out.shape == (2, 7, 3)
    np.testing.assert_array_equal(np.asarray(out[:, 5:]), np.repeat(np.asarray(z[:, -1:]), 2, 1))
