# -*- coding: utf-8 -*-
"""Decoder remat_blocks: identical loss AND gradients to the non-remat
scanned decoder (remat changes memory scheduling, never math), plus the
scan_blocks requirement guard.  Mirrors the encoder-side remat tests
(tests/test_train_encoder.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder


def _decoder(remat):
    return DenoisingTransformerDecoder(
        vocab_size=96, d_model=32, nhead=4, num_layers=3, dim_ff=64,
        dropout=0.0, max_len=64, pad_id=0,
        scan_blocks=True, remat_blocks=remat,
    )


def test_remat_blocks_identical_numerics():
    d_f, d_t = _decoder(False), _decoder(True)
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.integers(1, 96, (2, 16)), jnp.int32)
    t = jnp.asarray([3, 7], jnp.int32)
    cond = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)
    params = d_f.init(jax.random.key(0), xt, t, cond)  # same tree both ways

    def make_loss(model):
        def loss(p):
            logits = model.apply(p, xt, t, cond, deterministic=True)
            return jnp.sum(logits * logits) * 1e-4
        return loss

    lf, gf = jax.jit(jax.value_and_grad(make_loss(d_f)))(params)
    lt, gt = jax.jit(jax.value_and_grad(make_loss(d_t)))(params)
    np.testing.assert_allclose(float(lf), float(lt), rtol=1e-6)
    scale = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(gf))
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7 * scale)


def test_remat_blocks_requires_scan():
    dec = DenoisingTransformerDecoder(
        vocab_size=96, d_model=32, nhead=4, num_layers=2, dim_ff=64,
        scan_blocks=False, remat_blocks=True,
    )
    with pytest.raises(ValueError, match="remat_blocks requires scan_blocks"):
        dec.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
                 jnp.ones((1,), jnp.int32), jnp.zeros((1, 4, 32)))
