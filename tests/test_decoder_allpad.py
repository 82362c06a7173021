# -*- coding: utf-8 -*-
"""Regression: an all-pad x_t (reachable mid-sampling-chain) must not NaN."""
import numpy as np

import jax
import jax.numpy as jnp

from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder


def test_all_pad_row_no_nan():
    V, Dm = 32, 16
    dec = DenoisingTransformerDecoder(
        vocab_size=V, d_model=Dm, nhead=2, num_layers=1, dim_ff=32,
        dropout=0.0, max_len=8, pad_id=3,
    )
    xt = jnp.full((2, 8), 3, jnp.int32)  # every token == pad
    t = jnp.ones((2,), jnp.int32)
    cond = jnp.zeros((2, 5, Dm))
    params = dec.init(jax.random.key(0), xt, t, cond)
    logits = dec.apply(params, xt, t, cond, None, None, deterministic=True)
    assert bool(jnp.isfinite(logits).all()), "all-pad x_t produced non-finite logits"

    # mixed batch: one all-pad row, one normal row
    xt2 = xt.at[1, :4].set(7)
    logits2 = dec.apply(params, xt2, t, cond, None, None, deterministic=True)
    assert bool(jnp.isfinite(logits2).all())


def test_pad_embedding_row_gets_no_gradient():
    """torch Embedding(padding_idx=pad_id) parity: the pad row must stay
    zero AND receive zero gradient even when corrupted x_t contains pad_id
    at loss-active positions (regression: it used to drift in training)."""
    V, Dm, PAD = 32, 16, 3
    dec = DenoisingTransformerDecoder(
        vocab_size=V, d_model=Dm, nhead=2, num_layers=1, dim_ff=32,
        dropout=0.0, max_len=8, pad_id=PAD,
    )
    xt = jnp.asarray([[1, PAD, 7, PAD, 2, 9, PAD, 4]], jnp.int32)
    t = jnp.ones((1,), jnp.int32)
    cond = jnp.ones((1, 5, Dm)) * 0.1
    params = dec.init(jax.random.key(0), xt, t, cond)

    def loss(p):
        logits = dec.apply(p, xt, t, cond, None, None, deterministic=True)
        return jnp.sum(logits ** 2)

    grads = jax.grad(loss)(params)
    g_emb = grads["params"]["tok_emb"]["embedding"]
    np.testing.assert_array_equal(np.asarray(g_emb[PAD]), 0.0)
    # non-pad rows that appear in xt do train
    assert float(jnp.abs(g_emb[7]).sum()) > 0.0
    # and the forward's pad-position embeddings are exactly zero vectors
    emb = params["params"]["tok_emb"]["embedding"]
    np.testing.assert_array_equal(np.asarray(emb[PAD]), 0.0)
