# -*- coding: utf-8 -*-
"""Paper-scale (253 M) decoder config: loads, builds with the scanned-block
layout, and runs a jitted forward (the reference roadmap targets this size
but never ships a config for it)."""
import os

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_253m_config_builds_and_runs():
    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder

    cfg = load_config(os.path.join(REPO, "configs", "fddm_zhTW_253m.yaml"))
    # base_config inheritance: data/diffusion blocks come from the base file
    assert cfg.data.vocab_size == 8000 and cfg.diffusion["T"] == 200
    m = cfg.model
    assert m.d_model == 1024 and m.num_layers == 12 and m.scan_blocks

    dec = DenoisingTransformerDecoder(
        vocab_size=cfg.data.vocab_size, d_model=m.d_model, nhead=m.nhead,
        num_layers=m.num_layers, dim_ff=m.dim_ff, max_len=1024, pad_id=3,
        scan_blocks=True,
    )
    B, L, S = 1, 8, 16
    xt = jnp.ones((B, L), jnp.int32) * 5
    t = jnp.ones((B,), jnp.int32)
    cond = jnp.zeros((B, S, m.d_model), jnp.float32)
    params = dec.init(jax.random.key(0), xt, t, cond)

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 240e6 < n_params < 270e6, n_params  # the paper's ~253 M target
    # stacked nn.scan layout: ONE blocks_scan entry with a leading layer axis
    assert "blocks_scan" in params["params"]
    stacked = params["params"]["blocks_scan"]["block"]
    assert stacked["ff_0"]["kernel"].shape == (12, 1024, 4096)

    logits = jax.jit(
        lambda p, xt, t, c: dec.apply(p, xt, t, c, None, None, deterministic=True)
    )(params, xt, t, cond)
    assert logits.shape == (B, L, 8000)
    assert bool(jnp.isfinite(logits).all())
