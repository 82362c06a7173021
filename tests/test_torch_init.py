# -*- coding: utf-8 -*-
"""model.init_scheme: "torch" — per-tensor distribution parity with the
reference torch modules' actual init (the round-5 stall root cause was the
flax-default init drawing every weight sqrt(3) larger; see
models/torch_init.py)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, has_reference

from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder
from fddm_asr_tpu.models.torch_init import torch_like_decoder_init
from fddm_asr_tpu.convert.torch_ckpt import decoder_state_dict_from_params

V, Dm, H, LAYERS, FF = 96, 256, 4, 2, 512


def _init_params(scheme):
    model = DenoisingTransformerDecoder(
        vocab_size=V, d_model=Dm, nhead=H, num_layers=LAYERS, dim_ff=FF,
        dropout=0.0, max_len=64, pad_id=0)
    p = model.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
                   jnp.ones((1,), jnp.int32), jnp.zeros((1, 16, Dm)))["params"]
    if scheme == "torch":
        p = torch_like_decoder_init(jax.random.key(1), p, pad_id=0)
    return p


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_std_matches_actual_torch_init():
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from models.denoise_decoder import DenoisingTransformerDecoder as RefDecoder

    torch.manual_seed(0)
    ref = RefDecoder(vocab_size=V, d_model=Dm, nhead=H, num_layers=LAYERS,
                     dim_ff=FF, dropout=0.0, max_len=64, pad_id=0)
    ref_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = decoder_state_dict_from_params(_init_params("torch"))
    for k, g in ref_sd.items():
        if g.size < 64:  # too few samples for a stable std comparison
            continue
        a, b = float(np.std(np.asarray(ours[k]))), float(np.std(g))
        if b < 1e-8:
            assert a < 1e-8, f"{k}: expected ~constant, got std {a}"
        else:
            assert 0.9 < a / b < 1.1, f"{k}: std {a} vs torch {b}"


def test_semantics_pinned():
    p = _init_params("torch")
    sd = decoder_state_dict_from_params(p)
    # padding_idx row zeroed
    assert np.all(np.asarray(sd["tok_emb.weight"])[0] == 0.0)
    # attention biases zero (torch MHA zeroes in_proj_bias and out_proj.bias)
    assert np.all(np.asarray(sd["blocks.0.self_attn.in_proj_bias"]) == 0.0)
    assert np.all(np.asarray(sd["blocks.0.cross_attn.out_proj.bias"]) == 0.0)
    # plain Linear biases NONZERO (torch U(+-1/sqrt(fan_in)))
    assert np.std(np.asarray(sd["blocks.0.ff.0.bias"])) > 1e-4
    # LayerNorm untouched
    assert np.all(np.asarray(sd["blocks.0.norm1.weight"]) == 1.0)
    # kernels ~1/sqrt(3) of the flax draw
    flax_sd = decoder_state_dict_from_params(_init_params("flax"))
    r = (np.std(np.asarray(sd["blocks.0.ff.0.weight"]))
         / np.std(np.asarray(flax_sd["blocks.0.ff.0.weight"])))
    assert 0.5 < r < 0.65


def test_scan_stacked_layout():
    """The redraw must handle the nn.scan param layout (leading layer axis)."""
    model = DenoisingTransformerDecoder(
        vocab_size=V, d_model=Dm, nhead=H, num_layers=LAYERS, dim_ff=FF,
        dropout=0.0, max_len=64, pad_id=0, scan_blocks=True)
    p = model.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
                   jnp.ones((1,), jnp.int32), jnp.zeros((1, 16, Dm)))["params"]
    q = torch_like_decoder_init(jax.random.key(1), p, pad_id=0)
    k = q["blocks_scan"]["block"]["ff_0"]["kernel"]
    assert k.shape[0] == LAYERS
    std = float(jnp.std(k))
    expect = (1.0 / np.sqrt(Dm)) / np.sqrt(3.0)  # U(+-1/sqrt(fan_in)) std
    assert 0.9 < std / expect < 1.1
    # the two layer slices are independent draws
    assert float(jnp.abs(k[0] - k[1]).max()) > 1e-6


def test_from_config_knob(tmp_path):
    from fddm_asr_tpu.config import Config
    from fddm_asr_tpu.pipeline import FDDMPipeline

    class Tok:
        def encode(self, t):
            return [5, 6, 7]

    def build(scheme):
        cfg = Config({
            "seed": 0,
            "data": {"vocab_size": V, "pad_id": 0, "max_len": 16},
            "model": {"d_model": Dm, "nhead": H, "num_layers": LAYERS,
                      "dim_ff": FF, "dropout": 0.0, "init_scheme": scheme,
                      "encoder": {"wavlm_name": "tiny", "freeze": True,
                                  "proj": "linear", "pooling": "none"},
                      "projector": {"d_proj": 16}},
            "diffusion": {"T": 20, "beta_max": 0.2},
            "optim": {}, "lfd": {}, "log": {},
        })
        return FDDMPipeline.from_config(cfg, tokenizer=Tok(), seed=0)

    pt = build("torch")
    pf = build("flax")
    sd_t = decoder_state_dict_from_params(pt.decoder_params["params"])
    sd_f = decoder_state_dict_from_params(pf.decoder_params["params"])
    r = (np.std(np.asarray(sd_t["head.weight"]))
         / np.std(np.asarray(sd_f["head.weight"])))
    assert 0.5 < r < 0.65  # knob actually changed the init

    with pytest.raises(ValueError, match="init_scheme"):
        build("bogus")
