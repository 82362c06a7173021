# -*- coding: utf-8 -*-
"""Encoder fine-tuning (model.encoder.freeze: false).

The reference's AcousticEncoder carries a freeze flag
(/root/reference/models/acoustic_encoder.py:38) but its optimizer
unconditionally excludes the encoder (train.py:542-544), so freeze=False is
an inert capability there.  Here the fine-tune path is first-class: encoder
params ride in the donated TrainState (5th optimizer group, optional
optim.encoder_lr), the WavLM forward runs inside the differentiated jit
with dropout active, and the scanned layers rematerialize (remat_layers)
so activation memory stays O(1) in depth.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fddm_asr_tpu.config import Config
from fddm_asr_tpu.models.projection import (
    SpeechProjector, TextEmbedding, TextProjector,
)
from fddm_asr_tpu.pipeline import FDDMPipeline
from fddm_asr_tpu.train_lib import TrainState, make_optimizer, make_train_step


class _Tok:
    def encode(self, text):
        return [5, 6, 7]


def _cfg(tmp, freeze=False, encoder_extra=None, optim_extra=None,
         dec_dropout=0.1):
    enc = {"wavlm_name": "tiny", "freeze": freeze, "proj": "linear",
           "pooling": "none"}
    if encoder_extra:
        enc.update(encoder_extra)
    optim = {"batch_size": 4, "lr": 1e-3, "weight_decay": 0.01,
             "dtype": "float32"}
    if optim_extra:
        optim.update(optim_extra)
    return Config({
        "seed": 0,
        "data": {"vocab_size": 96, "pad_id": 0, "max_len": 16},
        "model": {
            "d_model": 32, "nhead": 4, "num_layers": 2, "dim_ff": 64,
            "dropout": dec_dropout, "encoder": enc, "projector": {"d_proj": 16},
        },
        "diffusion": {"T": 20, "beta_max": 0.2},
        "optim": optim,
        "lfd": {"lambda_offdiag": 5e-3, "n_step_fd": 1, "tau": 1.0},
        "log": {"log_every": 1, "ckpt_dir": str(tmp / "ck")},
    })


def _setup(cfg, train_encoder):
    pipeline = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), seed=0)
    s_proj = SpeechProjector(d_proj=16)
    t_embed = TextEmbedding(d_out=16, mode="logits")
    t_proj = TextProjector(d_proj=16)
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    sp = s_proj.init(r1, jnp.zeros((1, 4, 32)))
    te = t_embed.init(r2, jnp.zeros((1, 4, 96)))
    tp = t_proj.init(r3, jnp.zeros((1, 4, 16)))
    tx = make_optimizer(cfg, train_encoder=train_encoder)
    params0 = (pipeline.decoder_params, sp, te, tp)
    if train_encoder:
        params0 = params0 + (pipeline.encoder_params,)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        decoder=jax.tree.map(jnp.copy, params0[0]),
        s_proj=params0[1], t_embed=params0[2], t_proj=params0[3],
        opt_state=tx.init(params0),
        encoder=(jax.tree.map(jnp.copy, params0[4]) if train_encoder else None),
    )
    step = make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg,
                           train_encoder=train_encoder)
    return pipeline, state, step


def _batch():
    wave = np.random.default_rng(0).standard_normal((4, 3200)).astype(np.float32)
    x0 = np.random.default_rng(1).integers(1, 96, (4, 16), dtype=np.int32)
    return wave, x0


def _max_delta(a, b):
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))
    )


def test_finetune_step_updates_encoder(tmp_path):
    cfg = _cfg(tmp_path, freeze=False)
    pipeline, state, step = _setup(cfg, train_encoder=True)
    ref_enc = jax.tree.map(jnp.copy, state.encoder)
    ref_dec = jax.tree.map(jnp.copy, state.decoder)
    wave, x0 = _batch()

    state, metrics = step(state, wave, x0, jax.random.key(42), True)
    assert np.isfinite(float(metrics["total_loss"]))
    assert _max_delta(state.encoder, ref_enc) > 0.0, "encoder got no update"
    assert _max_delta(state.decoder, ref_dec) > 0.0
    # second step exercises donation on the enlarged state
    state, metrics = step(state, wave, x0, jax.random.key(43), False)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 2


def test_encoder_lr_zero_freezes_backbone_via_labels(tmp_path):
    """optim.encoder_lr: 0 must leave the encoder group untouched while the
    decoder still trains — pins the multi_transform label wiring."""
    cfg = _cfg(tmp_path, freeze=False, optim_extra={"encoder_lr": 0.0})
    pipeline, state, step = _setup(cfg, train_encoder=True)
    ref_enc = jax.tree.map(jnp.copy, state.encoder)
    ref_dec = jax.tree.map(jnp.copy, state.decoder)
    wave, x0 = _batch()
    state, _ = step(state, wave, x0, jax.random.key(42), False)
    assert _max_delta(state.decoder, ref_dec) > 0.0
    # adamw with lr=0: zero updates; weight decay also scales by lr
    assert _max_delta(state.encoder, ref_enc) == 0.0


def test_remat_layers_identical_numerics():
    """remat on/off: same loss and same GRADIENTS (remat changes memory
    scheduling, never math).  Compared at the gradient level — comparing
    post-Adam params instead would amplify float-reassociation noise on
    near-zero grads through Adam's g/sqrt(g^2) normalization into spurious
    sign flips.  Dropout zeroed so rng draw order can't differ between the
    two program shapes."""
    import dataclasses
    from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

    base = dataclasses.replace(
        WavLMConfig.tiny_for_tests(), scan_layers=True,
        hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0,
    )
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3200)), jnp.float32)
    model_f = WavLMModel(dataclasses.replace(base, remat_layers=False))
    model_t = WavLMModel(dataclasses.replace(base, remat_layers=True))
    params = model_f.init(jax.random.key(0), wave)  # same tree both ways

    def make_loss(model):
        def loss(p):
            out = model.apply(p, wave, deterministic=True)
            return jnp.sum(out * out)
        return loss

    lf, gf = jax.jit(jax.value_and_grad(make_loss(model_f)))(params)
    lt, gt = jax.jit(jax.value_and_grad(make_loss(model_t)))(params)
    np.testing.assert_allclose(float(lf), float(lt), rtol=1e-6)
    scale = max(
        float(jnp.max(jnp.abs(x))) for x in jax.tree_util.tree_leaves(gf))
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6 * scale)


def test_remat_policy_dots_identical_numerics():
    """remat_policy='dots' (save projection/FFN matmul outputs, recompute
    attention + elementwise) matches full remat exactly on loss and grads —
    the policy changes what is cached, never the math."""
    import dataclasses
    from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

    base = dataclasses.replace(
        WavLMConfig.tiny_for_tests(), scan_layers=True, remat_layers=True,
        hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0,
    )
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3200)), jnp.float32)
    model_full = WavLMModel(base)
    model_dots = WavLMModel(dataclasses.replace(base, remat_policy="dots"))
    params = model_full.init(jax.random.key(0), wave)

    def make_loss(model):
        def loss(p):
            out = model.apply(p, wave, deterministic=True)
            return jnp.sum(out * out)
        return loss

    lf, gf = jax.jit(jax.value_and_grad(make_loss(model_full)))(params)
    ld, gd = jax.jit(jax.value_and_grad(make_loss(model_dots)))(params)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-6)
    scale = max(
        float(jnp.max(jnp.abs(x))) for x in jax.tree_util.tree_leaves(gf))
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6 * scale)


def test_remat_policy_validated():
    import dataclasses
    from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

    cfg = dataclasses.replace(WavLMConfig.tiny_for_tests(),
                              scan_layers=True, remat_layers=True,
                              remat_policy="everything")
    with pytest.raises(ValueError, match="remat_policy"):
        WavLMModel(cfg).init(jax.random.key(0), jnp.zeros((1, 1600)))


def test_remat_requires_scan_layers(tmp_path):
    from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel
    import dataclasses

    cfg = dataclasses.replace(WavLMConfig.tiny_for_tests(),
                              remat_layers=True, scan_layers=False)
    model = WavLMModel(cfg)
    with pytest.raises(ValueError, match="remat_layers requires scan_layers"):
        model.init(jax.random.key(0), jnp.zeros((1, 1600)))


def test_guards(tmp_path):
    # frozen pipeline + train_encoder must refuse (stop_gradient would
    # silently zero the encoder grads)
    cfg = _cfg(tmp_path, freeze=True)
    pipeline = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), seed=0)
    s_proj = SpeechProjector(d_proj=16)
    t_embed = TextEmbedding(d_out=16, mode="logits")
    t_proj = TextProjector(d_proj=16)
    tx = make_optimizer(cfg, train_encoder=True)
    with pytest.raises(ValueError, match="freeze"):
        make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg,
                        train_encoder=True)
    with pytest.raises(ValueError, match="incompatible"):
        make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg,
                        train_encoder=True, cached_features=True)


def test_freeze_feature_extractor_zeroes_conv_grads():
    """freeze_feature_extractor: conv front-end grads exactly zero while the
    transformer / feature-projection grads flow (HF freeze_feature_encoder
    semantics)."""
    import dataclasses
    from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

    cfg = dataclasses.replace(WavLMConfig.tiny_for_tests(),
                              freeze_feature_extractor=True)
    model = WavLMModel(cfg)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3200)), jnp.float32)
    params = model.init(jax.random.key(0), wave)

    def loss(p):
        out = model.apply(p, wave, deterministic=True)
        return jnp.sum(out * out)

    g = jax.grad(loss)(params)["params"]
    conv_norm = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(g["feature_extractor"]))
    rest_norm = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(g["encoder"]))
    assert conv_norm == 0.0
    assert rest_norm > 0.0


def test_sample_time_mask_properties():
    from fddm_asr_tpu.models.wavlm import sample_time_mask

    mask = sample_time_mask(jax.random.key(0), 8, 200, 0.1, 10)
    assert mask.shape == (8, 200) and mask.dtype == jnp.bool_
    frac = np.asarray(jnp.mean(mask.astype(jnp.float32), axis=1))
    # 2 spans x 10 frames / 200 = 10% nominal; overlap only lowers it
    assert (frac > 0).all() and (frac <= 0.101).all()
    # mask_prob=0 path is never constructed (train_lib gates on > 0)


def test_specaugment_masked_positions_use_learned_embed():
    from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

    cfg = WavLMConfig.tiny_for_tests()
    model = WavLMModel(cfg)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3200)), jnp.float32)
    params = model.init(jax.random.key(0), wave)
    assert "masked_spec_embed" in params["params"]
    S = cfg.feat_extract_output_length(3200)
    mask = jnp.zeros((2, S), bool).at[:, :3].set(True)
    out_m = model.apply(params, wave, mask_time_indices=mask,
                        deterministic=True)
    out_u = model.apply(params, wave, deterministic=True)
    assert not np.allclose(np.asarray(out_m), np.asarray(out_u))
    # and the learned embed receives gradient through masked positions
    def loss(p):
        out = model.apply(p, wave, mask_time_indices=mask, deterministic=True)
        return jnp.sum(out * out)
    g = jax.grad(loss)(params)["params"]["masked_spec_embed"]
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_finetune_step_with_specaugment(tmp_path):
    cfg = _cfg(tmp_path, freeze=False,
               encoder_extra={"mask_time_prob": 0.1, "mask_time_length": 4})
    pipeline, state, step = _setup(cfg, train_encoder=True)
    wave, x0 = _batch()
    state, metrics = step(state, wave, x0, jax.random.key(42), False)
    assert np.isfinite(float(metrics["total_loss"]))
    # the learned mask embed is trained
    emb = state.encoder["params"]["backbone"]["masked_spec_embed"]
    emb0 = pipeline.encoder_params["params"]["backbone"]["masked_spec_embed"]
    assert not np.allclose(np.asarray(emb), np.asarray(emb0))


def test_run_training_finetune_e2e_with_resume(tmp_path):
    """Full run_training with freeze:false — fine-tunes under the 8-device
    dp mesh, checkpoints the encoder in the orbax state, and resumes."""
    from scripts.make_synth_data import main as synth_main
    from fddm_asr_tpu.config import load_yaml
    from fddm_asr_tpu.train_lib import run_training
    import json

    out = str(tmp_path / "synth")
    synth_main(["--out", out, "--n", "8", "--seconds", "0.3"])
    raw = load_yaml(os.path.join(out, "config.yaml"))
    raw["model"]["encoder"]["freeze"] = False
    raw["optim"]["num_epochs"] = 1
    raw["optim"]["batch_size"] = 8
    raw["optim"]["encoder_lr"] = 1e-4
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck")
    raw["data"]["val_json"] = raw["data"]["test_json"] = "/nonexistent"
    cfg = Config(json.loads(json.dumps(raw)))
    s1 = run_training(cfg, raw_cfg=raw, export_pt=False)
    assert np.isfinite(s1["train_loss"])

    # cache_features + fine-tune must refuse
    bad = json.loads(json.dumps(raw))
    bad["data"]["cache_features"] = str(tmp_path / "feats")
    with pytest.raises(ValueError, match="frozen encoder"):
        run_training(Config(bad), raw_cfg=bad, export_pt=False)

    # resume from the epoch-1 checkpoint (encoder state restored)
    raw2 = json.loads(json.dumps(raw))
    raw2["optim"]["num_epochs"] = 2
    s2 = run_training(Config(raw2), raw_cfg=raw2,
                      resume=str(tmp_path / "ck" / "ep001.orbax"),
                      export_pt=False)
    assert s2["epoch"] == 2
    assert np.isfinite(s2["train_loss"])


def test_feature_mask_zeroes_hidden_dims():
    """SpecAugment feature masks (mask_feature_indices): masked hidden dims
    are zeroed across all time steps, and the output changes vs unmasked."""
    from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel
    import jax.numpy as jnp

    cfg = WavLMConfig.tiny_for_tests()
    model = WavLMModel(cfg)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3200)), jnp.float32)
    params = model.init(jax.random.key(0), wave)
    H = cfg.hidden_size
    fmask = jnp.zeros((2, H), bool).at[:, :4].set(True)
    out_m = model.apply(params, wave, mask_feature_indices=fmask,
                        deterministic=True)
    out_u = model.apply(params, wave, deterministic=True)
    assert not np.allclose(np.asarray(out_m), np.asarray(out_u))


def test_finetune_step_with_feature_masks(tmp_path):
    """encoder.mask_feature_prob composes into the fine-tune step."""
    cfg = _cfg(tmp_path, freeze=False,
               encoder_extra={"mask_time_prob": 0.1, "mask_time_length": 4,
                              "mask_feature_prob": 0.1,
                              "mask_feature_length": 4})
    pipeline, state, step = _setup(cfg, train_encoder=True)
    wave, x0 = _batch()
    state, metrics = step(state, wave, x0, jax.random.key(42), False)
    assert np.isfinite(float(metrics["total_loss"]))
    state, metrics = step(state, wave, x0, jax.random.key(43), False)
    assert int(state.step) == 2
