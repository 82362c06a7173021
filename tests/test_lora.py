# -*- coding: utf-8 -*-
"""LoRA encoder fine-tuning (encoder.lora_rank) — merge math, training,
E2E integration.

Beyond-reference capability (its optimizer excludes the encoder entirely,
/root/reference/train.py:542-544).  Contract:
  * merge_lora(base, init_lora(...), s) == base exactly (B = 0 at init);
  * the LoRA train step updates ONLY the adapters — the threaded base
    params are untouched and the trainable state is O(rank·d);
  * stacked (scanned-layer) kernels adapt with batched-einsum merges;
  * run_training with encoder.lora_rank completes, checkpoints the
    adapters in the orbax state, and evaluates with merged weights.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fddm_asr_tpu.config import Config
from fddm_asr_tpu.models import lora as LO
from fddm_asr_tpu.models.projection import (
    SpeechProjector, TextEmbedding, TextProjector,
)
from fddm_asr_tpu.pipeline import FDDMPipeline
from fddm_asr_tpu.train_lib import TrainState, make_optimizer, make_train_step


class _Tok:
    def encode(self, text):
        return [5, 6, 7]


def _cfg(tmp, lora_rank=2, optim_extra=None):
    optim = {"batch_size": 4, "lr": 1e-3, "weight_decay": 0.01,
             "dtype": "float32"}
    if optim_extra:
        optim.update(optim_extra)
    return Config({
        "seed": 0,
        "data": {"vocab_size": 96, "pad_id": 0, "max_len": 16},
        "model": {
            "d_model": 32, "nhead": 4, "num_layers": 2, "dim_ff": 64,
            "dropout": 0.0,
            "encoder": {"wavlm_name": "tiny", "freeze": False,
                        "lora_rank": lora_rank, "proj": "linear",
                        "pooling": "none"},
            "projector": {"d_proj": 16},
        },
        "diffusion": {"T": 20, "beta_max": 0.2},
        "optim": optim,
        "lfd": {"lambda_offdiag": 5e-3, "n_step_fd": 1, "tau": 1.0},
        "log": {"log_every": 1, "ckpt_dir": str(tmp / "ck")},
    })


def test_merge_is_identity_at_init(tmp_path):
    cfg = _cfg(tmp_path)
    pipeline = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), seed=0)
    base = pipeline.encoder_params
    adapters = LO.init_lora(jax.random.key(0), base, rank=2)
    merged = LO.merge_lora(base, adapters, scale=1.0)
    for a, b in zip(jax.tree_util.tree_leaves(base),
                    jax.tree_util.tree_leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # adapters cover attention + FFN kernels and are small
    assert any("q_proj" in p for p in adapters)
    assert any("intermediate_dense" in p for p in adapters)
    n_base = sum(int(x.size) for x in jax.tree_util.tree_leaves(base))
    assert LO.lora_param_count(adapters) < 0.2 * n_base


def test_merge_math_and_stacked_kernels():
    """W + s·A@B, including a scanned-layer stacked kernel [L, din, dout]."""
    rng = np.random.default_rng(0)
    W2 = rng.standard_normal((6, 4)).astype(np.float32)
    W3 = rng.standard_normal((3, 6, 4)).astype(np.float32)
    params = {"x": {"q_proj": {"kernel": jnp.asarray(W2)}},
              "scan": {"q_proj": {"kernel": jnp.asarray(W3)}},
              "other": {"kernel": jnp.asarray(W2)}}
    adapters = LO.init_lora(jax.random.key(1), params, rank=2)
    assert set(adapters) == {"x/q_proj/kernel", "scan/q_proj/kernel"}
    # overwrite B with random so the delta is non-trivial
    adapters = {
        k: {"a": v["a"],
            "b": jnp.asarray(rng.standard_normal(v["b"].shape), jnp.float32)}
        for k, v in adapters.items()
    }
    merged = LO.merge_lora(params, adapters, scale=0.5)
    ad = adapters["x/q_proj/kernel"]
    np.testing.assert_allclose(
        np.asarray(merged["x"]["q_proj"]["kernel"]),
        W2 + 0.5 * np.asarray(ad["a"]) @ np.asarray(ad["b"]),
        rtol=1e-5, atol=1e-6)
    ad3 = adapters["scan/q_proj/kernel"]
    np.testing.assert_allclose(
        np.asarray(merged["scan"]["q_proj"]["kernel"]),
        W3 + 0.5 * np.einsum("lir,lro->lio", np.asarray(ad3["a"]),
                             np.asarray(ad3["b"])), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(merged["other"]["kernel"]), W2)
    # base-mismatch guard
    with pytest.raises(ValueError, match="not found"):
        LO.merge_lora({"y": {"kernel": jnp.zeros((2, 2))}}, adapters, 1.0)


def test_lora_step_trains_only_adapters(tmp_path):
    cfg = _cfg(tmp_path)
    pipeline = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), seed=0)
    s_proj = SpeechProjector(d_proj=16)
    t_embed = TextEmbedding(d_out=16, mode="logits")
    t_proj = TextProjector(d_proj=16)
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    sp = s_proj.init(r1, jnp.zeros((1, 4, 32)))
    te = t_embed.init(r2, jnp.zeros((1, 4, 96)))
    tp = t_proj.init(r3, jnp.zeros((1, 4, 16)))
    tx = make_optimizer(cfg, train_encoder=True)
    adapters = LO.init_lora(jax.random.key(7), pipeline.encoder_params, 2)
    params0 = (pipeline.decoder_params, sp, te, tp, adapters)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        decoder=jax.tree.map(jnp.copy, params0[0]),
        s_proj=sp, t_embed=te, t_proj=tp,
        opt_state=tx.init(params0),
        encoder=jax.tree.map(jnp.copy, adapters),
    )
    step = make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg,
                           train_encoder=True)

    base = jax.tree.map(jnp.copy, pipeline.encoder_params)
    wave = np.random.default_rng(0).standard_normal((4, 3200)).astype(np.float32)
    x0 = np.random.default_rng(1).integers(1, 96, (4, 16), dtype=np.int32)

    state, metrics = step(state, pipeline.encoder_params, wave, x0,
                          jax.random.key(42), True)
    assert np.isfinite(float(metrics["total_loss"]))
    # adapters moved (B leaves get gradient through A@B with A != 0)
    delta = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(state.encoder),
                                jax.tree_util.tree_leaves(adapters)))
    assert delta > 0.0, "adapters got no update"
    # the threaded base params are untouched
    for a, b in zip(jax.tree_util.tree_leaves(pipeline.encoder_params),
                    jax.tree_util.tree_leaves(base)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # second step exercises donation
    state, metrics = step(state, pipeline.encoder_params, wave, x0,
                          jax.random.key(43), False)
    assert int(state.step) == 2


def test_run_training_lora_e2e(tmp_path):
    """Full run_training with encoder.lora_rank: trains, evaluates with
    merged weights, stores only adapters in state.encoder, resumes."""
    from scripts.make_synth_data import main as synth_main
    from fddm_asr_tpu.config import load_yaml
    from fddm_asr_tpu.train_lib import run_training
    from fddm_asr_tpu import checkpoint as C

    out = str(tmp_path / "synth")
    synth_main(["--out", out, "--n", "8", "--seconds", "0.3"])
    raw = load_yaml(os.path.join(out, "config.yaml"))
    raw["model"]["encoder"]["freeze"] = False
    raw["model"]["encoder"]["lora_rank"] = 2
    raw["model"]["encoder"]["lora_alpha"] = 6  # train scale 3.0, not 1.0
    raw["optim"]["num_epochs"] = 1
    raw["optim"]["batch_size"] = 8
    raw["optim"]["encoder_lr"] = 1e-3
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck")
    s1 = run_training(Config(json.loads(json.dumps(raw))), raw_cfg=raw,
                      export_pt=False)
    assert np.isfinite(s1["train_loss"])
    assert s1["val_cer"] is not None  # eval ran on merged weights

    restored = C.load_orbax(str(tmp_path / "ck" / "ep001.orbax"))
    enc_state = restored["state"]["encoder"]
    flat = jax.tree_util.tree_leaves(enc_state)
    # adapters only: tiny encoder has ~100k params; rank-2 adapters are far
    # smaller, and every leaf trailing dim pairs with rank 2
    n = sum(int(np.asarray(x).size) for x in flat)
    assert n < 20_000, f"state.encoder holds {n} params — full tree, not LoRA?"

    raw2 = json.loads(json.dumps(raw))
    raw2["optim"]["num_epochs"] = 2
    s2 = run_training(Config(raw2), raw_cfg=raw2,
                      resume=str(tmp_path / "ck" / "ep001.orbax"),
                      export_pt=False)
    assert s2["epoch"] == 2 and np.isfinite(s2["train_loss"])

    # inference-side restore: from_config(ckpt_path=orbax) must transcribe
    # with the TUNED encoder — base params merged with the stored adapters
    # at the TRAINING scale (alpha/rank = 3.0 from the meta sidecar), even
    # when the inference config never mentions lora_alpha
    adapters = LO.normalize_adapter_tree(enc_state)
    assert adapters is not None, "orbax state.encoder no longer adapter-shaped"
    base_pipe = FDDMPipeline.from_config(Config(json.loads(json.dumps(raw))))
    expect = LO.merge_lora(base_pipe.encoder_params, adapters, scale=3.0)
    inf_raw = json.loads(json.dumps(raw))
    del inf_raw["model"]["encoder"]["lora_alpha"]  # sidecar must win
    tuned_pipe = FDDMPipeline.from_config(
        Config(inf_raw),
        ckpt_path=str(tmp_path / "ck" / "ep001.orbax"))
    for a, b in zip(jax.tree_util.tree_leaves(tuned_pipe.encoder_params),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # and it differs from the base encoder (adapters actually trained)
    diffs = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(
                 jax.tree_util.tree_leaves(tuned_pipe.encoder_params),
                 jax.tree_util.tree_leaves(base_pipe.encoder_params))]
    assert any(diffs)


def test_lora_requires_unfrozen_encoder(tmp_path):
    from fddm_asr_tpu.train_lib import run_training

    raw = _cfg(tmp_path).to_dict()
    raw["model"]["encoder"]["freeze"] = True
    with pytest.raises(ValueError, match="lora_rank"):
        run_training(Config(raw), raw_cfg=raw, export_pt=False)
