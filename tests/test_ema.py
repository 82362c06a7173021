# -*- coding: utf-8 -*-
"""EMA of trained params (optim.ema_decay) — math, eval/export, resume.

Beyond-reference capability: the reference optimizes and checkpoints raw
weights only (/root/reference/train.py:542-551, 629-673); EMA is the
standard diffusion-training stabilizer this framework adds.  Contract:
  * state.ema follows e_k = e_{k-1} + (1-d_k)(p_k - e_{k-1}) with the
    warmup ramp d_k = min(ema_decay, (1+k)/(10+k));
  * ema_eval evaluates + exports the EMA weights (best_model.pt carries
    them; the orbax state keeps BOTH for exact resume);
  * resuming a pre-EMA checkpoint with EMA newly enabled seeds the EMA
    from the restored weights instead of crashing.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fddm_asr_tpu.config import Config


def _tiny_cfg(tmp, optim_extra=None):
    optim = {"batch_size": 4, "lr": 1e-2, "weight_decay": 0.01,
             "dtype": "float32"}
    if optim_extra:
        optim.update(optim_extra)
    return Config({
        "seed": 0,
        "data": {"vocab_size": 96, "pad_id": 0, "max_len": 16},
        "model": {
            "d_model": 32, "nhead": 4, "num_layers": 2, "dim_ff": 64,
            "dropout": 0.0,
            "encoder": {"wavlm_name": "tiny", "freeze": True, "proj": "linear",
                        "pooling": "none"},
            "projector": {"d_proj": 16},
        },
        "diffusion": {"T": 20, "beta_max": 0.2},
        "optim": optim,
        "lfd": {"lambda_offdiag": 5e-3, "n_step_fd": 1, "tau": 1.0},
        "log": {"log_every": 1, "ckpt_dir": str(tmp / "ck")},
    })


class _Tok:
    def encode(self, text):
        return [5, 6, 7]


def test_ema_matches_manual_recurrence(tmp_path):
    """state.ema after k steps == the hand-computed warmup-ramped EMA of
    the raw-param trajectory."""
    from fddm_asr_tpu.models.projection import (
        SpeechProjector, TextEmbedding, TextProjector,
    )
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from fddm_asr_tpu.train_lib import TrainState, make_optimizer, make_train_step

    decay = 0.9
    cfg = _tiny_cfg(tmp_path, {"ema_decay": decay})
    pipeline = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), seed=0)
    s_proj = SpeechProjector(d_proj=16)
    t_embed = TextEmbedding(d_out=16, mode="logits")
    t_proj = TextProjector(d_proj=16)
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    sp = s_proj.init(r1, jnp.zeros((1, 4, 32)))
    te = t_embed.init(r2, jnp.zeros((1, 4, 96)))
    tp = t_proj.init(r3, jnp.zeros((1, 4, 16)))
    tx = make_optimizer(cfg)
    params0 = jax.tree.map(jnp.copy, (pipeline.decoder_params, sp, te, tp))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), decoder=params0[0], s_proj=params0[1],
        t_embed=params0[2], t_proj=params0[3], opt_state=tx.init(params0),
        ema=jax.tree.map(jnp.array, params0),
    )
    step = make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg)

    rng = np.random.default_rng(0)
    wave = rng.standard_normal((4, 3200)).astype(np.float32)
    x0 = rng.integers(1, 96, (4, 16), dtype=np.int32)

    expected = jax.tree.map(np.asarray, params0)
    for k in range(1, 4):
        state, _ = step(state, pipeline.encoder_params, wave, x0,
                        jax.random.key(k), True)
        d_k = min(decay, (1.0 + k) / (10.0 + k))
        new_params = (state.decoder, state.s_proj, state.t_embed, state.t_proj)
        expected = jax.tree.map(
            lambda e, p: e + (1.0 - d_k) * (np.asarray(p) - e),
            expected, new_params)
        for a, b in zip(jax.tree.leaves(state.ema), jax.tree.leaves(expected)):
            np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)

    # EMA must lag the raw weights (decay > 0 ⇒ not equal after updates)
    flat_raw = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(state.decoder)])
    flat_ema = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(state.ema[0])])
    assert not np.allclose(flat_raw, flat_ema)


def _synth_cfg(tmp_path, **optim_extra):
    from scripts.make_synth_data import main as synth_main
    from fddm_asr_tpu.config import load_yaml

    out = str(tmp_path / "synth")
    if not os.path.exists(out):
        synth_main(["--out", out, "--n", "8", "--seconds", "0.3"])
    raw = load_yaml(os.path.join(out, "config.yaml"))
    raw["optim"]["num_epochs"] = 1
    raw["optim"]["batch_size"] = 8
    raw["optim"].update(optim_extra)
    return raw


def test_ema_eval_exports_ema_weights(tmp_path):
    """best_model.pt carries the EMA decoder (the weights that produced the
    recorded CER); the orbax state keeps raw AND ema."""
    from fddm_asr_tpu.checkpoint import load_checkpoint_any
    from fddm_asr_tpu.train_lib import run_training
    from fddm_asr_tpu import checkpoint as C

    raw = _synth_cfg(tmp_path, ema_decay=0.5)
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck")
    summary = run_training(Config(raw), raw_cfg=raw)
    assert summary["val_cer"] is not None

    ck = os.path.join(raw["log"]["ckpt_dir"], "ep001")
    restored = C.load_orbax(ck + ".orbax")
    st = restored["state"]
    raw_dec = jax.tree.leaves(st["decoder"])
    ema_dec = jax.tree.leaves(st["ema"]["0"] if "0" in st["ema"] else st["ema"][0])
    assert not all(np.allclose(a, b) for a, b in zip(raw_dec, ema_dec))

    loaded = load_checkpoint_any(ck + ".pt")
    pt_leaves = sorted(
        ((k, v) for k, v in _flatten(loaded["decoder"]).items()),
    )
    ema_map = _flatten(st["ema"]["0"]["params"]
                       if "0" in st["ema"] else st["ema"][0]["params"])
    raw_map = _flatten(st["decoder"]["params"])
    matched_ema = matched_raw = 0
    for k, v in pt_leaves:
        if k in ema_map and np.allclose(v, ema_map[k], atol=1e-6):
            matched_ema += 1
        if k in raw_map and np.allclose(v, raw_map[k], atol=1e-6):
            matched_raw += 1
    assert matched_ema == len(pt_leaves)   # .pt == EMA weights
    assert matched_raw < len(pt_leaves)    # … and NOT the raw weights


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def test_orbax_inference_load_prefers_ema(tmp_path):
    """load_checkpoint_any on an EMA orbax state returns the EMA decoder —
    the weights the training loop evaluated with — not the raw one."""
    from fddm_asr_tpu.checkpoint import load_checkpoint_any
    from fddm_asr_tpu.train_lib import run_training
    from fddm_asr_tpu import checkpoint as C

    raw = _synth_cfg(tmp_path, ema_decay=0.5)
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck_inf")
    run_training(Config(raw), raw_cfg=raw, export_pt=False)
    ck = os.path.join(raw["log"]["ckpt_dir"], "ep001.orbax")
    loaded = load_checkpoint_any(ck)
    st = C.load_orbax(ck)["state"]
    ema_dec = st["ema"]["0"] if "0" in st["ema"] else st["ema"][0]
    got = _flatten(loaded["decoder"])
    want = _flatten(ema_dec["params"])
    raw_dec = _flatten(st["decoder"]["params"])
    assert set(got) == set(want)
    assert all(np.allclose(got[k], want[k]) for k in got)
    assert not all(np.allclose(got[k], raw_dec[k]) for k in got)
    # raw weights stay reachable for tooling
    raw_got = _flatten(loaded["raw_decoder"])
    assert all(np.allclose(raw_got[k], raw_dec[k]) for k in raw_got)


def test_orbax_load_respects_ema_eval_false(tmp_path):
    """optim.ema_eval: false — eval/selection used RAW weights, so the
    loader must return them (the meta sidecar records the choice)."""
    from fddm_asr_tpu.checkpoint import load_checkpoint_any, load_ckpt_meta
    from fddm_asr_tpu.train_lib import run_training
    from fddm_asr_tpu import checkpoint as C

    raw = _synth_cfg(tmp_path, ema_decay=0.5, ema_eval=False)
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck_raweval")
    run_training(Config(raw), raw_cfg=raw, export_pt=False)
    ck = os.path.join(raw["log"]["ckpt_dir"], "ep001.orbax")
    assert load_ckpt_meta(ck)["ema_eval"] is False
    loaded = load_checkpoint_any(ck)
    st = C.load_orbax(ck)["state"]
    got = _flatten(loaded["decoder"])
    raw_dec = _flatten(st["decoder"]["params"])
    assert all(np.allclose(got[k], raw_dec[k]) for k in got)


def test_resume_ema_checkpoint_with_ema_disabled(tmp_path):
    """The reverse migration: resume an EMA checkpoint with ema_decay: 0 —
    the EMA is dropped and training continues on the raw weights."""
    from fddm_asr_tpu.train_lib import run_training

    raw = _synth_cfg(tmp_path, ema_decay=0.9)
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck_ema1")
    run_training(Config(raw), raw_cfg=raw, export_pt=False)
    ck = os.path.join(raw["log"]["ckpt_dir"], "ep001.orbax")

    raw2 = json.loads(json.dumps(raw))
    raw2["optim"]["ema_decay"] = 0.0
    raw2["optim"]["num_epochs"] = 2
    raw2["log"]["ckpt_dir"] = str(tmp_path / "ck_ema0")
    summary = run_training(Config(raw2), raw_cfg=raw2, resume=ck)
    assert summary["epoch"] == 2
    assert np.isfinite(summary["train_loss"])


def test_resume_pre_ema_checkpoint_with_ema_enabled(tmp_path):
    """Enable EMA on a checkpoint trained without it: the EMA seeds from the
    restored weights and training continues."""
    from fddm_asr_tpu.train_lib import run_training

    raw = _synth_cfg(tmp_path)
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck1")
    run_training(Config(raw), raw_cfg=raw)
    ck = os.path.join(raw["log"]["ckpt_dir"], "ep001.orbax")
    assert os.path.exists(ck)

    raw2 = json.loads(json.dumps(raw))
    raw2["optim"]["ema_decay"] = 0.9
    raw2["optim"]["num_epochs"] = 2
    raw2["log"]["ckpt_dir"] = str(tmp_path / "ck2")
    summary = run_training(Config(raw2), raw_cfg=raw2, resume=ck)
    assert summary["epoch"] == 2
    assert np.isfinite(summary["train_loss"])


def test_bf16_ema_and_mu_dtype(tmp_path):
    """optim.ema_dtype/adam_mu_dtype: bfloat16 — training runs, EMA leaves
    are bf16, Adam mu leaves are bf16, and eval/export still work."""
    from fddm_asr_tpu.train_lib import run_training
    from fddm_asr_tpu import checkpoint as C

    raw = _synth_cfg(tmp_path, ema_decay=0.9, ema_dtype="bfloat16",
                     adam_mu_dtype="bfloat16")
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck_bf16")
    summary = run_training(Config(raw), raw_cfg=raw, export_pt=False)
    assert np.isfinite(summary["train_loss"])
    st = C.load_orbax(os.path.join(raw["log"]["ckpt_dir"], "ep001.orbax"))["state"]
    ema_leaves = [np.asarray(x) for x in jax.tree.leaves(st["ema"])]
    assert all(l.dtype == np.dtype("bfloat16") or not
               np.issubdtype(l.dtype, np.floating) for l in ema_leaves)
    # raw weights stay f32
    assert all(np.asarray(x).dtype == np.float32
               for x in jax.tree.leaves(st["decoder"]))
    # Adam state: mu leaves went bf16, nu leaves stayed f32 — so the
    # restored opt_state must contain BOTH float dtypes.  (No issubdtype
    # filter: ml_dtypes' bfloat16 is NOT a subtype of np.floating.)
    opt_dtypes = {np.asarray(x).dtype for x in jax.tree.leaves(st["opt_state"])}
    assert np.dtype("bfloat16") in opt_dtypes
    assert np.dtype("float32") in opt_dtypes
