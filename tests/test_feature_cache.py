# -*- coding: utf-8 -*-
"""Frozen-encoder feature cache: numerics identity + training integration.

The cache must be a pure performance lever — VERDICT r1 #4's contract is
"cached vs uncached steps produce identical losses"."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fddm_asr_tpu.config import Config
from fddm_asr_tpu.data import feature_cache as FC


def _tiny_cfg(tmp, extra_data=None):
    data = {"vocab_size": 96, "pad_id": 0, "max_len": 16}
    if extra_data:
        data.update(extra_data)
    return Config({
        "seed": 0,
        "data": data,
        "model": {
            "d_model": 32, "nhead": 4, "num_layers": 2, "dim_ff": 64,
            "dropout": 0.1,
            "encoder": {"wavlm_name": "tiny", "freeze": True, "proj": "linear",
                        "pooling": "none"},
            "projector": {"d_proj": 16},
        },
        "diffusion": {"T": 20, "beta_max": 0.2},
        "optim": {"batch_size": 4, "lr": 1e-3, "weight_decay": 0.01,
                  "dtype": "float32"},
        "lfd": {"lambda_offdiag": 5e-3, "n_step_fd": 1, "tau": 1.0},
        "log": {"log_every": 1, "ckpt_dir": str(tmp / "ck")},
    })


def test_cached_step_matches_wave_step(tmp_path):
    """Same state/batch/rng: the cached-c step must produce identical
    losses and identical updated params as the wave step."""
    from fddm_asr_tpu.models.projection import (
        SpeechProjector, TextEmbedding, TextProjector,
    )
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from fddm_asr_tpu.train_lib import TrainState, make_optimizer, make_train_step

    cfg = _tiny_cfg(tmp_path)

    class _Tok:
        def encode(self, text):
            return [5, 6, 7]

    pipeline = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), seed=0)
    s_proj = SpeechProjector(d_proj=16)
    t_embed = TextEmbedding(d_out=16, mode="logits")
    t_proj = TextProjector(d_proj=16)
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    sp = s_proj.init(r1, jnp.zeros((1, 4, 32)))
    te = t_embed.init(r2, jnp.zeros((1, 4, 96)))
    tp = t_proj.init(r3, jnp.zeros((1, 4, 16)))
    tx = make_optimizer(cfg)

    def fresh_state():
        # deep-copy: the train step DONATES state, so each run needs its
        # own buffers
        params0 = jax.tree.map(jnp.copy,
                               (pipeline.decoder_params, sp, te, tp))
        return TrainState(
            step=jnp.zeros((), jnp.int32), decoder=params0[0],
            s_proj=params0[1], t_embed=params0[2], t_proj=params0[3],
            opt_state=tx.init(params0),
        )

    wave = np.random.default_rng(0).standard_normal((4, 3200)).astype(np.float32)
    x0 = np.random.default_rng(1).integers(1, 96, (4, 16), dtype=np.int32)
    rng = jax.random.key(42)

    wave_step = make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg)
    cached_step = make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg,
                                  cached_features=True)

    s1, m1 = wave_step(fresh_state(), pipeline.encoder_params, wave, x0, rng, True)

    # precompute c exactly as the cache builder does (standalone jitted apply)
    enc = jax.jit(lambda p, w: pipeline.encoder.apply(p, w, None,
                                                      deterministic=True)[0])
    c = enc(pipeline.encoder_params, wave)
    s2, m2 = cached_step(fresh_state(), c, x0, rng, True)

    np.testing.assert_allclose(float(m1["total_loss"]), float(m2["total_loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["loss_diff"]), float(m2["loss_diff"]),
                               rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(s1.decoder)
    l2 = jax.tree_util.tree_leaves(s2.decoder)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_cache_roundtrip_bf16(tmp_path):
    """bf16 features survive the uint16 store bit-exactly."""
    class _DS:
        def __init__(self, feats):
            self.f = feats

        def __len__(self):
            return len(self.f)

        def __getitem__(self, i):
            return {"wave": self.f[i]}

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((6, 8)), jnp.bfloat16)
    ds = _DS(np.asarray(src, np.float32))

    def encode(waves):
        return jnp.asarray(waves, jnp.bfloat16)[:, :, None] * jnp.ones((1, 1, 3), jnp.bfloat16)

    FC.build_cache(str(tmp_path), "train", ds, encode, batch_size=4,
                   manifest_path="m.json", checksum=1.25)
    cache = FC.FeatureCache(str(tmp_path), "train",
                            expect_fingerprint=FC.fingerprint("m.json", 6, 1.25))
    assert cache.dtype_token == "bfloat16"
    rows = cache.rows([3, 1])
    expect = np.asarray(encode(np.stack([ds[3]["wave"], ds[1]["wave"]])))
    assert rows.dtype == expect.dtype
    np.testing.assert_array_equal(rows.view(np.uint16), expect.view(np.uint16))


def test_stale_cache_refused(tmp_path):
    class _DS(list):
        def __getitem__(self, i):
            return {"wave": np.zeros(4, np.float32)}

    ds = _DS([0, 1])

    FC.build_cache(str(tmp_path), "train", ds,
                   lambda w: jnp.asarray(w, jnp.float32)[:, :, None],
                   manifest_path="m.json", checksum=1.0)
    with pytest.raises(ValueError, match="stale feature cache"):
        FC.FeatureCache(str(tmp_path), "train",
                        expect_fingerprint=FC.fingerprint("m.json", 2, 2.0))


def test_wrong_width_cache_refused(tmp_path):
    """A cache built for one model geometry must be refused by another:
    the sampled-leaf checksum can miss a projection-width change, so the
    loader also checks the feature width exactly (found live in round 4:
    a d256 decoder silently accepted a 768-wide cache and crashed
    mid-training in cross-attention)."""
    from scripts.make_synth_data import main as synth_main
    from fddm_asr_tpu.config import load_yaml
    from fddm_asr_tpu.train_lib import run_training

    out = str(tmp_path / "synth")
    synth_main(["--out", out, "--n", "8", "--seconds", "0.3"])
    raw = load_yaml(os.path.join(out, "config.yaml"))
    raw["optim"].update(num_epochs=1, batch_size=8)
    raw["data"]["val_json"] = raw["data"]["test_json"] = "/nonexistent"
    raw["data"]["cache_features"] = str(tmp_path / "feats")
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck1")
    run_training(Config(raw), raw_cfg=raw, export_pt=False,
                 max_steps_per_epoch=1)

    # same cache dir, different d_model -> must refuse, not crash later.
    # (keep nhead dividing d_model; the tiny encoder reprojects to d_model)
    raw2 = json.loads(json.dumps(raw))
    raw2["model"].update(d_model=48, nhead=4)
    raw2["log"]["ckpt_dir"] = str(tmp_path / "ck2")
    with pytest.raises(ValueError, match="different model geometry|stale"):
        run_training(Config(raw2), raw_cfg=raw2, export_pt=False,
                     max_steps_per_epoch=1)


def test_training_with_cache_matches_uncached(tmp_path):
    """Full run_training with data.cache_features: per-epoch train losses
    must match the uncached run exactly (same seeds, same data order), and
    the cache must actually be built once and reused."""
    from scripts.make_synth_data import main as synth_main
    from fddm_asr_tpu.config import load_config, load_yaml
    from fddm_asr_tpu.train_lib import run_training

    out = str(tmp_path / "synth")
    synth_main(["--out", out, "--n", "8", "--seconds", "0.3"])
    raw = load_yaml(os.path.join(out, "config.yaml"))
    raw["optim"]["num_epochs"] = 2
    raw["optim"]["batch_size"] = 8  # divisible by the 8-device test mesh
    # eval costs dominate the toy run; this test pins the train-loss path
    raw["data"]["val_json"] = raw["data"]["test_json"] = "/nonexistent"

    def run(cache):
        r = json.loads(json.dumps(raw))
        r["log"]["ckpt_dir"] = str(tmp_path / ("ck_c" if cache else "ck_u"))
        if cache:
            r["data"]["cache_features"] = str(tmp_path / "feats")
        cfg = Config(r)
        return run_training(cfg, raw_cfg=r, export_pt=False)

    su = run(False)
    sc = run(True)
    np.testing.assert_allclose(sc["train_loss"], su["train_loss"], rtol=1e-6)
    cache_file = tmp_path / "feats" / "train" / "feats.npy"
    assert cache_file.exists()
    mtime = cache_file.stat().st_mtime
    sc2 = run(True)  # second run must REUSE, not rebuild
    assert cache_file.stat().st_mtime == mtime
    np.testing.assert_allclose(sc2["train_loss"], su["train_loss"], rtol=1e-6)


def test_precompute_script_then_train(tmp_path):
    """scripts/precompute_features.py (the documented multi-host
    prerequisite) writes a cache that a subsequent training run ACCEPTS —
    same fingerprint, no rebuild — and reproduces the uncached losses."""
    from scripts.make_synth_data import main as synth_main
    from scripts.precompute_features import main as precompute
    from fddm_asr_tpu.config import load_yaml
    from fddm_asr_tpu.train_lib import run_training

    out = str(tmp_path / "synth")
    synth_main(["--out", out, "--n", "8", "--seconds", "0.3"])
    cache = str(tmp_path / "feats")
    precompute(["--config", os.path.join(out, "config.yaml"),
                "--cache-dir", cache, "--splits", "train", "--device", "cpu"])
    feats = tmp_path / "feats" / "train" / "feats.npy"
    assert feats.exists()
    mtime = feats.stat().st_mtime

    raw = load_yaml(os.path.join(out, "config.yaml"))
    raw["optim"].update({"num_epochs": 1, "batch_size": 8})
    raw["data"]["val_json"] = raw["data"]["test_json"] = "/nonexistent"
    raw["data"]["cache_features"] = cache
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck")
    s = run_training(Config(raw), raw_cfg=raw, export_pt=False)
    assert np.isfinite(s["train_loss"])
    assert feats.stat().st_mtime == mtime  # accepted, not rebuilt


def test_device_resident_cache_matches_host_streaming(tmp_path):
    """data.cache_device: true parks the feature tensor in device memory
    and gathers batches on device (zero per-step feature upload — the
    host->device path is the relay bottleneck).  Losses must match the
    host-streaming cache path bit-for-bit."""
    from scripts.make_synth_data import main as synth_main
    from fddm_asr_tpu.config import load_yaml
    from fddm_asr_tpu.train_lib import run_training

    out = str(tmp_path / "synth")
    synth_main(["--out", out, "--n", "8", "--seconds", "0.3"])
    raw = load_yaml(os.path.join(out, "config.yaml"))
    raw["optim"]["num_epochs"] = 2
    raw["optim"]["batch_size"] = 8
    raw["data"]["val_json"] = raw["data"]["test_json"] = "/nonexistent"
    raw["data"]["cache_features"] = str(tmp_path / "feats")

    def run(device_cache, tag):
        r = json.loads(json.dumps(raw))
        r["log"]["ckpt_dir"] = str(tmp_path / f"ck_{tag}")
        r["data"]["cache_device"] = device_cache
        cfg = Config(r)
        return run_training(cfg, raw_cfg=r, export_pt=False)

    host = run(False, "host")
    dev = run(True, "dev")
    np.testing.assert_allclose(dev["train_loss"], host["train_loss"],
                               rtol=1e-6)


def test_condition_mask_training(tmp_path):
    """model.encoder.condition_mask: true (deviation from reference parity —
    the reference trains with c_mask=None, train.py:349):

      (a) cached and uncached masked runs produce identical losses (the mask
          is threaded through BOTH paths, and the cache is built with the
          WavLM attention mask so feature values match the live encoder);
      (b) the mask actually changes the losses vs the unmasked default
          (anti-no-op: a silently dropped mask must fail here);
      (c) a masked run refuses an unmasked cache (fingerprint mismatch).
    """
    from scripts.make_synth_data import main as synth_main
    from fddm_asr_tpu.config import load_yaml
    from fddm_asr_tpu.train_lib import run_training

    out = str(tmp_path / "synth")
    # words style with a duration RANGE wide enough to survive the 0.5-s
    # segment grid (k = max(2, round(dur/0.5))): equal-length utterances
    # would make every mask all-True and (b) vacuous
    synth_main(["--out", out, "--n", "8", "--seconds", "0.5",
                "--style", "words", "--max-seconds", "2.0"])
    raw = load_yaml(os.path.join(out, "config.yaml"))
    raw["optim"]["num_epochs"] = 2
    raw["optim"]["batch_size"] = 8
    raw["data"]["val_json"] = raw["data"]["test_json"] = "/nonexistent"

    def run(cache_tag, mask):
        r = json.loads(json.dumps(raw))
        r["log"]["ckpt_dir"] = str(tmp_path / f"ck_{cache_tag}_{mask}")
        if cache_tag:
            r["data"]["cache_features"] = str(tmp_path / f"feats_{cache_tag}")
        else:  # the generated synth config ships a default cache dir
            r["data"].pop("cache_features", None)
        if mask:
            r["model"]["encoder"]["condition_mask"] = True
        cfg = Config(r)
        return run_training(cfg, raw_cfg=r, export_pt=False)["train_loss"]

    masked_uncached = run("", True)
    masked_cached = run("m", True)
    unmasked = run("", False)
    np.testing.assert_allclose(masked_cached, masked_uncached, rtol=1e-6)
    assert abs(masked_uncached - unmasked) > 1e-6, (
        "condition_mask had no effect on the training loss")

    # (c): unmasked cache dir reused by a masked run must be refused
    run("x", False)  # builds an UNMASKED cache under feats_x
    r = json.loads(json.dumps(raw))
    r["log"]["ckpt_dir"] = str(tmp_path / "ck_refuse")
    r["data"]["cache_features"] = str(tmp_path / "feats_x")
    r["model"]["encoder"]["condition_mask"] = True
    with pytest.raises(ValueError, match="fingerprint|stale|cache"):
        run_training(Config(r), raw_cfg=r, export_pt=False)
