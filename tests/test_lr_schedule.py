# -*- coding: utf-8 -*-
"""LR schedules (optim.lr_schedule) — the reference runs constant-LR AdamW
(/root/reference/train.py:542-544, quirk #9 ignores even its warmup knob);
this framework wires warmup + constant/cosine/linear decay."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fddm_asr_tpu.config import Config
from fddm_asr_tpu.train_lib import _lr_schedule, make_optimizer


def _optim(**kw):
    base = {"lr": 1e-3, "weight_decay": 0.01}
    base.update(kw)
    return Config(base)


def test_constant_default_matches_reference():
    assert _lr_schedule(_optim(), 1e-3, 0) == 1e-3
    sched = _lr_schedule(_optim(warmup_steps=10), 1e-3, 10)
    np.testing.assert_allclose(float(sched(0)), 0.0)
    np.testing.assert_allclose(float(sched(10)), 1e-3)
    np.testing.assert_allclose(float(sched(1000)), 1e-3)


def test_cosine_schedule_shape():
    o = _optim(lr_schedule="cosine", warmup_steps=10, decay_steps=110,
               end_lr=1e-5)
    sched = _lr_schedule(o, 1e-3, 10)
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    mid = float(sched(60))
    assert 1e-5 < mid < 1e-3
    np.testing.assert_allclose(float(sched(110)), 1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(sched(10_000)), 1e-5, rtol=1e-4)


def test_linear_schedule_shape():
    o = _optim(lr_schedule="linear", warmup_steps=10, decay_steps=110)
    sched = _lr_schedule(o, 1e-3, 10)
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(60)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(110)), 0.0, atol=1e-10)


def test_schedule_validation():
    with pytest.raises(ValueError, match="decay_steps"):
        _lr_schedule(_optim(lr_schedule="cosine"), 1e-3, 0)
    with pytest.raises(ValueError, match="decay_steps"):
        _lr_schedule(_optim(lr_schedule="linear", warmup_steps=10,
                            decay_steps=5), 1e-3, 10)
    with pytest.raises(ValueError, match="unknown"):
        _lr_schedule(_optim(lr_schedule="exponential", decay_steps=10),
                     1e-3, 0)


def test_optimizer_with_cosine_trains():
    cfg = Config({"optim": {"lr": 1e-2, "weight_decay": 0.0,
                            "lr_schedule": "cosine", "warmup_steps": 2,
                            "decay_steps": 6}})
    tx = make_optimizer(cfg)
    params = ({"w": jnp.ones((3,))},) * 4
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    seen = []
    p = params
    for _ in range(8):
        updates, opt_state = tx.update(grads, opt_state, p)
        seen.append(float(jnp.abs(updates[0]["w"][0])))
        import optax
        p = optax.apply_updates(p, updates)
    # warmup: first update is ~0; peak then decays toward 0
    assert seen[0] < 1e-6
    assert max(seen) > 1e-3
    assert seen[-1] < max(seen)


def test_skip_nonfinite_updates_guards_params():
    """optim.skip_nonfinite_updates: a NaN/inf gradient leaves the params
    untouched (update dropped), a finite one applies normally."""
    import optax

    cfg = Config({"optim": {"lr": 1e-2, "weight_decay": 0.0,
                            "skip_nonfinite_updates": 3}})
    tx = make_optimizer(cfg)
    params = ({"w": jnp.ones((3,))},) * 4
    opt_state = tx.init(params)

    bad = jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), params)
    updates, opt_state = tx.update(bad, opt_state, params)
    p1 = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    good = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(good, opt_state, params)
    p2 = optax.apply_updates(p1, updates)
    assert not np.allclose(np.asarray(jax.tree.leaves(p2)[0]),
                           np.asarray(jax.tree.leaves(p1)[0]))


def test_grad_norm_metric_reported(tmp_path):
    """The train step reports the pre-clip global gradient norm."""
    from fddm_asr_tpu.models.projection import (
        SpeechProjector, TextEmbedding, TextProjector,
    )
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from fddm_asr_tpu.train_lib import TrainState, make_train_step

    cfg = Config({
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
        "optim": {"batch_size": 4, "lr": 1e-3, "weight_decay": 0.01,
                  "dtype": "float32"},
        "lfd": {"lambda_offdiag": 5e-3, "n_step_fd": 1, "tau": 1.0},
        "log": {"log_every": 1, "ckpt_dir": str(tmp_path / "ck")},
    })

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
    params0 = (pipeline.decoder_params, sp, te, tp)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), decoder=params0[0], s_proj=sp,
        t_embed=te, t_proj=tp, opt_state=tx.init(params0),
    )
    step = make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg)
    wave = np.zeros((4, 3200), np.float32)
    x0 = np.random.default_rng(1).integers(1, 96, (4, 16), dtype=np.int32)
    _, metrics = step(state, pipeline.encoder_params, wave, x0,
                      jax.random.key(0), False)
    gn = float(metrics["grad_norm"])
    assert np.isfinite(gn) and gn > 0.0


def test_decay_exclude_1d_masks_weight_decay():
    """optim.decay_exclude_1d: pure-decay shrinkage applies to 2-D kernels
    but not 1-D biases (grads zero, lr>0 so only the decay term acts)."""
    import optax

    def run(exclude):
        cfg = Config({"optim": {"lr": 1.0, "weight_decay": 0.1,
                                "decay_exclude_1d": exclude}})
        tx = make_optimizer(cfg)
        params = ({"w": jnp.ones((2, 2)), "b": jnp.ones((2,))},) * 4
        opt_state = tx.init(params)
        grads = jax.tree.map(jnp.zeros_like, params)
        updates, _ = tx.update(grads, opt_state, params)
        p = optax.apply_updates(params, updates)
        return p[0]

    p_masked = run(True)
    assert float(jnp.max(jnp.abs(p_masked["w"] - 1.0))) > 0  # kernel decayed
    np.testing.assert_array_equal(np.asarray(p_masked["b"]),
                                  np.ones(2, np.float32))    # bias untouched
    p_full = run(False)
    assert float(jnp.max(jnp.abs(p_full["b"] - 1.0))) > 0    # parity default
