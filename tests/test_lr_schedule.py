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
