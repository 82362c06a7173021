#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Scheduler sanity check (CLI-compatible with the reference script).

Builds the diffusion schedule with the real config's vocab size, runs
q_sample and q_posterior on fake one-hot input, and asserts both outputs
row-normalise to 1.  Behavioral reference:
/root/reference/scripts/sanity_check_scheduler.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS=cpu even though sitecustomize baked "axon" into config
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import yaml

from fddm_asr_tpu import diffusion as D

config_path = sys.argv[1] if len(sys.argv) > 1 else "configs/fddm_zhTW_base.yaml"
with open(config_path, "r", encoding="utf-8") as f:
    config = yaml.safe_load(f)
K = int(config["data"]["vocab_size"])

sched = D.make_schedule(K=K, T=200, beta_max=0.2)

B, L = 2, 6
x0 = jnp.zeros((B, L, K)).at[..., 10].set(1.0)
t = jax.random.randint(jax.random.key(0), (B,), 1, 200)

xt = D.q_sample(sched, x0, t)
assert jnp.allclose(xt.sum(-1), 1.0, atol=1e-5)

x0hat = x0 + 0.05 * jax.random.uniform(jax.random.key(1), x0.shape)
x0hat = x0hat / x0hat.sum(-1, keepdims=True)

post = D.q_posterior(sched, xt, x0hat, t)
assert jnp.allclose(post.sum(-1), 1.0, atol=1e-5)
print("Scheduler sanity check passed.")
