#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Minimal end-to-end forward sanity check (graded entry point, BASELINE
config #1).  Random waveform + random noisy tokens -> acoustic encoder ->
denoising decoder -> projection heads -> L_fd, one jitted forward.

Behavioral reference: /root/reference/scripts/sanity_forward.py (same
hyperparameters: B=2, 2 s audio, L=64, V=4000, D=768, 4 decoder layers).

By default the full WavLM-large architecture runs with random weights (no
download needed — weight loading is a separate converter step); pass
--tiny for a seconds-fast check with the test-sized encoder.

Run: python scripts/sanity_forward.py [--tiny] [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--tiny", action="store_true", help="test-sized encoder")
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()

if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
import dataclasses

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from fddm_asr_tpu.losses import align_speech_to_text, lfd_loss
from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder
from fddm_asr_tpu.models.encoder import AcousticEncoder
from fddm_asr_tpu.models.projection import SpeechProjector, TextEmbedding, TextProjector
from fddm_asr_tpu.models.wavlm import WavLMConfig

B = 2            # batch size
T_wav = 16000 * 2  # 2 s at 16 kHz
L_tok = 64       # token length after padding
V = 4000         # vocab size
D = 768          # model dim

rng = jax.random.key(0)
r1, r2, r3, r4, r5, r6, r7 = jax.random.split(rng, 7)

wave = jax.random.normal(r1, (B, T_wav))
xt = jax.random.randint(r2, (B, L_tok), 0, V)
t = jax.random.randint(r3, (B,), 1, 200)

wavlm_cfg = WavLMConfig.tiny_for_tests() if args.tiny else dataclasses.replace(WavLMConfig.large(), scan_layers=True)
enc = AcousticEncoder(config=wavlm_cfg, d_model=D)
enc_params = enc.init(r4, wave)

dec = DenoisingTransformerDecoder(
    vocab_size=V, d_model=D, nhead=12, num_layers=4, dim_ff=2048,
    dropout=0.1, max_len=L_tok, pad_id=0,
)

s_proj = SpeechProjector(d_proj=256)
te = TextEmbedding(d_out=256, mode="logits")
t_proj = TextProjector(d_proj=256)


@jax.jit
def forward(enc_params, dec_params, sp, tep, tpp, wave, xt, t):
    c, c_mask, _ = enc.apply(enc_params, wave, None, deterministic=True)
    logits = dec.apply(dec_params, xt, t, c, None, None, deterministic=True)
    z_text = t_proj.apply(tpp, te.apply(tep, logits))
    z_speech = align_speech_to_text(s_proj.apply(sp, c), L_tok)
    return logits, lfd_loss(z_speech, z_text, lambda_offdiag=1.0)


# init needs the condition shape -> run encoder once
c0, _, _ = enc.apply(enc_params, wave, None, deterministic=True)
dec_params = dec.init(r5, xt, t, c0)
sp = s_proj.init(r6, c0)
tep = te.init(r7, jnp.zeros((B, L_tok, V)))
tpp = t_proj.init(r7, jnp.zeros((B, L_tok, 256)))

logits, loss_fd = forward(enc_params, dec_params, sp, tep, tpp, wave, xt, t)
print("logits:", tuple(logits.shape))
print("L_fd:", float(loss_fd))
assert logits.shape == (B, L_tok, V)
assert jnp.isfinite(logits).all() and jnp.isfinite(loss_fd)
print("Sanity check passed.")
