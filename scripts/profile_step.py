# -*- coding: utf-8 -*-
"""Capture a device profile of the flagship jitted transcribe step and print
the top ops by device time.

Builds the same program as bench.py (wavlm-large + d768x6, jumpy sampling),
traces a few steps with jax.profiler, then parses the chrome-trace
vm.trace.json.gz directly (the tensorboard profile plugin's pywrap is
incompatible with the installed TF) and aggregates per-op durations on the
device tracks.

Usage: python scripts/profile_step.py [--batch 16] [--top 25] [--out DIR]
"""
from __future__ import annotations

import argparse
import collections
import dataclasses
import functools
import glob
import gzip
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def build_transcribe(batch, seconds, seq_len, gelu_tanh, seq_pad,
                     quant="none"):
    from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder
    from fddm_asr_tpu.models.encoder import AcousticEncoder
    from fddm_asr_tpu.models.wavlm import WavLMConfig
    from fddm_asr_tpu import diffusion as D
    from fddm_asr_tpu.sampler import SamplerConfig, make_sample_fn

    K = 8000
    wavlm_cfg = dataclasses.replace(
        WavLMConfig.large(), scan_layers=True, fused_attention=True,
        gelu_approx_tanh=gelu_tanh, seq_pad_multiple=seq_pad,
        quant_dense=quant,
    )
    encoder = AcousticEncoder(config=wavlm_cfg, d_model=768, dtype=jnp.bfloat16)
    decoder = DenoisingTransformerDecoder(
        vocab_size=K, d_model=768, nhead=12, num_layers=6, dim_ff=2048,
        max_len=1024, pad_id=0, dtype=jnp.bfloat16,
    )
    sched = D.make_schedule(K, 200, 0.2)
    scfg = SamplerConfig(K=K, T_train=200, T_infer=20, r=5, greedy=True,
                         posterior_mode="average", sampling_mode="exact")

    rng = jax.random.key(0)
    r_enc, r_dec, r_wav = jax.random.split(rng, 3)
    T_wav = int(seconds * 16000)
    wave = jax.random.normal(r_wav, (batch, T_wav), jnp.float32) * 0.1
    S = wavlm_cfg.feat_extract_output_length(T_wav)
    enc_params = encoder.init(r_enc, wave[:1])
    dec_params = decoder.init(
        r_dec, jnp.zeros((1, seq_len), jnp.int32), jnp.ones((1,), jnp.int32),
        jnp.zeros((1, S, 768)),
    )

    def decoder_apply(params, xt, t, cond, c_mask):
        return decoder.apply(params, xt, t, cond, None, c_mask, deterministic=True)

    sample_fn = make_sample_fn(decoder_apply, sched, scfg)

    @jax.jit
    def transcribe(enc_params, dec_params, wave, rng):
        c, _, _ = encoder.apply(enc_params, wave, None, deterministic=True)
        ids, _ = sample_fn(dec_params, rng, c, seq_len=seq_len)
        return ids

    return transcribe, (enc_params, dec_params, wave)


def aggregate(trace_dir, top):
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {trace_dir}"
    trace = json.loads(gzip.open(sorted(paths)[-1]).read())
    events = trace["traceEvents"]
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    # events nest (module > while-loop > op) — aggregate per thread track so
    # each level is reported separately instead of double-counted
    per_track = collections.defaultdict(collections.Counter)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids and "dur" in e:
            track = tid_names.get((e["pid"], e["tid"]), str(e.get("tid")))
            per_track[track][e.get("name", "?")] += e["dur"]
    for track, per_op in sorted(per_track.items()):
        total = sum(per_op.values())
        print(f"\n== track '{track}': {total / 1e3:.1f} ms total ==")
        for name, dur in per_op.most_common(top):
            print(f"  {dur / 1e3:9.2f} ms  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=20)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--gelu-tanh", type=int, default=1)
    ap.add_argument("--seq-pad", type=int, default=1)
    ap.add_argument("--out", default="/tmp/jaxtrace")
    ap.add_argument("--quant", default="none", help="none|int8|int8_fused")
    args = ap.parse_args()

    transcribe, (enc_params, dec_params, wave) = build_transcribe(
        args.batch, args.seconds, args.seq_len, bool(args.gelu_tanh),
        args.seq_pad, quant=args.quant,
    )
    # warm-up/compile outside the trace
    jax.block_until_ready(transcribe(enc_params, dec_params, wave, jax.random.key(1)))
    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            jax.block_until_ready(
                transcribe(enc_params, dec_params, wave, jax.random.key(2 + i))
            )
    aggregate(args.out, args.top)


if __name__ == "__main__":
    main()
