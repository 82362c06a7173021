#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""End-to-end inference benchmark on the default (TPU) backend.

Measures the flagship path — WavLM-large encoder + d768x6 denoising decoder,
jumpy sampling T_infer=20 / r=5 / greedy / exact posterior — as ONE jitted
program over a batch of 20-second utterances, and reports RTFx (seconds of
audio transcribed per wall-second) against the CPU PyTorch reference anchor
recorded in bench_baseline.json (scripts/measure_torch_baseline.py).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _relay_up(url: str) -> bool:
    """Any HTTP response (even an error status) means the relay is alive;
    a connection failure means TPU programs would hang indefinitely."""
    import urllib.request

    try:
        urllib.request.urlopen(url, timeout=3)
        return True
    except urllib.error.HTTPError:
        return True
    except Exception:
        return False


def _await_tpu_relay() -> bool:
    """The XLA compile relay has measurable outages (hours-long, CLAUDE.md);
    jax.devices() hangs rather than erroring when it is down.  Wait up to
    BENCH_TPU_WAIT seconds for it, and report honestly instead of hanging
    the driver if it never returns."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return True  # explicit CPU run: no relay involved
    url = os.environ.get("BENCH_RELAY_URL", "http://localhost:8083/")
    deadline = time.time() + float(os.environ.get("BENCH_TPU_WAIT", "900"))
    while True:
        if _relay_up(url):
            return True
        if time.time() >= deadline:
            return False
        time.sleep(30)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    seconds = float(os.environ.get("BENCH_SECONDS", "20"))
    seq_len = int(os.environ.get("BENCH_SEQ_LEN", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    if not _await_tpu_relay():
        print(json.dumps({
            "metric": "rtfx_e2e", "value": 0.0, "unit": "audio_s/s",
            "vs_baseline": 0.0, "platform": "none",
            "error": "TPU compile relay unreachable (outage) — benchmark "
                     "not run; see CLAUDE.md relay-outage notes",
        }))
        return

    import dataclasses

    import jax

    # persistent compile cache: the WavLM-large + sampler program is large;
    # repeat bench runs (and driver re-runs) skip the multi-minute compile
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder
    from fddm_asr_tpu.models.encoder import AcousticEncoder
    from fddm_asr_tpu.models.wavlm import WavLMConfig
    from fddm_asr_tpu import diffusion as D
    from fddm_asr_tpu.sampler import SamplerConfig, make_sample_fn

    platform = jax.devices()[0].platform
    K = 8000
    # BENCH_MODEL=paper benches the 253 M decoder (configs/fddm_zhTW_253m.yaml
    # geometry: d1024 x 12 x ff4096, scanned blocks) instead of the d768x6
    # flagship; the recorded headline stays the flagship.
    model_scale = os.environ.get("BENCH_MODEL", "base")
    fused = os.environ.get("BENCH_FUSED", "1") == "1"
    fused_fe = os.environ.get("BENCH_FUSED_FRONTEND", "0") == "1"
    # with the head-packed kernel, 128-aligned frames make every wrapper
    # pad zero-width (+0.4% e2e); batch 32 amortises the ~31 ms relay
    # dispatch overhead per call (+10% over batch 16)
    seq_pad = int(os.environ.get("BENCH_SEQ_PAD", "128"))
    gelu_tanh = os.environ.get("BENCH_GELU_TANH", "1") == "1"
    # int8 MXU path for the encoder's FFN + QKV/out matmuls (dynamic
    # symmetric quantization, ops/quant.py).  Default ON for the flagship
    # bench: validated end-to-end on a converged pipeline
    # (scripts/validate_quant.py: 15/16 transcripts identical to full
    # precision, CER 0.032 int8 vs 0.047 fp — the one disagreement is an
    # fp error), encoder error bounds pinned by tests/test_quant.py.
    # BENCH_QUANT=none restores the bf16 path (RTFx 2436 vs 2811 int8);
    # "int8_fused" selects the Pallas kernel (faster in isolation, slower
    # e2e — it breaks XLA's LN/residual/GELU epilogue fusions).
    quant = os.environ.get("BENCH_QUANT", "int8")
    # BENCH_QUANT_DEC=int8 also quantizes the decoder's projections/FFN/head
    # (models/decoder.py::_qdense); gate: validate_quant.py variant int8_all.
    quant_dec = os.environ.get("BENCH_QUANT_DEC", "none")
    wavlm_cfg = dataclasses.replace(
        WavLMConfig.large(), scan_layers=True, fused_attention=fused,
        fused_frontend=fused_fe, seq_pad_multiple=seq_pad,
        gelu_approx_tanh=gelu_tanh, quant_dense=quant,
    )
    if model_scale == "paper":
        d_model, nhead, n_layers, dim_ff, scan_blocks = 1024, 16, 12, 4096, True
    else:
        d_model, nhead, n_layers, dim_ff, scan_blocks = 768, 12, 6, 2048, False
    encoder = AcousticEncoder(config=wavlm_cfg, d_model=d_model, dtype=jnp.bfloat16)
    decoder = DenoisingTransformerDecoder(
        vocab_size=K, d_model=d_model, nhead=nhead, num_layers=n_layers,
        dim_ff=dim_ff, max_len=1024, pad_id=0, dtype=jnp.bfloat16,
        scan_blocks=scan_blocks, quant_dense=quant_dec,
    )
    sched = D.make_schedule(K, 200, 0.2)
    scfg = SamplerConfig(K=K, T_train=200, T_infer=20, r=5, greedy=True,
                         posterior_mode="average", sampling_mode="exact")

    rng = jax.random.key(0)
    r_enc, r_dec, r_wav = jax.random.split(rng, 3)
    T_wav = int(seconds * 16000)
    wave = jax.random.normal(r_wav, (batch, T_wav), jnp.float32) * 0.1
    S = wavlm_cfg.feat_extract_output_length(T_wav)

    t0 = time.perf_counter()
    enc_params = encoder.init(r_enc, wave[:1])
    dec_params = decoder.init(
        r_dec, jnp.zeros((1, seq_len), jnp.int32), jnp.ones((1,), jnp.int32),
        jnp.zeros((1, S, d_model)),
    )
    init_s = time.perf_counter() - t0

    def decoder_apply(params, xt, t, cond, c_mask):
        return decoder.apply(params, xt, t, cond, None, c_mask, deterministic=True)

    sample_fn = make_sample_fn(decoder_apply, sched, scfg)

    # params are jit ARGUMENTS (closures would bake them into the program)
    @functools.partial(jax.jit, static_argnames=())
    def transcribe(enc_params, dec_params, wave, rng):
        c, _, _ = encoder.apply(enc_params, wave, None, deterministic=True)
        ids, _ = sample_fn(dec_params, rng, c, seq_len=seq_len)
        return ids

    t0 = time.perf_counter()
    ids = jax.block_until_ready(transcribe(enc_params, dec_params, wave, jax.random.key(1)))
    compile_s = time.perf_counter() - t0

    # single-step latency: block between dispatches (includes the ~31 ms
    # relay dispatch overhead per call)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(transcribe(enc_params, dec_params, wave, jax.random.key(2 + i)))
        times.append(time.perf_counter() - t0)
    latency_s = min(times)

    # steady-state throughput: enqueue every batch back-to-back (JAX async
    # dispatch overlaps host dispatch with device execution — how a serving
    # loop actually runs) and block once at the end
    n_pipe = max(iters, 5)
    t0 = time.perf_counter()
    outs = [
        transcribe(enc_params, dec_params, wave, jax.random.key(100 + i))
        for i in range(n_pipe)
    ]
    jax.block_until_ready(outs)
    step_s = (time.perf_counter() - t0) / n_pipe
    rtfx = batch * seconds / step_s

    baseline_path = os.path.join(REPO, "bench_baseline.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path))
        if base.get("rtfx"):
            vs_baseline = rtfx / float(base["rtfx"])

    print(json.dumps({
        "metric": "e2e_inference_rtfx",
        "value": round(rtfx, 2),
        "unit": "audio_seconds_per_second",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "platform": platform,
        "batch": batch,
        "audio_seconds": seconds,
        "step_seconds": round(step_s, 4),
        "single_step_latency_seconds": round(latency_s, 4),
        "compile_seconds": round(compile_s, 1),
        "config": f"wavlm-large + d{d_model}x{n_layers}, T_infer=20 r=5 exact greedy bf16"
                  + (" fused-attn" if fused else "")
                  + (" fused-frontend" if fused_fe else "")
                  + (f" seqpad{seq_pad}" if seq_pad > 1 else "")
                  + (" gelu-tanh" if gelu_tanh else "")
                  + (f" quant-{quant}" if quant != "none" else "")
                  + (f" dec-quant-{quant_dec}" if quant_dec != "none" else ""),
    }))


if __name__ == "__main__":
    main()
