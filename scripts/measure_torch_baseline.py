#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Measure the CPU PyTorch reference's inference throughput (the RTFx anchor).

The reference repo publishes no numbers (BASELINE.md), so the rebuild
establishes its own baseline: run the reference's own modules
(/root/reference, torch CPU, random weights — identical FLOPs to trained
weights) over the flagship configuration and record seconds-of-audio per
wall-second (RTFx).  The result is stored in bench_baseline.json and used by
bench.py as the vs_baseline denominator.

Path measured per utterance (reference inference.py:204-255):
  WavLM-large forward on 20 s of 16 kHz audio  ->  cond c
  DiffusionJumpySampler.sample: T_infer=20, r=5, greedy, exact posterior
  (4 decoder forwards + per-batch multi-step posterior host loop)

Usage: python scripts/measure_torch_baseline.py [--utts 3] [--seconds 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=3)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=8000)
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "bench_baseline.json"))
    args = ap.parse_args(argv)

    sys.path.insert(0, REFERENCE)
    import torch

    torch.manual_seed(0)
    from transformers import WavLMConfig, WavLMModel

    from models.denoise_decoder import DenoisingTransformerDecoder
    from fddm.sched.diffusion_scheduler import DiscreteDiffusionScheduler
    from sampler.jumpy_sampler import DiffusionJumpySampler

    device = torch.device("cpu")
    # wavlm-large architecture, random init (no weight download in this env;
    # FLOPs identical to pretrained)
    wavlm = WavLMModel(WavLMConfig(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, conv_bias=True, feat_extract_norm="layer",
        do_stable_layer_norm=True,
    )).eval()
    proj = torch.nn.Linear(1024, 768)
    decoder = DenoisingTransformerDecoder(
        vocab_size=args.vocab, d_model=768, nhead=12, num_layers=6,
        dim_ff=2048, dropout=0.1, max_len=1024, pad_id=0,
    ).eval()
    sched = DiscreteDiffusionScheduler(K=args.vocab, T=200, device=device, beta_max=0.2)
    sampler = DiffusionJumpySampler(
        scheduler=sched, decoder=decoder, K=args.vocab, T_train=200,
        T_infer=20, r=5, greedy=True, posterior_mode="average",
        sampling_mode="exact", temperature=1.0, device=device,
    )

    n_samples = int(args.seconds * 16000)
    wav = torch.randn(1, n_samples)

    def run_once():
        with torch.no_grad():
            c = proj(wavlm(wav).last_hidden_state)
            sampler.sample(cond_c=c, seq_len=args.seq_len, init="uniform")

    run_once()  # warmup
    times = []
    for _ in range(args.utts):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    per_utt = sum(times) / len(times)
    rtfx = args.seconds / per_utt
    result = {
        "metric": "reference_cpu_inference_rtfx",
        "rtfx": rtfx,
        "seconds_per_utterance": per_utt,
        "audio_seconds": args.seconds,
        "T_infer": 20, "r": 5, "sampling_mode": "exact",
        "encoder": "wavlm-large(random-init)", "decoder": "d768x6",
        "device": "cpu-torch",
        "torch_threads": __import__("torch").get_num_threads(),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
