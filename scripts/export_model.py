#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Export an AOT deployment artifact (StableHLO modules + params +
tokenizer) from a trained checkpoint.  See fddm_asr_tpu/aot.py for the
artifact contract; the reference has no deployment packaging at all.

    python scripts/export_model.py \
        --ckpt ckpts/best_model.pt \
        --main-config configs/fddm_zhTW_base.yaml \
        --diffusion-config configs/diffusion.yaml \
        --tokenizer data/tokenizer/zh-TW_A/spm_zhTW_A.model \
        --out artifacts/fddm_v1 \
        --batch-sizes 1,8 --seconds 20 --seq-len 64 \
        --T-infer 20 --r 5 --greedy [--platforms cpu,tpu]

Prints one JSON summary line on success.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="FDDM-ASR-TPU AOT export")
    p.add_argument("--ckpt", type=str, required=True,
                   help=".pt or orbax checkpoint")
    p.add_argument("--main-config", type=str, required=True)
    p.add_argument("--diffusion-config", type=str, required=True)
    p.add_argument("--tokenizer", type=str, required=True)
    p.add_argument("--out", type=str, required=True, help="artifact directory")
    p.add_argument("--batch-sizes", type=str, default="1,8",
                   help="comma-separated batch buckets")
    p.add_argument("--seconds", type=str, default="20",
                   help="audio bucket length(s) in seconds at 16 kHz, "
                        "comma-separated (e.g. '5,10,20')")
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--T-infer", type=int, default=20)
    p.add_argument("--r", type=int, default=5)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--posterior-mode", type=str, default="average",
                   choices=["average", "max", "map"])
    p.add_argument("--sampling-mode", type=str, default="exact",
                   choices=["exact", "fast"])
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--corrected-posterior", action="store_true")
    p.add_argument("--condition-mask", choices=["on", "off"], default="off",
                   help="on: mask padded audio frames in cross-attention so "
                        "bucket padding cannot alter transcripts (what "
                        "serve.py uses); off (default): reference parity — "
                        "no masks at inference")
    p.add_argument("--platforms", type=str, default="",
                   help="comma-separated lowering targets, e.g. cpu,tpu "
                        "(default: the current backend)")
    p.add_argument("--device", type=str, default=None, help="cpu|tpu")
    p.add_argument("--wavlm-ckpt", type=str, default=None)
    p.add_argument("--dtype", choices=["config", "bfloat16", "float32"],
                   default="config",
                   help="compute dtype baked into the exported modules; "
                        "config honors the YAML's model.dtype — bfloat16 "
                        "is the TPU production setting")
    p.add_argument("--fused-attention", choices=["auto", "on", "off"],
                   default="auto",
                   help="Pallas fused gated attention inside the exported "
                        "encoder.  auto/off (default): use the portable XLA "
                        "attention — the serialized Mosaic kernel fails to "
                        "RECOMPILE after the jax.export round-trip on "
                        "current TPU toolchains ('Invalid relayout' on its "
                        "i1 gate vectors; the live pipeline, which lowers "
                        "the kernel fresh per trace, is unaffected).  on: "
                        "keep the kernel, for toolchains where it works")
    p.add_argument("--input-encoding", choices=["f32", "pcm16", "mulaw8"],
                   default="f32",
                   help="wire dtype of the wave input baked into the "
                        "modules (fddm_asr_tpu/data/wire.py).  pcm16 "
                        "halves host->device bytes (the measured serving "
                        "bottleneck on relay-attached hosts) and is "
                        "lossless for 16-bit-PCM sources; mulaw8 quarters "
                        "them at ~telephone-grade companding (max "
                        "throughput, opt-in); f32 is the historical "
                        "default")
    p.add_argument("--native", choices=["on", "off"], default="off",
                   help="on: ALSO AOT-compile each bucket on the current "
                        "backend with the live pipeline's fused Pallas "
                        "kernels and serialize the finished executable "
                        "(native_*.jaxexec) next to the portable StableHLO "
                        "modules.  Native modules only load on the same "
                        "platform/device-kind/jax-version (the loader "
                        "checks and falls back), but keep the kernels the "
                        "StableHLO round-trip loses")
    p.add_argument("--native-batch-sizes", type=str, default="",
                   help="extra batch buckets compiled ONLY as native "
                        "executables (e.g. '32' for a large serving batch "
                        "not worth a portable module)")
    p.add_argument("--mesh", type=str, default="",
                   help="export SHARDED modules over a device mesh, e.g. "
                        "data=4,model=2 — the artifact then requires that "
                        "many devices at load time; batch buckets must be "
                        "divisible by the data-axis size")
    p.add_argument("--seq-parallel", action="store_true",
                   help="with --mesh model=N>1: ring-attention sequence "
                        "parallelism in the exported encoder")
    return p.parse_args(argv)


def parse_buckets(batch_sizes: str, seconds: str):
    """'1,8' x '5,20' -> [(1, 80000), (1, 320000), (8, 80000), ...]"""
    batches = [int(b) for b in batch_sizes.split(",") if b]
    secs = [float(s) for s in seconds.split(",") if s]
    if not batches or not secs:
        raise ValueError("need at least one batch size and one duration")
    return [(b, int(round(sec * 16000))) for b in batches for sec in secs]


def main(argv=None):
    args = parse_args(argv)
    if args.device and args.device.startswith("cpu"):
        # sitecustomize bakes axon into jax.config — must ASSIGN the env var
        # AND update the config after import (CLAUDE.md env rules)
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.device and args.device.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from fddm_asr_tpu.runtime import enable_compile_cache

    enable_compile_cache()  # native bucket compiles are remote + expensive

    import inference as infer_cli
    from fddm_asr_tpu import aot

    if args.fused_attention != "on":
        # deep-merged into the main config by build_pipeline: AOT modules
        # carry the portable XLA attention (see --fused-attention help)
        args.config_overrides = {
            "model": {"encoder": {"wavlm_config": {"fused_attention": False}}}}
    pipeline = infer_cli.build_pipeline(args)
    pipeline.use_condition_mask = args.condition_mask == "on"
    if args.mesh:
        from train import parse_mesh
        from fddm_asr_tpu.parallel import make_mesh

        pipeline.apply_mesh(make_mesh(parse_mesh(args.mesh)),
                            seq_parallel=args.seq_parallel)
    sampling = infer_cli.sampling_kwargs(args)
    sampling["temperature"] = args.temperature

    buckets = parse_buckets(args.batch_sizes, args.seconds)
    platforms = [s for s in args.platforms.split(",") if s] or None

    meta = aot.save_artifact(
        pipeline, args.out, buckets, seq_len=args.seq_len,
        sampling=sampling, tokenizer_path=args.tokenizer,
        platforms=platforms, input_encoding=args.input_encoding,
    )
    if args.native == "on":
        # native executables carry the LIVE pipeline's kernels: clone the
        # loaded pipeline (same params — no second checkpoint load) without
        # the portable-attention override
        if args.fused_attention != "on":
            native_pipeline = pipeline.clone_with_wavlm_config(
                fused_attention=True)
            if pipeline.mesh is not None:
                native_pipeline.apply_mesh(pipeline.mesh,
                                           seq_parallel=args.seq_parallel)
        else:
            native_pipeline = pipeline  # already fused
        native_buckets = sorted(set(buckets) | set(parse_buckets(
            args.native_batch_sizes, args.seconds))
        ) if args.native_batch_sizes else buckets
        meta = aot.save_native_modules(
            native_pipeline, args.out, native_buckets,
            seq_len=args.seq_len, sampling=sampling)
    elif args.native_batch_sizes:
        raise SystemExit("--native-batch-sizes requires --native on")
    size = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(args.out) for f in files)
    print(json.dumps({"out": args.out, "buckets": meta["buckets"],
                      "native_buckets": (meta.get("native") or {}).get(
                          "buckets"),
                      "seq_len": meta["seq_len"],
                      "platforms": meta["platforms"],
                      "fused_attention": args.fused_attention == "on",
                      "artifact_bytes": size}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
