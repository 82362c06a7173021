#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""FDDM-ASR-TPU training CLI.

Flag-compatible with the reference train.py (`--config`, `--device`) plus
framework extensions:

    python train.py --config configs/fddm_zhTW_base.yaml
    python train.py --config ... --resume ckpts/run/ep003.orbax
    python train.py --config ... --mesh data=8,model=1
    python train.py --config ... --wavlm-ckpt /path/to/hf-or-orbax

`--device` accepts cpu/tpu (the reference's cuda strings map to the default
TPU backend); on this runtime the platform is selected before jax import.
Behavioral reference: /root/reference/train.py:491-683.
"""
from __future__ import annotations

import argparse
import os
import sys


def parse_mesh(spec: str):
    from fddm_asr_tpu.parallel import MeshSpec

    if not spec:
        return MeshSpec(data=-1, model=1)
    kv = dict(part.split("=") for part in spec.split(","))
    return MeshSpec(data=int(kv.get("data", -1)), model=int(kv.get("model", 1)))


def main(argv=None):
    parser = argparse.ArgumentParser(description="FDDM-ASR-TPU Training")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--device", type=str, default=None,
                        help="cpu|tpu (cuda aliases to the default backend)")
    parser.add_argument("--resume", type=str, default=None,
                        help="orbax checkpoint dir to resume from")
    parser.add_argument("--mesh", type=str, default="",
                        help="mesh spec, e.g. data=8,model=1")
    parser.add_argument("--wavlm-ckpt", type=str, default=None,
                        help="local WavLM weights (HF dir or orbax)")
    parser.add_argument("--max-steps-per-epoch", type=int, default=None)
    parser.add_argument("--eval-every", type=int, default=None,
                        help="evaluate val/test CER every k-th epoch "
                             "(final epoch always); overrides cfg "
                             "log.eval_every; default: cfg value or 1 "
                             "(reference per-epoch cadence)")
    parser.add_argument("--no-pt-export", action="store_true",
                        help="skip reference-format .pt export per checkpoint")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax.profiler trace here (TensorBoard)")
    parser.add_argument("--debug-nans", action="store_true",
                        help="raise at the op producing any NaN")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host: coordinator address host:port "
                             "(or env FDDM_COORDINATOR)")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="multi-host: total process count "
                             "(or env FDDM_NUM_PROCESSES)")
    parser.add_argument("--process-id", type=int, default=None,
                        help="multi-host: this process's id "
                             "(or env FDDM_PROCESS_ID)")
    args = parser.parse_args(argv)

    if args.device and args.device.startswith("cpu"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from fddm_asr_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    from fddm_asr_tpu.config import load_config, load_yaml
    from fddm_asr_tpu.parallel import DistributedConfig, initialize
    from fddm_asr_tpu.train_lib import run_training, setup_logging

    # multi-host bootstrap: flags override env; single process is a no-op
    dist_cfg = DistributedConfig.from_env()
    if args.coordinator or args.num_processes or args.process_id is not None:
        dist_cfg = DistributedConfig(
            coordinator_address=args.coordinator or dist_cfg.coordinator_address,
            num_processes=args.num_processes or dist_cfg.num_processes,
            process_id=(args.process_id if args.process_id is not None
                        else dist_cfg.process_id),
        )
    initialize(dist_cfg)

    setup_logging()
    raw = load_yaml(args.config)
    cfg = load_config(args.config)

    wavlm_params = None
    if args.wavlm_ckpt:
        wavlm_params = _load_wavlm(args.wavlm_ckpt, cfg)

    run_training(
        cfg,
        raw_cfg=raw,
        resume=args.resume,
        mesh_spec=parse_mesh(args.mesh),
        wavlm_params=wavlm_params,
        max_steps_per_epoch=args.max_steps_per_epoch,
        export_pt=not args.no_pt_export,
        profile_dir=args.profile_dir,
        debug_nans=args.debug_nans,
        eval_every=args.eval_every,
    )


def _load_wavlm(path: str, cfg):
    if os.path.isdir(path) and any(
        n.startswith("checkpoint") or n.endswith(".safetensors") or n.endswith(".bin")
        for n in os.listdir(path)
    ):
        from fddm_asr_tpu.convert.wavlm_convert import load_pretrained_wavlm

        _, params = load_pretrained_wavlm(path)
        return params
    from fddm_asr_tpu.checkpoint import load_orbax

    return load_orbax(path)


if __name__ == "__main__":
    main()
