#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""One-shot frozen-encoder feature precompute (data/feature_cache.py).

    python scripts/precompute_features.py --config cfg.yaml \
        --cache-dir feats/ [--splits train] [--wavlm-ckpt …] [--device cpu]

Writes <cache-dir>/<split>/feats.npy + meta.json; training picks it up via
``data.cache_features: <cache-dir>`` and skips the WavLM forward from the
first step (identical numerics; the encoder is frozen — reference
train.py:318-319/542-544 never trains or saves it).  For multi-host runs,
precompute once here before launching.
"""
from __future__ import annotations

import argparse
import functools
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--cache-dir", required=True)
    ap.add_argument("--splits", default="train",
                    help="comma-separated: train,validation,test")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--wavlm-ckpt", default=None)
    ap.add_argument("--device", default=None, help="cpu forces the CPU backend")
    args = ap.parse_args(argv)

    if args.device == "cpu":
        from fddm_asr_tpu.runtime import force_cpu

        force_cpu()
    from fddm_asr_tpu.runtime import enable_compile_cache

    enable_compile_cache()

    import jax

    from fddm_asr_tpu.config import load_config, resolve_special_ids
    from fddm_asr_tpu.data import feature_cache as FC
    from fddm_asr_tpu.data.dataset import ManifestDataset
    from fddm_asr_tpu.pipeline import FDDMPipeline

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    cfg = load_config(args.config)
    wavlm_params = None
    if args.wavlm_ckpt:
        from train import _load_wavlm

        wavlm_params = _load_wavlm(args.wavlm_ckpt, cfg)
    pipeline = FDDMPipeline.from_config(
        cfg, wavlm_params=wavlm_params, seed=cfg.get("seed", 1337))
    special = resolve_special_ids(cfg)
    data_cfg = cfg.data
    batch_size = args.batch_size or cfg.optim.get("batch_size", 8)

    enc_apply = jax.jit(functools.partial(
        pipeline.encoder.apply, deterministic=True))

    masked = bool(pipeline.use_condition_mask)

    def encode(waves, lengths=None):
        import jax.numpy as jnp

        c, _, _ = enc_apply(
            pipeline.encoder_params, waves,
            None if lengths is None else jnp.asarray(lengths))
        return c

    checksum = FC.param_checksum(pipeline.encoder_params)
    name_map = {
        "train": data_cfg.get("train_json", "data/processed/train.json"),
        "validation": data_cfg.get("val_json", "data/processed/validation.json"),
        "test": data_cfg.get("test_json", "data/processed/test.json"),
    }
    for split in args.splits.split(","):
        manifest = name_map[split.strip()]
        ds = ManifestDataset(
            manifest, pipeline.tokenizer,
            max_len=data_cfg.get("max_len", 128),
            pad_id=special["pad_id"], bos_id=data_cfg.get("bos_id"),
            eos_id=data_cfg.get("eos_id"),
            max_audio_seconds=data_cfg.get("max_seconds", 20),
            sample_rate=data_cfg.get("sample_rate", 16000),
        )
        FC.build_cache(args.cache_dir, split.strip(), ds, encode,
                       batch_size=batch_size, manifest_path=manifest,
                       checksum=checksum, log_every=5, masked=masked)
        cache = FC.FeatureCache(args.cache_dir, split.strip())
        logging.info(f"{split}: cached feats {cache.shape} "
                     f"dtype={cache.dtype_token} under {args.cache_dir}")


if __name__ == "__main__":
    main()
