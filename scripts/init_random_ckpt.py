#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Write a RANDOM-INIT checkpoint for a config — no training required.

Deployment smoke tests, serving/AOT-export benchmarks, and load-path
validation all need a checkpoint file at the real model scale; training
one just to measure compile/latency/throughput wastes hours.  This tool
builds the pipeline exactly as training would from the config (same
seed -> the same derived frozen encoder) and writes the decoder +
projection heads as a reference-format ``.pt`` — loadable everywhere a
trained checkpoint is (inference.py, serve.py, export_model.py,
bench_serve.py, eval).  The reference repo has no equivalent (its
checkpoints only ever come out of train.py:632-643).

    python scripts/init_random_ckpt.py \
        --config configs/fddm_zhTW_base.yaml --out /tmp/random.pt

Prints one JSON line: {"out": ..., "params": N, "bytes": N}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_synthetic_tokenizer(prefix: str, vocab_size: int) -> str:
    """Fabricate an SPM model with exactly `vocab_size` pieces: the 4
    specials + single CJK-ideograph NORMAL pieces (U+4E00..).  Encodes and
    decodes real text; piece IDENTITIES are meaningless — this exists so
    serving/export benchmarks run at the true vocab scale without the
    (environment-unavailable) trained tokenizer artifact."""
    from fddm_asr_tpu.tokenizer import model_proto as mp
    from fddm_asr_tpu.tokenizer.train_bpe import write_artifacts

    n_normal = vocab_size - 4
    if n_normal <= 0:
        raise ValueError(f"vocab_size {vocab_size} too small")
    if n_normal > 0x9FFF - 0x4E00 + 1:
        raise ValueError(f"vocab_size {vocab_size} exceeds the synthetic "
                         "CJK piece budget")
    pieces = [
        mp.Piece("<unk>", 0.0, mp.UNKNOWN),
        mp.Piece("<s>", 0.0, mp.CONTROL),
        mp.Piece("</s>", 0.0, mp.CONTROL),
        mp.Piece("<pad>", 0.0, mp.CONTROL),
    ] + [mp.Piece(chr(0x4E00 + i), -float(i + 1), mp.NORMAL)
         for i in range(n_normal)]
    model = mp.SPModel(pieces=pieces, unk_id=0, bos_id=1, eos_id=2, pad_id=3)
    write_artifacts(model, prefix,
                    vocab_json_path=os.path.join(
                        os.path.dirname(prefix), "vocab.json"))
    return prefix + ".model"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="training config.yaml")
    ap.add_argument("--out", required=True, help="output .pt path")
    ap.add_argument("--device", default=None, help="cpu to force CPU")
    ap.add_argument("--make-tokenizer", action="store_true",
                    help="also fabricate a synthetic data.vocab_size-piece "
                         "SPM tokenizer next to --out (spm_synth.model) and "
                         "use it — for benchmarking at real vocab scale "
                         "when the config's tokenizer artifact isn't "
                         "available in this environment")
    args = ap.parse_args(argv)
    if args.device and args.device.startswith("cpu"):
        # sitecustomize bakes axon into jax.config — must ASSIGN the env
        # var AND update the config after import (CLAUDE.md env rules)
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.device and args.device.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fddm_asr_tpu import checkpoint as C
    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.models.projection import (
        SpeechProjector, TextEmbedding, TextProjector)
    from fddm_asr_tpu.pipeline import FDDMPipeline

    cfg = load_config(args.config)
    tokenizer = None
    tok_path = None
    if args.make_tokenizer:
        tok_path = _make_synthetic_tokenizer(
            os.path.join(os.path.dirname(os.path.abspath(args.out)) or ".",
                         "spm_synth"),
            int(cfg.data.vocab_size))
        from fddm_asr_tpu.tokenizer import load_tokenizer

        tokenizer = load_tokenizer(tok_path)
    # identical rng derivation to train_lib.run_training (seed default 1337
    # INCLUDED — from_config alone would default to cfg.get('seed', 0)) so a
    # random-init .pt matches what epoch-0 training would start from
    seed = int(cfg.get("seed", 1337))
    pipeline = FDDMPipeline.from_config(cfg, tokenizer=tokenizer, seed=seed)
    d_model = cfg.model.d_model
    d_proj = cfg.model.projector.get("d_proj", 256)
    vocab = cfg.data.vocab_size
    r1, r2, r3 = jax.random.split(jax.random.key(seed), 3)
    sp = SpeechProjector(d_proj=d_proj).init(r1, jnp.zeros((1, 4, d_model)))
    te = TextEmbedding(d_out=d_proj, mode="logits").init(
        r2, jnp.zeros((1, 4, vocab)))
    tp = TextProjector(d_proj=d_proj).init(r3, jnp.zeros((1, 4, d_proj)))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    C.export_reference_ckpt(
        args.out,
        pipeline.decoder_params["params"],
        sp["params"], te["params"], tp["params"],
        epoch=0, step=0, config=cfg.to_dict(),
    )
    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree.leaves(pipeline.decoder_params))
    line = {"out": args.out, "params": n_params,
            "bytes": os.path.getsize(args.out)}
    if tok_path:
        line["tokenizer"] = tok_path
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
