#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""FDDM-ASR-TPU inference CLI (jumpy sampling + greedy decoding).

Flag surface and result-JSON format match the reference inference.py
(lines 261-283, 247-255):

    python inference.py --wav path.wav --ckpt ckpts/ep001.pt \
        --main-config configs/fddm_zhTW_base.yaml \
        --diffusion-config configs/diffusion.yaml \
        --tokenizer data/tokenizer/zh-TW_A/spm_zhTW_A.model \
        --T-infer 20 --r 5 --greedy

    python inference.py --csv data/processed/test.csv ... --out-json out.json

Extensions over the reference: `--batch-size` batches CSV rows through one
jitted sampler (the reference loops one utterance at a time), `--device`,
`--sampling-mode`, `--seed`.  Single-WAV output prints the same JSON schema:
{wav, text, ids, T_infer, r, greedy, posterior_mode}.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, List, Optional

from fddm_asr_tpu import CONV_RECEPTIVE_FIELD  # import-light (no jax)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="FDDM-ASR-TPU Inference (Jumpy Sampling)")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--wav", type=str, help="single WAV file")
    src.add_argument("--csv", type=str, help="batch CSV with a `path` column")

    p.add_argument("--ckpt", type=str, required=True, help=".pt or orbax checkpoint")
    p.add_argument("--main-config", type=str, required=True)
    p.add_argument("--diffusion-config", type=str, required=True)
    p.add_argument("--tokenizer", type=str, required=True,
                   help="SentencePiece model/vocab path")

    p.add_argument("--T-infer", type=int, default=20)
    p.add_argument("--r", type=int, default=5)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--posterior-mode", type=str, default="average",
                   choices=["average", "max"])
    p.add_argument("--sampling-mode", type=str, default="exact",
                   choices=["exact", "fast"])
    p.add_argument("--seq-len", type=int, default=None)

    p.add_argument("--gpu", type=int, default=None,
                   help="accepted for reference CLI compatibility; device "
                        "selection is via --device on TPU runtimes")
    p.add_argument("--device", type=str, default=None, help="cpu|tpu")
    p.add_argument("--batch-size", type=int, default=8,
                   help="CSV mode: utterances per jitted batch")
    p.add_argument("--chunk-align", choices=["silence", "fixed"],
                   default="silence",
                   help="long-form split points: 'silence' cuts each window "
                        "at the quietest 25 ms frame in its last second "
                        "(avoids mid-word cuts; same batch shape, no "
                        "recompiles), 'fixed' cuts at exact window edges")
    p.add_argument("--chunk-seconds", type=float, default=0.0,
                   help="single-WAV mode: transcribe audio longer than this "
                        "in fixed windows of this many seconds (batched in "
                        "one jitted call, condition-masked) and join the "
                        "texts — the reference-style whole-file path would "
                        "recompile per length and exhaust memory on long "
                        "recordings; 0 = whole-file (reference behavior)")
    p.add_argument("--mesh", type=str, default="",
                   help="device-mesh spec for multi-chip inference, e.g. "
                        "data=8,model=1 — shards the batch on the data axis "
                        "and the decoder by the tp rules; --batch-size must "
                        "be divisible by the data-axis size")
    p.add_argument("--corrected-posterior", action="store_true",
                   help="use the mathematically corrected multi-step "
                        "posterior instead of reproducing the reference's "
                        "tensor-aliasing recurrence (ref_compat=False; see "
                        "fddm_asr_tpu/diffusion.py::multi_step_coeffs)")
    p.add_argument("--repeat-penalty", type=float, default=0.0,
                   help="repetition-penalized final decode: subtract this "
                        "from each position's log p(x0) for the token the "
                        "previous position decoded to (mitigates the "
                        "repeated-run failure mode of undertrained x0hat); "
                        "0 = plain argmax (reference parity)")
    p.add_argument("--confidence", action="store_true",
                   help="add a per-utterance 'confidence' field to results: "
                        "geometric mean of the model's probability for each "
                        "emitted token (final-step p_x0, decoded span only)")
    p.add_argument("--num-candidates", type=int, default=1,
                   help="best-of-N decoding: sample N trajectories per "
                        "utterance (one device call — candidates fold into "
                        "the batch dim) and keep the highest-confidence one")
    p.add_argument("--dtype", choices=["config", "bfloat16", "float32"],
                   default="config",
                   help="model compute dtype; config (default) honors the "
                        "YAML's model.dtype (float32 when unset).  bfloat16 "
                        "is the TPU production setting — full-rate MXU, "
                        "matches training's eval precision")
    p.add_argument("--seq-parallel", action="store_true",
                   help="with --mesh model=N>1: additionally shard the "
                        "ENCODER FRAME AXIS across the model axis with ring "
                        "attention (one long utterance's attention spans "
                        "chips; see fddm_asr_tpu/ops/ring_attention.py)")
    p.add_argument("--bucket-seconds", type=float, default=1.0,
                   help="CSV mode: round each batch's padded audio length up "
                        "to a multiple of this many seconds, and pad the last "
                        "chunk to --batch-size rows, so every chunk reuses "
                        "ONE compiled program per duration bucket instead of "
                        "recompiling per max-length (XLA compiles are remote "
                        "and cost 30-60 s each here); 0 disables")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--wavlm-ckpt", type=str, default=None)
    p.add_argument("--condition-mask", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="mask padded audio frames in cross-attention; auto = "
                        "on for batched CSV (padded batches), off for single "
                        "WAV (reference parity — it never masks)")
    p.add_argument("--out-json", type=str, default=None)
    p.add_argument("--ref-column", type=str, default=None,
                   help="CSV mode: reference-text column; when present (or "
                        "when the CSV has a text/sentence column) per-row CER "
                        "is computed and a summary line printed")
    return p.parse_args(argv)


def build_pipeline(args):
    from fddm_asr_tpu.config import load_config, load_yaml
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from fddm_asr_tpu.tokenizer import load_tokenizer

    main_cfg = load_config(args.main_config)
    diff = load_yaml(args.diffusion_config).get("diffusion", {})
    cfg = main_cfg.updated({"diffusion": {
        "T": diff.get("T", main_cfg.diffusion["T"]),
        "beta_max": diff.get("beta_max", main_cfg.diffusion.get("beta_max", 0.2)),
    }})
    # programmatic config overrides (deep-merged) — used by callers that
    # must adjust model knobs without editing the YAML, e.g. export_model
    # forcing the portable attention into AOT artifacts
    extra = getattr(args, "config_overrides", None)
    if extra:
        cfg = cfg.updated(extra)
    tokenizer = load_tokenizer(args.tokenizer)

    wavlm_params = None
    if args.wavlm_ckpt:
        from train import _load_wavlm

        wavlm_params = _load_wavlm(args.wavlm_ckpt, cfg)

    # --dtype overrides the config's model.dtype compute precision
    # (None -> from_config resolves model.dtype, default float32)
    dtype = {"bfloat16": "bf16", "bf16": "bf16",
             "float32": "f32", "f32": "f32"}.get(
                 str(getattr(args, "dtype", None) or "config").lower())
    import jax.numpy as jnp

    dtype = None if dtype is None else (
        jnp.bfloat16 if dtype == "bf16" else jnp.float32)

    # NOTE: the model-init seed comes from the config (so a random-init dev
    # encoder matches training); --seed only controls sampling randomness.
    return FDDMPipeline.from_config(
        cfg, ckpt_path=args.ckpt, wavlm_params=wavlm_params, tokenizer=tokenizer,
        dtype=dtype,
    )


def sampling_kwargs(args) -> Dict[str, Any]:
    return dict(
        T_infer=args.T_infer, r=args.r, greedy=args.greedy,
        posterior_mode=args.posterior_mode, sampling_mode=args.sampling_mode,
        ref_compat=not getattr(args, "corrected_posterior", False),
        repeat_penalty=getattr(args, "repeat_penalty", 0.0),
    )


def infer_batch(
    pipeline, wav_paths: List[str], args, rng, pad_rows_to: int = 0
) -> List[Dict[str, Any]]:
    """Batched inference over a list of WAVs (padded to the longest).

    With --bucket-seconds > 0 the padded length is rounded up to a duration
    bucket and the row count padded to `pad_rows_to`, so chunks of varying
    content reuse one compiled program per bucket (remote XLA compiles cost
    30-60 s each in this environment).  Length-bucketing only activates when
    the condition mask is on: without a mask the appended silence would
    become real conditioning frames and change transcriptions (the --wav and
    reference-parity paths therefore always pad to the exact max length).
    """
    import numpy as np

    from fddm_asr_tpu.data.audio_io import load_audio

    waves, lengths, ok_paths, results = [], [], [], []
    errors: Dict[int, str] = {}
    for i, path in enumerate(wav_paths):
        try:
            wav, _ = load_audio(path, target_sr=16000, mono=True)
            waves.append(wav)
            lengths.append(len(wav))
            ok_paths.append((i, path))
        except Exception as e:  # per-row error records, reference 334-336
            errors[i] = str(e)

    out: List[Optional[Dict[str, Any]]] = [None] * len(wav_paths)
    for i, msg in errors.items():
        out[i] = {"wav": wav_paths[i], "error": msg}

    if waves:
        T = max(lengths)
        bucket = int(round(float(getattr(args, "bucket_seconds", 0) or 0) * 16000))
        if bucket > 0 and not pipeline.use_condition_mask:
            bucket = 0  # unmasked zero-padding would alter transcriptions
        if bucket > 0:
            T = ((T + bucket - 1) // bucket) * bucket
        n_rows = len(waves)
        # a fixed row count is needed for shape stability (bucketing) AND for
        # data-axis divisibility under a device mesh
        if pad_rows_to > n_rows and (
            bucket > 0 or getattr(pipeline, "mesh", None) is not None
        ):
            n_rows = pad_rows_to
        batch = np.zeros((n_rows, T), np.float32)
        for j, w in enumerate(waves):
            batch[j, : len(w)] = w
        # dummy rows: CONV_RECEPTIVE_FIELD samples = exactly one conv-stack
        # output frame (320 would yield ZERO frames and an all-masked
        # cross-attention row -> NaNs in the dummy rows)
        lengths = lengths + [CONV_RECEPTIVE_FIELD] * (n_rows - len(waves))
        seq_len = args.seq_len or 64  # reference default (inference.py:227)
        texts_ids = _transcribe(pipeline, batch, np.asarray(lengths), seq_len, args, rng)
        for (i, path), row in zip(ok_paths, texts_ids):
            text, ids = row[0], row[1]
            out[i] = {
                "wav": path, "text": text, "ids": ids,
                "T_infer": args.T_infer, "r": args.r, "greedy": args.greedy,
                "posterior_mode": args.posterior_mode,
            }
            if len(row) > 2:
                out[i]["confidence"] = round(row[2], 6)
    return out  # type: ignore[return-value]


def _transcribe(pipeline, batch, lengths, seq_len, args, rng):
    """One public-API call: transcribe_with_ids handles best-of-N candidate
    folding, device-side confidence (fused into the sampler program), and
    winner selection — the CLI must not re-implement that logic (it drifted
    once: review finding, round 2)."""
    return pipeline.transcribe_with_ids(
        batch, lengths, seq_len=seq_len, rng=rng,
        with_confidence=bool(getattr(args, "confidence", False)),
        num_candidates=max(1, int(getattr(args, "num_candidates", 1))),
        **sampling_kwargs(args)
    )


def infer_long(pipeline, path: str, args, rng) -> Dict[str, Any]:
    """Chunked transcription of one long WAV.

    Splits into --chunk-seconds windows (every window padded to the same
    shape -> ONE compiled program regardless of recording length),
    transcribes them as batches of --batch-size with the real lengths
    condition-masked, and joins the window texts.  Windows are independent;
    --chunk-align silence (default) places each cut at the quietest 25 ms
    frame near the window edge so boundaries fall in speech pauses instead
    of mid-word (plan_silence_chunks); 'fixed' reproduces hard edge cuts.
    """
    import numpy as np

    from fddm_asr_tpu.data.audio_io import load_audio

    wav, _ = load_audio(path, target_sr=16000, mono=True)
    win = max(CONV_RECEPTIVE_FIELD, int(args.chunk_seconds * 16000))
    if getattr(args, "chunk_align", "silence") == "silence":
        from fddm_asr_tpu.data.audio_io import plan_silence_chunks

        spans = plan_silence_chunks(wav, win)
    else:
        spans = [(i * win, min((i + 1) * win, len(wav)))
                 for i in range(max(1, -(-len(wav) // win)))]
    n = len(spans)
    seq_len = args.seq_len or 64
    texts, ids, confs = [], [], []
    bs = max(1, args.batch_size)
    for start in range(0, n, bs):
        rows = min(bs, n - start)
        batch = np.zeros((rows, win), np.float32)
        lengths = []
        for j in range(rows):
            s, e = spans[start + j]
            seg = wav[s:e]
            batch[j, : len(seg)] = seg
            lengths.append(max(len(seg), CONV_RECEPTIVE_FIELD))
        rng, step_rng = __import__("jax").random.split(rng)
        for row in _transcribe(
            pipeline, batch, np.asarray(lengths), seq_len, args, step_rng
        ):
            texts.append(row[0])
            ids.append(row[1])
            if len(row) > 2:
                confs.append(row[2])
    result = {
        "wav": path, "text": "".join(texts), "chunks": texts, "ids": ids,
        "chunk_seconds": args.chunk_seconds,
        "chunk_align": getattr(args, "chunk_align", "silence"),
        "T_infer": args.T_infer,
        "r": args.r, "greedy": args.greedy,
        "posterior_mode": args.posterior_mode,
    }
    if confs:
        # per-chunk geometric means combine as their mean in log space
        result["confidence"] = round(
            float(np.exp(np.mean(np.log(np.maximum(confs, 1e-12))))), 6)
    return result


def main(argv=None):
    args = parse_args(argv)
    if args.device and args.device.startswith("cpu"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from fddm_asr_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    pipeline = build_pipeline(args)
    if args.mesh:
        from train import parse_mesh
        from fddm_asr_tpu.parallel import make_mesh

        pipeline.apply_mesh(make_mesh(parse_mesh(args.mesh)),
                            seq_parallel=args.seq_parallel)
    if args.condition_mask == "auto":
        # keep a config-enabled mask (model.encoder.condition_mask — models
        # TRAINED masked must be decoded masked); otherwise mask exactly the
        # batched-CSV case where padding across utterances is material
        pipeline.use_condition_mask = (pipeline.use_condition_mask
                                       or (bool(args.csv) and args.batch_size > 1))
    else:
        pipeline.use_condition_mask = args.condition_mask == "on"
    rng = jax.random.key(args.seed)
    results: List[Dict[str, Any]] = []

    if args.wav:
        if args.chunk_seconds and args.chunk_seconds > 0:
            # windows are zero-padded batches; masking the pad is required
            pipeline.use_condition_mask = True
            res = infer_long(pipeline, args.wav, args, rng)
        else:
            res = infer_batch(pipeline, [args.wav], args, rng)[0]
        results.append(res)
        print(json.dumps(res, ensure_ascii=False, indent=2))
    else:
        import pandas as pd

        df = pd.read_csv(args.csv)
        paths = [str(row["path"]) for _, row in df.iterrows()]
        ref_col = args.ref_column
        if ref_col is None:
            ref_col = next((c for c in ("text", "sentence") if c in df.columns), None)
        refs = [str(r) if pd.notna(r) else "" for r in df[ref_col]] if ref_col else None

        bs = max(1, args.batch_size)
        cer_sum, cer_n = 0.0, 0
        for start in range(0, len(paths), bs):
            rng, step_rng = jax.random.split(rng)
            chunk = infer_batch(
                pipeline, paths[start : start + bs], args, step_rng,
                pad_rows_to=bs,
            )
            for j, res in enumerate(chunk):
                if refs is not None and "text" in res:
                    from fddm_asr_tpu.eval import calculate_cer

                    res["ref"] = refs[start + j]
                    res["cer"] = calculate_cer(refs[start + j], res["text"])
                    cer_sum += res["cer"]
                    cer_n += 1
                results.append(res)
                print(json.dumps(res, ensure_ascii=False))
        if cer_n:
            print(json.dumps({"summary": "cer", "avg_cer": cer_sum / cer_n,
                              "utterances": cer_n}, ensure_ascii=False))

    if args.out_json:
        os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
        with open(args.out_json, "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False, indent=2)


if __name__ == "__main__":
    main()
