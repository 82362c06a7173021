#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Controlled reference-vs-rebuild CER experiment (the BASELINE.md north
star: final test CER within 0.2 absolute of the PyTorch reference).

Trains BOTH implementations on the SAME synthetic corpus, tokenizer,
frozen-encoder weights, schedule, and hyperparameters, then reports both
final/best validation CERs side by side:

    python scripts/cer_parity_experiment.py --out /tmp/cerexp --epochs 300

The reference side runs the reference's OWN torch modules — CVZhTWDataset,
SchedulerAdapter, train_one_epoch, evaluate_cer_with_jumpy_sampling,
DiscreteDiffusionScheduler (/root/reference/train.py:491-683 mirrored
construction-for-construction, same seeding order).  Substitutions, each
forced by this environment and documented:

  * ``sentencepiece`` wheel is absent -> stubbed with
    fddm_asr_tpu.tokenizer.spm (SPM-compatible codec; round-trip parity
    tested in tests/test_tokenizer.py);
  * ``librosa``/``soundfile`` are absent -> stubbed with
    fddm_asr_tpu.data.audio_io (WAV decode + resample);
  * ``WavLMModel.from_pretrained`` cannot download -> patched to return a
    seeded tiny HF WavLM; its state_dict is converted with
    convert.wavlm_params_from_state_dict so BOTH sides share identical
    frozen-encoder weights (the conversion itself is parity-tested in
    tests/test_wavlm_parity.py);
  * the reference Config dataclass is replaced by a dict+attr hybrid —
    without it the reference's own train-time eval path crashes on
    ``cfg.get`` (SURVEY quirk #3);
  * eval runs every ``--eval-every`` epochs (CPU wall-clock), final epoch
    always evaluated;
  * the training loop is re-wired here (instead of calling the reference
    ``main()``) so metrics can be returned — every construction follows
    main() in order, including seeding.

Both sides use pad_id=3/eos_id=2 from the toy tokenizer's vocab.json (the
quirk-#1 fix, applied consistently) and the measured convergence recipe
(CLAUDE.md: T=20, beta_max=0.6, lr 1e-3, T_infer=20, r=5, exact greedy).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_ROOT = "/root/reference"

D_MODEL = 32  # == tiny WavLM hidden_size: no projection layer on either side


# --------------------------------------------------------------- stubs
def _stub_module(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    # transformers probes optional deps via importlib; a spec-less module
    # makes importlib.util.find_spec raise ValueError
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def install_reference_stubs():
    """Stand-ins for wheels absent in this image (see module docstring)."""
    if "sentencepiece" not in sys.modules:
        from fddm_asr_tpu.tokenizer.spm import SentencePieceProcessor

        spm_mod = _stub_module("sentencepiece")
        spm_mod.SentencePieceProcessor = SentencePieceProcessor
        sys.modules["sentencepiece"] = spm_mod
    if "librosa" not in sys.modules:
        from fddm_asr_tpu.data.audio_io import load_audio

        lib = _stub_module("librosa")

        def _load(path, sr=None, mono=True):
            wav, got_sr = load_audio(path, target_sr=sr, mono=mono)
            return wav, got_sr

        lib.load = _load
        sys.modules["librosa"] = lib
    if "soundfile" not in sys.modules:
        sys.modules["soundfile"] = _stub_module("soundfile")


class RefCfg:
    """dict+attr hybrid: cfg.data['pad_id'] AND cfg.get('inference', {})
    both work (the reference needs both — quirk #3)."""

    def __init__(self, raw: dict):
        self._raw = raw
        for k, v in raw.items():
            setattr(self, k, v)

    def get(self, key, default=None):
        return self._raw.get(key, default)


# --------------------------------------------------------------- setup
def tiny_hf_wavlm(seed: int):
    """Seeded tiny HF torch WavLM — the shared frozen encoder."""
    import torch
    from transformers import WavLMConfig as HFConfig, WavLMModel as HFModel

    torch.manual_seed(seed)
    cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        num_buckets=32, max_bucket_distance=80, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, mask_time_prob=0.0,
        mask_feature_prob=0.0, layerdrop=0.0,
    )
    model = HFModel(cfg)
    model.eval()
    return model


def prepare(out: str, n: int, seconds: float):
    """Synth corpus + ref-side manifest variant (normalized_sentence field:
    the reference dataset reads it — quirk #2) + vocab info."""
    from scripts.make_synth_data import main as synth_main

    if not os.path.exists(os.path.join(out, "config.yaml")):
        synth_main(["--out", out, "--n", str(n), "--seconds", str(seconds)])
    vocab_json = json.load(
        open(os.path.join(out, "data/tokenizer/toy/vocab.json")))
    for split in ("train", "validation", "test"):
        src = os.path.join(out, f"data/processed/{split}.json")
        dst = os.path.join(out, f"data/processed/{split}_ref.json")
        if not os.path.exists(dst):
            records = json.load(open(src, encoding="utf-8"))
            for r in records:
                r["normalized_sentence"] = r["text"]
            json.dump(records, open(dst, "w", encoding="utf-8"),
                      ensure_ascii=False)
    return vocab_json


def experiment_config(out: str, vocab_json: dict, epochs: int) -> dict:
    """The shared recipe, as one raw config dict (reference YAML schema).

    Calibrated on the rebuild side (CPU, /tmp probes, round 2): the toy
    task is knife-edge — batch 4 (4 steps/epoch), decoder vocab 96 (>44
    real pieces, so corruption tokens are often out-of-distribution and
    carry more denoising signal), ~700 epochs -> val CER 0.0 by ~ep 560.
    Batch 8 / vocab 44 variants plateau at CER 1.4-2.5 (constant-token
    collapse).
    """
    specials = vocab_json["special_token_ids"]
    return {
        "seed": 7,
        "data": {
            "sample_rate": 16000, "max_seconds": 1.0,
            "pad_id": specials["pad_id"], "eos_id": specials["eos_id"],
            "max_len": 24,
            "vocab_size": 96,
            "train_json": f"{out}/data/processed/train.json",
            "val_json": f"{out}/data/processed/validation.json",
            "test_json": f"{out}/data/processed/test.json",
            "tokenizer_path": f"{out}/data/tokenizer/toy/spm_toy.model",
            "tokenizer_model_path": f"{out}/data/tokenizer/toy/spm_toy.model",
        },
        "model": {
            "d_model": D_MODEL, "nhead": 4, "num_layers": 2, "dim_ff": 64,
            "dropout": 0.1,
            "encoder": {"wavlm_name": "tiny", "freeze": True, "proj": "linear",
                        "pooling": "none"},
            "projector": {"d_proj": 16},
        },
        "diffusion": {"T": 20, "beta_max": 0.6},
        "inference": {"T_infer": 20, "r": 5, "greedy": True,
                      "sampling_mode": "exact", "posterior_mode": "map"},
        "optim": {"batch_size": 4, "lr": 1.0e-3, "weight_decay": 0.01,
                  "num_epochs": epochs, "grad_accum_steps": 1,
                  "warmup_steps": 0, "dtype": "float32",
                  "mask_pad_loss": True},
        "lfd": {"lambda_offdiag": 5.0e-3, "n_step_fd": 2, "tau": 1.0},
        "log": {"log_every": 50, "ckpt_dir": f"{out}/ckpts"},
    }


# --------------------------------------------------------------- reference
def run_reference(out: str, raw: dict, eval_every: int) -> dict:
    """Train the torch reference with its own modules; returns metrics."""
    import random

    import torch

    install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # patch the HF hub fetch BEFORE the reference encoder module binds it
    import models.acoustic_encoder as ref_ae

    shared = tiny_hf_wavlm(seed=0)

    class _Loader:
        @staticmethod
        def from_pretrained(name):
            return shared

    ref_ae.WavLMModel = _Loader

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_train", os.path.join(REFERENCE_ROOT, "train.py"))
    ref_train = importlib.util.module_from_spec(spec)
    sys.modules["ref_train"] = ref_train  # dataclass processing needs this
    spec.loader.exec_module(ref_train)
    from models.evaluate import evaluate_cer_with_jumpy_sampling

    cfg = RefCfg(raw)
    device = torch.device("cpu")

    # ---- construction order + seeding mirrors reference main() ----------
    random.seed(cfg.seed)
    torch.manual_seed(cfg.seed)

    d_model = cfg.model["d_model"]
    vocab = cfg.data["vocab_size"]
    pad_id = cfg.data["pad_id"]

    encoder = ref_train.AcousticEncoder(
        **cfg.model["encoder"], d_model=d_model).to(device)
    decoder = ref_train.DenoisingTransformerDecoder(
        vocab_size=vocab, d_model=d_model, nhead=cfg.model["nhead"],
        num_layers=cfg.model["num_layers"], dim_ff=cfg.model["dim_ff"],
        dropout=cfg.model["dropout"], max_len=1024, pad_id=pad_id,
    ).to(device)
    s_proj = ref_train.SpeechProjector(
        d_in=d_model, d_proj=cfg.model["projector"]["d_proj"]).to(device)
    t_embed = ref_train.TextEmbedding(
        vocab=vocab, d_out=cfg.model["projector"]["d_proj"],
        mode="logits").to(device)
    t_proj = ref_train.TextProjector(
        d_in=cfg.model["projector"]["d_proj"],
        d_proj=cfg.model["projector"]["d_proj"]).to(device)

    from fddm.sched.diffusion_scheduler import DiscreteDiffusionScheduler

    scheduler = ref_train.SchedulerAdapter(DiscreteDiffusionScheduler(
        K=vocab, T=cfg.diffusion["T"], device=device,
        beta_max=cfg.diffusion["beta_max"]))

    params = (list(decoder.parameters()) + list(s_proj.parameters())
              + list(t_embed.parameters()) + list(t_proj.parameters()))
    optim = torch.optim.AdamW(params, lr=cfg.optim["lr"],
                              weight_decay=cfg.optim["weight_decay"])

    from torch.utils.data import DataLoader

    def make_loader(json_key, shuffle, drop_last):
        path = cfg.data[json_key].replace(".json", "_ref.json")
        ds = ref_train.CVZhTWDataset(
            json_file=path,
            tokenizer_vocab_path=cfg.data["tokenizer_model_path"],
            max_len=cfg.data["max_len"], pad_id=pad_id,
            bos_id=cfg.data.get("bos_id"), eos_id=cfg.data.get("eos_id"),
        )
        return DataLoader(ds, batch_size=cfg.optim["batch_size"],
                          shuffle=shuffle, drop_last=drop_last)

    train_loader = make_loader("train_json", True, True)
    val_loader = make_loader("val_json", False, False)

    import sentencepiece as spm

    tokenizer = spm.SentencePieceProcessor()
    tokenizer.load(cfg.data["tokenizer_model_path"])

    global_step = 1
    best_val_cer, best_epoch = float("inf"), 0
    history = []
    num_epochs = cfg.optim["num_epochs"]
    t0 = time.time()
    for epoch in range(1, num_epochs + 1):
        global_step, train_loss = ref_train.train_one_epoch(
            encoder, decoder, s_proj, t_embed, t_proj, scheduler,
            train_loader, optim, device, cfg, global_step, None,
            epoch=epoch, print_epoch_summary=False,
        )
        if epoch % eval_every == 0 or epoch == num_epochs:
            val_cer = evaluate_cer_with_jumpy_sampling(
                encoder, decoder, scheduler, val_loader, device, cfg, tokenizer)
            if val_cer < best_val_cer:
                best_val_cer, best_epoch = val_cer, epoch
            history.append({"epoch": epoch, "train_loss": train_loss,
                            "val_cer": val_cer})
            logging.info(
                f"[ref] epoch {epoch} train_loss={train_loss:.4f} "
                f"val_cer={val_cer:.4f} best={best_val_cer:.4f}")
    return {
        "side": "reference", "best_val_cer": best_val_cer,
        "best_epoch": best_epoch, "final_val_cer": history[-1]["val_cer"],
        "epochs": num_epochs, "seconds": time.time() - t0,
        "history": history,
    }


# --------------------------------------------------------------- rebuild
def run_rebuild(out: str, raw: dict, eval_every: int) -> dict:
    """Train the JAX rebuild via its real run_training on the same recipe."""
    import jax
    import torch  # noqa: F401  (state_dict source)

    from fddm_asr_tpu.config import Config
    from fddm_asr_tpu.convert.wavlm_convert import wavlm_params_from_state_dict
    from fddm_asr_tpu.models.wavlm import WavLMConfig
    from fddm_asr_tpu.parallel import MeshSpec
    from fddm_asr_tpu.train_lib import run_training

    shared = tiny_hf_wavlm(seed=0)
    wavlm_cfg = WavLMConfig.from_hf(shared.config)
    wavlm_params = wavlm_params_from_state_dict(shared.state_dict(), wavlm_cfg)

    raw = dict(raw)
    raw["log"] = dict(raw["log"], ckpt_dir=f"{out}/ckpts_rebuild")
    # identical geometry: pipeline's named tiny config == shared HF config.
    # Use all local devices on the data axis when batch size divides them,
    # else a trivial all-data mesh on 1 device (the torch side is
    # single-device; multi-device envs like the 8-device test platform
    # would otherwise reject batch 4)
    n_dev = len(jax.devices())
    mesh_spec = (MeshSpec() if raw["optim"]["batch_size"] % n_dev == 0
                 else MeshSpec(data=1, model=1))
    cfg = Config(raw)
    t0 = time.time()
    summary = run_training(cfg, raw_cfg=raw, wavlm_params=wavlm_params,
                           mesh_spec=mesh_spec,
                           export_pt=False, eval_every=eval_every)
    return {
        "side": "rebuild", "best_val_cer": summary["best_val_cer"],
        "best_epoch": summary["best_epoch"],
        "final_val_cer": summary["val_cer"],
        "epochs": raw["optim"]["num_epochs"], "seconds": time.time() - t0,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/cer_parity")
    ap.add_argument("--epochs", type=int, default=700)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--side", choices=["ref", "rebuild", "both"],
                    default="both")
    ap.add_argument("--device", choices=["cpu", "tpu"], default="cpu",
                    help="rebuild-side backend; cpu needs BOTH the env var "
                         "and a config update (sitecustomize bakes the TPU "
                         "platform in at interpreter startup)")
    args = ap.parse_args(argv)

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    out = os.path.abspath(args.out)
    vocab_json = prepare(out, args.n, args.seconds)
    raw = experiment_config(out, vocab_json, args.epochs)

    results = {}
    result_path = os.path.join(out, "cer_parity.json")
    if os.path.exists(result_path):
        results = json.load(open(result_path))
    if args.side in ("rebuild", "both"):
        results["rebuild"] = run_rebuild(out, raw, args.eval_every)
        json.dump(results, open(result_path, "w"), indent=1)
    if args.side in ("ref", "both"):
        results["reference"] = run_reference(out, raw, args.eval_every)
        json.dump(results, open(result_path, "w"), indent=1)

    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "history"}
                      for k, v in results.items()}, indent=1))
    if "reference" in results and "rebuild" in results:
        delta = abs(results["reference"]["best_val_cer"]
                    - results["rebuild"]["best_val_cer"])
        print(f"|ΔCER| = {delta:.4f}  ({'PASS' if delta <= 0.2 else 'FAIL'}"
              " vs the 0.2 north star)")
    print(f"results written to {result_path}")


if __name__ == "__main__":
    main()
