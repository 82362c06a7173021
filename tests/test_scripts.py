# -*- coding: utf-8 -*-
"""Script-level tests: preprocess auto-merge, tokenizer_train CLI, sweep
runner (dry run), sanity scripts."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.fixture
def cv_raw(tmp_path, monkeypatch):
    """Synthetic Common Voice dump: two dataset versions, one language, with
    an exact duplicate and a too-short clip across versions."""
    from fddm_asr_tpu.data.audio_io import save_wav

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    sentences = ["我們可以交流", "台灣的高速公路", "我們可以交流", "短"]
    for version in ("cv-v1", "cv-v2"):
        clips = tmp_path / "data/raw" / version / "zh-TW" / "clips"
        clips.mkdir(parents=True)
        rows = ["path\tsentence"]
        for i, s in enumerate(sentences):
            name = f"{version}_{i}.wav"
            dur = 0.02 if s == "短" else 0.5
            save_wav(str(clips / name),
                     rng.standard_normal(int(16000 * dur)).astype(np.float32) * 0.1,
                     16000)
            rows.append(f"{name}\t{s}")
        (clips.parent / "train.tsv").write_text("\n".join(rows))
        (clips.parent / "dev.tsv").write_text("\n".join(rows[:2]))
    return tmp_path


def test_preprocess_auto_merge(cv_raw):
    import preprocess

    preprocess.main(["--auto_merge", "--splits", "train,dev"])
    processed = cv_raw / "data/processed"
    train = json.load(open(processed / "train.json", encoding="utf-8"))
    # 8 rows found; 1 unique pair of sentences survives exact+short filtering:
    # "我們可以交流" once, "台灣的高速公路" once (duplicates + v2 copies removed)
    texts = [r["text"] for r in train]
    assert sorted(set(texts)) == ["台灣的高速公路", "我們可以交流"]
    assert len(texts) == 2
    for r in train:
        assert os.path.exists(r["processed_path"])
        assert set(r) == {"path", "sentence", "text", "duration",
                          "processed_path", "language", "dataset", "split",
                          "audio_hash"}
    report = json.load(open(processed / "merge_report.json", encoding="utf-8"))
    assert report["global_statistics"]["duplicates_removed"] >= 4
    assert report["merge_summary"]["total_datasets"] == 2
    assert (processed / "duplicates_removed.json").exists()
    assert (processed / "train.csv").exists()


def test_preprocess_clears_stale_temps(cv_raw):
    """_tmp_* leftovers from a crashed previous run must be discarded, not
    merged: otherwise every re-processed utterance appears twice in the
    fresh manifests (regression)."""
    import preprocess

    processed = cv_raw / "data/processed"
    processed.mkdir(parents=True, exist_ok=True)
    stale = [{"path": "ghost.wav", "sentence": "ghost", "text": "ghost",
              "duration": 1.0, "processed_path": "ghost16.wav",
              "language": "zh-TW", "dataset": "cv-v0", "split": "train",
              "audio_hash": None}]
    (processed / "_tmp_train_cv-v0_zh-TW_000000.json").write_text(
        json.dumps(stale), encoding="utf-8")

    preprocess.main(["--auto_merge", "--splits", "train,dev"])
    train = json.load(open(processed / "train.json", encoding="utf-8"))
    texts = [r["text"] for r in train]
    assert "ghost" not in texts
    assert len(texts) == len(set(texts)) == 2


def test_preprocess_multilingual_merge(tmp_path, monkeypatch):
    """--auto_merge across two languages (zh-TW + en) in one dataset
    (BASELINE config #5: merged multilingual corpus)."""
    from fddm_asr_tpu.data.audio_io import save_wav

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(1)
    data = {"zh-TW": ["我們交流", "台灣高速公路"], "en": ["hello there", "general kenobi"]}
    for lang, sentences in data.items():
        clips = tmp_path / "data/raw/cv-m/" / lang / "clips"
        clips.mkdir(parents=True)
        rows = ["path\tsentence"]
        for i, s in enumerate(sentences):
            name = f"{lang}_{i}.wav"
            save_wav(str(clips / name),
                     rng.standard_normal(8000).astype(np.float32) * 0.1, 16000)
            rows.append(f"{name}\t{s}")
        (clips.parent / "train.tsv").write_text("\n".join(rows))
    import preprocess

    preprocess.main(["--auto_merge", "--splits", "train"])
    train = json.load(open(tmp_path / "data/processed/train.json", encoding="utf-8"))
    langs = {r["language"] for r in train}
    assert langs == {"zh-TW", "en"}
    assert len(train) == 4
    report = json.load(open(tmp_path / "data/processed/merge_report.json", encoding="utf-8"))
    assert report["merge_summary"]["total_languages"] == 2


def test_preprocess_dedup_index_similarity():
    from preprocess import DedupIndex

    idx = DedupIndex(0.8)
    idx.add("我們可以一起交流了")
    dup, reason = idx.check("我們可以一起交流了")
    assert dup and "exact" in reason
    dup, reason = idx.check("我們可以一起交流呀")  # 1-char diff, high sim
    assert dup and "similar" in reason
    dup, _ = idx.check("完全不同的句子")
    assert not dup


def test_tokenizer_train_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = tmp_path / "corpus"
    data.mkdir()
    records = [{"text": s} for s in ["我們可以交流", "台灣高速公路", "交流的問題"] * 10]
    json.dump(records, open(data / "train.json", "w", encoding="utf-8"))
    cfg = {
        "corpus": {"lang_prefix": "zh", "base_path": str(data), "text_field": "text",
                   "min_len": 1, "max_len": None},
        "tokenizer": {"type": "sentencepiece", "model_prefix": "spm_test",
                      "vocab_size": 48, "model_type": "bpe",
                      "character_coverage": 0.9995, "extra_user_symbols": []},
        "special_tokens": {"pad": "<pad>", "bos": "<s>", "eos": "</s>", "unk": "<unk>"},
        "output": {"dir": str(tmp_path / "tok"), "export_vocab_json": "vocab.json"},
    }
    import yaml

    cfg_path = tmp_path / "tok.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    import tokenizer_train

    tokenizer_train.main(["--config", str(cfg_path)])
    assert (tmp_path / "tok/spm_test.model").exists()
    vj = json.load(open(tmp_path / "tok/vocab.json", encoding="utf-8"))
    assert vj["special_token_ids"]["pad_id"] == 3
    from fddm_asr_tpu.tokenizer import load_tokenizer

    sp = load_tokenizer(str(tmp_path / "tok/spm_test.model"))
    assert sp.decode(sp.encode("我們可以交流")) == "我們可以交流"


def test_sweep_dry_run(tmp_path, capsys):
    import sweep

    sweep.main([
        "--sweep", os.path.join(REPO, "configs/fddm_sweep.yaml"),
        "--trials", "3", "--out", str(tmp_path / "sw"), "--dry-run",
    ])
    out = capsys.readouterr().out
    assert out.count("[trial") == 3
    assert "lfd/lambda_offdiag" in out
    assert os.path.exists(tmp_path / "sw/trial_000/config.yaml")
    import yaml

    c = yaml.safe_load(open(tmp_path / "sw/trial_000/config.yaml"))
    # sampled leaf replaced the search spec with a concrete value
    assert isinstance(c["lfd"]["lambda_offdiag"], float)
    assert isinstance(c["optim"]["batch_size"], int)
    # base config fields survived
    assert c["model"]["d_model"] == 768


def test_convert_wavlm_script(tmp_path):
    """convert_wavlm CLI: local HF dir -> orbax dir that train.py's
    --wavlm-ckpt loader accepts, with --verify's torch-vs-flax comparison
    passing on the tiny model."""
    import torch
    from transformers import WavLMConfig as HFConfig, WavLMModel as HFModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=15, num_conv_pos_embedding_groups=1,
        num_buckets=32, max_bucket_distance=80, do_stable_layer_norm=False,
        feat_extract_norm="group",
    )
    src = str(tmp_path / "hf")
    HFModel(hf_cfg).save_pretrained(src)

    from scripts.convert_wavlm import main as convert

    out = str(tmp_path / "wavlm.orbax")
    convert(["--src", src, "--out", out, "--cpu", "--verify"])
    assert os.path.isdir(out)

    from train import _load_wavlm
    from fddm_asr_tpu.config import Config

    cfg = Config({"model": {"encoder": {"wavlm_name": src}}})
    params = _load_wavlm(out, cfg)
    assert params is not None


def test_sanity_check_scheduler_script():
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/sanity_check_scheduler.py"),
         os.path.join(REPO, "configs/fddm_zhTW_base.yaml")],
        capture_output=True, text=True, timeout=570,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=REPO,
    )
    assert "Scheduler sanity check passed." in result.stdout, result.stderr


def test_sanity_forward_script_tiny():
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/sanity_forward.py"),
         "--tiny", "--cpu"],
        capture_output=True, text=True, timeout=570, cwd=REPO,
    )
    assert "Sanity check passed." in result.stdout, result.stderr
    assert "logits: (2, 64, 4000)" in result.stdout


def test_make_synth_convergence_config(tmp_path):
    """make_synth_data also emits the measured convergence recipe as a
    base_config overlay; loading it deep-merges onto the smoke config."""
    from fddm_asr_tpu.config import load_config
    from scripts.make_synth_data import main as make

    out = str(tmp_path / "synth")
    make(["--out", out, "--n", "2", "--seconds", "0.5"])
    cfg = load_config(os.path.join(out, "config_convergence.yaml"))
    # recipe deltas (CLAUDE.md learning-dynamics findings)
    assert cfg.data.eos_id == 2
    assert cfg.diffusion.T == 20 and cfg.diffusion.beta_max == 0.6
    assert cfg.inference.T_infer == 20 and cfg.inference.r == 5
    assert cfg.inference.greedy is True
    assert cfg.optim.num_epochs == 300 and cfg.optim.mask_pad_loss is True
    # inherited from the smoke base via deep merge
    assert cfg.optim.batch_size == 4
    assert cfg.model.d_model == 32
    assert cfg.data.vocab_size == 96


def test_sweep_real_run(tmp_path, capsys):
    """A real (non-dry) sweep executes training per trial and ranks results
    by best val CER into summary.json."""
    import json

    from scripts.make_synth_data import main as make

    out = str(tmp_path / "synth")
    make(["--out", out, "--n", "4", "--seconds", "0.5"])
    spec = tmp_path / "sweep.yaml"
    spec.write_text(
        f"base_config: {out}/config.yaml\n"
        "optim:\n"
        "  lr:\n"
        "    distribution: categorical\n"
        "    values: [1.0e-3]\n"
    )
    import sweep

    sweep.main([
        "--sweep", str(spec), "--trials", "1", "--epochs", "1",
        "--max-steps-per-epoch", "2", "--device", "cpu",
        "--mesh", "data=4,model=2", "--out", str(tmp_path / "sw"),
    ])
    summary = json.load(open(tmp_path / "sw/summary.json"))
    assert len(summary) == 1
    assert "val_cer" in summary[0] and summary[0]["trial"] == 0


def test_pyproject_metadata_resolves():
    """pyproject.toml: dynamic version, entry points, and package discovery
    all resolve (pip install -e . would succeed on a machine that allows it)."""
    tomllib = pytest.importorskip("tomllib")  # stdlib from 3.11

    import fddm_asr_tpu

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["name"] == "fddm-asr-tpu"
    assert meta["tool"]["setuptools"]["dynamic"]["version"]["attr"] == \
        "fddm_asr_tpu.__version__"
    assert fddm_asr_tpu.__version__
    for target in meta["project"]["scripts"].values():
        mod, fn = target.split(":")
        assert callable(getattr(__import__(mod), fn)), target
    from setuptools import find_packages
    pkgs = find_packages(REPO, include=["fddm_asr_tpu*"])
    assert "fddm_asr_tpu" in pkgs and "fddm_asr_tpu.ops" in pkgs


def test_average_checkpoints(tmp_path):
    """scripts/average_checkpoints.py: the output .pt's weights equal the
    arithmetic mean of the inputs', and the file loads through the normal
    checkpoint loader."""
    import numpy as np

    from scripts.make_synth_data import main as synth_main
    from scripts.average_checkpoints import main as avg_main
    from fddm_asr_tpu.checkpoint import load_checkpoint_any
    from fddm_asr_tpu.config import Config, load_yaml
    from fddm_asr_tpu.train_lib import run_training

    out = str(tmp_path / "synth")
    synth_main(["--out", out, "--n", "8", "--seconds", "0.3"])
    raw = load_yaml(os.path.join(out, "config.yaml"))
    raw["optim"].update(num_epochs=2, batch_size=8)
    raw["log"]["ckpt_dir"] = str(tmp_path / "ck")
    run_training(Config(raw), raw_cfg=raw)

    dst = str(tmp_path / "avg.pt")
    avg_main(["--out", dst, "--last", "2", "--ckpt-dir", str(tmp_path / "ck")])

    a = load_checkpoint_any(str(tmp_path / "ck" / "ep001.pt"))
    b = load_checkpoint_any(str(tmp_path / "ck" / "ep002.pt"))
    got = load_checkpoint_any(dst)
    import jax

    for la, lb, lg in zip(jax.tree.leaves(a["decoder"]),
                          jax.tree.leaves(b["decoder"]),
                          jax.tree.leaves(got["decoder"])):
        np.testing.assert_allclose(
            np.asarray(lg), (np.asarray(la) + np.asarray(lb)) / 2.0,
            rtol=1e-6, atol=1e-7)


def test_init_random_ckpt_round_trip(tmp_path, capsys):
    """init_random_ckpt writes a .pt whose decoder params are EXACTLY the
    config-seeded random init (so serving/export benchmarks on a random
    checkpoint start from the same weights epoch-0 training would)."""
    import json

    import jax

    from scripts.make_synth_data import main as make

    out = str(tmp_path / "synth")
    make(["--out", out, "--n", "4", "--seconds", "0.3"])
    cfg_path = os.path.join(out, "config.yaml")
    pt = str(tmp_path / "random.pt")

    from scripts.init_random_ckpt import main as init_main

    assert init_main(["--config", cfg_path, "--out", pt]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["out"] == pt and line["params"] > 0
    assert os.path.getsize(pt) == line["bytes"]

    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.pipeline import FDDMPipeline

    cfg = load_config(cfg_path)
    want = FDDMPipeline.from_config(cfg)           # fresh random init
    got = FDDMPipeline.from_config(cfg, ckpt_path=pt)
    wl = jax.tree.leaves(want.decoder_params)
    gl = jax.tree.leaves(got.decoder_params)
    assert len(wl) == len(gl) and len(wl) > 0
    for w, g in zip(wl, gl):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_init_random_ckpt_seedless_config_matches_train_default(
        tmp_path, capsys):
    """A config WITHOUT a 'seed' key must init with train_lib's default
    (1337) — regression: from_config alone defaults to seed 0, so the .pt
    did not match what epoch-0 training would start from."""
    import yaml

    from scripts.make_synth_data import main as make

    out = str(tmp_path / "synth")
    make(["--out", out, "--n", "4", "--seconds", "0.3"])
    cfg_path = os.path.join(out, "config.yaml")
    raw = yaml.safe_load(open(cfg_path))
    raw.pop("seed", None)
    yaml.safe_dump(raw, open(cfg_path, "w"))
    pt = str(tmp_path / "random.pt")

    from scripts.init_random_ckpt import main as init_main

    assert init_main(["--config", cfg_path, "--out", pt]) == 0
    capsys.readouterr()

    import jax

    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.pipeline import FDDMPipeline

    cfg = load_config(cfg_path)
    want = FDDMPipeline.from_config(cfg, seed=1337)  # train_lib default
    got = FDDMPipeline.from_config(cfg, ckpt_path=pt)
    for w, g in zip(jax.tree.leaves(want.decoder_params),
                    jax.tree.leaves(got.decoder_params)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_init_random_ckpt_synthetic_tokenizer(tmp_path, capsys):
    """--make-tokenizer fabricates an SPM model with exactly
    data.vocab_size pieces that encodes/decodes CJK text."""
    import json

    from scripts.make_synth_data import main as make

    out = str(tmp_path / "synth")
    make(["--out", out, "--n", "4", "--seconds", "0.3"])
    pt = str(tmp_path / "r.pt")

    from scripts.init_random_ckpt import main as init_main

    assert init_main(["--config", os.path.join(out, "config.yaml"),
                      "--out", pt, "--make-tokenizer"]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from fddm_asr_tpu.tokenizer import load_tokenizer

    tok = load_tokenizer(line["tokenizer"])
    assert tok.vocab_size() == 96  # synth config data.vocab_size
    ids = tok.encode("一丁")
    assert ids and all(0 <= i < 96 for i in ids)
    assert "一" in tok.decode(ids)
    # vocab.json sidecar carries the special ids resolve_special_ids reads
    side = json.load(open(os.path.join(os.path.dirname(line["tokenizer"]),
                                       "vocab.json")))
    assert side["special_token_ids"]["pad_id"] == 3
    assert side["special_token_ids"]["eos_id"] == 2


def test_dropout_mode_probe_smoke(tmp_path, capsys):
    """scripts/dropout_mode_probe.py end-to-end on a fresh synth corpus:
    make_synth_data -> precompute_features -> random-init dual-mode probe.
    Pins the artifact schema (docs/dropout_probe_r05.json producers) and
    that a random-init model shows no mode-dependent fit (|gap| small) —
    the round-4 pathology detector must read ~0 on a healthy state."""
    from scripts.make_synth_data import main as make
    from scripts.precompute_features import main as pre_main
    from scripts.dropout_mode_probe import main as probe_main

    out = str(tmp_path / "synth")
    make(["--out", out, "--n", "6", "--seconds", "0.3"])
    cfg_path = os.path.join(out, "config.yaml")
    cache = str(tmp_path / "cache")
    pre_main(["--config", cfg_path, "--cache-dir", cache,
              "--splits", "train", "--device", "cpu"])

    res = str(tmp_path / "probe.json")
    probe_main(["--config", cfg_path, "--cache",
                os.path.join(cache, "train"), "--n-probe", "6",
                "--batch-size", "3", "--n-dropout-draws", "2",
                "--out", res])
    got = json.load(open(res))
    # schema consumed by scripts/dropout_probe_artifact.py
    for k in ("eval_kl", "eval_eos_frac", "trainmode_kl_mean",
              "trainmode_kl_per_draw", "trainmode_eos_frac", "mode_gap"):
        assert k in got, k
    assert got["eval_kl"] > 0 and np.isfinite(got["eval_kl"])
    assert len(got["trainmode_kl_per_draw"]) == 2
    assert 0.0 <= got["eval_eos_frac"] <= 1.0
    # random init: both modes see the same (untrained) function up to
    # dropout noise — the pathology signature (eval >> trainmode) is absent
    assert abs(got["mode_gap"]) < 0.5 * got["eval_kl"]
