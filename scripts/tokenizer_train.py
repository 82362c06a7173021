#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Tokenizer training CLI (config-compatible with the reference script).

    python scripts/tokenizer_train.py --config configs/tokenizer_zhTW.yaml

Reads corpus JSON manifests (merged train/dev/test.json preferred, else
`{lang_prefix}_*.json`), extracts the configured text field with length
filtering, trains a SentencePiece-compatible BPE vocab with fixed special ids
(unk=0, bos=1, eos=2, pad=3), and writes `<prefix>.model`, `<prefix>.vocab`
and the `vocab.json` sidecar.

Behavioral reference: /root/reference/scripts/tokenizer_train.py
(discover_corpus_files 162-207, prepare_corpus_text_from_json 36-76,
export_vocab_json 129-160).  The training itself uses the built-in BPE
trainer (`fddm_asr_tpu.tokenizer.train_bpe`) — the sentencepiece wheel is
optional; when importable it is used instead for bit-identical artifacts.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml


def discover_corpus_files(base_path: str, lang_prefix: str):
    """Merged {train,validation/dev,test}.json preferred; else prefixed files."""
    merged = []
    for name in ("train.json", "validation.json", "dev.json", "test.json"):
        p = os.path.join(base_path, name)
        if os.path.exists(p):
            merged.append(p)
    if merged:
        return merged
    return sorted(glob.glob(os.path.join(base_path, f"{lang_prefix}_*.json")))


def corpus_lines(files, text_field: str, min_len: int, max_len):
    for path in files:
        with open(path, "r", encoding="utf-8") as f:
            records = json.load(f)
        for rec in records:
            text = rec.get(text_field) or rec.get("text") or rec.get("sentence") or ""
            text = str(text).strip()
            if len(text) < (min_len or 1):
                continue
            if max_len and len(text) > max_len:
                continue
            yield text


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train a BPE tokenizer")
    ap.add_argument("--config", type=str, required=True)
    args = ap.parse_args(argv)

    with open(args.config, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    corpus = cfg["corpus"]
    tok = cfg["tokenizer"]
    out = cfg["output"]

    files = discover_corpus_files(corpus["base_path"], corpus.get("lang_prefix", ""))
    if not files:
        print(f"no corpus JSON found under {corpus['base_path']}", file=sys.stderr)
        sys.exit(1)
    print(f"corpus files: {files}")

    lines = list(corpus_lines(
        files, corpus.get("text_field", "text"),
        corpus.get("min_len", 1), corpus.get("max_len"),
    ))
    print(f"{len(lines)} sentences")

    out_dir = out["dir"]
    os.makedirs(out_dir, exist_ok=True)
    prefix = os.path.join(out_dir, tok["model_prefix"])
    vocab_json = os.path.join(out_dir, out.get("export_vocab_json", "vocab.json"))

    try:
        import sentencepiece as spm  # optional: bit-identical artifacts

        corpus_txt = prefix + "_corpus.txt"
        with open(corpus_txt, "w", encoding="utf-8") as f:
            f.write("\n".join(lines))
        spm.SentencePieceTrainer.train(
            input=corpus_txt, model_prefix=prefix,
            model_type=tok.get("model_type", "bpe"),
            vocab_size=tok["vocab_size"],
            character_coverage=tok.get("character_coverage", 0.9995),
            input_sentence_size=tok.get("input_sentence_size", 2000000),
            shuffle_input_sentence=tok.get("shuffle_input_sentence", True),
            unk_id=0, bos_id=1, eos_id=2, pad_id=3,
        )
        os.remove(corpus_txt)
        from fddm_asr_tpu.tokenizer import load_tokenizer

        sp = load_tokenizer(prefix + ".model")
        _export_vocab_json(sp, prefix, vocab_json)
    except ImportError:
        from fddm_asr_tpu.tokenizer.train_bpe import train_bpe, write_artifacts

        model = train_bpe(
            lines, vocab_size=tok["vocab_size"],
            character_coverage=tok.get("character_coverage", 0.9995),
            user_defined_symbols=tok.get("extra_user_symbols") or [],
        )
        write_artifacts(model, prefix, vocab_json_path=vocab_json)
    print(f"wrote {prefix}.model / .vocab and {vocab_json}")


def _export_vocab_json(sp, prefix, vocab_json):
    id2token = [sp.id_to_piece(i) for i in range(sp.vocab_size())]
    with open(vocab_json, "w", encoding="utf-8") as f:
        json.dump({
            "vocab_size": sp.vocab_size(),
            "special_token_ids": {"unk_id": 0, "bos_id": 1, "eos_id": 2, "pad_id": 3},
            "id2token": id2token,
            "token2id": {t: i for i, t in enumerate(id2token)},
            "sp_model_path": prefix + ".model",
        }, f, ensure_ascii=False, indent=2)


if __name__ == "__main__":
    main()
