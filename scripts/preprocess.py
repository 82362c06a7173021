#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Common Voice preprocessing: raw TSV/audio dumps -> 16 kHz WAVs + manifests.

CLI-compatible with the reference scripts/preprocess.py (flags: --auto_merge,
--dataset_names/--dataset_name, --language, --splits, --batch_size,
--text_similarity_threshold, --enable_audio_hash, --use_memory_optimized) and
produces the same artifacts:

  data/processed/{split}.json / .csv   records of schema
      {path, sentence, text, duration, processed_path, language, dataset,
       split, audio_hash}                      (reference preprocess.py:515-525)
  data/processed/clips/*.wav                   16 kHz mono PCM16
  data/processed/merge_report.json             (reference 814-874)
  data/processed/duplicates_removed.json       (reference 851-855)

Behavior matched: tolerant TSV reading (dev.tsv|validation.tsv|validated.tsv,
filename->path, text->sentence; reference 146-192), text normalization
(reference 97-112, via fddm_asr_tpu.data.text), duration filter 0.1-30 s,
exact + near-duplicate text dedup with optional audio-MD5 dedup, streaming
batch processing.

Performance redesign: the reference compares every new text against ALL seen
texts with difflib (O(N^2) — SURVEY quirk #10).  Here near-dup detection is
length-bucketed with a character-multiset prefilter, so each candidate is
compared only against texts whose length is within the threshold band and
whose character histogram could possibly reach the similarity bound; difflib
confirms.  Same decisions on matching inputs, ~N x cheaper.
"""
from __future__ import annotations

import argparse
import csv
import hashlib
import json
import os
import sys
from collections import Counter, defaultdict
from difflib import SequenceMatcher
from typing import Dict, List, Optional, Set, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fddm_asr_tpu.data.audio_io import to_wav_16k_mono
from fddm_asr_tpu.data.text import normalize_text

RAW_DIR = os.path.join("data", "raw")
PROCESSED_DIR = os.path.join("data", "processed")
CLIPS_DIR = os.path.join(PROCESSED_DIR, "clips")

MIN_DURATION, MAX_DURATION = 0.1, 30.0


# ------------------------------------------------------------- discovery
def detect_datasets(dataset_names: Optional[List[str]] = None) -> List[str]:
    """Datasets = subdirs of data/raw/ containing <lang>/clips/."""
    if not os.path.isdir(RAW_DIR):
        return []
    found = []
    for name in sorted(os.listdir(RAW_DIR)):
        root = os.path.join(RAW_DIR, name)
        if not os.path.isdir(root):
            continue
        if dataset_names and name not in dataset_names:
            continue
        if detect_languages(root):
            found.append(name)
    return found


def detect_languages(cv_root: str) -> List[str]:
    """Languages = subdirs with a clips/ folder."""
    if not os.path.isdir(cv_root):
        return []
    return sorted(
        d for d in os.listdir(cv_root)
        if os.path.isdir(os.path.join(cv_root, d, "clips"))
    )


def read_split_tsv(cv_lang_dir: str, split_name: str):
    """Tolerant Common Voice TSV reader (reference 146-192)."""
    import pandas as pd

    candidates = {
        "train": ["train.tsv"],
        "dev": ["dev.tsv", "validation.tsv", "validated.tsv"],
        "test": ["test.tsv"],
        "validated": ["validated.tsv"],
        "other": ["other.tsv"],
    }
    tsv_path = None
    for fn in candidates.get(split_name, [f"{split_name}.tsv"]):
        fp = os.path.join(cv_lang_dir, fn)
        if os.path.isfile(fp):
            tsv_path = fp
            break
    if tsv_path is None:
        raise FileNotFoundError(
            f"no TSV for split {split_name} under {cv_lang_dir}"
        )
    df = pd.read_csv(tsv_path, sep="\t", quoting=3, dtype=str, keep_default_na=False)
    if "path" not in df.columns:
        if "filename" in df.columns:
            df = df.rename(columns={"filename": "path"})
        else:
            raise KeyError(f"{tsv_path} lacks a 'path' column: {list(df.columns)}")
    if "sentence" not in df.columns:
        if "text" in df.columns:
            df = df.rename(columns={"text": "sentence"})
        else:
            raise KeyError(f"{tsv_path} lacks a 'sentence' column: {list(df.columns)}")
    return df[["path", "sentence"]]


# ----------------------------------------------------------------- dedup
def calculate_audio_hash(file_path: str) -> Optional[str]:
    try:
        h = hashlib.md5()
        with open(file_path, "rb") as f:
            for chunk in iter(lambda: f.read(65536), b""):
                h.update(chunk)
        return h.hexdigest()
    except OSError:
        return None


def text_similarity(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio()


class DedupIndex:
    """Exact + near-duplicate text index with length/char-histogram pruning.

    difflib's ratio is 2*M/(len(a)+len(b)) where M = total matched chars;
    M <= multiset-intersection of characters, so a histogram bound prunes
    candidates that cannot reach the threshold before any quadratic match.
    """

    def __init__(self, threshold: float = 0.95):
        self.threshold = threshold
        self.exact: Set[str] = set()
        self.by_length: Dict[int, List[Tuple[str, Counter]]] = defaultdict(list)

    def add(self, text: str) -> None:
        self.exact.add(text)
        self.by_length[len(text)].append((text, Counter(text)))

    def check(self, text: str) -> Tuple[bool, str]:
        if text in self.exact:
            return True, "exact text match"
        if self.threshold < 1.0 and len(text) > 0:
            n = len(text)
            hist = Counter(text)
            # |len(a)-len(b)| bound: ratio <= 2*min/(a+b)
            lo = max(1, int(n * self.threshold / (2 - self.threshold)) - 1)
            hi = int(n * (2 - self.threshold) / self.threshold) + 2
            for m in range(lo, hi):
                for cand, cand_hist in self.by_length.get(m, ()):
                    inter = sum((hist & cand_hist).values())
                    if 2.0 * inter / (n + m) < self.threshold:
                        continue
                    if text_similarity(text, cand) >= self.threshold:
                        return True, f"similar text (>= {self.threshold})"
        return False, ""


# ------------------------------------------------------------ processing
def process_language_batch(
    dataset_name: str,
    lang: str,
    splits: List[str],
    batch_size: int,
    dedup: DedupIndex,
    seen_audio_hashes: Set[str],
    enable_audio_hash: bool,
    stats: Dict,
) -> float:
    """Convert+filter+dedup one dataset/language; returns duration seconds."""
    cv_lang_dir = os.path.join(RAW_DIR, dataset_name, lang)
    clips_dir = os.path.join(cv_lang_dir, "clips")
    os.makedirs(CLIPS_DIR, exist_ok=True)
    total_duration = 0.0

    for split in splits:
        try:
            df = read_split_tsv(cv_lang_dir, split)
        except (FileNotFoundError, KeyError) as e:
            print(f"  skip {split}: {e}")
            continue
        records = []
        split_stats = stats["split_stats"][split]
        for _, row in df.iterrows():
            stats["global_stats"]["total_found"] += 1
            src = os.path.join(clips_dir, str(row["path"]))
            text = normalize_text(str(row["sentence"]))
            if not text:
                stats["global_stats"]["invalid_files"] += 1
                continue

            dup, reason = dedup.check(text)
            if dup:
                stats["global_stats"]["duplicates_removed"] += 1
                stats["global_stats"]["duplicates_detail"].append({
                    "text": text, "path": str(row["path"]),
                    "dataset": dataset_name, "language": lang, "split": split,
                    "reason": reason,
                })
                continue

            base = os.path.splitext(os.path.basename(str(row["path"])))[0]
            dst = os.path.join(CLIPS_DIR, f"{dataset_name}_{lang}_{base}.wav")
            duration = to_wav_16k_mono(src, dst)
            if duration < 0 or not (MIN_DURATION <= duration <= MAX_DURATION):
                stats["global_stats"]["invalid_files"] += 1
                if os.path.exists(dst) and duration >= 0:
                    os.remove(dst)
                continue

            audio_hash = None
            if enable_audio_hash:
                audio_hash = calculate_audio_hash(dst)
                if audio_hash and audio_hash in seen_audio_hashes:
                    stats["global_stats"]["duplicates_removed"] += 1
                    stats["global_stats"]["duplicates_detail"].append({
                        "text": text, "path": str(row["path"]),
                        "dataset": dataset_name, "language": lang,
                        "split": split, "reason": "identical audio hash",
                    })
                    os.remove(dst)
                    continue
                if audio_hash:
                    seen_audio_hashes.add(audio_hash)

            dedup.add(text)
            rec = {
                "path": str(row["path"]),
                "sentence": str(row["sentence"]),
                "text": text,
                "duration": duration,
                "processed_path": dst,
                "language": lang,
                "dataset": dataset_name,
                "split": split,
                "audio_hash": audio_hash,
            }
            records.append(rec)
            split_stats["records"].append(rec)
            split_stats["total_duration"] += duration
            total_duration += duration
            stats["global_stats"]["total_processed"] += 1

            if len(records) >= batch_size:
                _flush_temp(split, dataset_name, lang, records)
                records = []
        if records:
            _flush_temp(split, dataset_name, lang, records)
    return total_duration


_flush_counters: Dict[str, int] = {}


def _flush_temp(split, dataset, lang, records):
    # Each flush writes a NEW chunk file (never read-modify-write): flushing
    # stays O(batch) instead of O(total-so-far), and a crash can't leave a
    # half-written aggregate.  merge_temp_files_to_unified sorts names, so
    # the zero-padded counter preserves record order.
    key = f"{split}_{dataset}_{lang}"
    n = _flush_counters.get(key, 0)
    _flush_counters[key] = n + 1
    path = os.path.join(PROCESSED_DIR, f"_tmp_{key}_{n:06d}.json")
    os.makedirs(PROCESSED_DIR, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(records, f, ensure_ascii=False)


def clear_stale_temps(splits: List[str]):
    """Remove _tmp_* leftovers from a crashed previous run.

    Temps are only deleted at merge time; if a prior run died after
    flushing, a rerun would otherwise sweep the stale chunks into the
    fresh manifests and duplicate every re-processed utterance."""
    if not os.path.isdir(PROCESSED_DIR):
        return
    for split in splits:
        for name in sorted(os.listdir(PROCESSED_DIR)):
            if name.startswith(f"_tmp_{split}_") and name.endswith(".json"):
                path = os.path.join(PROCESSED_DIR, name)
                print(f"  removing stale temp from a previous run: {path}")
                os.remove(path)


def merge_temp_files_to_unified(splits: List[str]):
    """Concatenate temp files into {split}.json/.csv, then delete temps."""
    for split in splits:
        merged = []
        for name in sorted(os.listdir(PROCESSED_DIR)):
            if name.startswith(f"_tmp_{split}_") and name.endswith(".json"):
                path = os.path.join(PROCESSED_DIR, name)
                merged.extend(json.load(open(path, encoding="utf-8")))
                os.remove(path)
        if not merged:
            continue
        jpath = os.path.join(PROCESSED_DIR, f"{split}.json")
        with open(jpath, "w", encoding="utf-8") as f:
            json.dump(merged, f, ensure_ascii=False, indent=1)
        cpath = os.path.join(PROCESSED_DIR, f"{split}.csv")
        with open(cpath, "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=list(merged[0].keys()))
            w.writeheader()
            w.writerows(merged)
        print(f"  wrote {jpath} ({len(merged)} records)")


def generate_merge_report(stats: Dict):
    import datetime

    report = {
        "merge_summary": {
            "total_datasets": stats["total_datasets"],
            "total_languages": len(stats["languages_processed"]),
            "datasets_processed": stats["datasets_processed"],
            "languages_processed": sorted(stats["languages_processed"]),
            "total_duration_hours": stats["total_duration"] / 3600.0,
            "processing_timestamp": datetime.datetime.now().isoformat(),
        },
        "global_statistics": stats["global_stats"],
        "split_statistics": {
            split: {
                "total_records": len(d["records"]),
                "total_duration_hours": d["total_duration"] / 3600.0,
                "avg_duration_seconds": (
                    d["total_duration"] / len(d["records"]) if d["records"] else 0
                ),
            }
            for split, d in stats["split_stats"].items()
            if d["records"]
        },
        "duplicates_detail": stats["global_stats"]["duplicates_detail"],
    }
    os.makedirs(PROCESSED_DIR, exist_ok=True)
    with open(os.path.join(PROCESSED_DIR, "merge_report.json"), "w", encoding="utf-8") as f:
        json.dump(report, f, ensure_ascii=False, indent=2)
    if stats["global_stats"]["duplicates_detail"]:
        with open(os.path.join(PROCESSED_DIR, "duplicates_removed.json"), "w", encoding="utf-8") as f:
            json.dump(stats["global_stats"]["duplicates_detail"], f, ensure_ascii=False, indent=2)
    g = stats["global_stats"]
    print(f"\ndatasets={stats['total_datasets']} languages={len(stats['languages_processed'])} "
          f"hours={stats['total_duration']/3600.0:.2f} found={g['total_found']} "
          f"processed={g['total_processed']} dupes={g['duplicates_removed']} "
          f"invalid={g['invalid_files']}")


def build_manifests_auto_merge(
    dataset_names: Optional[List[str]],
    language: Optional[str],
    splits: List[str],
    batch_size: int,
    text_similarity_threshold: float,
    enable_audio_hash: bool,
) -> Dict:
    dedup = DedupIndex(text_similarity_threshold)
    seen_audio_hashes: Set[str] = set()
    stats: Dict = {
        "total_duration": 0.0,
        "total_datasets": 0,
        "datasets_processed": [],
        "languages_processed": set(),
        "split_stats": {s: {"records": [], "total_duration": 0.0} for s in splits},
        "global_stats": {
            "total_found": 0, "total_processed": 0, "duplicates_removed": 0,
            "invalid_files": 0, "duplicates_detail": [],
        },
    }
    clear_stale_temps(splits)
    datasets = detect_datasets(dataset_names)
    if not datasets:
        raise ValueError(f"no datasets found under {RAW_DIR}")
    print(f"datasets: {datasets}")
    stats["total_datasets"] = len(datasets)

    for dataset_name in datasets:
        langs = [language] if language else detect_languages(
            os.path.join(RAW_DIR, dataset_name)
        )
        stats["languages_processed"].update(langs)
        for lang in langs:
            try:
                print(f"processing {dataset_name}/{lang}")
                stats["total_duration"] += process_language_batch(
                    dataset_name, lang, splits, batch_size, dedup,
                    seen_audio_hashes, enable_audio_hash, stats,
                )
            except Exception as e:
                print(f"  error in {lang}: {e}")
                continue
        stats["datasets_processed"].append(dataset_name)

    merge_temp_files_to_unified(splits)
    generate_merge_report(stats)
    return stats


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Convert local Common Voice dumps to 16 kHz WAV + manifests "
                    "(multi-version auto-merge supported)"
    )
    p.add_argument("--dataset_names", type=str, default="")
    p.add_argument("--dataset_name", type=str, default="")
    p.add_argument("--language", type=str, default="")
    p.add_argument("--splits", type=str, default="train,dev,test")
    p.add_argument("--batch_size", type=int, default=1000)
    p.add_argument("--text_similarity_threshold", type=float, default=0.95)
    p.add_argument("--enable_audio_hash", action="store_true")
    p.add_argument("--auto_merge", action="store_true")
    p.add_argument("--use_memory_optimized", action="store_true",
                   help="accepted for CLI compatibility; streaming is always on")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    splits = [s.strip() for s in args.splits.split(",") if s.strip()]
    dataset_names = None
    if args.dataset_names:
        dataset_names = [n.strip() for n in args.dataset_names.split(",") if n.strip()]
    elif args.dataset_name:
        dataset_names = [args.dataset_name]
    build_manifests_auto_merge(
        dataset_names=dataset_names,
        language=args.language or None,
        splits=splits,
        batch_size=args.batch_size,
        text_similarity_threshold=args.text_similarity_threshold,
        enable_audio_hash=args.enable_audio_hash,
    )


if __name__ == "__main__":
    main()
