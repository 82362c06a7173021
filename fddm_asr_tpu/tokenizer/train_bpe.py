# -*- coding: utf-8 -*-
"""BPE tokenizer trainer producing SentencePiece-compatible artifacts.

Framework counterpart of the reference's scripts/tokenizer_train.py, which
shells into `spm.SentencePieceTrainer.train` (reference line 256) — the
sentencepiece wheel is unavailable here, so the trainer is implemented
directly:

  * normalization identical to the codec (NFKC + whitespace folding);
  * `split_by_whitespace` semantics: pieces never cross word boundaries;
    every word carries the U+2581 prefix (dummy-prefix + escaped spaces);
  * character_coverage: rarest characters beyond the coverage quantile are
    dropped from the alphabet (they encode as <unk>);
  * classic BPE merges by pair frequency (ties: lexicographic, matching the
    deterministic behavior needed for reproducible vocabs);
  * output vocab layout mirrors SPM BPE: specials (<unk>=0, <s>=1, </s>=2,
    <pad>=3 — the fixed ids of reference tokenizer_train.py:117-120), merged
    pieces with score = -(merge rank), then alphabet characters continuing
    the rank sequence by frequency.

Outputs: `<prefix>.model` (real SentencePiece ModelProto via `model_proto`),
`<prefix>.vocab` (tsv), and the `vocab.json` sidecar schema of
reference tokenizer_train.py:129-160.

Exact .vocab-file equality with the sentencepiece binary on the same corpus
is not guaranteed (SPM's internal tie-breaking/dedup differs); artifact
*format* compatibility and codec round-trip are covered by tests.
"""
from __future__ import annotations

import collections
import heapq
import json
import os
import unicodedata
from typing import Dict, Iterable, List, Optional, Tuple

from fddm_asr_tpu.tokenizer import model_proto as mp
from fddm_asr_tpu.tokenizer.spm import WS, SentencePieceProcessor

SPECIALS = ("<unk>", "<s>", "</s>", "<pad>")


def _normalize(text: str) -> str:
    text = unicodedata.normalize("NFKC", text)
    text = "".join(" " if ch in "\t\n\r\v\f   " else ch for ch in text)
    return " ".join(t for t in text.split(" ") if t)


def _word_counts(lines: Iterable[str]) -> collections.Counter:
    counts: collections.Counter = collections.Counter()
    for line in lines:
        line = _normalize(line)
        if not line:
            continue
        for word in line.split(" "):
            counts[WS + word] += 1
    return counts


def _coverage_alphabet(
    word_counts: collections.Counter, character_coverage: float
) -> Dict[str, int]:
    char_freq: collections.Counter = collections.Counter()
    for word, c in word_counts.items():
        for ch in word:
            char_freq[ch] += c
    total = sum(char_freq.values())
    kept: Dict[str, int] = {}
    covered = 0
    for ch, c in char_freq.most_common():
        if total and covered / total >= character_coverage and ch != WS:
            break
        kept[ch] = c
        covered += c
    kept.setdefault(WS, char_freq.get(WS, 1))
    return kept


def train_bpe(
    lines: Iterable[str],
    vocab_size: int,
    character_coverage: float = 0.9995,
    max_piece_length: int = 16,
    user_defined_symbols: Optional[List[str]] = None,
) -> mp.SPModel:
    """Train BPE over an iterable of sentences; returns an SPModel."""
    word_counts = _word_counts(lines)
    alphabet = _coverage_alphabet(word_counts, character_coverage)
    uds = [s for s in (user_defined_symbols or []) if s not in SPECIALS]

    # words as symbol tuples, dropping non-alphabet chars entirely (they will
    # encode as unk at runtime; keeping them would leak unmergeable symbols)
    words: List[Tuple[List[str], int]] = []
    for word, c in word_counts.items():
        syms = [ch for ch in word if ch in alphabet]
        if syms:
            words.append((syms, c))

    n_merge_budget = vocab_size - len(SPECIALS) - len(uds) - len(alphabet)

    # pair counts with occurrence indexing: pair -> {word_idx: count_in_word}
    pair_counts: collections.Counter = collections.Counter()
    pair_words: Dict[Tuple[str, str], collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for wi, (syms, c) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)][wi] += 1

    heap: List[Tuple[int, Tuple[str, str]]] = [
        (-cnt, pair) for pair, cnt in pair_counts.items()
    ]
    heapq.heapify(heap)

    merges: List[str] = []
    merged_set = set()
    while len(merges) < max(0, n_merge_budget) and heap:
        negcnt, pair = heapq.heappop(heap)
        cnt = pair_counts.get(pair, 0)
        if cnt <= 0:
            continue
        if -negcnt != cnt:  # stale entry
            heapq.heappush(heap, (-cnt, pair))
            continue
        new_sym = pair[0] + pair[1]
        if len(new_sym) > max_piece_length or new_sym in merged_set:
            pair_counts.pop(pair, None)
            continue
        merges.append(new_sym)
        merged_set.add(new_sym)

        # apply merge only to words containing the pair
        touched = list(pair_words.get(pair, ()))
        changed_pairs = set()
        for wi in touched:
            syms, c = words[wi]
            i = 0
            while i < len(syms) - 1:
                if syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    if i > 0:
                        left = (syms[i - 1], syms[i])
                        pair_counts[left] -= c
                        pair_words[left][wi] -= 1
                        newl = (syms[i - 1], new_sym)
                        pair_counts[newl] += c
                        pair_words[newl][wi] += 1
                        changed_pairs.update((left, newl))
                    if i + 2 < len(syms):
                        right = (syms[i + 1], syms[i + 2])
                        pair_counts[right] -= c
                        pair_words[right][wi] -= 1
                        # note: the new right-neighbor pair is formed below
                        changed_pairs.add(right)
                    syms[i : i + 2] = [new_sym]
                    if i < len(syms) - 1:
                        newr = (new_sym, syms[i + 1])
                        pair_counts[newr] += c
                        pair_words[newr][wi] += 1
                        changed_pairs.add(newr)
                else:
                    i += 1
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
        for pch in changed_pairs:
            if pair_counts.get(pch, 0) > 0:
                heapq.heappush(heap, (-pair_counts[pch], pch))

    # ---- assemble vocab: specials, user symbols, merges, alphabet ----------
    pieces: List[mp.Piece] = [
        mp.Piece("<unk>", 0.0, mp.UNKNOWN),
        mp.Piece("<s>", 0.0, mp.CONTROL),
        mp.Piece("</s>", 0.0, mp.CONTROL),
        mp.Piece("<pad>", 0.0, mp.CONTROL),
    ]
    for s in uds:
        pieces.append(mp.Piece(s, 0.0, mp.USER_DEFINED))
    rank = 0
    for sym in merges:
        pieces.append(mp.Piece(sym, -float(rank)))
        rank += 1
    for ch, _freq in sorted(alphabet.items(), key=lambda kv: (-kv[1], kv[0])):
        if ch in merged_set:
            continue
        pieces.append(mp.Piece(ch, -float(rank)))
        rank += 1
    pieces = pieces[:vocab_size]
    return mp.SPModel(pieces=pieces, character_coverage=character_coverage)


def write_artifacts(
    model: mp.SPModel, output_prefix: str, vocab_json_path: Optional[str] = None
) -> None:
    """Write <prefix>.model, <prefix>.vocab, and the vocab.json sidecar."""
    os.makedirs(os.path.dirname(output_prefix) or ".", exist_ok=True)
    mp.save_model(model, output_prefix + ".model")
    with open(output_prefix + ".vocab", "w", encoding="utf-8") as f:
        for p in model.pieces:
            score = 0 if p.type in (mp.UNKNOWN, mp.CONTROL, mp.USER_DEFINED) else p.score
            f.write(f"{p.piece}\t{_fmt_score(score)}\n")
    if vocab_json_path:
        id2token = [p.piece for p in model.pieces]
        sidecar = {
            "vocab_size": len(model.pieces),
            "special_token_ids": {
                "unk_id": model.unk_id,
                "bos_id": model.bos_id,
                "eos_id": model.eos_id,
                "pad_id": model.pad_id,
            },
            "id2token": id2token,
            "token2id": {t: i for i, t in enumerate(id2token)},
            "sp_model_path": output_prefix + ".model",
        }
        with open(vocab_json_path, "w", encoding="utf-8") as f:
            json.dump(sidecar, f, ensure_ascii=False, indent=2)


def _fmt_score(score: float) -> str:
    if score == 0:
        return "0"
    if float(score).is_integer():
        return f"-{abs(int(score))}"
    return str(score)


def train_from_files(
    input_files: List[str],
    output_prefix: str,
    vocab_size: int,
    character_coverage: float = 0.9995,
    user_defined_symbols: Optional[List[str]] = None,
    vocab_json_path: Optional[str] = None,
) -> SentencePieceProcessor:
    def lines():
        for path in input_files:
            with open(path, "r", encoding="utf-8") as f:
                for line in f:
                    yield line.rstrip("\n")

    model = train_bpe(
        lines(), vocab_size, character_coverage,
        user_defined_symbols=user_defined_symbols,
    )
    write_artifacts(model, output_prefix, vocab_json_path)
    sp = SentencePieceProcessor()
    sp._init_from_model(model)
    return sp
