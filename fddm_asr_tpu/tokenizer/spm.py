# -*- coding: utf-8 -*-
"""SentencePiece-compatible BPE tokenizer (encode/decode), pure Python.

Drop-in replacement for the `sentencepiece.SentencePieceProcessor` surface the
reference uses (train.py:109-111, inference.py:178-198, evaluate.py:26-68):
`load`, `encode(text)->ids`, `decode(ids)->str`, `DecodeIds`, `vocab_size()`,
`piece_to_id`, `id_to_piece`.  The sentencepiece wheel is unavailable in this
environment, so the codec is implemented from scratch against the public
algorithm:

  * normalization: NFKC + whitespace folding (an approximation of the
    precompiled "nmt_nfkc" charsmap — exact for the zh-TW corpus's character
    classes), optional collapse/strip of extra whitespace;
  * `add_dummy_prefix`: prepend one space, then escape spaces to U+2581;
  * BPE segmentation: greedy best-score adjacent merge (score = the merged
    piece's score from the model; ties break leftmost) — equivalent to
    merge-rank order since SPM's BPE trainer assigns score = -rank;
  * unknown characters -> unk_id; CONTROL pieces (<s>, </s>, <pad>) are never
    produced by encoding and are skipped (bos/eos/pad) on decoding;
  * decode renders unk as `unk_surface` (" ⁇ ", the SPM default).

Models load from a real `.model` protobuf (via `model_proto`) or directly
from a `.vocab` tsv (piece<TAB>score) as shipped with the reference repo.
"""
from __future__ import annotations

import heapq
import os
import unicodedata
from typing import Dict, Iterable, List, Optional, Sequence, Union

from fddm_asr_tpu.tokenizer import model_proto as mp

WS = "▁"  # ▁
UNK_SURFACE = " ⁇ "  # " ⁇ "

_DEFAULT_CONTROL = {"<s>", "</s>", "<pad>"}


class SentencePieceProcessor:
    def __init__(self, model_file: Optional[str] = None):
        self._pieces: List[mp.Piece] = []
        self._piece_to_id: Dict[str, int] = {}
        self._unk_id = 0
        self._add_dummy_prefix = True
        self._remove_extra_ws = True
        self._native = None
        self._native_tried = False
        if model_file:
            self.load(model_file)

    # ------------------------------------------------------------------ load
    def load(self, path: str) -> "SentencePieceProcessor":
        if path.endswith(".vocab") or not _looks_like_proto(path):
            self._load_vocab_tsv(path)
        else:
            self._init_from_model(mp.load_model(path))
        return self

    Load = load

    def _init_from_model(self, model: mp.SPModel) -> None:
        self._pieces = model.pieces
        self._piece_to_id = {p.piece: i for i, p in enumerate(self._pieces)}
        self._unk_id = model.unk_id
        self._add_dummy_prefix = model.add_dummy_prefix
        self._remove_extra_ws = model.remove_extra_whitespaces
        self._native = None          # C++ merge loop (native/fddm_native.cc)
        self._native_tried = False

    def _load_vocab_tsv(self, path: str) -> None:
        """Build from a `.vocab` tsv; first <unk> is UNKNOWN, <s></s><pad> CONTROL."""
        pieces: List[mp.Piece] = []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                piece, _, score = line.rpartition("\t")
                ptype = mp.NORMAL
                if piece == "<unk>":
                    ptype = mp.UNKNOWN
                elif piece in _DEFAULT_CONTROL:
                    ptype = mp.CONTROL
                pieces.append(mp.Piece(piece, float(score), ptype))
        self._init_from_model(mp.SPModel(pieces=pieces))

    # ------------------------------------------------------------- metadata
    def vocab_size(self) -> int:
        return len(self._pieces)

    GetPieceSize = vocab_size
    get_piece_size = vocab_size

    def __len__(self) -> int:
        return len(self._pieces)

    def piece_to_id(self, piece: str) -> int:
        return self._piece_to_id.get(piece, self._unk_id)

    PieceToId = piece_to_id

    def id_to_piece(self, idx: int) -> str:
        return self._pieces[idx].piece

    IdToPiece = id_to_piece

    def unk_id(self) -> int:
        return self._unk_id

    # ------------------------------------------------------------- normalize
    def _normalize(self, text: str) -> str:
        text = unicodedata.normalize("NFKC", text)
        text = "".join(" " if ch in "\t\n\r\v\f   " else ch for ch in text)
        if self._remove_extra_ws:
            text = " ".join(t for t in text.split(" ") if t)
        return text

    # ---------------------------------------------------------------- encode
    def _pretokenize(self, text: str) -> str:
        """normalize + dummy prefix + U+2581 escaping — the merge-loop input."""
        text = self._normalize(text)
        if not text:
            return ""
        if self._add_dummy_prefix:
            text = " " + text
        return text.replace(" ", WS)

    def _native_encoder(self):
        """Lazily builds the C++ merge-loop encoder (None when unavailable)."""
        if not self._native_tried:
            self._native_tried = True
            try:
                from fddm_asr_tpu.native import BpeEncoder

                self._native = BpeEncoder.create(
                    [p.piece for p in self._pieces],
                    [p.score for p in self._pieces],
                    [p.type for p in self._pieces],
                    self._unk_id,
                )
            except Exception:
                self._native = None
        return self._native

    def encode_as_pieces(self, text: str) -> List[str]:
        text = self._pretokenize(text)
        if not text:
            return []

        symbols: List[str] = list(text)
        # BPE merge with a lazy heap: entries (neg_score, position, left, right)
        n = len(symbols)
        nxt = list(range(1, n + 1))
        prv = list(range(-1, n - 1))
        alive = [True] * n

        heap: List = []

        def push(i: int) -> None:
            j = nxt[i]
            if j >= n:
                return
            merged = symbols[i] + symbols[j]
            mid = self._piece_to_id.get(merged)
            if mid is not None and self._pieces[mid].type == mp.NORMAL:
                heapq.heappush(heap, (-self._pieces[mid].score, i, symbols[i], symbols[j]))

        for i in range(n - 1):
            push(i)
        while heap:
            negscore, i, left, right = heapq.heappop(heap)
            if not alive[i] or symbols[i] != left:
                continue
            j = nxt[i]
            if j >= n or not alive[j] or symbols[j] != right:
                continue
            symbols[i] = left + right
            alive[j] = False
            nxt[i] = nxt[j]
            if nxt[i] < n:
                prv[nxt[i]] = i
            push(i)
            if prv[i] >= 0:
                push(prv[i])

        return [symbols[i] for i in range(n) if alive[i]]

    EncodeAsPieces = encode_as_pieces

    def encode(self, text: str, out_type=int) -> List:
        if out_type is str:
            return self.encode_as_pieces(text)
        native = self._native_encoder()
        if native is not None:
            try:
                return native.encode(self._pretokenize(text))
            except (UnicodeEncodeError, RuntimeError):
                # e.g. lone surrogates that cannot reach the UTF-8 ABI; the
                # Python codec maps such codepoints to unk per-character
                pass
        return self._encode_ids_py(text)

    def _encode_ids_py(self, text: str) -> List[int]:
        """Pure-Python reference path (also the no-toolchain fallback)."""
        pieces = self.encode_as_pieces(text)
        ids: List[int] = []
        for p in pieces:
            pid = self._piece_to_id.get(p)
            if pid is None or self._pieces[pid].type in (mp.CONTROL, mp.UNKNOWN):
                # unknown piece: fall back to per-character lookup
                for ch in p:
                    ids.append(self._piece_to_id.get(ch, self._unk_id))
            else:
                ids.append(pid)
        return ids

    Encode = encode
    EncodeAsIds = encode
    encode_as_ids = encode

    # ---------------------------------------------------------------- decode
    def decode(self, ids: Union[Sequence[int], Sequence[Sequence[int]]]) -> Union[str, List[str]]:
        if ids and isinstance(ids[0], (list, tuple)):
            return [self._decode_one(x) for x in ids]
        return self._decode_one(ids)  # type: ignore[arg-type]

    Decode = decode
    DecodeIds = decode
    decode_ids = decode

    def _decode_one(self, ids: Sequence[int]) -> str:
        parts: List[str] = []
        for i in ids:
            i = int(i)
            if i < 0 or i >= len(self._pieces):
                continue
            p = self._pieces[i]
            if p.type == mp.CONTROL:
                continue
            if p.type == mp.UNKNOWN:
                parts.append(UNK_SURFACE)
            else:
                parts.append(p.piece)
        text = "".join(parts).replace(WS, " ")
        if text.startswith(" "):
            text = text[1:]
        return text

    def decode_pieces(self, pieces: Iterable[str]) -> str:
        text = "".join(pieces).replace(WS, " ")
        return text[1:] if text.startswith(" ") else text


def _looks_like_proto(path: str) -> bool:
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with open(path, "rb") as f:
        head = f.read(2)
    # ModelProto starts with field 1, wire 2 -> 0x0a
    return len(head) == 2 and head[0] == 0x0A


def load_tokenizer(path: str) -> SentencePieceProcessor:
    """Load a tokenizer from `.model`, `.vocab`, or a directory containing one.

    Falls back from the gitignored `.model` binary to the `.vocab` tsv the
    reference repo actually ships.
    """
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".model"):
                return SentencePieceProcessor(os.path.join(path, name))
        for name in sorted(os.listdir(path)):
            if name.endswith(".vocab"):
                return SentencePieceProcessor(os.path.join(path, name))
        raise FileNotFoundError(f"no .model/.vocab under {path}")
    if not os.path.exists(path) and path.endswith(".model"):
        alt = path[: -len(".model")] + ".vocab"
        if os.path.exists(alt):
            return SentencePieceProcessor(alt)
    return SentencePieceProcessor(path)
