# -*- coding: utf-8 -*-
"""Minimal protobuf codec for the SentencePiece ModelProto format.

The sentencepiece wheel is not available in this environment, but the
reference pipeline's tokenizer artifacts are SentencePiece files
(reference scripts/tokenizer_train.py trains `.model`/`.vocab`).  This module
reads and writes the `.model` binary directly — a hand-rolled subset of
protobuf wire format covering the fields the codec needs — so artifacts stay
interchangeable with the real SentencePiece library.

Schema subset (from the public sentencepiece_model.proto):

  ModelProto:
    repeated SentencePiece pieces = 1
      { optional string piece = 1; optional float score = 2;
        optional Type type = 3 [default NORMAL]; }
    optional TrainerSpec trainer_spec = 2
      { model_type = 3 (1=UNIGRAM, 2=BPE, 3=WORD, 4=CHAR); vocab_size = 4;
        character_coverage = 10; unk_id = 40; bos_id = 41; eos_id = 42;
        pad_id = 43; }
    optional NormalizerSpec normalizer_spec = 3
      { name = 1; add_dummy_prefix = 3; remove_extra_whitespaces = 4;
        escape_whitespaces = 5; }

  SentencePiece.Type: NORMAL=1 UNKNOWN=2 CONTROL=3 USER_DEFINED=4 UNUSED=5 BYTE=6
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional, Tuple

NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6


@dataclasses.dataclass
class Piece:
    piece: str
    score: float
    type: int = NORMAL


@dataclasses.dataclass
class SPModel:
    pieces: List[Piece]
    model_type: int = 2  # BPE
    unk_id: int = 0
    bos_id: int = 1
    eos_id: int = 2
    pad_id: int = 3
    add_dummy_prefix: bool = True
    remove_extra_whitespaces: bool = True
    escape_whitespaces: bool = True
    normalizer_name: str = "nmt_nfkc"
    character_coverage: float = 0.9995


# ------------------------------------------------------------ wire primitives
def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


_U64 = 1 << 64


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        # protobuf int32/int64: negatives are 64-bit two's complement
        # (a 10-byte varint).  Python's arithmetic shift would otherwise
        # never terminate on a negative int.  SentencePiece uses -1 as the
        # standard "disabled id" sentinel (e.g. its default pad_id).
        value += _U64
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _signed(value: int) -> int:
    """Undo the two's-complement varint encoding for signed int fields."""
    return value - _U64 if value >= (1 << 63) else value


def _iter_fields(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            val = buf[pos : pos + length]
            pos += length
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _field(out: bytearray, field: int, wire: int) -> None:
    _write_varint(out, (field << 3) | wire)


def _put_bytes(out: bytearray, field: int, data: bytes) -> None:
    _field(out, field, 2)
    _write_varint(out, len(data))
    out.extend(data)


def _put_varint_field(out: bytearray, field: int, value: int) -> None:
    _field(out, field, 0)
    _write_varint(out, value)


def _put_float(out: bytearray, field: int, value: float) -> None:
    _field(out, field, 5)
    out.extend(struct.pack("<f", value))


# ----------------------------------------------------------------- load/save
def parse_model(data: bytes) -> SPModel:
    pieces: List[Piece] = []
    trainer: Dict[int, int] = {}
    normalizer: Dict[int, object] = {}
    for field, wire, val in _iter_fields(data):
        if field == 1 and wire == 2:
            piece, score, ptype = "", 0.0, NORMAL
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1:
                    piece = v2.decode("utf-8")
                elif f2 == 2:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == 3:
                    ptype = v2
            pieces.append(Piece(piece, score, ptype))
        elif field == 2 and wire == 2:
            for f2, w2, v2 in _iter_fields(val):
                if w2 == 0:
                    trainer[f2] = v2
        elif field == 3 and wire == 2:
            for f2, w2, v2 in _iter_fields(val):
                normalizer[f2] = v2
    model = SPModel(pieces=pieces)
    model.model_type = trainer.get(3, 2)
    model.unk_id = _signed(trainer.get(40, 0))
    model.bos_id = _signed(trainer.get(41, 1))
    model.eos_id = _signed(trainer.get(42, 2))
    model.pad_id = _signed(trainer.get(43, 3))
    if 1 in normalizer and isinstance(normalizer[1], bytes):
        model.normalizer_name = normalizer[1].decode("utf-8", "replace")
    model.add_dummy_prefix = bool(normalizer.get(3, 1))
    model.remove_extra_whitespaces = bool(normalizer.get(4, 1))
    model.escape_whitespaces = bool(normalizer.get(5, 1))
    return model


def serialize_model(model: SPModel) -> bytes:
    out = bytearray()
    for p in model.pieces:
        sub = bytearray()
        _put_bytes(sub, 1, p.piece.encode("utf-8"))
        _put_float(sub, 2, p.score)
        if p.type != NORMAL:
            _put_varint_field(sub, 3, p.type)
        _put_bytes(out, 1, bytes(sub))
    trainer = bytearray()
    _put_varint_field(trainer, 3, model.model_type)
    _put_varint_field(trainer, 4, len(model.pieces))
    _put_varint_field(trainer, 40, model.unk_id)
    _put_varint_field(trainer, 41, model.bos_id)
    _put_varint_field(trainer, 42, model.eos_id)
    _put_varint_field(trainer, 43, model.pad_id)
    _put_bytes(out, 2, bytes(trainer))
    norm = bytearray()
    _put_bytes(norm, 1, model.normalizer_name.encode("utf-8"))
    _put_varint_field(norm, 3, int(model.add_dummy_prefix))
    _put_varint_field(norm, 4, int(model.remove_extra_whitespaces))
    _put_varint_field(norm, 5, int(model.escape_whitespaces))
    _put_bytes(out, 3, bytes(norm))
    return bytes(out)


def load_model(path: str) -> SPModel:
    with open(path, "rb") as f:
        return parse_model(f.read())


def save_model(model: SPModel, path: str) -> None:
    with open(path, "wb") as f:
        f.write(serialize_model(model))
