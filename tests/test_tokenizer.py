# -*- coding: utf-8 -*-
"""Tokenizer tests: shipped-artifact loading, SPM-format round trip, BPE
training, and encode/decode behavior."""
import os

import pytest

from conftest import has_reference

from fddm_asr_tpu.tokenizer import SentencePieceProcessor, load_tokenizer
from fddm_asr_tpu.tokenizer import model_proto as mp
from fddm_asr_tpu.tokenizer.train_bpe import train_bpe, write_artifacts

REF_VOCAB = "/root/reference/data/tokenizer/zh-TW_A/spm_zhTW_A.vocab"

CORPUS = [
    "我們可以一起交流",
    "台灣的高速公路很大",
    "我們在台灣",
    "高速公路可以交流",
    "我們的交流道很大",
    "hello hello world",
] * 20


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
class TestShippedVocab:
    @pytest.fixture(scope="class")
    def sp(self):
        return load_tokenizer(REF_VOCAB)

    def test_size_and_specials(self, sp):
        assert sp.vocab_size() == 8000
        assert sp.id_to_piece(0) == "<unk>"
        assert sp.id_to_piece(1) == "<s>"
        assert sp.id_to_piece(2) == "</s>"
        assert sp.id_to_piece(3) == "<pad>"

    def test_round_trip_chinese(self, sp):
        for text in ["我們可以一起交流", "台灣的高速公路很大", "沒有問題"]:
            assert sp.decode(sp.encode(text)) == text

    def test_merge_priority(self, sp):
        # best-score-first merging: (交,流)->交流 (-3) then (交流,道)->交流道
        # (-5); "▁交流道" itself is not in the vocab so the dummy-prefix ▁
        # stays a standalone piece.
        pieces = sp.encode_as_pieces("交流道")
        assert pieces == ["▁", "交流道"]

    def test_specials_never_produced_and_skipped(self, sp):
        ids = sp.encode("我們")
        assert 1 not in ids and 2 not in ids and 3 not in ids
        assert sp.decode([1] + ids + [3, 2]) == "我們"

    def test_unknown_renders_unk_surface(self, sp):
        assert " ⁇ " in sp.decode(sp.encode("ЖЗИ"))

    def test_model_load_path_fallback(self):
        # .model is gitignored/absent in the reference; loader falls back to .vocab
        sp = load_tokenizer(REF_VOCAB.replace(".vocab", ".model"))
        assert sp.vocab_size() == 8000


class TestProtoRoundTrip:
    def test_serialize_parse(self, tmp_path):
        model = mp.SPModel(
            pieces=[
                mp.Piece("<unk>", 0.0, mp.UNKNOWN),
                mp.Piece("<s>", 0.0, mp.CONTROL),
                mp.Piece("</s>", 0.0, mp.CONTROL),
                mp.Piece("<pad>", 0.0, mp.CONTROL),
                mp.Piece("▁ab", -0.0),
                mp.Piece("▁a", -1.0),
                mp.Piece("a", -2.0),
                mp.Piece("b", -3.0),
                mp.Piece("▁", -4.0),
            ]
        )
        path = str(tmp_path / "toy.model")
        mp.save_model(model, path)
        loaded = mp.load_model(path)
        assert [p.piece for p in loaded.pieces] == [p.piece for p in model.pieces]
        assert loaded.pieces[4].score == -0.0
        assert loaded.pieces[0].type == mp.UNKNOWN
        assert loaded.unk_id == 0 and loaded.pad_id == 3
        sp = SentencePieceProcessor(path)
        assert sp.encode_as_pieces("ab") == ["▁ab"]

    def test_disabled_id_sentinels_round_trip(self, tmp_path):
        # SentencePiece's own defaults disable bos/pad with id -1, encoded
        # as a 10-byte two's-complement varint.  Regression: serialization
        # used to infinite-loop on negatives and parsing returned 2^64-1.
        model = mp.SPModel(
            pieces=[mp.Piece("<unk>", 0.0, mp.UNKNOWN), mp.Piece("a", -1.0)],
            bos_id=-1, eos_id=1, pad_id=-1,
        )
        path = str(tmp_path / "disabled.model")
        mp.save_model(model, path)
        loaded = mp.load_model(path)
        assert loaded.bos_id == -1
        assert loaded.pad_id == -1
        assert loaded.eos_id == 1
        assert loaded.unk_id == 0


class TestTraining:
    def test_train_and_use(self, tmp_path):
        model = train_bpe(CORPUS, vocab_size=64)
        assert [p.piece for p in model.pieces[:4]] == ["<unk>", "<s>", "</s>", "<pad>"]
        prefix = str(tmp_path / "toy")
        write_artifacts(model, prefix, vocab_json_path=str(tmp_path / "vocab.json"))
        assert os.path.exists(prefix + ".model")
        assert os.path.exists(prefix + ".vocab")

        sp = SentencePieceProcessor(prefix + ".model")
        for text in ["我們可以交流", "高速公路很大"]:
            assert sp.decode(sp.encode(text)) == text
        # frequent word should have merged into a multi-char piece
        assert any(len(p) > 2 for p in sp.encode_as_pieces("我們可以一起交流"))

        import json

        vj = json.load(open(tmp_path / "vocab.json", encoding="utf-8"))
        assert vj["vocab_size"] == len(model.pieces)
        assert vj["special_token_ids"]["pad_id"] == 3
        assert vj["id2token"][0] == "<unk>"

    def test_vocab_tsv_matches_model(self, tmp_path):
        model = train_bpe(CORPUS, vocab_size=48)
        prefix = str(tmp_path / "t")
        write_artifacts(model, prefix)
        sp_model = SentencePieceProcessor(prefix + ".model")
        sp_vocab = SentencePieceProcessor(prefix + ".vocab")
        text = "我們可以一起交流"
        assert sp_model.encode(text) == sp_vocab.encode(text)


class TestNativeBpeParity:
    """The C++ merge loop (native/fddm_native.cc bpe_*) must produce
    token-for-token identical ids to the pure-Python codec on every input."""

    CASES = [
        "我們可以一起交流",
        "台灣的高速公路很大",
        "hello world",
        "mixed 中英 text  with   spaces",
        "",
        " ",
        "\t\n我們\r",
        "ascii-only punctuation!?",
        "🎸 emoji and ∑ symbols",
        "我" * 200,
    ]

    def _check(self, sp):
        from fddm_asr_tpu.native import available

        if not available() or sp._native_encoder() is None:
            pytest.skip("native library unavailable")
        for text in self.CASES:
            ids_native = sp.encode(text)
            ids_py = sp._encode_ids_py(text)
            assert ids_native == ids_py, f"native/python mismatch on {text!r}"
            # decode round-trips through the same surface either way
            assert sp.decode(ids_native) == sp.decode(ids_py)

    @pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
    def test_shipped_vocab(self):
        self._check(load_tokenizer(REF_VOCAB))

    def test_trained_toy_vocab(self, tmp_path):
        model = train_bpe(CORPUS, vocab_size=128)
        path = os.path.join(tmp_path, "toy.model")
        with open(path, "wb") as f:
            f.write(mp.serialize_model(model))
        self._check(SentencePieceProcessor(path))

    def test_batch_matches_single(self):
        if not has_reference():
            pytest.skip("reference repo not mounted")
        sp = load_tokenizer(REF_VOCAB)
        enc = sp._native_encoder()
        if enc is None:
            pytest.skip("native library unavailable")
        texts = [sp._pretokenize(t) for t in self.CASES]
        batched = enc.encode_batch(texts)
        singles = [enc.encode(t) for t in texts]
        assert batched == singles

    def test_lone_surrogate_falls_back_to_python(self):
        """Unpaired surrogates can't cross the UTF-8 ABI; encode() must fall
        back to the Python codec instead of raising (review finding)."""
        sp = SentencePieceProcessor()
        model = train_bpe(CORPUS, vocab_size=96)
        import tempfile, os as _os
        with tempfile.TemporaryDirectory() as d:
            path = _os.path.join(d, "t.model")
            with open(path, "wb") as f:
                f.write(mp.serialize_model(model))
            sp.load(path)
        bad = "我們" + "\ud800" + "交流"
        ids = sp.encode(bad)            # must not raise
        assert ids == sp._encode_ids_py(bad)


class TestRandomizedRoundTrip:
    """Property-style sweep: BPE trained on a random mixed-script corpus
    must round-trip ANY text drawn from its coverage set, keep ids in
    range, and agree between the Python and native codecs."""

    def test_random_corpus_round_trip(self, tmp_path):
        import random

        rng = random.Random(7)
        cjk = [chr(c) for c in range(0x4E00, 0x4E00 + 120)]
        latin = list("abcdefghij klmnop")
        misc = ["é", "ß", "€", "中", "，", "。", "🙂"]
        alphabet = cjk + latin + misc

        corpus = ["".join(rng.choice(alphabet) for _ in range(rng.randint(3, 30)))
                  for _ in range(300)]
        model = train_bpe(corpus, vocab_size=512)
        prefix = str(tmp_path / "rand")
        write_artifacts(model, prefix)
        sp = SentencePieceProcessor(prefix + ".model")

        import unicodedata

        for _ in range(200):
            text = "".join(rng.choice(alphabet)
                           for _ in range(rng.randint(1, 60)))
            ids = sp.encode(text)
            assert all(0 <= i < len(model.pieces) for i in ids)
            # decode(encode(x)) == nmt_nfkc(x): SPM's default normalizer —
            # NFKC (fullwidth ，-> ASCII ,) plus whitespace strip/collapse —
            # exactly like real sentencepiece
            got = sp.decode(ids)
            want = " ".join(unicodedata.normalize("NFKC", text).split())
            assert got == want, (text, got)
            # and it is idempotent
            assert sp.decode(sp.encode(got)) == got

    def test_whitespace_edge_cases(self, tmp_path):
        model = train_bpe(["a b  c", "  leading", "trailing  "], vocab_size=48)
        prefix = str(tmp_path / "ws")
        write_artifacts(model, prefix)
        sp = SentencePieceProcessor(prefix + ".model")
        # SPM normalizes: leading space added, runs collapse per its rules —
        # round-trip must at least preserve the non-space content order
        for text in ["a b c", "a  b", " a", "a "]:
            got = sp.decode(sp.encode(text))
            assert got.replace(" ", "") == text.replace(" ", ""), (text, got)
