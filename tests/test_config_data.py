# -*- coding: utf-8 -*-
"""Config system, audio IO, text normalization, and dataset pipeline tests."""
import json
import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, has_reference

from fddm_asr_tpu.config import Config, load_config, resolve_special_ids
from fddm_asr_tpu.data.audio_io import load_wav, resample, save_wav, to_wav_16k_mono
from fddm_asr_tpu.data.dataset import ManifestDataset, make_batches
from fddm_asr_tpu.data.text import normalize_text


class TestConfig:
    def test_attribute_and_dict_access(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("seed: 1\nmodel:\n  d_model: 64\n  encoder:\n    freeze: true\n")
        cfg = load_config(str(p))
        assert cfg.seed == 1
        assert cfg["model"]["d_model"] == 64
        assert cfg.model.d_model == 64
        assert cfg.get("inference", {}).get("T_infer", 20) == 20  # quirk #3 fixed
        assert cfg.model.encoder.freeze is True

    def test_base_config_inheritance(self, tmp_path):
        (tmp_path / "base.yaml").write_text("a: 1\nm:\n  x: 1\n  y: 2\n")
        (tmp_path / "child.yaml").write_text(
            f"base_config: {tmp_path}/base.yaml\nm:\n  y: 9\nb: 3\n"
        )
        cfg = load_config(str(tmp_path / "child.yaml"))
        assert cfg.a == 1 and cfg.b == 3
        assert cfg.m.x == 1 and cfg.m.y == 9

    def test_resolve_special_ids_from_sidecar(self, tmp_path):
        tok = tmp_path / "tok"
        tok.mkdir()
        (tok / "vocab.json").write_text(json.dumps({
            "special_token_ids": {"unk_id": 0, "bos_id": 1, "eos_id": 2, "pad_id": 3}
        }))
        cfg = Config({"data": {"pad_id": 0, "tokenizer_path": str(tok / "spm.model")}})
        ids = resolve_special_ids(cfg)
        assert ids["pad_id"] == 3 and ids["unk_id"] == 0  # sidecar wins over YAML

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_resolve_special_ids_reference_artifacts(self):
        cfg = Config({"data": {
            "pad_id": 0,
            "tokenizer_path": os.path.join(
                REFERENCE_ROOT, "data/tokenizer/zh-TW_A/spm_zhTW_A.model"
            ),
        }})
        ids = resolve_special_ids(cfg)
        assert ids == {"pad_id": 3, "bos_id": 1, "eos_id": 2, "unk_id": 0}


class TestAudio:
    def test_wav_round_trip(self, tmp_path):
        sr = 16000
        t = np.arange(sr) / sr
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / "a.wav")
        save_wav(path, sig, sr)
        loaded, sr2 = load_wav(path)
        assert sr2 == sr
        np.testing.assert_allclose(loaded, sig, atol=1e-4)

    def test_resample_preserves_tone(self):
        sr = 48000
        t = np.arange(sr) / sr
        sig = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = resample(sig, 48000, 16000)
        assert abs(len(out) - 16000) <= 1
        spec = np.abs(np.fft.rfft(out[:16000]))
        peak_hz = float(np.argmax(spec))
        assert abs(peak_hz - 440) <= 2

    def test_to_wav_16k_mono(self, tmp_path):
        sr = 8000
        sig = np.random.default_rng(0).standard_normal(sr).astype(np.float32) * 0.1
        src = str(tmp_path / "src.wav")
        save_wav(src, sig, sr)
        dst = str(tmp_path / "dst.wav")
        dur = to_wav_16k_mono(src, dst)
        assert abs(dur - 1.0) < 0.01
        out, sr2 = load_wav(dst)
        assert sr2 == 16000 and abs(len(out) - 16000) <= 2

    @pytest.mark.parametrize("bits,fmt", [(32, "<f4"), (64, "<f8")])
    def test_float_wav_load(self, tmp_path, bits, fmt):
        """WAVE_FORMAT_IEEE_FLOAT files (rejected by stdlib wave with
        'unknown format: 3') decode through the RIFF fallback parser."""
        import struct

        sr = 16000
        sig = (0.25 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
        payload = np.asarray(sig, fmt).tobytes()
        width = bits // 8
        fmt_chunk = struct.pack("<HHIIHH", 3, 1, sr, sr * width, width, bits)
        body = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
                + b"data" + struct.pack("<I", len(payload)) + payload)
        path = str(tmp_path / f"float{bits}.wav")
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(body)) + body)

        loaded, sr2 = load_wav(path)
        assert sr2 == sr
        np.testing.assert_allclose(loaded, sig, atol=1e-6)

    def test_extensible_float_wav_load(self, tmp_path):
        """WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping the IEEE-float
        subformat GUID resolves to the float decode path."""
        import struct

        sr = 8000
        sig = np.linspace(-0.5, 0.5, sr, dtype=np.float32)
        payload = sig.tobytes()
        # KSDATAFORMAT_SUBTYPE_IEEE_FLOAT: 00000003-0000-0010-8000-00aa00389b71
        guid = (struct.pack("<IHH", 3, 0, 0x0010)
                + bytes.fromhex("800000aa00389b71"))
        fmt_chunk = (struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32)
                     + struct.pack("<HHI", 22, 32, 0) + guid)
        body = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
                + b"data" + struct.pack("<I", len(payload)) + payload)
        path = str(tmp_path / "ext.wav")
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(body)) + body)

        loaded, sr2 = load_wav(path)
        assert sr2 == sr
        np.testing.assert_allclose(loaded, sig, atol=1e-6)

    def test_silence_chunks_cut_in_gaps(self):
        """Long-form split points land inside the silent gaps, not at the
        hard window edges — and every span stays <= win with full
        coverage in order."""
        from fddm_asr_tpu.data.audio_io import plan_silence_chunks

        sr, win = 16000, 5 * 16000
        rng = np.random.default_rng(3)
        # 12 s of loud tone with silence at 4.0-4.4 s and 8.6-9.0 s
        n = 12 * sr
        wav = 0.5 * np.sin(2 * np.pi * 300 * np.arange(n) / sr).astype(np.float32)
        wav += rng.standard_normal(n).astype(np.float32) * 0.01
        gaps = [(int(4.0 * sr), int(4.4 * sr)), (int(8.6 * sr), int(9.0 * sr))]
        for a, b in gaps:
            wav[a:b] = 0.0

        spans = plan_silence_chunks(wav, win)
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
            assert e0 == s1  # contiguous
        assert all(e - s <= win for s, e in spans)
        # the first two cuts must land inside the silent gaps (a fixed
        # split would cut at exactly 5 s and 10 s — mid-speech)
        cuts = [e for _, e in spans[:-1]]
        assert gaps[0][0] <= cuts[0] <= gaps[0][1], cuts
        assert gaps[1][0] <= cuts[1] <= gaps[1][1], cuts

    def test_silence_chunks_short_audio_single_span(self):
        from fddm_asr_tpu.data.audio_io import plan_silence_chunks

        wav = np.zeros(1000, np.float32)
        assert plan_silence_chunks(wav, 16000) == [(0, 1000)]

    def test_silence_chunks_uniform_audio_progress(self):
        """No silence anywhere: cuts still advance and cover everything."""
        from fddm_asr_tpu.data.audio_io import plan_silence_chunks

        wav = np.ones(50 * 400, np.float32)
        spans = plan_silence_chunks(wav, 7 * 400)
        assert spans[0][0] == 0 and spans[-1][1] == len(wav)
        assert all(0 < e - s <= 7 * 400 for s, e in spans)

    def test_to_wav_failure_returns_minus_one(self, tmp_path):
        bad = str(tmp_path / "bad.mp3")
        open(bad, "wb").write(b"not audio")
        assert to_wav_16k_mono(bad, str(tmp_path / "o.wav")) == -1.0


class TestNormalizeText:
    CASES = [
        "我愛你(guá ài lí) 哈囉",
        "Hello, WORLD!  多  空白",
        "標點。符號、測試！",
        "（全形括號）保留嗎",
        123,
        "",
    ]

    def test_basic(self):
        assert normalize_text("我愛你(guá ài lí)") == "我愛你"
        assert normalize_text("ABC  def") == "abc def"
        assert normalize_text(123) == ""

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_parity_with_reference(self):
        # the reference preprocess module imports audio wheels absent here;
        # stub them — normalize_text touches none of them.  Load by path
        # under a unique module name (our repo has its own scripts/preprocess).
        import importlib.util
        import types

        stubbed = []
        for mod in ("librosa", "soundfile"):
            if mod not in sys.modules:
                sys.modules[mod] = types.ModuleType(mod)
                stubbed.append(mod)
        try:
            spec = importlib.util.spec_from_file_location(
                "_reference_preprocess",
                os.path.join(REFERENCE_ROOT, "scripts", "preprocess.py"),
            )
            ref_pre = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(ref_pre)
            ref_norm = ref_pre.normalize_text
        finally:
            # a bare ModuleType stub has __spec__=None and poisons
            # transformers' importlib availability probes in later tests
            for mod in stubbed:
                sys.modules.pop(mod, None)

        for case in self.CASES:
            assert normalize_text(case) == ref_norm(case), repr(case)


class _ToyTokenizer:
    def encode(self, text):
        return [ord(c) % 100 + 4 for c in text.replace(" ", "")]


class TestDataset:
    @pytest.fixture
    def manifest(self, tmp_path):
        items = []
        rng = np.random.default_rng(1)
        for i in range(7):
            wav_path = str(tmp_path / f"{i}.wav")
            save_wav(wav_path, rng.standard_normal(1600).astype(np.float32) * 0.1, 16000)
            items.append({
                "path": wav_path, "processed_path": wav_path,
                "text": f"句子 {i}", "sentence": f"句子 {i}",
                "duration": 0.1, "language": "zh-TW", "dataset": "toy",
                "split": "train", "audio_hash": None,
            })
        # one missing file -> filtered out
        items.append({"processed_path": str(tmp_path / "missing.wav"), "text": "x"})
        mpath = str(tmp_path / "train.json")
        json.dump(items, open(mpath, "w"))
        return mpath

    def test_dataset_and_batches(self, manifest):
        ds = ManifestDataset(
            manifest, _ToyTokenizer(), max_len=16, pad_id=3, bos_id=1, eos_id=2,
            max_audio_seconds=0.5,
        )
        assert len(ds) == 7
        item = ds[0]
        assert item["wave"].shape == (8000,)
        assert item["tokens"].shape == (16,)
        assert item["tokens"][0] == 1  # bos
        assert item["tokens"][item["token_length"] - 1] == 2  # eos
        assert item["tokens"][item["token_length"]] == 3  # pad

        batches = list(make_batches(ds, batch_size=3, shuffle=True, seed=0, drop_last=True))
        assert len(batches) == 2
        assert batches[0].wave.shape == (3, 8000)
        assert batches[0].tokens.dtype == np.int32

    def test_seeded_shuffle_deterministic(self, manifest):
        ds = ManifestDataset(manifest, _ToyTokenizer(), max_len=8, pad_id=0,
                             max_audio_seconds=0.1)
        a = [b.tokens.tolist() for b in make_batches(ds, 2, shuffle=True, seed=5)]
        b = [b.tokens.tolist() for b in make_batches(ds, 2, shuffle=True, seed=5)]
        c = [b.tokens.tolist() for b in make_batches(ds, 2, shuffle=True, seed=6)]
        assert a == b
        assert a != c

    def test_sharding_partitions(self, manifest):
        ds = ManifestDataset(manifest, _ToyTokenizer(), max_len=8, pad_id=0,
                             max_audio_seconds=0.1)
        got = []
        for host in range(2):
            for b in make_batches(ds, 1, shuffle=False, drop_last=False, shard=(host, 2)):
                got.append(tuple(b.tokens[0].tolist()))
        # exactly the 7 distinct examples, each covered once — the texts
        # tokenize injectively, so == 7 catches a duplicate+drop slicing bug
        # that >= 6 slack would mask
        assert len(got) == 7 and len(set(got)) == 7


def test_shipped_finetune_config_resolves():
    """configs/fddm_zhTW_finetune.yaml inherits the base config and wires
    the full fine-tuning recipe (remat'd scan, SpecAugment-not-dropout,
    frozen conv front-end, EMA, cosine schedule)."""
    from fddm_asr_tpu.pipeline import build_wavlm_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs", "fddm_zhTW_finetune.yaml"))
    enc = cfg.model.encoder
    assert enc.freeze is False
    assert enc.mask_time_prob > 0
    assert cfg.optim.ema_decay > 0
    assert cfg.optim.lr_schedule == "cosine"
    assert cfg.model.d_model == 768 and cfg.data.vocab_size == 8000  # base
    wc = build_wavlm_config(enc)
    assert wc.scan_layers and wc.remat_layers and wc.freeze_feature_extractor
    assert wc.attention_dropout == 0.0 and wc.fused_attention


def test_make_batches_abandoned_iterator_releases_producer():
    """Abandoning the generator early (max_steps_per_epoch pattern) must
    unblock the producer thread within its stop-poll interval — no leaked
    thread holding prefetched waveform batches."""
    import threading
    import time

    class _DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"wave": np.zeros(1600, np.float32),
                    "wave_length": np.int64(1600),
                    "tokens": np.zeros(8, np.int32),
                    "token_length": np.int64(8)}

    before = set(threading.enumerate())
    gen = make_batches(_DS(), batch_size=4, prefetch=2)
    next(gen)          # producer running, queue filling
    gen.close()        # abandon -> generator finally sets stop
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before
                  if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer threads still alive: {leaked}"


def test_make_batches_surfaces_worker_failure():
    """A collate failure mid-epoch (e.g. a WAV deleted after the init-time
    existence check) must raise in the CONSUMER, not silently truncate the
    epoch (regression: the producer's exception used to die in its thread
    and the None sentinel read as normal end-of-data — desyncing multi-host
    step counts)."""

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise IOError("wav vanished")
            return {"wave": np.zeros(160, np.float32),
                    "wave_length": np.int64(160),
                    "tokens": np.zeros(4, np.int32),
                    "token_length": np.int64(4)}

    got = 0
    with pytest.raises(RuntimeError, match="data pipeline worker failed"):
        for _ in make_batches(_DS(), batch_size=2, shuffle=False):
            got += 1
    assert got < 4  # the epoch did NOT complete silently
