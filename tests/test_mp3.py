# -*- coding: utf-8 -*-
"""MP3 ingestion without ffmpeg (fddm_asr_tpu/data/mp3.py): libmpg123
decode + libmp3lame fixture encoding, the load_audio wiring, and the
preprocess L0 pipeline over an authentic-format (MP3-clips) Common Voice
dump — the reference capability that previously required ffmpeg
(/root/reference/scripts/preprocess.py:118-141 via librosa/audioread).
"""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from fddm_asr_tpu.data.mp3 import (  # noqa: E402
    decode_mp3, encode_mp3, lame_available, mpg123_available,
)

needs_codecs = pytest.mark.skipif(
    not (mpg123_available() and lame_available()),
    reason="system libmpg123/libmp3lame not present")


def _sine(sr, seconds=0.5, hz=440.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _aligned_corr(decoded, src, search=5000, n=4000):
    """Correlation after sliding off the codec's encoder delay."""
    d = int(np.argmax(np.correlate(decoded[:search], src[:1000], "valid")))
    n = min(n, len(src) - 1000, len(decoded) - d)
    return float(np.corrcoef(decoded[d:d + n], src[:n])[0, 1])


@needs_codecs
def test_roundtrip_mono_16k():
    src = _sine(16000)
    blob = encode_mp3(src, 16000, 64)
    assert blob[:2][0] == 0xFF  # MPEG sync byte — it's a real MP3 stream
    out, sr = decode_mp3(blob)
    assert sr == 16000 and out.ndim == 1 and out.dtype == np.float32
    # decoded stream covers the full input (plus codec delay padding)
    assert len(out) >= len(src)
    assert _aligned_corr(out, src) > 0.999


@needs_codecs
def test_roundtrip_stereo_and_rates():
    # the rates Common Voice clips actually come in (MPEG-1 and MPEG-2)
    for sr, ch, kbps in [(44100, 2, 128), (32000, 2, 96), (22050, 1, 64),
                         (48000, 1, 128)]:
        t = np.arange(int(sr * 0.3)) / sr
        src = np.stack([0.5 * np.sin(2 * np.pi * 300 * t),
                        0.4 * np.sin(2 * np.pi * 700 * t)])[:ch]
        src = src.astype(np.float32)
        out, r = decode_mp3(encode_mp3(src if ch == 2 else src[0], sr, kbps))
        assert r == sr, f"rate not preserved at {sr}"
        out2 = np.atleast_2d(out)
        assert out2.shape[0] == ch  # [n] mono / [C, n] stereo contract
        assert _aligned_corr(out2[0], src[0]) > 0.999, (sr, ch)


@needs_codecs
def test_bytes_and_path_inputs_identical(tmp_path):
    blob = encode_mp3(_sine(16000), 16000, 64)
    p = tmp_path / "x.mp3"
    p.write_bytes(blob)
    a, ra = decode_mp3(blob)
    b, rb = decode_mp3(str(p))
    assert ra == rb and np.array_equal(a, b)
    with pytest.raises(ValueError):
        decode_mp3(b"")
    with pytest.raises(ValueError):
        decode_mp3(b"\x00" * 4096)  # no MPEG frames at all


@needs_codecs
def test_load_audio_mp3_resamples_and_downmixes(tmp_path):
    from fddm_asr_tpu.data.audio_io import load_audio

    sr = 44100
    t = np.arange(int(sr * 0.4)) / sr
    src = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                    0.5 * np.sin(2 * np.pi * 440 * t)]).astype(np.float32)
    p = tmp_path / "clip.mp3"
    p.write_bytes(encode_mp3(src, sr, 128))
    wave, out_sr = load_audio(str(p), target_sr=16000, mono=True)
    assert out_sr == 16000 and wave.ndim == 1
    # 0.4 s of audio survives the decode+resample within codec padding
    assert abs(len(wave) / 16000 - 0.4) < 0.1
    ref = _sine(16000, 0.4, 440.0)
    assert _aligned_corr(wave, ref) > 0.99


@needs_codecs
def test_preprocess_runs_on_mp3_common_voice_dump(tmp_path, monkeypatch):
    """The L0 pipeline end-to-end on MP3 clips: preprocess converts every
    valid clip to 16 kHz mono WAV and writes the manifest — no ffmpeg."""
    import preprocess

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    clips = tmp_path / "data/raw/cv-v1/zh-TW/clips"
    clips.mkdir(parents=True)
    rows = ["path\tsentence"]
    sentences = ["我們可以交流", "台灣的高速公路"]
    for i, s in enumerate(sentences):
        wave = rng.standard_normal(int(32000 * 0.6)).astype(np.float32) * 0.1
        (clips / f"c{i}.mp3").write_bytes(encode_mp3(wave, 32000, 96))
        rows.append(f"c{i}.mp3\t{s}")
    (clips.parent / "train.tsv").write_text("\n".join(rows))

    preprocess.main(["--auto_merge", "--splits", "train"])

    entries = json.load(open(tmp_path / "data/processed/train.json",
                             encoding="utf-8"))
    assert len(entries) == len(sentences)
    from fddm_asr_tpu.data.audio_io import load_wav

    for e in entries:
        data, sr = load_wav(e["processed_path"])
        assert sr == 16000 and len(data) > 8000  # ~0.6 s resampled
        assert 0.4 < e["duration"] < 0.8


def test_real_fixture_decodes_with_plausible_audio():
    """An on-disk third-party MP3 (pygame's example clip, MPEG-2.5 11 kHz
    mono) decodes to finite audio of the right duration; when the pygame
    oracle can decode it too, durations must agree."""
    fixture = ("/opt/venv/lib/python3.12/site-packages/pygame/examples/"
               "data/house_lo.mp3")
    if not (mpg123_available() and os.path.exists(fixture)):
        pytest.skip("fixture or libmpg123 missing")
    out, sr = decode_mp3(fixture)
    assert np.isfinite(out).all() and out.std() > 0.01
    dur = out.shape[-1] / sr
    assert 1.0 < dur < 60.0
    try:
        os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
        import pygame

        pygame.mixer.init(frequency=44100)
        arr = pygame.sndarray.array(pygame.mixer.Sound(fixture))
        oracle_dur = arr.shape[0] / 44100.0
        pygame.mixer.quit()
    except Exception:
        pytest.skip("pygame oracle unavailable")
    assert abs(dur - oracle_dur) / oracle_dur < 0.02
