# -*- coding: utf-8 -*-
"""Audio I/O without external audio wheels.

The reference leans on librosa/soundfile/torchaudio (train.py:134,
preprocess.py:118-141, inference.py:53-61); none of those are available here,
so WAV parsing is implemented over the stdlib `wave`/`struct` modules and
resampling over scipy's polyphase filter — the same algorithm family
(windowed-sinc polyphase) torchaudio's `resample` uses, with equivalent
quality for the 16 kHz ASR path.

Scope: PCM WAV (8/16/24/32-bit int, 32/64-bit float).  Compressed formats
(mp3 used by raw Common Voice dumps) require ffmpeg, which is absent in this
image; `load_audio` raises a clear error for them — preprocessing expects
dumps already converted to WAV, or an environment with ffmpeg on PATH (it is
probed and used when present).
"""
from __future__ import annotations

import math
import os
import shutil
import struct
import subprocess
import wave
from typing import Optional, Tuple

import numpy as np

__all__ = ["load_wav", "save_wav", "resample", "load_audio",
           "to_wav_16k_mono", "plan_silence_chunks"]


def _decode_pcm_int(raw: bytes, width: int, path: str) -> np.ndarray:
    if width == 2:
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if width == 4:
        return np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    if width == 1:
        return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if width == 3:
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            a[:, 0].astype(np.int32)
            | (a[:, 1].astype(np.int32) << 8)
            | (a[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        return ints.astype(np.float32) / float(1 << 23)
    raise ValueError(f"unsupported WAV sample width {width} in {path}")


def _load_wav_riff(path: str) -> Tuple[np.ndarray, int]:
    """Minimal RIFF parser for WAVs the stdlib `wave` module rejects —
    notably WAVE_FORMAT_IEEE_FLOAT (format tag 3: 32/64-bit float) and
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping a float or PCM subformat.
    stdlib wave raises 'unknown format: 3' before the sample-width dispatch
    can run, so float support needs the format tag read from the fmt chunk
    directly."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {path}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError(f"missing fmt/data chunk in {path}")
    tag, channels, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the SubFormat GUID's first two bytes are
        # the real format tag (KSDATAFORMAT_SUBTYPE_{PCM,IEEE_FLOAT})
        (tag,) = struct.unpack("<H", fmt[24:26])
    width = bits // 8
    frame = max(1, width * max(1, channels))
    data = data[: (len(data) // frame) * frame]
    if tag == 3:  # IEEE float
        if width == 4:
            samples = np.frombuffer(data, "<f4").astype(np.float32)
        elif width == 8:
            samples = np.frombuffer(data, "<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float WAV width {bits} in {path}")
    elif tag == 1:
        samples = _decode_pcm_int(data, width, path)
    else:
        raise ValueError(f"unsupported WAV format tag {tag} in {path}")
    if channels > 1:
        samples = samples.reshape(-1, channels).T  # [C, T]
    return samples, int(sr)


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV -> (float32 samples [C, T] squeezed to [T] if mono, sr)."""
    try:
        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            channels = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(n)
    except wave.Error:
        # stdlib wave only accepts PCM (and, on newer Pythons, extensible-
        # PCM); float and extensible-float WAVs land here
        return _load_wav_riff(path)
    data = _decode_pcm_int(raw, width, path)
    if channels > 1:
        data = data.reshape(-1, channels).T  # [C, T]
    return data, sr


def save_wav(path: str, samples: np.ndarray, sr: int) -> None:
    """Write float32 samples in [-1, 1] as 16-bit PCM WAV (soundfile PCM_16
    equivalence — reference preprocess.py:118-141 output format)."""
    samples = np.asarray(samples, np.float32)
    if samples.ndim == 2:  # [C, T] -> mono mixdown
        samples = samples.mean(axis=0)
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def resample(samples: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase windowed-sinc resampling (scipy.signal.resample_poly)."""
    if orig_sr == target_sr:
        return np.asarray(samples, np.float32)
    from scipy.signal import resample_poly

    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    return resample_poly(np.asarray(samples, np.float64), up, down, axis=-1).astype(
        np.float32
    )


def silence_cut(window: np.ndarray, win: int, search: int = 16000,
                frame: int = 400) -> int:
    """Cut offset (window-relative, in [frame, win]) for ONE window holding
    >= ``win`` samples: the center of the quietest ``frame``-sample (25 ms)
    RMS frame inside the trailing ``search`` samples (clamped to win/4 so
    short windows don't fragment).  This is the single-window decision both
    ``plan_silence_chunks`` (offline) and the serving ``StreamingSession``
    (incremental) make — sharing it is what keeps streaming commits
    byte-identical to the offline plan."""
    search = max(frame, min(search, win // 4))
    lo = max(frame, win - search)
    seg = np.asarray(window[lo:win], np.float32)
    nf = len(seg) // frame
    if nf >= 1:
        rms = np.sqrt(
            np.mean(seg[: nf * frame].reshape(nf, frame) ** 2, axis=1))
        cut = lo + int(np.argmin(rms)) * frame + frame // 2
    else:
        cut = win
    return max(frame, min(cut, win))  # forward progress, span <= win


def plan_silence_chunks(
    samples: np.ndarray,
    win: int,
    search: int = 16000,
    frame: int = 400,
) -> list:
    """Long-form chunk spans [(start, end)], each <= ``win`` samples, with
    every cut placed at the QUIETEST 25 ms frame inside the last ``search``
    samples of its window instead of the hard window edge.

    A fixed-boundary split can land mid-word; a non-autoregressive token
    decoder then transcribes two half-words with no cross-chunk context to
    repair them.  Cutting at the local energy minimum (a VAD-lite: pauses
    between words/sentences are near-silent) makes each chunk closed under
    natural speech units at zero model cost.  Chunks stay <= win, so the
    fixed [rows, win] batch shape — and therefore the compile cache — is
    unchanged; only the per-row lengths vary (already supported).

    The final span may be shorter than 400 samples; callers clamp lengths
    to one conv receptive field exactly as for fixed splits.
    """
    n = len(samples)
    if n <= win:
        return [(0, n)]
    bounds = [0]
    pos = 0
    while n - pos > win:
        cut = pos + silence_cut(samples[pos:pos + win], win, search, frame)
        bounds.append(cut)
        pos = cut
    bounds.append(n)
    return list(zip(bounds[:-1], bounds[1:]))


_FFMPEG = shutil.which("ffmpeg")


def load_audio(path: str, target_sr: Optional[int] = None, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Load WAV natively, MP3 via the in-process libmpg123 binding
    (data/mp3.py — covers the raw Common Voice dumps, no ffmpeg needed),
    anything else via ffmpeg when available."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        data, sr = load_wav(path)
    elif ext in (".mp3", ".mp2", ".mpga"):
        from fddm_asr_tpu.data.mp3 import decode_mp3, mpg123_available

        if mpg123_available():
            data, sr = decode_mp3(path)
        elif _FFMPEG:
            return _load_via_ffmpeg(path, target_sr, mono)
        else:
            raise RuntimeError(
                f"cannot decode {ext}: neither libmpg123 nor ffmpeg is "
                f"available; convert {path} to WAV first")
    elif _FFMPEG:
        return _load_via_ffmpeg(path, target_sr, mono)
    else:
        raise RuntimeError(
            f"cannot decode {ext} without ffmpeg; convert {path} to WAV first"
        )
    if mono and data.ndim == 2:
        data = data.mean(axis=0)
    if target_sr and sr != target_sr:
        data = resample(data, sr, target_sr)
        sr = target_sr
    return data, sr


def _load_via_ffmpeg(path: str, target_sr: Optional[int],
                     mono: bool) -> Tuple[np.ndarray, int]:
    out_sr = target_sr or 16000
    cmd = [
        _FFMPEG, "-v", "error", "-i", path, "-f", "f32le",
        "-ac", "1" if mono else "2", "-ar", str(out_sr), "-",
    ]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    data = np.frombuffer(raw, np.float32).copy()
    if not mono:
        # f32le is interleaved; return [C, T] like the WAV branch does
        data = data.reshape(-1, 2).T
    return data, out_sr


def to_wav_16k_mono(src: str, dst: str) -> float:
    """Convert any supported audio to 16 kHz mono PCM16 WAV; returns duration
    seconds or -1.0 on failure (reference preprocess.py:118-141 contract)."""
    try:
        data, sr = load_audio(src, target_sr=16000, mono=True)
        save_wav(dst, data, 16000)
        return float(len(data)) / 16000.0
    except Exception:
        return -1.0
