# -*- coding: utf-8 -*-
"""MP3 (MPEG audio) decode via the system ``libmpg123`` — no ffmpeg.

The reference ingests raw Common Voice dumps, which ship MP3 clips, through
librosa -> audioread -> a system decoder (/root/reference/scripts/
preprocess.py:118-141).  This module is the same architectural choice made
explicit and dependency-light: a ctypes binding to the mpg123 decoder
library (present on this image as libmpg123.so.0; ffmpeg and librosa are
not), exposing one call that returns float32 PCM + sample rate.  The
feed-based API decodes from memory, so both file paths and already-read
bytes (e.g. an HTTP upload) work without temp files.

``encode_mp3`` is the matching ctypes binding to ``libmp3lame`` (also on
the image).  It exists so tests can synthesize real MP3 fixtures from
known waveforms and round-trip them through the decoder — and doubles as a
way to write compressed artifacts.  Both bindings degrade to an
ImportError-style RuntimeError naming the missing library, and
data/audio_io.py falls back to its ffmpeg path when mpg123 is absent.

Layer coverage: mpg123 decodes MPEG-1/2/2.5 Layers I-III — the full range
Common Voice clips appear in — with the project-standard output contract
(float32 in [-1, 1], channel-major for stereo).
"""
from __future__ import annotations

import ctypes
import ctypes.util
import glob
import os
from typing import Optional, Tuple, Union

import numpy as np

# ---------------------------------------------------------------- constants
_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_MPG123_NEED_MORE = -10
_ENC_FLOAT_32 = 0x200

_mpg123 = None
_lame = None


def _find_lib(stub: str, names) -> Optional[str]:
    found = ctypes.util.find_library(stub)
    if found:
        return found
    for pat in names:
        for d in ("/usr/lib/x86_64-linux-gnu", "/usr/lib", "/usr/local/lib"):
            hits = sorted(glob.glob(os.path.join(d, pat)))
            if hits:
                return hits[0]
    return None


def _load_mpg123():
    global _mpg123
    if _mpg123 is not None:
        return _mpg123
    path = _find_lib("mpg123", ("libmpg123.so*",))
    if path is None:
        raise RuntimeError(
            "libmpg123 not found — install mpg123 (or ffmpeg, which "
            "data/audio_io.py uses as a fallback) to decode MP3")
    lib = ctypes.CDLL(path)
    lib.mpg123_init()  # no-op on modern mpg123, required on old ones
    lib.mpg123_new.restype = ctypes.c_void_p
    lib.mpg123_new.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int)]
    lib.mpg123_delete.argtypes = [ctypes.c_void_p]
    lib.mpg123_open_feed.argtypes = [ctypes.c_void_p]
    lib.mpg123_close.argtypes = [ctypes.c_void_p]
    lib.mpg123_feed.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_size_t]
    lib.mpg123_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_size_t,
                                ctypes.POINTER(ctypes.c_size_t)]
    lib.mpg123_getformat.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_long),
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
    lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
    lib.mpg123_format.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                  ctypes.c_int, ctypes.c_int]
    lib.mpg123_plain_strerror.restype = ctypes.c_char_p
    lib.mpg123_plain_strerror.argtypes = [ctypes.c_int]
    _mpg123 = lib
    return lib


def mpg123_available() -> bool:
    try:
        _load_mpg123()
        return True
    except RuntimeError:
        return False


def decode_mp3(src: Union[str, bytes, os.PathLike],
               ) -> Tuple[np.ndarray, int]:
    """Decode an MP3 file path or raw MP3 bytes.

    Returns ``(data, sample_rate)`` with data float32 in [-1, 1]: shape
    [n] for mono, [channels, n] for stereo — the same contract as
    audio_io.load_wav so callers can treat both formats uniformly.
    """
    lib = _load_mpg123()
    if isinstance(src, (str, os.PathLike)):
        with open(src, "rb") as f:
            payload = f.read()
    else:
        payload = bytes(src)
    if not payload:
        raise ValueError("empty MP3 input")

    err = ctypes.c_int(0)
    h = lib.mpg123_new(None, ctypes.byref(err))
    if not h:
        raise RuntimeError(
            f"mpg123_new failed: "
            f"{lib.mpg123_plain_strerror(err.value).decode()}")
    try:
        if lib.mpg123_open_feed(h) != _MPG123_OK:
            raise RuntimeError("mpg123_open_feed failed")
        if lib.mpg123_feed(h, payload, len(payload)) != _MPG123_OK:
            raise RuntimeError("mpg123_feed failed")

        rate = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        done = ctypes.c_size_t(0)
        buf = (ctypes.c_ubyte * 65536)()
        chunks = []
        out_rate = None
        out_channels = None
        out_enc = None
        while True:
            ret = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
            if done.value:
                chunks.append(bytes(buf[: done.value]))
            if ret == _MPG123_NEW_FORMAT:
                lib.mpg123_getformat(h, ctypes.byref(rate),
                                     ctypes.byref(channels),
                                     ctypes.byref(enc))
                if out_rate is None:
                    out_rate = rate.value
                    out_channels = channels.value
                    out_enc = enc.value
                elif (rate.value, channels.value, enc.value) != (
                        out_rate, out_channels, out_enc):
                    # malformed concatenation changing format mid-stream:
                    # keep what decoded under the first format
                    break
                # NOTE: the library's negotiated output (signed 16-bit on
                # this build) is accepted as-is and converted below —
                # forcing ENC_FLOAT_32 via mpg123_format on the feed API
                # of libmpg123 0.47 produces corrupted output (half-length
                # NaN-laced buffers, measured in tests/test_mp3.py's
                # round-trip), while the native s16 path round-trips a
                # lame-encoded sine at corr > 0.9999999
            elif ret in (_MPG123_DONE, _MPG123_NEED_MORE):
                # NEED_MORE after the full feed == end of stream (tail
                # frame may be truncated; everything decodable is out)
                break
            elif ret != _MPG123_OK:
                raise RuntimeError(
                    "mpg123_read failed: "
                    f"{lib.mpg123_plain_strerror(ret).decode()}")
        if out_rate is None or not chunks:
            raise ValueError("no decodable MPEG audio frames in input")
        raw = b"".join(chunks)
        if out_enc & _ENC_FLOAT_32:
            data = np.frombuffer(raw, dtype=np.float32).astype(np.float32)
        else:  # ENC_SIGNED_16 — the default across mpg123 builds
            usable = len(raw) - len(raw) % (2 * out_channels)
            data = (np.frombuffer(raw[:usable], dtype="<i2")
                    .astype(np.float32) / 32768.0)
        if out_channels > 1:
            data = data.reshape(-1, out_channels).T
        return np.ascontiguousarray(data), int(out_rate)
    finally:
        lib.mpg123_close(h)
        lib.mpg123_delete(h)


# ------------------------------------------------------------------ encoder
def _load_lame():
    global _lame
    if _lame is not None:
        return _lame
    path = _find_lib("mp3lame", ("libmp3lame.so*",))
    if path is None:
        raise RuntimeError("libmp3lame not found — cannot encode MP3")
    lib = ctypes.CDLL(path)
    lib.lame_init.restype = ctypes.c_void_p
    for fn in ("lame_set_in_samplerate", "lame_set_out_samplerate",
               "lame_set_num_channels", "lame_set_brate", "lame_set_mode",
               "lame_set_quality", "lame_init_params"):
        getattr(lib, fn).argtypes = [ctypes.c_void_p] + (
            [ctypes.c_int] if fn != "lame_init_params" else [])
    lib.lame_encode_buffer.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_short),
        ctypes.POINTER(ctypes.c_short), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int]
    lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int]
    lib.lame_close.argtypes = [ctypes.c_void_p]
    _lame = lib
    return lib


def lame_available() -> bool:
    try:
        _load_lame()
        return True
    except RuntimeError:
        return False


def encode_mp3(data: np.ndarray, sample_rate: int,
               bitrate_kbps: int = 64) -> bytes:
    """Encode float32/float64 PCM in [-1, 1] (shape [n] mono or
    [channels, n]) to MP3 bytes via libmp3lame.  Test-fixture and
    artifact-writing helper — the framework's training data stays WAV."""
    lib = _load_lame()
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[None, :]
    if data.shape[0] > 2:
        raise ValueError(f"expected [n] or [channels<=2, n], got {data.shape}")
    channels, n = data.shape
    pcm = np.clip(data * 32767.0, -32768, 32767).astype(np.int16)
    gfp = ctypes.c_void_p(lib.lame_init())
    try:
        lib.lame_set_in_samplerate(gfp, int(sample_rate))
        # pin the output rate: at low bitrates lame otherwise resamples
        # internally (e.g. 44.1 kHz stereo @64 kbps comes out 24 kHz)
        lib.lame_set_out_samplerate(gfp, int(sample_rate))
        lib.lame_set_num_channels(gfp, channels)
        lib.lame_set_brate(gfp, int(bitrate_kbps))
        lib.lame_set_mode(gfp, 3 if channels == 1 else 1)  # MONO / JOINT
        lib.lame_set_quality(gfp, 2)
        if lib.lame_init_params(gfp) < 0:
            raise RuntimeError("lame_init_params failed (rate/bitrate "
                               "combination unsupported)")
        left = pcm[0].ctypes.data_as(ctypes.POINTER(ctypes.c_short))
        right = (pcm[1].ctypes.data_as(ctypes.POINTER(ctypes.c_short))
                 if channels == 2 else left)
        out = ctypes.create_string_buffer(int(1.25 * n + 7200))
        nb = lib.lame_encode_buffer(gfp, left, right, n, out, len(out))
        if nb < 0:
            raise RuntimeError(f"lame_encode_buffer failed ({nb})")
        tail = ctypes.create_string_buffer(7200)
        nt = lib.lame_encode_flush(gfp, tail, len(tail))
        return out.raw[:nb] + tail.raw[:max(nt, 0)]
    finally:
        lib.lame_close(gfp)
