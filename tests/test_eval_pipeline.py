# -*- coding: utf-8 -*-
"""Pipeline-level eval-function tests on a tiny CPU configuration."""
import json
import os

import numpy as np
import pytest

import jax

from fddm_asr_tpu.config import Config
from fddm_asr_tpu.data.audio_io import save_wav
from fddm_asr_tpu.data.dataset import Batch, ManifestDataset, make_batches
from fddm_asr_tpu import eval as E
from fddm_asr_tpu.pipeline import FDDMPipeline


class _Tok:
    def encode(self, text):
        return [(ord(c) % 90) + 4 for c in text.replace(" ", "")]

    def decode(self, ids):
        return "".join(chr(0x4E00 + i) for i in ids)

    DecodeIds = decode


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("evalpipe")
    cfg = Config({
        "seed": 0,
        "data": {"vocab_size": 96, "pad_id": 0, "max_len": 12},
        "model": {
            "d_model": 32, "nhead": 4, "num_layers": 1, "dim_ff": 64,
            "dropout": 0.0,
            "encoder": {"wavlm_name": "tiny", "freeze": True, "proj": "linear",
                        "pooling": "none"},
            "projector": {"d_proj": 16},
        },
        "diffusion": {"T": 10, "beta_max": 0.2},
        "inference": {"T_infer": 4, "r": 2},
    })
    pipeline = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), seed=0)

    rng = np.random.default_rng(0)
    items = []
    for i in range(4):
        path = str(tmp / f"{i}.wav")
        save_wav(path, rng.standard_normal(1600).astype(np.float32) * 0.1, 16000)
        items.append({"processed_path": path, "text": f"句子{i}"})
    mpath = str(tmp / "m.json")
    json.dump(items, open(mpath, "w"))
    ds = ManifestDataset(mpath, _Tok(), max_len=12, pad_id=0, max_audio_seconds=0.1)
    return cfg, pipeline, ds


def test_evaluate_validation_loss(tiny):
    cfg, pipeline, ds = tiny
    loss = E.evaluate_validation_loss(pipeline, make_batches(ds, 2, drop_last=False))
    assert np.isfinite(loss) and loss >= 0


def test_evaluate_cer_with_jumpy_sampling(tiny):
    cfg, pipeline, ds = tiny
    cer = E.evaluate_cer_with_jumpy_sampling(
        pipeline, make_batches(ds, 2, drop_last=False), cfg
    )
    # an UNTRAINED model cannot transcribe: CER must be strictly positive
    # (an always-0 wiring bug — e.g. decoding the refs as the hypothesis —
    # would satisfy a finite-and-nonnegative check everywhere)
    assert np.isfinite(cer) and cer > 0


def test_evaluate_cer_hyp_vs_ref_wiring(tiny):
    """Pin exact CER values through the evaluator by controlling what the
    sampler returns: the refs themselves -> 0.0; all-pad -> 1.0 (every
    reference char deleted).  Catches hyp/ref swaps and decode-side
    normalization bugs that the statistical tests cannot."""
    cfg, pipeline, ds = tiny
    batches = list(make_batches(ds, 2, drop_last=False, shuffle=False))

    class _Echo:
        """pipeline facade whose sample() returns a queued prediction."""

        def __init__(self, preds):
            self._preds = list(preds)

        def __getattr__(self, name):
            return getattr(pipeline, name)

        def _sample_raw(self, rng, c, seq_len, c_mask=None, **sc):
            # the evaluator's device-sampling seam (it pulls ids only;
            # p_x0 stays on device in production)
            x = self._preds.pop(0)
            return x, None

    echo = _Echo([b.tokens for b in batches])
    cer = E.evaluate_cer_with_full_sampling(echo, batches, cfg)
    assert cer == 0.0

    pad = pipeline.pad_id
    echo_pad = _Echo([np.full_like(b.tokens, pad) for b in batches])
    cer_pad = E.evaluate_cer_with_full_sampling(echo_pad, batches, cfg)
    assert cer_pad == 1.0


def test_evaluate_wer(tiny):
    cfg, pipeline, ds = tiny
    wer = E.evaluate_wer_with_jumpy_sampling(
        pipeline, make_batches(ds, 2, drop_last=False), cfg
    )
    assert np.isfinite(wer) and wer >= 0


@pytest.mark.parametrize("voting", ["first", "majority", "logprob"])
def test_evaluate_multi_sample(tiny, voting):
    cfg, pipeline, ds = tiny
    cer = E.evaluate_cer_with_multi_sample(
        pipeline, make_batches(ds, 2, drop_last=False), cfg,
        num_samples=2, voting=voting,
    )
    assert np.isfinite(cer) and cer >= 0


def test_logprob_voting_ignores_post_eos_tail():
    """Best-of-N scoring must cover only the decoded span (pre-eos,
    non-pad/bos), like ids_to_text and _utterance_confidence: a sample
    whose post-eos garbage the model scores confidently must not beat a
    sample with a better decoded span (regression: sum over all L)."""

    class _P:
        special_ids = {"eos_id": 2, "bos_id": 1}
        pad_id = 0

    # sample A: strong decoded span [5, 6], weak tail after eos
    ids_a = np.asarray([5, 6, 2, 9, 9, 9])
    p_a = np.asarray([0.9, 0.9, 0.5, 1e-6, 1e-6, 1e-6])
    # sample B: weak decoded span, extremely confident post-eos tail
    ids_b = np.asarray([7, 8, 2, 4, 4, 4])
    p_b = np.asarray([0.2, 0.2, 0.5, 1.0, 1.0, 1.0])

    score_a = E._decoded_span_logprob_mean(ids_a, p_a, _P())
    score_b = E._decoded_span_logprob_mean(ids_b, p_b, _P())
    assert score_a > score_b  # tail confidence must not flip the vote
    np.testing.assert_allclose(score_a, np.log([0.9, 0.9]).mean(), rtol=1e-6)

    # all-pad decode scores -inf so any real content wins
    ids_pad = np.zeros(6, np.int64)
    assert E._decoded_span_logprob_mean(ids_pad, p_a, _P()) == -np.inf


def test_transcribe_api(tiny):
    cfg, pipeline, ds = tiny
    wave = np.random.default_rng(1).standard_normal((2, 1600)).astype(np.float32)
    texts = pipeline.transcribe(wave, seq_len=6, T_infer=4, r=2, greedy=True)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)


def test_pipeline_accepts_wire_dtypes(tiny):
    """Live pipeline input robustness: int16 (pcm16) and uint8 (mulaw8)
    waves expand INSIDE the encode program (data/wire.py) — transcripts
    must equal feeding the expanded float wave directly.  This is the live
    serving upload-bound fast path (serve.py --wire-dtype)."""
    import jax

    from fddm_asr_tpu.data.wire import mulaw_decode_np, mulaw_encode

    _, pipeline, _ = tiny
    rng = np.random.default_rng(3)
    wave16 = np.clip(np.round(
        rng.standard_normal((2, 1600)) * 0.1 * 32768), -32768, 32767
    ).astype(np.int16)
    f32 = wave16.astype(np.float32) / 32768.0
    kw = dict(seq_len=8, T_infer=4, r=2, greedy=True)

    a = pipeline.transcribe_with_ids(f32, rng=jax.random.key(5), **kw)
    b = pipeline.transcribe_with_ids(wave16, rng=jax.random.key(5), **kw)
    assert [x[1] for x in a] == [x[1] for x in b]

    u8 = mulaw_encode(f32)
    c = pipeline.transcribe_with_ids(mulaw_decode_np(u8),
                                     rng=jax.random.key(5), **kw)
    d = pipeline.transcribe_with_ids(u8, rng=jax.random.key(5), **kw)
    assert [x[1] for x in c] == [x[1] for x in d]
