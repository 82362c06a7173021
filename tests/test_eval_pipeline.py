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
    assert np.isfinite(cer) and cer >= 0


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


def test_transcribe_api(tiny):
    cfg, pipeline, ds = tiny
    wave = np.random.default_rng(1).standard_normal((2, 1600)).astype(np.float32)
    texts = pipeline.transcribe(wave, seq_len=6, T_infer=4, r=2, greedy=True)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
