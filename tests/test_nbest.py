# -*- coding: utf-8 -*-
"""Best-of-N candidate decoding (pipeline.sample_nbest / transcribe_nbest /
transcribe_with_ids(num_candidates=N) and the --num-candidates CLI/serving
surfaces).

The reference's multi-sample evaluation (evaluate.py:344-452) draws N
stochastic samples but stubs candidate voting to "take sample 0"; this is
the serving-side productionization: N trajectories per utterance in ONE
device call (candidates folded into the batch dim), highest decoded-span
confidence wins.
"""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

SAMPLING = dict(T_infer=6, r=3, greedy=True, posterior_mode="map",
                sampling_mode="exact")
SEQ_LEN = 10
N_SAMP = 4800  # 0.3 s


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from scripts.make_synth_data import main as make

    out = str(tmp_path_factory.mktemp("nbest_synth"))
    make(["--out", out, "--n", "4", "--seconds", "0.3"])
    return out


@pytest.fixture(scope="module")
def pipeline(synth):
    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.pipeline import FDDMPipeline

    return FDDMPipeline.from_config(load_config(f"{synth}/config.yaml"))


def _wave(rows, samples=N_SAMP, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((rows, samples)).astype(np.float32)


def test_sample_nbest_is_batchfolded_sampling(pipeline):
    """sample_nbest == pipeline.sample on a manually repeat()-ed condition
    at the same rng: candidates are plain extra batch rows, grouped
    [u0c0, u0c1, ..., u1c0, ...]."""
    import jax
    import jax.numpy as jnp

    wave = _wave(2, seed=1)
    c, c_mask = pipeline.encode_waveform(wave)
    rng = jax.random.key(11)
    ids_n, p_n = pipeline.sample_nbest(rng, c, SEQ_LEN, 3, c_mask=c_mask,
                                       **SAMPLING)
    assert ids_n.shape[:2] == (2, 3) and p_n.shape[:2] == (2, 3)
    ids_flat, p_flat = pipeline.sample(
        rng, jnp.repeat(c, 3, axis=0), seq_len=SEQ_LEN,
        c_mask=None if c_mask is None else jnp.repeat(c_mask, 3, axis=0),
        **SAMPLING)
    np.testing.assert_array_equal(ids_n.reshape(6, -1), ids_flat)
    np.testing.assert_allclose(p_n.reshape(6, SEQ_LEN, -1), p_flat)
    # candidates within a group must actually differ (x_T is drawn per
    # padded row) — otherwise best-of-N silently degenerates to best-of-1
    assert any(
        not np.array_equal(ids_n[i, 0], ids_n[i, j])
        for i in range(2) for j in range(1, 3)
    )


def test_transcribe_nbest_sorted_and_top1_consistent(pipeline):
    import jax

    wave = _wave(2, seed=2)
    nbest = pipeline.transcribe_nbest(
        wave, seq_len=SEQ_LEN, rng=jax.random.key(3), num_candidates=4,
        **SAMPLING)
    assert len(nbest) == 2
    for cands in nbest:
        assert len(cands) == 4
        confs = [c[2] for c in cands]
        assert confs == sorted(confs, reverse=True)
        for text, ids, conf in cands:
            assert isinstance(text, str) and isinstance(ids, list)
            assert 0.0 <= conf <= 1.0

    # transcribe_with_ids(num_candidates=4) is exactly the top-1 of nbest
    top = pipeline.transcribe_with_ids(
        wave, seq_len=SEQ_LEN, rng=jax.random.key(3), with_confidence=True,
        num_candidates=4, **SAMPLING)
    assert [t for t in top] == [c[0] for c in nbest]

    # without confidence the rows are (text, ids) pairs
    top2 = pipeline.transcribe_with_ids(
        wave, seq_len=SEQ_LEN, rng=jax.random.key(3), num_candidates=4,
        **SAMPLING)
    assert top2 == [c[0][:2] for c in nbest]


def test_num_candidates_validation(pipeline):
    import jax

    wave = _wave(1)
    c, _ = pipeline.encode_waveform(wave)
    with pytest.raises(ValueError, match="num_candidates"):
        pipeline.sample_nbest(jax.random.key(0), c, SEQ_LEN, 0, **SAMPLING)


def test_inference_cli_num_candidates(synth, pipeline, tmp_path):
    """--num-candidates on the batch-CSV CLI: runs end-to-end and the
    result rows carry confidence when --confidence is passed."""
    import csv

    import inference as infer_cli
    from fddm_asr_tpu import checkpoint as C

    ckpt = str(tmp_path / "r.pt")
    # random-init decoder export so the CLI has a checkpoint to load
    dummy = np.zeros((1, 4, pipeline.cfg.model.d_model), np.float32)
    from fddm_asr_tpu.models.projection import (
        SpeechProjector, TextEmbedding, TextProjector)
    import jax
    import jax.numpy as jnp

    d_proj = pipeline.cfg.model.projector.get("d_proj", 256)
    r1, r2, r3 = jax.random.split(jax.random.key(0), 3)
    sp = SpeechProjector(d_proj=d_proj).init(r1, jnp.asarray(dummy))
    te = TextEmbedding(d_out=d_proj, mode="logits").init(
        r2, jnp.zeros((1, 4, pipeline.cfg.data.vocab_size)))
    tp = TextProjector(d_proj=d_proj).init(r3, jnp.zeros((1, 4, d_proj)))
    C.export_reference_ckpt(
        ckpt, pipeline.decoder_params["params"], sp["params"], te["params"],
        tp["params"], epoch=0, step=0, config=pipeline.cfg.to_dict())

    man = json.load(open(f"{synth}/data/processed/test.json"))
    csv_path = str(tmp_path / "batch.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path"])
        w.writeheader()
        for rec in man[:2]:
            w.writerow({"path": rec["processed_path"]})
    out_json = str(tmp_path / "out.json")
    rc = infer_cli.main([
        "--csv", csv_path, "--ckpt", ckpt,
        "--main-config", f"{synth}/config.yaml",
        "--diffusion-config", f"{synth}/config.yaml",
        "--tokenizer", pipeline.cfg.data.tokenizer_path,
        "--T-infer", "6", "--r", "3", "--greedy", "--seq-len", "10",
        "--num-candidates", "2", "--confidence",
        "--out-json", out_json,
    ])
    assert rc in (0, None)
    rows = json.load(open(out_json))
    assert len(rows) == 2
    for row in rows:
        assert "error" not in row
        assert isinstance(row["text"], str)
        assert 0.0 <= row["confidence"] <= 1.0


def test_model_dtype_knob(synth):
    """model.dtype: bfloat16 flips the pipeline's COMPUTE dtype on every
    inference surface (from_config resolves it; parity default stays f32)
    and actually changes the numerics — a silent no-op cannot pass."""
    import jax.numpy as jnp

    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.pipeline import FDDMPipeline

    cfg = load_config(f"{synth}/config.yaml")
    p32 = FDDMPipeline.from_config(cfg)
    assert p32.dtype == jnp.float32  # unset -> parity default
    pbf = FDDMPipeline.from_config(cfg.updated({"model": {"dtype": "bfloat16"}}))
    assert pbf.dtype == jnp.bfloat16
    # explicit arg wins over the config
    pex = FDDMPipeline.from_config(
        cfg.updated({"model": {"dtype": "bfloat16"}}), dtype=jnp.float32)
    assert pex.dtype == jnp.float32

    wave = _wave(1, seed=4)
    c32, _ = p32.encode_waveform(wave)
    cbf, _ = pbf.encode_waveform(wave)
    assert cbf.dtype == jnp.bfloat16 and c32.dtype == jnp.float32
    assert not np.allclose(np.asarray(c32), np.asarray(cbf, np.float32),
                           atol=1e-7)
    # bf16 features stay close to f32 (same weights, lower precision)
    rel = (np.linalg.norm(np.asarray(c32) - np.asarray(cbf, np.float32))
           / np.linalg.norm(np.asarray(c32)))
    assert rel < 0.1, rel


def test_batch_confidence_device_matches_numpy(pipeline):
    """batch_confidence_device (the on-device [B] reduction serving uses —
    p_x0 never crosses to host) must match the numpy utterance_confidence
    row-for-row, including empty decoded spans."""
    import jax

    from fddm_asr_tpu.eval import batch_confidence_device, utterance_confidence

    pad = pipeline.pad_id
    eos = pipeline.special_ids.get("eos_id")
    bos = pipeline.special_ids.get("bos_id")
    K = pipeline.cfg.data.vocab_size
    rng = np.random.default_rng(0)
    L = 12
    ids = rng.integers(0, K, size=(6, L)).astype(np.int32)
    ids[1, 0] = eos            # eos first -> empty span -> 0.0
    ids[2, :] = pad            # all pad -> 0.0
    ids[3, 4] = eos            # mid-sequence eos
    if bos is not None:
        ids[4, 0] = bos        # bos excluded from the span
    p = rng.random((6, L, K)).astype(np.float32)
    p /= p.sum(-1, keepdims=True)

    dev = np.asarray(batch_confidence_device(ids, p, pad, pipeline.special_ids))
    for i in range(ids.shape[0]):
        ref = utterance_confidence(ids[i], p[i], pad, pipeline.special_ids)
        assert abs(float(dev[i]) - ref) < 1e-6, (i, float(dev[i]), ref)
    assert dev[1] == 0.0 and dev[2] == 0.0

    # and the real pipeline agrees between transcribe_with_ids (device
    # reduction) and the per-row numpy helper
    wave = _wave(2, seed=6)
    got = pipeline.transcribe_with_ids(
        wave, seq_len=SEQ_LEN, rng=jax.random.key(5), with_confidence=True,
        **SAMPLING)
    c, c_mask = pipeline.encode_waveform(wave)
    ids2, p2 = pipeline.sample(jax.random.key(5), c, seq_len=SEQ_LEN,
                               c_mask=c_mask, **SAMPLING)
    for i, (_t, _ids, conf) in enumerate(got):
        ref = utterance_confidence(ids2[i], p2[i], pad, pipeline.special_ids)
        assert abs(conf - ref) < 1e-6
