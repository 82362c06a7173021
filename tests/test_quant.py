# -*- coding: utf-8 -*-
"""Int8 dynamic-quantized dense path (fddm_asr_tpu/ops/quant.py).

Verifies quantization error bounds, checkpoint interchangeability with
nn.Dense (identical parameter layout), and that the quantized WavLM
encoder tracks the full-precision one closely enough for the frozen
acoustic-condition role.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from fddm_asr_tpu.ops.quant import (
    Int8Dense,
    int8_matmul,
    int8_matmul_fused,
    quantize_cols_int8,
    quantize_rows_int8,
)


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


class TestQuantPrimitives:
    def test_row_quant_roundtrip(self):
        x = jax.random.normal(jax.random.key(0), (64, 128), jnp.float32) * 3.0
        xq, s = quantize_rows_int8(x)
        assert xq.dtype == jnp.int8 and s.shape == (64, 1)
        # per-row symmetric quant: reconstruction error <= scale/2 per element
        err = np.abs(np.asarray(xq, np.float32) * np.asarray(s) - np.asarray(x))
        assert np.all(err <= np.asarray(s) * 0.5 + 1e-6)

    def test_col_quant_uses_full_range(self):
        w = jax.random.normal(jax.random.key(1), (32, 16), jnp.float32)
        wq, s = quantize_cols_int8(w)
        assert s.shape == (1, 16)
        # each column's max magnitude maps to +-127
        assert np.all(np.max(np.abs(np.asarray(wq, np.int32)), axis=0) == 127)

    def test_int8_matmul_close_to_f32(self):
        r1, r2 = jax.random.split(jax.random.key(2))
        x = jax.random.normal(r1, (256, 384), jnp.float32)
        w = jax.random.normal(r2, (384, 512), jnp.float32) * 0.05
        y_ref = x @ w
        y = int8_matmul(x, w, out_dtype=jnp.float32)
        assert _rel_l2(y, y_ref) < 0.015  # ~1% typical for dynamic int8

    def test_int8_matmul_bias_and_batch_dims(self):
        r1, r2, r3 = jax.random.split(jax.random.key(3), 3)
        x = jax.random.normal(r1, (4, 16, 24), jnp.bfloat16)
        w = jax.random.normal(r2, (24, 8), jnp.float32)
        b = jax.random.normal(r3, (8,), jnp.float32)
        y = int8_matmul(x, w, b, out_dtype=jnp.float32)
        y_ref = x.astype(jnp.float32) @ w + b
        assert y.shape == (4, 16, 8)
        assert _rel_l2(y, y_ref) < 0.02


class TestFusedKernel:
    """int8_matmul_fused must reproduce the XLA path's numerics exactly:
    same quantized integers, same f32 epilogue — only the scheduling
    (VMEM-resident quantization) differs."""

    def test_matches_unfused_exactly(self):
        r1, r2, r3 = jax.random.split(jax.random.key(10), 3)
        x = jax.random.normal(r1, (96, 128), jnp.float32)
        w = jax.random.normal(r2, (128, 256), jnp.float32) * 0.05
        b = jax.random.normal(r3, (256,), jnp.float32)
        y_ref = int8_matmul(x, w, b, out_dtype=jnp.float32)
        y = int8_matmul_fused(x, w, b, out_dtype=jnp.float32,
                              block_m=32, block_n=128)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)

    def test_padded_edges_and_no_bias(self):
        # rows/dout not multiples of the block sizes exercise the pad+slice path
        r1, r2 = jax.random.split(jax.random.key(11))
        x = jax.random.normal(r1, (3, 17, 64), jnp.bfloat16)
        w = jax.random.normal(r2, (64, 136), jnp.float32)
        y_ref = int8_matmul(x, w, out_dtype=jnp.float32)
        y = int8_matmul_fused(x, w, out_dtype=jnp.float32,
                              block_m=32, block_n=128)
        assert y.shape == (3, 17, 136)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)

    def test_wavlm_fused_matches_int8(self):
        import dataclasses

        from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

        base = dataclasses.replace(
            WavLMConfig.tiny_for_tests(), quant_dense="int8"
        )
        fused = dataclasses.replace(base, quant_dense="int8_fused")
        wave = jax.random.normal(jax.random.key(12), (2, 3200), jnp.float32) * 0.1
        m_a, m_b = WavLMModel(base), WavLMModel(fused)
        params = m_a.init(jax.random.key(13), wave)
        y_a = m_a.apply(params, wave, deterministic=True)
        y_b = m_b.apply(params, wave, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(y_a, np.float32), np.asarray(y_b, np.float32),
            rtol=2e-5, atol=2e-5,
        )


class TestInt8Dense:
    def test_param_layout_matches_nn_dense(self):
        x = jnp.zeros((2, 8, 24))
        pq = Int8Dense(16).init(jax.random.key(0), x)
        pd = nn.Dense(16).init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pd)
        for a, b in zip(jax.tree_util.tree_leaves(pq), jax.tree_util.tree_leaves(pd)):
            assert a.shape == b.shape and a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_same_params_close_output(self):
        x = jax.random.normal(jax.random.key(4), (3, 10, 24), jnp.float32)
        params = nn.Dense(16).init(jax.random.key(5), x)
        y_ref = nn.Dense(16).apply(params, x)
        y = Int8Dense(16, dtype=jnp.float32).apply(params, x)
        assert _rel_l2(y, y_ref) < 0.02


class TestQuantizedWavLM:
    @pytest.mark.parametrize("scan_layers", [False, True])
    def test_encoder_tracks_full_precision(self, scan_layers):
        import dataclasses

        from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

        base = dataclasses.replace(
            WavLMConfig.tiny_for_tests(), scan_layers=scan_layers
        )
        quant = dataclasses.replace(base, quant_dense="int8")
        wave = jax.random.normal(jax.random.key(6), (2, 3200), jnp.float32) * 0.1

        m_ref = WavLMModel(base)
        m_q = WavLMModel(quant)
        params = m_ref.init(jax.random.key(7), wave)
        # identical parameter trees: quantization happens on the fly
        params_q = m_q.init(jax.random.key(7), wave)
        assert (
            jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_q)
        )

        y_ref = m_ref.apply(params, wave, deterministic=True)
        y_q = m_q.apply(params, wave, deterministic=True)
        assert y_q.shape == y_ref.shape
        err = _rel_l2(y_q, y_ref)
        assert err < 0.05, f"quantized encoder drifted: rel L2 {err:.4f}"
        # ...but NOT identical: int8 rounding must leave a measurable trace,
        # or the quant_dense flag silently stopped dispatching to Int8Dense
        # (a closeness-only assertion is satisfied by a no-op regression)
        assert err > 1e-6, "int8 output identical to fp: flag is a no-op"
        # direction preserved (the decoder consumes c through cross-attention)
        a = np.asarray(y_ref, np.float64).ravel()
        b = np.asarray(y_q, np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.995


def test_training_with_int8_encoder(tmp_path):
    """Training with the quantized frozen encoder runs end-to-end: the int8
    path is inference-only math (no grads flow through the encoder), so it
    is equally valid under the training step; loss must stay finite and
    checkpoints must materialize."""
    import io
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.make_synth_data import main as make

    out = str(tmp_path / "synth")
    make(["--out", out, "--n", "4", "--seconds", "0.5"])
    cfg_path = os.path.join(out, "config.yaml")
    cfg_text = open(cfg_path).read()
    patched = cfg_text.replace(
        "    wavlm_name: tiny",
        "    wavlm_name: tiny\n    wavlm_config:\n      quant_dense: int8",
    )
    # a silent-no-op str.replace here would run the test in pure fp
    assert patched != cfg_text, "synth config template changed; patch missed"
    open(cfg_path, "w").write(patched)

    # and the YAML -> WavLMConfig plumbing must actually see the flag
    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.pipeline import build_wavlm_config

    assert build_wavlm_config(
        load_config(cfg_path).model.encoder).quant_dense == "int8"

    import train as train_cli

    train_cli.main([
        "--config", cfg_path, "--device", "cpu", "--mesh", "data=4,model=2",
        "--max-steps-per-epoch", "2", "--no-pt-export",
    ])
    assert os.path.isdir(os.path.join(out, "ckpts", "ep001.orbax"))


class TestQuantizedDecoder:
    def test_decoder_int8_param_layout_and_logits(self):
        """quant_dense=int8 shares the exact parameter tree with the fp
        decoder (checkpoint compatibility) and tracks its logits closely."""
        from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder

        kw = dict(vocab_size=64, d_model=32, nhead=4, num_layers=2,
                  dim_ff=64, dropout=0.0, pad_id=0)
        dec_fp = DenoisingTransformerDecoder(**kw)
        dec_q = DenoisingTransformerDecoder(**kw, quant_dense="int8")
        xt = jnp.array([[5, 6, 7, 0, 0, 0, 1, 2]], jnp.int32)
        t = jnp.array([3], jnp.int32)
        cond = jax.random.normal(jax.random.key(20), (1, 10, 32))
        params = dec_fp.init(jax.random.key(21), xt, t, cond)
        params_q = dec_q.init(jax.random.key(21), xt, t, cond)
        assert (
            jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_q)
        )
        y_fp = dec_fp.apply(params, xt, t, cond, deterministic=True)
        y_q = dec_q.apply(params, xt, t, cond, deterministic=True)
        assert y_q.shape == y_fp.shape
        err = _rel_l2(y_q, y_fp)
        assert err < 0.05
        assert err > 1e-6, "int8 logits identical to fp: flag is a no-op"
        # argmax tokens (what sampling consumes) should essentially agree
        agree = float(np.mean(np.argmax(np.asarray(y_q), -1)
                              == np.argmax(np.asarray(y_fp), -1)))
        assert agree >= 0.8, agree

    def test_scan_blocks_variant(self):
        from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder

        kw = dict(vocab_size=64, d_model=32, nhead=4, num_layers=2,
                  dim_ff=64, dropout=0.0, pad_id=0, scan_blocks=True)
        dec = DenoisingTransformerDecoder(**kw, quant_dense="int8")
        xt = jnp.array([[5, 6, 7, 1]], jnp.int32)
        cond = jax.random.normal(jax.random.key(22), (1, 6, 32))
        params = dec.init(jax.random.key(23), xt, jnp.array([2]), cond)
        y = dec.apply(params, xt, jnp.array([2]), cond, deterministic=True)
        assert np.isfinite(np.asarray(y)).all()
