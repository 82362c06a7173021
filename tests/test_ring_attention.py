# -*- coding: utf-8 -*-
"""Sequence-parallel ring attention vs the single-device XLA reference.

The SP/CP completion of SURVEY §2.2 (the reference has no parallelism;
round 1 deferred sequence sharding to chunked inference).  Contract:
`ring_gated_attention` over an N-way ring produces the same output as
`wavlm_gated_attention_xla` on the unsharded arrays — including key-padding
masks, bf16 inputs, and composition with data parallelism on a 2-D mesh.
Runs on the 8-device virtual CPU platform (conftest.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fddm_asr_tpu.ops.flash_attention import wavlm_gated_attention_xla
from fddm_asr_tpu.ops.ring_attention import ring_gated_attention


def _mk(B, L, H, dh, dtype, masked, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, L, H, dh)).astype(dtype)
    k = rng.standard_normal((B, L, H, dh)).astype(dtype)
    v = rng.standard_normal((B, L, H, dh)).astype(dtype)
    bias = (0.5 * rng.standard_normal((H, L, L))).astype(dtype)
    gate = rng.uniform(0.5, 2.0, (B, H, L)).astype(dtype)
    if masked:
        lens = rng.integers(L // 2, L + 1, size=B)
        mask = np.arange(L)[None, :] < lens[:, None]
    else:
        mask = np.ones((B, L), bool)
    return map(jnp.asarray, (q, k, v, bias, gate, mask))


def _seq_mesh(n):
    return Mesh(np.array(jax.devices()[:n]).reshape(1, n), ("data", "model"))


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("ring", [2, 4, 8])
def test_ring_matches_xla(ring, masked):
    B, L, H, dh = 2, 64, 4, 16
    q, k, v, bias, gate, mask = _mk(B, L, H, dh, np.float32, masked)
    want = wavlm_gated_attention_xla(q, k, v, bias, gate, mask)
    mesh = _seq_mesh(ring)
    got = ring_gated_attention(
        q, k, v, bias, gate, mask, mesh=mesh, axis="model", batch_axis=None
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_bf16():
    B, L, H, dh = 2, 64, 4, 16
    q, k, v, bias, gate, mask = _mk(B, L, H, dh, np.float32, True, seed=1)
    cast = lambda x: x.astype(jnp.bfloat16)
    want = wavlm_gated_attention_xla(cast(q), cast(k), cast(v),
                                     cast(bias), cast(gate), mask)
    got = ring_gated_attention(
        cast(q), cast(k), cast(v), cast(bias), cast(gate), mask,
        mesh=_seq_mesh(4), axis="model", batch_axis=None,
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_ring_composes_with_dp():
    """dp x sp on a 2x4 mesh: batch sharded on 'data', frames on 'model'."""
    B, L, H, dh = 4, 32, 2, 8
    q, k, v, bias, gate, mask = _mk(B, L, H, dh, np.float32, True, seed=2)
    want = wavlm_gated_attention_xla(q, k, v, bias, gate, mask)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    spec = NamedSharding(mesh, P("data", "model", None, None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    got = ring_gated_attention(qs, ks, vs, bias, gate, mask,
                               mesh=mesh, axis="model", batch_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # the output really is sequence-sharded (no hidden all-gather to host)
    shard_shapes = {s.data.shape for s in got.addressable_shards}
    assert shard_shapes == {(B // 2, L // 4, H, dh)}


def test_wavlm_forward_with_ring_attention():
    """Full WavLM forward with the gated_attention_fn hook bound to the ring
    op reproduces the single-device forward (same params, same waveform)."""
    import dataclasses
    import functools

    from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

    cfg = dataclasses.replace(WavLMConfig.tiny_for_tests(), seq_pad_multiple=8)
    rng = jax.random.PRNGKey(0)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 3200))
    params = WavLMModel(cfg).init(rng, wave)
    want = WavLMModel(cfg).apply(params, wave)

    ring_fn = functools.partial(
        ring_gated_attention, mesh=_seq_mesh(4), axis="model", batch_axis=None
    )
    got = WavLMModel(cfg, gated_attention_fn=ring_fn).apply(params, wave)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ring_gradients_match_xla():
    """The ring op is differentiable (AD through shard_map + ppermute):
    grads wrt q/k/v match the XLA attention's grads."""
    B, L, H, dh = 1, 32, 2, 8
    q, k, v, bias, gate, mask = _mk(B, L, H, dh, np.float32, True, seed=4)
    mesh = _seq_mesh(4)

    def loss_xla(q, k, v):
        out = wavlm_gated_attention_xla(q, k, v, bias, gate, mask)
        return jnp.sum(jnp.sin(out))

    def loss_ring(q, k, v):
        out = ring_gated_attention(q, k, v, bias, gate, mask,
                                   mesh=mesh, axis="model", batch_axis=None)
        return jnp.sum(jnp.sin(out))

    g_want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_seq_parallel_inference_matches_single_device():
    """pipeline.apply_mesh(mesh, seq_parallel=True) — dp x tp x sp composed —
    produces the same tokens as the unsharded pipeline."""
    from fddm_asr_tpu.config import Config
    from fddm_asr_tpu.parallel import MeshSpec, make_mesh
    from fddm_asr_tpu.pipeline import FDDMPipeline

    cfg = Config({
        "seed": 0,
        "data": {"vocab_size": 96, "tokenizer_path": None},
        "model": {"d_model": 32, "nhead": 4, "num_layers": 2, "dim_ff": 64,
                  "encoder": {"wavlm_name": "tiny"}},
        "diffusion": {"T": 20, "beta_max": 0.2},
    })

    class _Tok:
        def decode(self, ids):
            return "".join(chr(97 + (i % 26)) for i in ids)

    wave = np.random.default_rng(0).standard_normal((4, 3200)).astype(np.float32)

    def run(seq_parallel):
        pipe = FDDMPipeline.from_config(cfg, tokenizer=_Tok())
        if seq_parallel is not None:
            pipe.apply_mesh(make_mesh(MeshSpec(data=2, model=4)),
                            seq_parallel=seq_parallel)
        c, c_mask = pipe.encode_waveform(wave)
        ids, _ = pipe.sample(jax.random.key(0), c, seq_len=8, c_mask=c_mask,
                             T_infer=4, r=2, greedy=True)
        return np.asarray(ids)

    base = run(None)
    np.testing.assert_array_equal(run(True), base)


def test_wavlm_finetune_grads_with_ring_attention():
    """Sequence-parallel TRAINING: grads of a scalar loss wrt ALL WavLM
    params, taken through the ring-attention hook on an 8-device mesh,
    match the single-device grads — fine-tuning can shard the frame axis."""
    import dataclasses
    import functools

    from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

    cfg = dataclasses.replace(WavLMConfig.tiny_for_tests(), seq_pad_multiple=8)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 3200))
    params = WavLMModel(cfg).init(jax.random.PRNGKey(0), wave)

    def loss(params, model):
        out = model.apply(params, wave)
        return jnp.mean(jnp.square(out))

    g_want = jax.grad(loss)(params, WavLMModel(cfg))
    ring_fn = functools.partial(
        ring_gated_attention, mesh=_seq_mesh(4), axis="model", batch_axis=None
    )
    g_got = jax.grad(loss)(params, WavLMModel(cfg, gated_attention_fn=ring_fn))
    flat_w, _ = jax.tree_util.tree_flatten_with_path(g_want)
    flat_g = jax.tree.leaves(g_got)
    assert len(flat_w) == len(flat_g)
    for (path, w), g in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_seq_parallel_training_matches(tmp_path):
    """model.encoder.seq_parallel: a full training epoch on a dp x sp mesh
    (data=2, model=4) reproduces the non-sp train loss (same seed)."""
    import os

    from scripts.make_synth_data import main as synth_main
    from fddm_asr_tpu.config import Config, load_yaml
    from fddm_asr_tpu.parallel import MeshSpec
    from fddm_asr_tpu.train_lib import run_training

    out = str(tmp_path / "synth")
    synth_main(["--out", out, "--n", "8", "--seconds", "0.3"])

    def run(seq_parallel, name):
        raw = load_yaml(os.path.join(out, "config.yaml"))
        raw["optim"].update(num_epochs=1, batch_size=8)
        raw["model"]["encoder"]["seq_parallel"] = seq_parallel
        raw["log"]["ckpt_dir"] = str(tmp_path / name)
        return run_training(Config(raw), raw_cfg=raw, export_pt=False,
                            mesh_spec=MeshSpec(data=2, model=4))

    base = run(False, "ck_base")
    sp = run(True, "ck_sp")
    assert np.isfinite(sp["train_loss"])
    np.testing.assert_allclose(sp["train_loss"], base["train_loss"],
                               rtol=1e-5)
    assert sp["val_cer"] == base["val_cer"]


def test_ring_fully_masked_row_matches_xla():
    """A batch row whose keys are ALL masked degrades to the uniform-average
    semantics of the XLA softmax (scores pinned at float32-min)."""
    B, L, H, dh = 2, 32, 2, 8
    q, k, v, bias, gate, _ = _mk(B, L, H, dh, np.float32, False, seed=3)
    mask = np.ones((B, L), bool)
    mask[1, :] = False
    mask = jnp.asarray(mask)
    want = wavlm_gated_attention_xla(q, k, v, bias, gate, mask)
    got = ring_gated_attention(q, k, v, bias, gate, mask,
                               mesh=_seq_mesh(4), axis="model", batch_axis=None)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
