# -*- coding: utf-8 -*-
"""Mesh/sharding tests on the 8-device virtual CPU platform + the driver's
multichip dry run."""
import os

import jax
import numpy as np
import pytest

from fddm_asr_tpu.parallel import MeshSpec, decoder_param_spec, make_mesh, shard_pytree
from jax.sharding import PartitionSpec as P


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    mesh = make_mesh(MeshSpec(data=4, model=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(MeshSpec())  # all devices on data
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    # fully-pinned specs may take a device SUBSET (single-device runs on
    # multi-device hosts); over-subscription still raises
    mesh = make_mesh(MeshSpec(data=3, model=2))
    assert dict(mesh.shape) == {"data": 3, "model": 2}
    mesh = make_mesh(MeshSpec(data=1, model=1))
    assert dict(mesh.shape) == {"data": 1, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(MeshSpec(data=5, model=2))
    with pytest.raises(ValueError):
        make_mesh(MeshSpec(data=-1, model=3))  # 8 not divisible


def test_param_spec_rules():
    assert decoder_param_spec("blocks_0/self_attn/q_proj/kernel") == P(None, "model")
    assert decoder_param_spec("blocks_3/cross_attn/out_proj/kernel") == P("model", None)
    assert decoder_param_spec("blocks_1/ff_0/kernel") == P(None, "model")
    assert decoder_param_spec("blocks_1/ff_3/kernel") == P("model", None)
    assert decoder_param_spec("head/kernel") == P(None, "model")
    assert decoder_param_spec("encoder/layers_0/attention/k_proj/kernel") == P(None, "model")
    assert decoder_param_spec("blocks_0/norm1/scale") == P()
    assert decoder_param_spec("time_proj/kernel") == P()


def test_shard_pytree_places_leaves():
    mesh = make_mesh(MeshSpec(data=4, model=2))
    tree = {
        "blocks_0": {"ff_0": {"kernel": np.zeros((16, 64), np.float32),
                              "bias": np.zeros((64,), np.float32)}},
        "norm": {"scale": np.ones((16,), np.float32)},
        # dimension not divisible by model axis -> silently replicated
        "odd": {"ff_0": {"kernel": np.zeros((16, 7), np.float32)}},
    }
    sharded = shard_pytree(tree, mesh)
    k = sharded["blocks_0"]["ff_0"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    assert sharded["norm"]["scale"].sharding.spec == P()
    assert sharded["odd"]["ff_0"]["kernel"].sharding.spec == P(None, None)


def test_shard_pytree_shifts_scan_stacks():
    """Stacked scan params (leading layer axis) shift the spec past axis 0 —
    for BOTH the encoder's layers_scan and the decoder's blocks_scan."""
    mesh = make_mesh(MeshSpec(data=4, model=2))
    tree = {
        "blocks_scan": {"block": {"ff_0": {
            "kernel": np.zeros((6, 16, 64), np.float32),
            "bias": np.zeros((6, 64), np.float32),
        }}},
        "encoder": {"layers_scan": {"layer": {"attention": {"out_proj": {
            "kernel": np.zeros((23, 64, 64), np.float32),
        }}}}},
    }
    sharded = shard_pytree(tree, mesh)
    blk = sharded["blocks_scan"]["block"]["ff_0"]
    assert blk["kernel"].sharding.spec == P(None, None, "model")
    assert blk["bias"].sharding.spec == P(None, "model")
    enc = sharded["encoder"]["layers_scan"]["layer"]["attention"]["out_proj"]
    assert enc["kernel"].sharding.spec == P(None, "model", None)


def test_sharded_inference_matches_single_device():
    """apply_mesh (dp batch + tp decoder sharding) must not change outputs."""
    from fddm_asr_tpu.config import Config
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

    def run(mesh_spec):
        pipe = FDDMPipeline.from_config(cfg, tokenizer=_Tok())
        if mesh_spec is not None:
            pipe.apply_mesh(make_mesh(mesh_spec))
        c, c_mask = pipe.encode_waveform(wave)
        ids, p = pipe.sample(jax.random.key(0), c, seq_len=8, c_mask=c_mask,
                             T_infer=4, r=2, greedy=True)
        return np.asarray(ids)

    base = run(None)
    sharded = run(MeshSpec(data=4, model=2))
    np.testing.assert_array_equal(sharded, base)


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(4)


def test_dryrun_multichip_self_bootstraps():
    """The driver invokes dryrun_multichip from a process that sees only one
    device; the entry must re-exec itself onto a virtual CPU platform.  Pin
    the bootstrap by running it from a 1-device CPU parent (never touching
    the TPU) and asserting the child's OK line surfaces."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env.pop("FDDM_DRYRUN_INNER", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import __graft_entry__ as g;"
         "assert len(jax.devices()) < 4;"
         "g.dryrun_multichip(4)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_sharded_int8_inference_matches_single_device():
    """int8 quantization composes with dp+tp sharding: the per-channel
    weight scales on din-sharded kernels (e.g. ff_3) need a cross-shard
    max, which GSPMD must insert — outputs must be token-exact vs one
    device with the SAME quantization."""
    from fddm_asr_tpu.config import Config
    from fddm_asr_tpu.pipeline import FDDMPipeline

    cfg = Config({
        "seed": 0,
        "data": {"vocab_size": 96, "tokenizer_path": None},
        "model": {"d_model": 32, "nhead": 4, "num_layers": 2, "dim_ff": 64,
                  "quant_dense": "int8",
                  "encoder": {"wavlm_name": "tiny",
                              "wavlm_config": {"quant_dense": "int8"}}},
        "diffusion": {"T": 20, "beta_max": 0.2},
    })

    class _Tok:
        def decode(self, ids):
            return "".join(chr(97 + (i % 26)) for i in ids)

    wave = np.random.default_rng(1).standard_normal((4, 3200)).astype(np.float32)

    def run(mesh_spec):
        pipe = FDDMPipeline.from_config(cfg, tokenizer=_Tok())
        if mesh_spec is not None:
            pipe.apply_mesh(make_mesh(mesh_spec))
        c, c_mask = pipe.encode_waveform(wave)
        ids, _ = pipe.sample(jax.random.key(0), c, seq_len=8, c_mask=c_mask,
                             T_infer=4, r=2, greedy=True)
        return np.asarray(ids)

    base = run(None)
    sharded = run(MeshSpec(data=4, model=2))
    np.testing.assert_array_equal(sharded, base)
