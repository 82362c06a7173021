# -*- coding: utf-8 -*-
"""Worker for the REAL multi-process (DCN-analogue) train-step test.

Run standalone, NOT under pytest:

    python tests/mp_worker.py solo             # 8-device single process
    python tests/mp_worker.py <pid> <nproc> <port>   # one cluster member

Both modes execute the SAME two sharded train steps (tiny decoder + tiny
WavLM, dp=4 x tp=2 mesh, deterministic batch) and print one JSON line with
the final loss; the test asserts the cluster reproduces the solo loss.
The multi-process cluster is 2 hosts x 4 virtual CPU devices, with the
gradient all-reduce crossing the process boundary over Gloo — the CPU
stand-in for DCN (SURVEY §2.2).
"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def build_and_step(mesh):
    from fddm_asr_tpu.config import Config
    from fddm_asr_tpu.models.projection import (
        SpeechProjector, TextEmbedding, TextProjector,
    )
    from fddm_asr_tpu.parallel import (
        batch_sharding, decoder_param_spec, put_global_batch, shard_pytree,
    )
    from fddm_asr_tpu.pipeline import FDDMPipeline
    from fddm_asr_tpu.train_lib import TrainState, make_optimizer, make_train_step

    vocab, d_model, d_proj = 96, 32, 16
    cfg = Config({
        "seed": 0,
        "data": {"vocab_size": vocab, "pad_id": 0, "max_len": 16},
        "model": {
            "d_model": d_model, "nhead": 4, "num_layers": 2, "dim_ff": 64,
            "dropout": 0.0,
            "encoder": {"wavlm_name": "tiny", "freeze": True, "proj": "linear",
                        "pooling": "none"},
            "projector": {"d_proj": d_proj},
        },
        "diffusion": {"T": 20, "beta_max": 0.2},
        "optim": {"batch_size": 8, "lr": 1e-3, "weight_decay": 0.01,
                  "dtype": "float32"},
        "lfd": {"lambda_offdiag": 5e-3, "n_step_fd": 1, "tau": 1.0},
        "log": {"log_every": 1, "ckpt_dir": "/tmp/mp_worker_ckpt"},
    })

    class _Tok:
        def encode(self, text):
            return [5, 6, 7]

    pipeline = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), seed=0)
    s_proj = SpeechProjector(d_proj=d_proj)
    t_embed = TextEmbedding(d_out=d_proj, mode="logits")
    t_proj = TextProjector(d_proj=d_proj)
    rng = jax.random.key(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    sp = s_proj.init(r1, jnp.zeros((1, 4, d_model)))
    te = t_embed.init(r2, jnp.zeros((1, 4, vocab)))
    tp = t_proj.init(r3, jnp.zeros((1, 4, d_proj)))

    tx = make_optimizer(cfg)
    params0 = (pipeline.decoder_params, sp, te, tp)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        decoder=params0[0], s_proj=params0[1], t_embed=params0[2],
        t_proj=params0[3], opt_state=tx.init(params0),
    )

    B, T_wav, L = 8, 3200, 16
    # deterministic GLOBAL batch; each process places only the rows it owns
    # (mesh data axis is host-major, so process p owns contiguous rows)
    wave_g = np.random.default_rng(0).standard_normal((B, T_wav)).astype(np.float32)
    x0_g = np.random.default_rng(1).integers(1, vocab, (B, L), dtype=np.int32)
    pcount, pid = jax.process_count(), jax.process_index()
    rows = slice(pid * B // pcount, (pid + 1) * B // pcount)

    with mesh:
        state = shard_pytree(state, mesh, decoder_param_spec)
        pipeline.encoder_params = shard_pytree(
            pipeline.encoder_params, mesh, decoder_param_spec
        )
        train_step = make_train_step(pipeline, s_proj, t_embed, t_proj, tx, cfg)
        bshard = batch_sharding(mesh)
        wave = put_global_batch(wave_g[rows], bshard)
        x0 = put_global_batch(x0_g[rows], bshard)
        for i in range(2):
            state, metrics = train_step(
                state, pipeline.encoder_params, wave, x0, jax.random.key(7 + i),
                True,
            )
        return float(metrics["total_loss"]), float(metrics["loss_diff"])


def run_training_mode(out_dir: str, lora: bool = False) -> dict:
    """The FULL run_training loop (epoch + eval + checkpointing) over the
    current process group — exercises host-sharded eval batches, the
    host_local_copy replicate collective, weighted metric recombination,
    and primary-gated artifact writes.

    lora=True fine-tunes the encoder through rank-2 adapters: the eval
    epoch must host_local_copy the globally-sharded adapters BEFORE the
    eager merge_lora (regression: merging first raised 'Array that is not
    fully addressable' on every multi-host LoRA eval)."""
    from fddm_asr_tpu.config import Config, load_yaml
    from fddm_asr_tpu.parallel import MeshSpec
    from fddm_asr_tpu.train_lib import run_training

    raw = load_yaml(os.path.join(out_dir, "config.yaml"))
    raw["optim"].update({"num_epochs": 1, "batch_size": 8})
    tag = "lora_" if lora else ""
    raw["log"]["ckpt_dir"] = os.path.join(
        out_dir, f"ck_{tag}{jax.process_count()}p")
    if lora:
        raw["model"]["encoder"].update({"freeze": False, "lora_rank": 2})
    summary = run_training(Config(raw), raw_cfg=raw, export_pt=False,
                           mesh_spec=MeshSpec(data=4, model=2))
    return {
        "train_loss": summary["train_loss"],
        "val_cer": summary["val_cer"],
        "val_loss": summary["val_loss"],
        "ckpt_dir": raw["log"]["ckpt_dir"],
    }


def run_training_resume_mode(out_dir: str) -> dict:
    """Elastic recovery on the cluster: train epoch 1, then a SECOND
    run_training resuming from ep001.orbax for epoch 2 — every process
    calls the orbax restore (its internal barriers must stay
    group-consistent, exactly like the save side), the restored host-local
    state re-shards onto the global mesh, and training continues."""
    from fddm_asr_tpu.config import Config, load_yaml
    from fddm_asr_tpu.parallel import MeshSpec
    from fddm_asr_tpu.train_lib import run_training

    raw = load_yaml(os.path.join(out_dir, "config.yaml"))
    raw["optim"].update({"num_epochs": 1, "batch_size": 8})
    ck = os.path.join(out_dir, f"ck_res_{jax.process_count()}p")
    raw["log"]["ckpt_dir"] = ck
    # epoch 1 saves ASYNCHRONOUSLY: orbax's async commit runs cross-process
    # barriers of its own, and the artifact must still restore cleanly
    raw["log"]["async_checkpoint"] = True
    run_training(Config(raw), raw_cfg=raw, export_pt=False,
                 mesh_spec=MeshSpec(data=4, model=2))
    raw["log"]["async_checkpoint"] = False

    raw["optim"]["num_epochs"] = 2
    summary = run_training(Config(raw), raw_cfg=raw, export_pt=False,
                           mesh_spec=MeshSpec(data=4, model=2),
                           resume=os.path.join(ck, "ep001.orbax"))
    return {
        "train_loss": summary["train_loss"],
        "val_cer": summary["val_cer"],
        "has_ep002": os.path.isdir(os.path.join(ck, "ep002.orbax")),
    }


def main():
    from fddm_asr_tpu.parallel import (
        DistributedConfig, MeshSpec, initialize, make_global_mesh,
    )

    argv = sys.argv[1:]
    modes = ("solo", "train_solo", "train", "train_lora", "train_resume")
    train_modes = ("train", "train_lora", "train_resume")
    mode = argv[0] if argv[0] in modes else "step"
    if mode in ("solo", "train_solo"):
        assert jax.device_count() == 8, "run with xla_force_host_platform_device_count=8"
    else:
        # cluster member: "train[_lora|_resume] <pid> <nproc> <port> <out>"
        # or the classic step-mode "<pid> <nproc> <port>"
        rest = argv[1:] if mode in train_modes else argv
        pid, nproc, port = int(rest[0]), int(rest[1]), rest[2]
        initialize(DistributedConfig(f"localhost:{port}", nproc, pid))
        assert jax.process_count() == nproc
        assert jax.device_count() == 8, "run with xla_force_host_platform_device_count=4"

    base = {"process": jax.process_index(),
            "process_count": jax.process_count()}
    if mode == "train_resume":
        base.update(run_training_resume_mode(argv[4]))
    elif mode in ("train_solo", "train", "train_lora"):
        out_dir = argv[1] if mode == "train_solo" else argv[4]
        base.update(run_training_mode(out_dir, lora=(mode == "train_lora")))
    else:
        mesh = make_global_mesh(MeshSpec(data=4, model=2))
        total, diff = build_and_step(mesh)
        base.update({"mesh": dict(mesh.shape), "total_loss": total,
                     "loss_diff": diff})
        # pinned SUBSET spec (data*model < total devices): every host must
        # still contribute an equal share (regression: reshape crash)
        sub = make_global_mesh(MeshSpec(data=2, model=2))
        sub_procs = {d.process_index for d in sub.devices.flat}
        base["subset_mesh"] = dict(sub.shape)
        base["subset_hosts"] = len(sub_procs)
    print(json.dumps(base), flush=True)


if __name__ == "__main__":
    main()
