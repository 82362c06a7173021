# -*- coding: utf-8 -*-
"""Multi-host (DCN) communication layer.

The reference has no distributed backend of any kind (SURVEY §2.2: zero uses
of torch.distributed / NCCL / MPI — /root/reference/train.py picks one
torch.device at train.py:494).  SURVEY §2.2/§5 mandates the TPU-native
equivalent: ``jax.distributed.initialize`` + XLA collectives over ICI within
a slice and DCN across slices.  This module is that layer.

Design (the DCN note SURVEY §5 asks for):

  * **Process group bootstrap** — ``initialize()`` wires
    ``jax.distributed.initialize`` from explicit args or environment
    variables (coordinator address, process id/count).  With one process it
    is a strict no-op: every current single-host path runs unchanged.
  * **Mesh construction** — ``make_global_mesh`` builds the same 2-D
    ("data", "model") logical mesh as ``mesh.make_mesh`` but over ALL
    processes' devices.  Axis placement follows the scaling-book recipe:
    the "model" (tensor-parallel) axis — which moves activations every
    layer — is laid out over devices WITHIN a host (ICI), while the "data"
    axis — one gradient all-reduce per step — is the axis that crosses
    hosts (DCN).  Multi-host layouts use
    ``mesh_utils.create_hybrid_device_mesh`` so XLA knows which hops are
    DCN; single-host falls back to ``mesh.make_mesh`` exactly.
  * **Input sharding** — each host loads only its shard of the global batch
    (``host_shard()`` feeds ``data.dataset.make_batches(shard=...)``; the
    per-(seed, epoch) shuffle is host-independent, so all hosts draw the
    same global order before slicing).  ``put_global_batch`` assembles the
    host-local array into a global jax.Array:
    ``jax.make_array_from_process_local_data`` under multi-process,
    plain ``device_put`` (bit-identical) under one process.
  * **Metrics** — per-host scalars are combined with
    ``multihost_utils.process_allgather`` (``all_hosts_mean``); identity
    for one process.
  * **Checkpoints** — only the primary process writes reference-format
    artifacts (``is_primary()``); orbax handles multi-process array
    gathering internally.

No reference counterpart exists to cite for behavior; the contract pinned by
tests is "process_count == 1 must be a no-op on every current path".
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fddm_asr_tpu.parallel.mesh import MeshSpec, make_mesh

__all__ = [
    "DistributedConfig", "initialize", "process_group", "is_primary",
    "host_shard", "make_global_mesh", "put_global_batch", "all_hosts_mean",
    "all_hosts_weighted_mean", "host_local_copy",
]

_initialized = False


@dataclasses.dataclass(frozen=True)
class DistributedConfig:
    """Coordinator wiring for ``jax.distributed.initialize``.

    All fields optional: ``None`` everywhere means "single process" (or, on
    a real TPU pod with a cluster-env, jax's own auto-detection).
    """
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    local_device_ids: Optional[Sequence[int]] = None

    @classmethod
    def from_env(cls, env: Optional[dict] = None) -> "DistributedConfig":
        """FDDM_COORDINATOR / FDDM_NUM_PROCESSES / FDDM_PROCESS_ID, falling
        back to jax's own JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
        JAX_PROCESS_ID."""
        env = os.environ if env is None else env

        def pick(*names):
            for n in names:
                v = env.get(n)
                if v not in (None, ""):
                    return v
            return None

        addr = pick("FDDM_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
        nproc = pick("FDDM_NUM_PROCESSES", "JAX_NUM_PROCESSES")
        pid = pick("FDDM_PROCESS_ID", "JAX_PROCESS_ID")
        return cls(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc is not None else None,
            process_id=int(pid) if pid is not None else None,
        )

    @property
    def is_multiprocess(self) -> bool:
        return (self.num_processes or 1) > 1 or self.coordinator_address is not None


def initialize(cfg: Optional[DistributedConfig] = None) -> Tuple[int, int]:
    """Join the process group; returns (process_index, process_count).

    Strict no-op when the config resolves to a single process with no
    coordinator — the path every current test and CLI run takes.  Safe to
    call more than once (subsequent calls return the current group).
    """
    global _initialized
    cfg = DistributedConfig.from_env() if cfg is None else cfg
    if not cfg.is_multiprocess:
        return process_group()
    if _initialized:
        return process_group()
    jax.distributed.initialize(
        coordinator_address=cfg.coordinator_address,
        num_processes=cfg.num_processes,
        process_id=cfg.process_id,
        local_device_ids=cfg.local_device_ids,
    )
    _initialized = True
    logging.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return process_group()


def process_group() -> Tuple[int, int]:
    """(process_index, process_count) of the current group ((0, 1) solo)."""
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that owns host-side side effects (ckpt export,
    report files, log summaries)."""
    return jax.process_index() == 0


def host_shard() -> Optional[Tuple[int, int]]:
    """``shard=`` argument for data.dataset.make_batches: this host's slice
    of the global example order.  None (no slicing) when single-process."""
    pid, pcount = process_group()
    return None if pcount == 1 else (pid, pcount)


def make_global_mesh(
    spec: MeshSpec = MeshSpec(), devices: Optional[Sequence] = None
) -> Mesh:
    """("data", "model") mesh over every process's devices.

    Single-process: delegates to mesh.make_mesh (identical result).
    Multi-process: hybrid ICI×DCN layout — "model" stays inside each host's
    ICI domain, "data" = (hosts × remaining local devices) crosses DCN only
    on its inter-host factor.
    """
    if jax.process_count() == 1:
        return make_mesh(spec, devices)
    from jax.experimental import mesh_utils

    n_local = jax.local_device_count()
    n_hosts = jax.process_count()
    data, model = spec.resolve(n_local * n_hosts)
    if model > n_local:
        raise ValueError(
            f"model axis {model} cannot exceed {n_local} local devices: "
            "tensor-parallel collectives must ride ICI, not DCN"
        )
    if data % n_hosts != 0:
        raise ValueError(
            f"data axis {data} must be divisible by {n_hosts} hosts"
        )
    devs = list(devices if devices is not None else jax.devices())
    needed_local = (data * model) // n_hosts
    if needed_local > n_local:
        raise ValueError(
            f"mesh data={data},model={model} needs {needed_local} devices "
            f"per host but only {n_local} are local; lower one axis or use "
            "more hosts"
        )
    if needed_local * n_hosts < len(devs):
        # pinned subset spec (MeshSpec.resolve permits data*model <
        # n_devices, mirroring make_mesh's devices[:data*model]): keep every
        # host in the mesh with an equal share — the first needed_local
        # local devices per process — so no process is left without an
        # addressable shard of the global arrays.
        by_proc: dict = {}
        for d in sorted(devs, key=lambda d: (d.process_index, d.id)):
            by_proc.setdefault(d.process_index, []).append(d)
        devs = [d for _, ds in sorted(by_proc.items())
                for d in ds[:needed_local]]
    slices = {getattr(d, "slice_index", None) for d in devs}
    if None not in slices and len(slices) == n_hosts:
        # real TPU pod slices: let mesh_utils optimize the ICI layout
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data // n_hosts, model),
            dcn_mesh_shape=(n_hosts, 1),
            devices=devs,
        )
    else:
        # no slice topology (multi-process CPU test clusters, single-slice
        # pods): group by process so "model" never crosses a host boundary
        devs.sort(key=lambda d: (d.process_index, d.id))
        dev_array = np.asarray(devs).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def put_global_batch(arr: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Assemble a host-local batch slice into a global array.

    Under one process this is exactly ``jax.device_put`` (tested
    bit-identical); under many, each host contributes its local rows and
    the result is a global jax.Array addressable by the jitted step.
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(arr))


def all_hosts_mean(value: Any) -> float:
    """Mean of a per-host scalar metric across the process group (identity
    for one process) — e.g. per-host CER averaged for the epoch summary."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(value, np.float64))
    return float(np.mean(gathered))


def all_hosts_weighted_mean(value: Any, weight: float) -> float:
    """Weight-aware cross-host mean: sum(v_i*w_i)/sum(w_i).  Hosts with
    weight 0 (e.g. an empty eval shard) contribute nothing; returns 0.0 if
    every host is empty.  Identity (value) for one process."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    pair = np.asarray([float(value) * float(weight), float(weight)], np.float64)
    gathered = multihost_utils.process_allgather(pair)  # [nproc, 2]
    num, den = np.asarray(gathered).reshape(-1, 2).sum(axis=0)
    return float(num / den) if den > 0 else 0.0


def host_local_copy(tree: Any, mesh: Mesh) -> Any:
    """Fetch a host-local numpy copy of a (possibly cross-host-sharded)
    param tree: one jitted identity resharded to fully-replicated (a single
    all-gather collective), then read each leaf's local shard.

    The multi-host eval path needs this: per-host evaluation runs plain
    process-local jits, which cannot consume arrays committed to other
    hosts' devices.  Single-process: plain device_get."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: np.asarray(x), tree)
    rep = NamedSharding(mesh, P())
    replicate_fn = jax.jit(
        lambda t: t, out_shardings=jax.tree.map(lambda _: rep, tree))
    replicated = replicate_fn(tree)
    return jax.tree.map(
        lambda x: np.asarray(x.addressable_data(0)), replicated)
