# -*- coding: utf-8 -*-
"""Device mesh construction + sharding rules (dp / tp).

The reference is strictly single-device (SURVEY §2.2: no DDP/FSDP/NCCL
anywhere); this module is the TPU-native parallelism layer designed in its
place:

  * a 2-D logical mesh ("data", "model") over ICI;
  * data parallelism: batches sharded on "data", gradients all-reduced by
    XLA's GSPMD partitioner (no hand-written psum needed under jit with
    sharded params/batch — collectives are compiler-inserted);
  * tensor parallelism: attention heads + FFN of the denoising decoder
    sharded on "model" via path-pattern PartitionSpec rules.  At the
    reference scale (~70 M params) TP is optional; the rules exist so the
    paper-scale 253 M+ decoder shards without code changes.

Single-chip runs use a trivial 1x1 mesh and the same code path — mesh size is
configuration, not code (tested on the 8-device virtual CPU platform).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "MeshSpec", "make_mesh", "decoder_param_spec", "shard_pytree",
    "batch_sharding", "replicate", "path_str",
]


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1   # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if self.data > 0:
            # fully-pinned spec: may use a SUBSET of the devices (e.g. a
            # 1x1 mesh on a multi-device host for single-device runs)
            if data * model > n_devices:
                raise ValueError(
                    f"mesh {data}x{model} needs more than {n_devices} devices"
                )
        elif data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices; adjust MeshSpec"
            )
        return data, model


def make_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


# -------------------------------------------------------- partitioning rules
# Matched against "/"-joined flax param paths, first hit wins.
_DECODER_RULES = (
    # attention: shard heads (output features of q/k/v, input of out_proj)
    (re.compile(r".*(self_attn|cross_attn|attention)/(q_proj|k_proj|v_proj)/kernel$"), P(None, "model")),
    (re.compile(r".*(self_attn|cross_attn|attention)/(q_proj|k_proj|v_proj)/bias$"), P("model")),
    (re.compile(r".*(self_attn|cross_attn|attention)/out_proj/kernel$"), P("model", None)),
    # FFN: column-parallel in, row-parallel out
    (re.compile(r".*(ff_0|intermediate_dense)/kernel$"), P(None, "model")),
    (re.compile(r".*(ff_0|intermediate_dense)/bias$"), P("model")),
    (re.compile(r".*(ff_3|output_dense)/kernel$"), P("model", None)),
    # vocab-sharded head + embedding
    (re.compile(r".*head/kernel$"), P(None, "model")),
    (re.compile(r".*head/bias$"), P("model")),
    (re.compile(r".*tok_emb/embedding$"), P("model", None)),
)


def decoder_param_spec(path: str) -> P:
    """PartitionSpec for one decoder/encoder param path ("a/b/kernel")."""
    for pattern, spec in _DECODER_RULES:
        if pattern.match(path):
            return spec
    return P()  # replicate


def path_str(key_path) -> str:
    """"/"-joined flax/jax tree path — the ONE canonical helper (also used
    by models/lora.py; do not copy it).  Handles DictKey(.key),
    SequenceKey(.idx), and GetAttrKey(.name) — the str() fallback of a
    GetAttrKey is ".name", which would silently break prefix matches."""
    parts = []
    for k in key_path:
        for attr in ("key", "idx", "name"):
            if hasattr(k, attr):
                parts.append(str(getattr(k, attr)))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


_path_str = path_str  # internal alias (pre-existing call sites)


def shard_pytree(tree: Any, mesh: Mesh, spec_fn=decoder_param_spec) -> Any:
    """device_put every leaf with its rule-derived NamedSharding."""
    def place(key_path, leaf):
        path = _path_str(key_path)
        spec = spec_fn(path)
        # drop axes that don't divide the leaf (e.g. nhead smaller than mesh)
        shape = getattr(leaf, "shape", ())
        axes = list(spec)
        # scanned-layer stacks (encoder "layers_scan", decoder "blocks_scan")
        # carry a leading layer axis; shift the spec past it
        if (
            axes
            and ("layers_scan" in path or "blocks_scan" in path)
            and len(shape) == len(axes) + 1
        ):
            axes = [None] + axes
        for i, ax in enumerate(axes):
            if ax is None:
                continue
            dim = shape[i] if i < len(shape) else 1
            if dim % mesh.shape[ax] != 0:
                axes[i] = None
        if (jax.process_count() > 1 and isinstance(leaf, jax.Array)
                and leaf.is_fully_addressable):
            # A host-local array (fresh init, orbax restore) may be
            # COMMITTED to a device other processes cannot address (orbax
            # restores e.g. the step scalar onto global device 0, which is
            # non-addressable on process 1) — device_put then demands DCN
            # cross-host transfer support and raises.  Every process holds
            # the identical full value here, so drop to numpy and let
            # device_put assemble the global array from per-host copies
            # without any transfer.
            leaf = np.asarray(leaf)
        try:
            return jax.device_put(leaf, NamedSharding(mesh, P(*axes)))
        except ValueError as e:
            raise ValueError(
                f"shard_pytree failed at {path}: "
                f"leaf {type(leaf).__name__}{getattr(leaf, 'shape', ())} "
                f"src_sharding={getattr(leaf, 'sharding', None)} -> "
                f"P({', '.join(map(str, axes))}) on mesh {dict(mesh.shape)}"
            ) from e

    return jax.tree_util.tree_map_with_path(place, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batches."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
