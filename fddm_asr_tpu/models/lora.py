# -*- coding: utf-8 -*-
"""LoRA adapters for parameter-efficient encoder fine-tuning.

Beyond-reference capability (the reference cannot train its encoder at all —
/root/reference/train.py:542-544 excludes it from the optimizer; this
framework's full fine-tune is `encoder.freeze: false`, and LoRA is the
parameter-efficient variant: `encoder.lora_rank: r` on top of it).

Design — functional merge, zero model-code changes:
    W_eff = W + (alpha / r) * A @ B          (A: [d_in, r], B: [r, d_out])
The adapter tree is a FLAT dict {"<param/path>": {"a": A, "b": B}} keyed by
the "/"-joined flax param path of each targeted kernel.  `merge_lora`
rebuilds a full param pytree with the targeted kernels replaced by W_eff;
the train step differentiates through the merge w.r.t. the adapters only
(the base params are threaded as a non-differentiated argument, exactly
like the frozen-encoder path), so the optimizer/EMA state is O(rank·d)
instead of O(d²) — ~0.8 M trainable params at r=8 on wavlm-large vs 315 M.

Works unchanged with scanned-layer parameter stacks: a stacked kernel
[L, d_in, d_out] gets stacked adapters [L, d_in, r] / [L, r, d_out] and a
batched einsum merge.

Init follows the LoRA paper (Hu et al. 2021): A ~ N(0, 1/r), B = 0, so the
merged model is EXACTLY the base model at step 0.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["DEFAULT_TARGETS", "init_lora", "merge_lora", "lora_param_count",
           "is_adapter_tree", "adapter_rank", "normalize_adapter_tree",
           "resolve_scale"]

# attention projections + FFN of the transformer layers (the conv front-end
# stays frozen — the standard wav2vec2/WavLM fine-tuning recipe)
DEFAULT_TARGETS = (
    r".*(q_proj|k_proj|v_proj|out_proj|intermediate_dense|output_dense)/kernel$"
)


from fddm_asr_tpu.parallel.mesh import path_str as _path_str


def resolve_scale(rank: int, alpha=None) -> float:
    """LoRA merge scale alpha / rank (alpha defaults to rank -> 1.0).

    The ONE place the scale formula lives — training (train_lib), inference
    restore (pipeline), and benchmarks all call this so the train-time and
    inference-time scales cannot drift.
    """
    return float(rank if alpha is None else alpha) / rank


def init_lora(rng, params: Any, rank: int,
              targets: str = DEFAULT_TARGETS) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Build the adapter tree for every kernel matching `targets`.

    Returns {"path/to/kernel": {"a": [..., d_in, r], "b": [..., r, d_out]}}.
    Leading stack axes (scanned layers) are preserved.
    """
    if rank <= 0:
        raise ValueError(f"lora rank must be positive, got {rank}")
    pattern = re.compile(targets)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    adapters: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key_path, leaf in leaves:
        path = _path_str(key_path)
        if not pattern.match(path) or getattr(leaf, "ndim", 0) < 2:
            continue
        *stack, d_in, d_out = leaf.shape
        rng, sub = jax.random.split(rng)
        # A ~ N(0, 1/r) (std 1/sqrt(r), the LoRA-paper recipe); B = 0 so the
        # merged model is exactly the base at step 0
        a = (jax.random.normal(sub, (*stack, d_in, rank), jnp.float32)
             / jnp.sqrt(rank))
        b = jnp.zeros((*stack, rank, d_out), jnp.float32)
        adapters[path] = {"a": a, "b": b}
    if not adapters:
        raise ValueError(f"no params matched lora targets {targets!r}")
    return adapters


def merge_lora(params: Any, adapters: Dict[str, Dict[str, jnp.ndarray]],
               scale: float) -> Any:
    """params with each adapted kernel replaced by W + scale * A @ B.

    Differentiable in `adapters`; `params` passes through untouched where
    not targeted (same buffers — no copies).
    """
    hit = {"n": 0}

    def place(key_path, leaf):
        ad = adapters.get(_path_str(key_path))
        if ad is None:
            return leaf
        hit["n"] += 1
        delta = jnp.einsum("...ir,...ro->...io", ad["a"], ad["b"])
        return leaf + scale * delta.astype(leaf.dtype)

    merged = jax.tree_util.tree_map_with_path(place, params)
    if hit["n"] != len(adapters):
        raise ValueError(
            f"{len(adapters) - hit['n']} adapter paths not found in params "
            "(base model mismatch?)")
    return merged


def lora_param_count(adapters: Dict[str, Dict[str, jnp.ndarray]]) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(adapters))


def is_adapter_tree(tree: Any) -> bool:
    """True iff `tree` is a LoRA adapter dict ({"path": {"a", "b"}, ...}) —
    used by checkpoint loaders to tell adapters from full encoder params."""
    return (
        isinstance(tree, dict) and len(tree) > 0
        and all(isinstance(v, dict) and set(v) == {"a", "b"}
                for v in tree.values())
    )


def adapter_rank(adapters: Dict[str, Dict[str, Any]]) -> int:
    """The rank r encoded in the adapter shapes (A: [..., d_in, r])."""
    first = next(iter(adapters.values()))
    return int(first["a"].shape[-1])


def normalize_adapter_tree(tree: Any) -> Any:
    """Return the flat {"path": {"a", "b"}} adapter dict, or None if `tree`
    isn't one.

    Checkpoint loaders restored WITHOUT a target template may re-nest the
    slash-joined adapter keys into a plain nested dict; this accepts either
    form (every leaf path must terminate in "a" or "b", paired per kernel)."""
    if not isinstance(tree, dict) or not tree:
        return None
    if is_adapter_tree(tree):
        return tree
    groups: Dict[str, Dict[str, Any]] = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = _path_str(key_path).split("/")
        if parts[-1] not in ("a", "b"):
            return None
        groups.setdefault("/".join(parts[:-1]), {})[parts[-1]] = leaf
    if not all(set(v) == {"a", "b"} for v in groups.values()):
        return None
    return groups
