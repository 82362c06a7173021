# -*- coding: utf-8 -*-
"""Checkpointing: orbax-native format + reference `.pt` interop.

Two formats are supported everywhere a checkpoint is accepted:
  * directories -> orbax (the TPU-native, preemption-safe format used by the
    training loop, with async save and resume);
  * files ending in .pt/.ckpt/.pth -> reference torch format
    (fddm_asr_tpu.convert.torch_ckpt), so checkpoints from the PyTorch
    reference run unchanged, and `export_reference_ckpt` writes checkpoints
    the reference's own inference.py can load.

The reference only ever *writes* per-epoch checkpoints and never reads them
back (no resume path — SURVEY §5); this framework adds `--resume` on top of
the same artifacts.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = [
    "save_orbax",
    "wait_for_saves",
    "load_orbax",
    "load_checkpoint_any",
    "export_reference_ckpt",
    "save_ckpt_meta",
    "load_ckpt_meta",
]


def save_ckpt_meta(orbax_path: str, meta: Dict[str, Any]) -> None:
    """Write the JSON sidecar `<dir>.orbax.meta.json` next to an orbax dir.

    The orbax tree itself cannot grow new top-level keys without breaking
    every existing restore-with-template call, so run metadata the loader
    needs (ema_eval, LoRA rank/alpha, …) rides in a sidecar instead."""
    import json

    with open(os.path.normpath(os.path.abspath(orbax_path)) + ".meta.json",
              "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=1)


def load_ckpt_meta(orbax_path: str) -> Dict[str, Any]:
    """The sidecar written by save_ckpt_meta, or {} (older checkpoints)."""
    import json

    p = os.path.normpath(os.path.abspath(orbax_path)) + ".meta.json"
    if not os.path.exists(p):
        return {}
    with open(p, "r", encoding="utf-8") as f:
        return json.load(f)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


# One persistent AsyncCheckpointer for the process: orbax serializes
# consecutive saves from the same instance (a new save waits for the
# previous commit), so interleaved best_model/epoch saves can't collide.
_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = _checkpointer()
    return _ASYNC_CKPTR


def save_orbax(path: str, tree: Dict[str, Any], asynchronous: bool = False) -> None:
    """Orbax save of a pytree (numpy/jax leaves).

    asynchronous=True returns once the tree is staged and lets the disk
    serialization run in orbax's background thread (the commit is an atomic
    rename, so readers never see a partial checkpoint).  Call
    `wait_for_saves()` before depending on the files existing — the training
    loop does so at exit.  Default is a blocking save.
    """
    ckptr = _async_checkpointer() if asynchronous else _checkpointer()
    path = os.path.abspath(path)
    ckptr.save(path, tree, force=True)
    if not asynchronous:
        ckptr.wait_until_finished()


def wait_for_saves() -> None:
    """Block until every `save_orbax(..., asynchronous=True)` has committed
    (and surface any background save error).  No-op if none are pending."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_orbax(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target=target)
    return ckptr.restore(os.path.abspath(path))


def load_checkpoint_any(path: str, scan_blocks: bool = False) -> Dict[str, Any]:
    """Load either format into {decoder, s_proj, t_embed, t_proj, meta...}.

    scan_blocks only affects reference `.pt` loads: the decoder tree is built
    in the stacked nn.scan layout.  Orbax dirs already store whatever layout
    the model trained with.

    Orbax training checkpoints ({"state": TrainState-tree, "epoch": N}) are
    normalised to the same schema: each model entry is the bare param subtree
    (without the flax {"params": ...} wrapper), matching what
    `torch_ckpt.load_reference_checkpoint` returns.  Two training-state
    extras ride along when present:
      * "encoder": the fine-tuned encoder entry (full flax vars when
        model.encoder.freeze was false, or the LoRA adapter dict when
        encoder.lora_rank was set) — the reference contract never
        checkpoints the frozen encoder, so this key is None on frozen runs;
      * EMA weights: when the state carries an EMA (optim.ema_decay) AND the
        run evaluated with it (the sidecar's ema_eval, default true — see
        save_ckpt_meta), the returned decoder/heads/encoder come from the
        EMA — those are the weights the training loop evaluated and
        best-model-selected with (the raw weights stay available under
        "raw_decoder" for tooling).  The sidecar rides along under "meta"
        (LoRA rank/alpha for scale-faithful re-merging, etc.).
    """
    if os.path.isdir(path):
        tree = load_orbax(path)
        if isinstance(tree, dict) and "state" in tree:
            state = tree["state"]
            meta = load_ckpt_meta(path)
            use_ema = bool(meta.get("ema_eval", True))

            def unwrap(entry):
                if isinstance(entry, dict) and set(entry) == {"params"}:
                    return entry["params"]
                return entry

            def ema_part(i):
                ema = state.get("ema")
                if not ema or not use_ema:
                    return None
                # a tuple field restores as {"0": ..., "1": ...} without a
                # target template
                return ema.get(str(i), ema.get(i)) if isinstance(ema, dict) \
                    else (ema[i] if i < len(ema) else None)

            def pick(i, name):
                e = ema_part(i)
                return e if e is not None else state.get(name)

            best = tree.get("best_val_cer")
            if best is not None and not np.isfinite(best):
                best = None  # inf placeholder = "no best recorded yet"
            return {
                "decoder": unwrap(pick(0, "decoder")),
                "s_proj": unwrap(pick(1, "s_proj")),
                "t_embed": unwrap(pick(2, "t_embed")),
                "t_proj": unwrap(pick(3, "t_proj")),
                "encoder": pick(4, "encoder"),
                "raw_decoder": unwrap(state.get("decoder")),
                "epoch": tree.get("epoch"),
                "step": state.get("step"),
                "best_val_cer": best,
                "config": None,
                "meta": meta,
            }
        return tree
    from fddm_asr_tpu.convert.torch_ckpt import load_reference_checkpoint

    return load_reference_checkpoint(path, scan_blocks=scan_blocks)


def export_reference_ckpt(
    path: str,
    decoder_params: Dict[str, Any],
    s_proj_params: Optional[Dict] = None,
    t_embed_params: Optional[Dict] = None,
    t_proj_params: Optional[Dict] = None,
    **meta,
) -> None:
    """Write a reference-format `.pt` from flax param trees."""
    from fddm_asr_tpu.convert.torch_ckpt import save_reference_checkpoint

    to_np = lambda tree: jax.tree.map(lambda x: np.asarray(x), tree)
    save_reference_checkpoint(
        path,
        to_np(decoder_params),
        None if s_proj_params is None else to_np(s_proj_params),
        None if t_embed_params is None else to_np(t_embed_params),
        None if t_proj_params is None else to_np(t_proj_params),
        **meta,
    )
