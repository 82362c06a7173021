# -*- coding: utf-8 -*-
"""PyTorch <-> JAX checkpoint interop for the FDDM decoder + projection heads.

The reference trains with torch and saves `.pt` dicts
  {decoder, s_proj, t_embed, t_proj, epoch, step, [best_val_cer], config}
where each model entry is a raw state_dict (reference train.py:632-673);
inference accepts {decoder: ...} / {state_dict: ...} / bare state_dict with
strict=False (reference inference.py:146-157).  This module converts those
state_dicts to/from the Flax parameter trees of `fddm_asr_tpu.models` so that

  * reference-trained checkpoints run under this framework bit-compatibly, and
  * checkpoints trained here can be exported back for the reference tooling.

torch is imported lazily: it is only needed when actually touching `.pt`
files; the TPU runtime itself never depends on it.

Key mapping notes:
  * torch Linear stores weight [out, in]; flax Dense kernel is [in, out].
  * torch nn.MultiheadAttention packs q/k/v as in_proj_weight [3d, d] /
    in_proj_bias [3d]; we split into q_proj/k_proj/v_proj (rows 0:d, d:2d,
    2d:3d) — the layout documented by torch.nn.functional.
    multi_head_attention_forward.
  * RoPE has a persistent `inv_freq` buffer in torch state_dicts; it is
    deterministic and recomputed on our side, so it is ignored on load and
    emitted on save.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _np(w) -> np.ndarray:
    return np.asarray(w)


def _to_numpy_state_dict(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _linear(sd: Mapping[str, np.ndarray], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    p = {"kernel": _t(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _layernorm(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _mha(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    d = w.shape[1]
    return {
        "q_proj": {"kernel": _t(w[:d]), "bias": _np(b[:d])},
        "k_proj": {"kernel": _t(w[d : 2 * d]), "bias": _np(b[d : 2 * d])},
        "v_proj": {"kernel": _t(w[2 * d :]), "bias": _np(b[2 * d :])},
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def decoder_params_from_state_dict(
    sd: Mapping[str, Any],
    num_layers: Optional[int] = None,
    pos_emb_type: str = "rope",
    use_film: bool = True,
    scan_blocks: bool = False,
) -> Dict[str, Any]:
    """Reference DenoisingTransformerDecoder state_dict -> flax params tree.

    scan_blocks=True stacks per-block leaves along a leading layer axis into
    "blocks_scan"/"block" (the nn.scan parameter layout).
    """
    sd = _to_numpy_state_dict(sd)
    if num_layers is None:
        num_layers = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
        )
    params: Dict[str, Any] = {
        "tok_emb": {"embedding": _np(sd["tok_emb.weight"])},
        "time_emb": {
            "mlp_0": _linear(sd, "time_emb.mlp.0"),
            "mlp_2": _linear(sd, "time_emb.mlp.2"),
        },
        "time_proj": _linear(sd, "time_proj"),
        "head": _linear(sd, "head"),
    }
    if pos_emb_type == "learned" and "pos_emb.weight" in sd:
        params["pos_emb"] = {"embedding": _np(sd["pos_emb.weight"])}

    def block_params(i: int) -> Dict[str, Any]:
        blk = {
            "self_attn": _mha(sd, f"blocks.{i}.self_attn"),
            "cross_attn": _mha(sd, f"blocks.{i}.cross_attn"),
            "ff_0": _linear(sd, f"blocks.{i}.ff.0"),
            "ff_3": _linear(sd, f"blocks.{i}.ff.3"),
            "norm1": _layernorm(sd, f"blocks.{i}.norm1"),
            "norm2": _layernorm(sd, f"blocks.{i}.norm2"),
            "norm3": _layernorm(sd, f"blocks.{i}.norm3"),
        }
        if use_film and f"blocks.{i}.film_layer.scale_proj.weight" in sd:
            blk["film_layer"] = {
                "scale_proj": _linear(sd, f"blocks.{i}.film_layer.scale_proj"),
                "shift_proj": _linear(sd, f"blocks.{i}.film_layer.shift_proj"),
            }
        return blk

    blocks = [block_params(i) for i in range(num_layers)]
    if scan_blocks:
        import jax

        params["blocks_scan"] = {
            "block": jax.tree.map(lambda *leaves: np.stack(leaves, axis=0), *blocks)
        }
    else:
        for i, blk in enumerate(blocks):
            params[f"blocks_{i}"] = blk
    return params


def decoder_state_dict_from_params(
    params: Mapping[str, Any],
    pos_emb_type: str = "rope",
    rope_base: float = 10000.0,
) -> Dict[str, np.ndarray]:
    """Flax decoder params -> reference-format torch-style state_dict (numpy).

    Wrap with `save_reference_checkpoint` to write an actual `.pt`.
    """
    p = {k: v for k, v in params.items()}
    sd: Dict[str, np.ndarray] = {
        "tok_emb.weight": _np(p["tok_emb"]["embedding"]),
        "time_emb.mlp.0.weight": _t(p["time_emb"]["mlp_0"]["kernel"]),
        "time_emb.mlp.0.bias": _np(p["time_emb"]["mlp_0"]["bias"]),
        "time_emb.mlp.2.weight": _t(p["time_emb"]["mlp_2"]["kernel"]),
        "time_emb.mlp.2.bias": _np(p["time_emb"]["mlp_2"]["bias"]),
        "time_proj.weight": _t(p["time_proj"]["kernel"]),
        "time_proj.bias": _np(p["time_proj"]["bias"]),
        "head.weight": _t(p["head"]["kernel"]),
        "head.bias": _np(p["head"]["bias"]),
    }
    d_model = sd["time_proj.weight"].shape[0]
    if pos_emb_type == "rope":
        inv_freq = 1.0 / (
            rope_base ** (np.arange(0, d_model, 2, dtype=np.float32) / d_model)
        )
        sd["pos_emb.inv_freq"] = inv_freq.astype(np.float32)
    elif pos_emb_type == "learned" and "pos_emb" in p:
        sd["pos_emb.weight"] = _np(p["pos_emb"]["embedding"])
    if "blocks_scan" in p:
        # Unstack the nn.scan parameter layout (leading layer axis) into
        # per-block entries so the rest of the export path is layout-agnostic.
        import jax

        stacked = p.pop("blocks_scan")["block"]
        n = int(np.asarray(jax.tree.leaves(stacked)[0]).shape[0])
        for i in range(n):
            p[f"blocks_{i}"] = jax.tree.map(lambda a: np.asarray(a)[i], stacked)
    for name, blk in p.items():
        if not name.startswith("blocks_"):
            continue
        i = int(name.split("_")[1])
        for attn in ("self_attn", "cross_attn"):
            a = blk[attn]
            w = np.concatenate(
                [_t(a["q_proj"]["kernel"]), _t(a["k_proj"]["kernel"]), _t(a["v_proj"]["kernel"])], 0
            )
            b = np.concatenate(
                [_np(a["q_proj"]["bias"]), _np(a["k_proj"]["bias"]), _np(a["v_proj"]["bias"])], 0
            )
            sd[f"blocks.{i}.{attn}.in_proj_weight"] = w
            sd[f"blocks.{i}.{attn}.in_proj_bias"] = b
            sd[f"blocks.{i}.{attn}.out_proj.weight"] = _t(a["out_proj"]["kernel"])
            sd[f"blocks.{i}.{attn}.out_proj.bias"] = _np(a["out_proj"]["bias"])
        if "film_layer" in blk:
            sd[f"blocks.{i}.film_layer.scale_proj.weight"] = _t(blk["film_layer"]["scale_proj"]["kernel"])
            sd[f"blocks.{i}.film_layer.scale_proj.bias"] = _np(blk["film_layer"]["scale_proj"]["bias"])
            sd[f"blocks.{i}.film_layer.shift_proj.weight"] = _t(blk["film_layer"]["shift_proj"]["kernel"])
            sd[f"blocks.{i}.film_layer.shift_proj.bias"] = _np(blk["film_layer"]["shift_proj"]["bias"])
        sd[f"blocks.{i}.ff.0.weight"] = _t(blk["ff_0"]["kernel"])
        sd[f"blocks.{i}.ff.0.bias"] = _np(blk["ff_0"]["bias"])
        sd[f"blocks.{i}.ff.3.weight"] = _t(blk["ff_3"]["kernel"])
        sd[f"blocks.{i}.ff.3.bias"] = _np(blk["ff_3"]["bias"])
        for n in ("norm1", "norm2", "norm3"):
            sd[f"blocks.{i}.{n}.weight"] = _np(blk[n]["scale"])
            sd[f"blocks.{i}.{n}.bias"] = _np(blk[n]["bias"])
    return sd


# ---------------------------------------------------------------- projections
def projection_params_from_state_dict(sd: Mapping[str, Any], kind: str) -> Dict[str, Any]:
    """Reference SpeechProjector/TextEmbedding/TextProjector state_dict -> flax.

    kind: "s_proj" | "t_embed" | "t_proj".
    """
    sd = _to_numpy_state_dict(sd)
    if kind == "t_embed":
        return {"proj": {"kernel": _t(sd["proj.weight"])}}
    # MLP with 0 or 1 hidden layer: keys proj.net.{0,2}
    out: Dict[str, Any] = {"proj": {"net_0": _linear(sd, "proj.net.0")}}
    if "proj.net.2.weight" in sd:
        out["proj"]["net_2"] = _linear(sd, "proj.net.2")
    return out


def projection_state_dict_from_params(params: Mapping[str, Any], kind: str) -> Dict[str, np.ndarray]:
    if kind == "t_embed":
        return {"proj.weight": _t(params["proj"]["kernel"])}
    sd = {
        "proj.net.0.weight": _t(params["proj"]["net_0"]["kernel"]),
        "proj.net.0.bias": _np(params["proj"]["net_0"]["bias"]),
    }
    if "net_2" in params["proj"]:
        sd["proj.net.2.weight"] = _t(params["proj"]["net_2"]["kernel"])
        sd["proj.net.2.bias"] = _np(params["proj"]["net_2"]["bias"])
    return sd


# ------------------------------------------------------------- full ckpt I/O
def load_reference_checkpoint(path: str, scan_blocks: bool = False) -> Dict[str, Any]:
    """Load a reference `.pt` checkpoint into numpy-backed flax param trees.

    Accepts the three formats the reference inference accepts: full training
    dict with a `decoder` key, `{state_dict: ...}`, or a bare decoder
    state_dict (reference inference.py:146-157).

    Returns dict with keys: decoder, [s_proj, t_embed, t_proj], epoch, step,
    best_val_cer, config (missing entries -> None).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {
        "epoch": None, "step": None, "best_val_cer": None, "config": None,
        "s_proj": None, "t_embed": None, "t_proj": None,
    }
    if isinstance(raw, dict) and "decoder" in raw:
        out["decoder"] = decoder_params_from_state_dict(
            raw["decoder"], scan_blocks=scan_blocks
        )
        for kind in ("s_proj", "t_embed", "t_proj"):
            if kind in raw:
                out[kind] = projection_params_from_state_dict(raw[kind], kind)
        for meta in ("epoch", "step", "best_val_cer", "config"):
            out[meta] = raw.get(meta)
    elif isinstance(raw, dict) and "state_dict" in raw:
        out["decoder"] = decoder_params_from_state_dict(
            raw["state_dict"], scan_blocks=scan_blocks
        )
    else:
        out["decoder"] = decoder_params_from_state_dict(raw, scan_blocks=scan_blocks)
    return out


def save_reference_checkpoint(
    path: str,
    decoder_params: Mapping[str, Any],
    s_proj_params: Optional[Mapping[str, Any]] = None,
    t_embed_params: Optional[Mapping[str, Any]] = None,
    t_proj_params: Optional[Mapping[str, Any]] = None,
    epoch: int = 0,
    step: int = 0,
    best_val_cer: Optional[float] = None,
    config: Optional[dict] = None,
    pos_emb_type: str = "rope",
) -> None:
    """Write a reference-format `.pt` (train.py:632-643 schema)."""
    import torch

    def to_torch(sd):
        # The reference .pt contract stores f32; ml_dtypes bfloat16 (e.g.
        # optim.ema_dtype: bfloat16 EMA weights) has no torch.from_numpy
        # mapping, so upcast any non-native float dtype here.
        def cvt(v):
            v = np.ascontiguousarray(v)
            if v.dtype.kind not in "fiub?c":
                v = v.astype(np.float32)
            return torch.from_numpy(v)

        return {k: cvt(v) for k, v in sd.items()}

    ckpt: Dict[str, Any] = {
        "decoder": to_torch(decoder_state_dict_from_params(decoder_params, pos_emb_type)),
        "epoch": epoch,
        "step": step,
        "config": config,
    }
    if s_proj_params is not None:
        ckpt["s_proj"] = to_torch(projection_state_dict_from_params(s_proj_params, "s_proj"))
    if t_embed_params is not None:
        ckpt["t_embed"] = to_torch(projection_state_dict_from_params(t_embed_params, "t_embed"))
    if t_proj_params is not None:
        ckpt["t_proj"] = to_torch(projection_state_dict_from_params(t_proj_params, "t_proj"))
    if best_val_cer is not None:
        ckpt["best_val_cer"] = best_val_cer
    import torch as _torch

    _torch.save(ckpt, path)
