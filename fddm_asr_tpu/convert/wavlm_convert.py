# -*- coding: utf-8 -*-
"""HuggingFace WavLM -> Flax parameter conversion.

Maps `transformers.WavLMModel` state_dicts onto the parameter tree of
`fddm_asr_tpu.models.wavlm.WavLMModel`.  The positional-conv weight-norm
parametrisation (g, v with dim=2) is folded into a plain conv kernel — the
encoder is frozen in this framework (reference acoustic_encoder.py:49-51), so
the parametrisation carries no training semantics.

Layout conventions:
  * torch Linear weight [out, in]      -> flax Dense kernel [in, out]
  * torch Conv1d weight [Cout, Cin/g, k] -> flax Conv kernel [k, Cin/g, Cout]
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _np(w) -> np.ndarray:
    return np.asarray(w)


def _conv_kernel(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _norm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _fold_weight_norm(sd: Mapping[str, np.ndarray], prefix: str) -> np.ndarray:
    """Fold weight_norm(g, v, dim=2) into a dense [Cout, Cin/g, k] weight."""
    for g_key, v_key in (
        (f"{prefix}.parametrizations.weight.original0", f"{prefix}.parametrizations.weight.original1"),
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
    ):
        if g_key in sd:
            g = np.asarray(sd[g_key])  # [1, 1, k]
            v = np.asarray(sd[v_key])  # [Cout, Cin/g, k]
            norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=(0, 1), keepdims=True))
            return (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)
    return np.asarray(sd[f"{prefix}.weight"])  # already plain


def wavlm_params_from_state_dict(sd: Mapping[str, Any], config) -> Dict[str, Any]:
    """Convert a WavLMModel state_dict (HF names, no 'wavlm.' prefix).

    `config` is `fddm_asr_tpu.models.wavlm.WavLMConfig` (drives layer count
    and norm variant).
    """
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in sd.items()
    }

    fe: Dict[str, Any] = {}
    for i in range(len(config.conv_dim)):
        layer: Dict[str, Any] = {
            "conv": {"kernel": _conv_kernel(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])}
        }
        if f"feature_extractor.conv_layers.{i}.conv.bias" in sd:
            layer["conv"]["bias"] = _np(sd[f"feature_extractor.conv_layers.{i}.conv.bias"])
        norm_key = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if norm_key in sd:
            layer["layer_norm"] = _norm(sd, f"feature_extractor.conv_layers.{i}.layer_norm")
        fe[f"conv_layers_{i}"] = layer

    pos_conv = {
        "conv": {
            "kernel": _conv_kernel(_fold_weight_norm(sd, "encoder.pos_conv_embed.conv")),
            "bias": _np(sd["encoder.pos_conv_embed.conv.bias"]),
        }
    }

    encoder: Dict[str, Any] = {
        "pos_conv_embed": pos_conv,
        "layer_norm": _norm(sd, "encoder.layer_norm"),
    }

    def layer_params(i: int) -> Dict[str, Any]:
        p = f"encoder.layers.{i}"
        attn: Dict[str, Any] = {
            "q_proj": _linear(sd, f"{p}.attention.q_proj"),
            "k_proj": _linear(sd, f"{p}.attention.k_proj"),
            "v_proj": _linear(sd, f"{p}.attention.v_proj"),
            "out_proj": _linear(sd, f"{p}.attention.out_proj"),
            "gru_rel_pos_linear": _linear(sd, f"{p}.attention.gru_rel_pos_linear"),
            "gru_rel_pos_const": _np(sd[f"{p}.attention.gru_rel_pos_const"]),
        }
        if f"{p}.attention.rel_attn_embed.weight" in sd:
            attn["rel_attn_embed"] = {"embedding": _np(sd[f"{p}.attention.rel_attn_embed.weight"])}
        return {
            "attention": attn,
            "layer_norm": _norm(sd, f"{p}.layer_norm"),
            "final_layer_norm": _norm(sd, f"{p}.final_layer_norm"),
            "feed_forward": {
                "intermediate_dense": _linear(sd, f"{p}.feed_forward.intermediate_dense"),
                "output_dense": _linear(sd, f"{p}.feed_forward.output_dense"),
            },
        }

    encoder["layers_0"] = layer_params(0)
    rest = [layer_params(i) for i in range(1, config.num_hidden_layers)]
    if rest and config.scan_layers:
        # stack layers 1..N-1 leaf-wise for the nn.scan parameter layout
        import jax

        encoder["layers_scan"] = {
            "layer": jax.tree.map(lambda *leaves: np.stack(leaves, axis=0), *rest)
        }
    else:
        for i, lp in enumerate(rest, start=1):
            encoder[f"layers_{i}"] = lp

    params: Dict[str, Any] = {
        "feature_extractor": fe,
        "feature_projection": {
            "layer_norm": _norm(sd, "feature_projection.layer_norm"),
            "projection": _linear(sd, "feature_projection.projection"),
        },
        "encoder": encoder,
    }
    if "masked_spec_embed" in sd:
        params["masked_spec_embed"] = _np(sd["masked_spec_embed"])
    else:
        # HF only creates masked_spec_embed when mask_time_prob > 0; our
        # module creates it unconditionally (so trees stay mask-capable).
        # Zeros is inert: the param is read only under SpecAugment masks.
        hidden = params["feature_projection"]["projection"]["kernel"].shape[1]
        params["masked_spec_embed"] = np.zeros((hidden,), np.float32)
    return params


def load_pretrained_wavlm(name_or_path: str):
    """Load a pretrained WavLM via transformers and convert.

    Returns (WavLMConfig, flax params dict).  Requires the weights to be
    available locally (offline environments: pass a local directory).
    """
    from transformers import WavLMModel as HFWavLMModel

    from fddm_asr_tpu.models.wavlm import WavLMConfig

    hf = HFWavLMModel.from_pretrained(name_or_path)
    config = WavLMConfig.from_hf(hf.config)
    params = wavlm_params_from_state_dict(hf.state_dict(), config)
    return config, params
