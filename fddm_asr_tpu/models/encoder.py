# -*- coding: utf-8 -*-
"""AcousticEncoder: frozen WavLM backbone + projection to d_model.

Framework role of /root/reference/models/acoustic_encoder.py (lines 34-128):
c = c_psi(s) maps 16 kHz waveform -> acoustic condition for the decoder's
cross-attention.  Matches the reference's observable behavior:

  * optional Linear projection applied only when hidden_size != d_model
    (reference lines 54-55);
  * `feat_mask` computed from ceil(samples / 320) clamped to the actual frame
    count (reference lines 73-82, 109-117) — note this deliberately mirrors
    the reference's estimate rather than the exact conv-stack formula; the
    waveform-level attention mask handed to WavLM itself uses the exact conv
    arithmetic, as HF does;
  * optional masked mean pooling (reference lines 119-126).

The backbone is frozen by convention: parameters live in a separate pytree
that is simply never passed to the optimizer; `jax.lax.stop_gradient` is
applied on the output so encoder weights receive no gradient even when the
whole forward is differentiated (freeze=True default, reference lines 49-51).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel

Dtype = Any

from fddm_asr_tpu import CONV_RECEPTIVE_FIELD  # noqa: F401  (re-export)

WAVLM_HOP = 320  # samples per output frame (reference line 80)


def frame_length_estimate(sample_lengths: jnp.ndarray) -> jnp.ndarray:
    """ceil(samples / 320) — the reference's conservative frame count."""
    return (sample_lengths + WAVLM_HOP - 1) // WAVLM_HOP


class AcousticEncoder(nn.Module):
    """Waveform [B, T] -> (feats [B, S, d_model], feat_mask [B, S]|None, pooled)."""

    config: WavLMConfig
    d_model: int = 768
    proj: str = "linear"  # "linear" | "none"
    pooling: str = "none"  # "none" | "mean"
    freeze: bool = True
    dtype: Dtype = jnp.float32
    attention_fn: Any = None
    # sequence-parallel attention hook (ops/ring_attention) — forwarded to
    # WavLMModel; shards the frame axis across a mesh axis
    gated_attention_fn: Any = None

    @nn.compact
    def __call__(
        self,
        waveforms: jnp.ndarray,                    # [B, T] 16 kHz
        lengths: Optional[jnp.ndarray] = None,     # [B] valid sample counts
        deterministic: bool = True,
        mask_time_indices: Optional[jnp.ndarray] = None,  # [B, S] SpecAugment
        mask_feature_indices: Optional[jnp.ndarray] = None,  # [B, H] SpecAugment
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        B, T = waveforms.shape
        attention_mask = None
        if lengths is not None:
            attention_mask = jnp.arange(T)[None, :] < lengths[:, None]

        feats = WavLMModel(
            self.config, self.dtype, attention_fn=self.attention_fn,
            gated_attention_fn=self.gated_attention_fn, name="backbone"
        )(waveforms, attention_mask=attention_mask,
          mask_time_indices=mask_time_indices,
          mask_feature_indices=mask_feature_indices,
          deterministic=deterministic)
        if self.freeze:
            feats = jax.lax.stop_gradient(feats)

        use_proj = (self.proj == "linear") and (self.config.hidden_size != self.d_model)
        if use_proj:
            feats = nn.Dense(self.d_model, dtype=self.dtype, name="proj")(feats)

        S = feats.shape[1]
        feat_mask = None
        if lengths is not None:
            feat_lengths = jnp.minimum(frame_length_estimate(lengths), S)
            feat_mask = jnp.arange(S)[None, :] < feat_lengths[:, None]

        pooled = None
        if self.pooling == "mean":
            if feat_mask is None:
                pooled = jnp.mean(feats, axis=1)
            else:
                denom = jnp.clip(jnp.sum(feat_mask, axis=1), min=1)[:, None]
                pooled = jnp.sum(feats * feat_mask[..., None], axis=1) / denom

        return feats, feat_mask, pooled
