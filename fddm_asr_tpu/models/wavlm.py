# -*- coding: utf-8 -*-
"""WavLM in JAX/Flax — the frozen acoustic backbone c = c_psi(s).

A from-scratch Flax implementation of the WavLM architecture (conv feature
encoder + transformer with gated relative-position-bias attention), matching
the HuggingFace `transformers.WavLMModel` numerics so that pretrained
microsoft/wavlm-large weights convert losslessly
(`fddm_asr_tpu.convert.wavlm_convert`).  Behavioral reference for the
*framework role* of this module: /root/reference/models/acoustic_encoder.py
(wraps WavLMModel, lines 34-128).

Architecture notes (wavlm-large: hidden 1024, 24 layers, 16 heads, ff 4096,
feat_extract_norm="layer", do_stable_layer_norm=True):

  * Feature encoder: 7 temporal convs, kernels (10,3,3,3,3,2,2), strides
    (5,2,2,2,2,2,2) — total hop 320 samples; "layer" norm variant applies a
    channel LayerNorm after each conv, then exact GELU.
  * Feature projection: LayerNorm(512) -> Linear(512 -> hidden).
  * Positional conv embedding: grouped Conv1d(hidden, hidden, k=128, groups=16,
    pad 64) with weight-norm (folded at conversion), drop last frame (even
    kernel), GELU.
  * Encoder layers (stable-LN = pre-LN): LN -> gated-rel-pos-bias attention ->
    +residual; FFN over final_layer_norm(x) -> +residual; one trailing
    encoder LayerNorm.
  * Relative position bias: T5-style log-bucketed (num_buckets=320,
    max_distance=800), embedded per head by layer 0 only and reused by all
    layers; each layer applies its own sigmoid gate computed from its
    pre-projection hidden states.

TPU-first choices: channel-last conv layout (feeds the MXU directly), bucket
tables computed with numpy at trace time (static shapes), bf16-able compute
with f32 params, attention through the pluggable kernel in
`fddm_asr_tpu.ops.attention`.

SpecAugment time/feature masking is a training-time feature of the HF model;
the FDDM pipeline keeps the encoder frozen (reference acoustic_encoder.py:49),
so masking is exposed via `mask_time_indices` only (precomputed on host).
LayerDrop is likewise training-only and not applied.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fddm_asr_tpu.ops.attention import dot_product_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    """Subset of HF WavLMConfig needed for the forward pass."""

    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Sequence[int] = (512,) * 7
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"  # "layer" (large) | "group" (base)
    do_stable_layer_norm: bool = True
    num_buckets: int = 320
    max_bucket_distance: int = 800
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    feat_proj_dropout: float = 0.0
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    # Compile layers 1..N-1 as ONE lax.scan body with stacked params instead
    # of unrolling N near-identical layers into the HLO graph — ~N x smaller
    # program, minutes less XLA compile time for wavlm-large.  Numerics are
    # identical (parity-tested); param tree gains a stacked "layers_scan"
    # entry (the converter stacks accordingly).
    scan_layers: bool = False
    # Rematerialize (jax.checkpoint) each transformer layer's activations in
    # the backward pass.  Only relevant when the encoder is TRAINED
    # (model.encoder.freeze: false): fine-tuning wavlm-large at B=16 x 20 s
    # stores ~24 layers x O(B*S*H) activation tensors without it; with it,
    # layer activations are recomputed from the layer input during backprop
    # (O(1) layers live at once) at ~1/3 extra FLOPs — the standard
    # memory/compute trade on TPU.  No effect on forward numerics; no effect
    # at all under stop_gradient (frozen encoder).
    remat_layers: bool = False
    # What the remat checkpoint SAVES across the forward scan:
    #   "full" — save nothing, recompute the whole layer in backprop (max
    #            memory savings, the jax.checkpoint default);
    #   "dots" — save plain-matmul outputs (qkv/out/FFN projections) and
    #            recompute only the batched attention tensors + elementwise
    #            ops (jax.checkpoint_policies.dots_with_no_batch_dims_
    #            saveable).  ~288 MB/layer extra HBM at B=16 x 20 s but the
    #            backward scan skips the projection recompute.
    # Measured (v5e, wavlm-large fine-tune, no-dropout + SpecAugment):
    # B=8 dots 16.54 ex/s vs full 16.0 (+3.4%); B=16 dots OOMs (by ~1 GB)
    # while full reaches 17.16 ex/s — so "full" at the largest batch that
    # fits remains the best recipe; "dots" helps only when the batch is
    # bounded by something else.  The backward scan is dominated by the
    # batched-attention recompute either way (scripts/profile_finetune.py).
    # No-remat is NOT offered for wavlm-large fine-tuning: the saved
    # per-layer gate tensors alone ([B, H, S, S] f32 x 23 layers ~ 24 GB at
    # B=16) exceed v5e HBM.
    remat_policy: str = "full"
    # Fine-tuning: keep the conv feature extractor frozen (stop_gradient on
    # its output) — HF's freeze_feature_encoder(), the standard WavLM
    # fine-tune recipe.  No effect when the whole encoder is frozen.
    freeze_feature_extractor: bool = False
    # Fuse gate*pos_bias + attention into one Pallas kernel on TPU (falls
    # back to XLA elsewhere): avoids materialising two [B, H, L, L] HBM
    # tensors per layer.  See fddm_asr_tpu.ops.flash_attention.
    fused_attention: bool = False
    # Fuse conv+LayerNorm+GELU of the feature extractor into one Pallas
    # kernel per layer ("layer"-norm variant only) — single HBM read/write
    # of the 64k-position early feature maps.  See ops/conv_frontend.py.
    fused_frontend: bool = False
    # Use the tanh approximation of GELU instead of the exact erf form
    # everywhere in WavLM (conv front-end, pos-conv, FFN).  On TPU the
    # transcendental erf costs ~15 ms/step on the 64k-position conv feature
    # maps alone (measured, scripts/profile_frontend.py); tanh-GELU differs
    # by ~1 ulp of bfloat16 (max|dy| 6e-2, mean 3e-3 on unit-scale inputs) —
    # below the bf16 compute noise of the flagship path.  Off by default:
    # exact-erf matches HF WavLM for the f32 parity suite.
    gelu_approx_tanh: bool = False
    # Run the encoder's large matmuls (FFN intermediate/output, attention
    # q/k/v/out projections) through the int8 MXU path with dynamic
    # symmetric quantization (per-token activation scales x per-channel
    # weight scales) — ~1.32x on those matmuls on v5e (measured,
    # scripts/probe_int8.py).  Values: "none" | "int8" | "int8_fused"
    # (the latter runs the same numerics through a single Pallas pass that
    # keeps activation quantization in VMEM).  Parameter layout
    # is unchanged (quantized on the fly), so checkpoints are shared with
    # the full-precision path.  Inference-only: keep "none" for training
    # and for the f32 parity suite.  See fddm_asr_tpu/ops/quant.py.
    quant_dense: str = "none"
    # Pad the encoder sequence axis up to a multiple of this at encoder entry
    # (zero frames + key-mask).  Real-frame numerics are unchanged: the
    # encoder zeroes masked positions before pos_conv exactly like HF, and the
    # pad frames are masked out of every attention.  At 128, every pad inside
    # the fused-attention wrapper (q/k/v and the [H, L, L] position bias)
    # becomes zero-width and is elided by XLA — removing a loop-invariant
    # ~67 MB bias re-pad from each scanned layer (~4 ms/step at B=16).
    seq_pad_multiple: int = 1

    @classmethod
    def large(cls) -> "WavLMConfig":
        return cls()

    @classmethod
    def base(cls) -> "WavLMConfig":
        return cls(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, conv_bias=False, feat_extract_norm="group",
            do_stable_layer_norm=False,
        )

    @classmethod
    def tiny_for_tests(cls) -> "WavLMConfig":
        """Geometry-preserving toy config for fast parity/unit tests."""
        return cls(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, conv_dim=(16,) * 7,
            num_buckets=32, max_bucket_distance=80,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        )

    @classmethod
    def from_hf(cls, hf_config) -> "WavLMConfig":
        return cls(
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            conv_dim=tuple(hf_config.conv_dim),
            conv_kernel=tuple(hf_config.conv_kernel),
            conv_stride=tuple(hf_config.conv_stride),
            conv_bias=hf_config.conv_bias,
            feat_extract_norm=hf_config.feat_extract_norm,
            do_stable_layer_norm=hf_config.do_stable_layer_norm,
            num_buckets=hf_config.num_buckets,
            max_bucket_distance=hf_config.max_bucket_distance,
            num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=hf_config.num_conv_pos_embedding_groups,
            layer_norm_eps=hf_config.layer_norm_eps,
            feat_proj_dropout=hf_config.feat_proj_dropout,
            hidden_dropout=hf_config.hidden_dropout,
            attention_dropout=hf_config.attention_dropout,
            activation_dropout=hf_config.activation_dropout,
        )

    def feat_extract_output_length(self, input_length) -> Any:
        """Conv-stack output length: floor((len - k)/s) + 1 per layer.

        Works on python ints or integer arrays (numpy/jnp).
        """
        length = input_length
        for k, s in zip(self.conv_kernel, self.conv_stride):
            length = (length - k) // s + 1
        return length


def _gelu(x, approximate: bool = False):
    return jax.nn.gelu(x, approximate=approximate)


def _dense(cfg: "WavLMConfig", features: int, dtype: Dtype, name: str):
    """nn.Dense, or its int8-MXU drop-in when cfg.quant_dense != "none".

    "int8" = XLA dynamic-quant path; "int8_fused" = single-pass Pallas
    kernel (same numerics, quantization fused into the matmul's VMEM
    residency — fddm_asr_tpu/ops/quant.py::int8_matmul_fused).
    """
    if cfg.quant_dense in ("int8", "int8_fused"):
        from fddm_asr_tpu.ops.quant import Int8Dense

        return Int8Dense(
            features, dtype=dtype, name=name,
            fused=cfg.quant_dense == "int8_fused",
        )
    if cfg.quant_dense != "none":
        raise ValueError(
            f"quant_dense={cfg.quant_dense!r}: expected 'none', 'int8', or"
            " 'int8_fused'"
        )
    return nn.Dense(features, dtype=dtype, name=name)


class ConvLayer(nn.Module):
    """One temporal conv of the feature encoder ("layer"/"group"/"none" norm)."""

    out_dim: int
    kernel: int
    stride: int
    use_bias: bool
    norm: str  # "layer" | "group" | "none"
    eps: float
    dtype: Dtype = jnp.float32
    fused: bool = False
    gelu_tanh: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C_in]
        conv = nn.Conv(
            self.out_dim, (self.kernel,), strides=(self.stride,), padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )
        if self.fused and self.norm == "layer":
            # materialise the submodule params without running the real ops
            # (tiny dummy calls — DCE'd by XLA), then run the fused kernel
            ln = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm")
            _ = conv(jnp.zeros((1, self.kernel, x.shape[-1]), x.dtype))
            _ = ln(jnp.zeros((1, 1, self.out_dim), x.dtype))
            cp = conv.variables["params"]
            lp = ln.variables["params"]
            from fddm_asr_tpu.ops.conv_frontend import conv_ln_gelu

            return conv_ln_gelu(
                x, cp["kernel"], cp.get("bias"), lp["scale"], lp["bias"],
                self.stride, gelu_tanh=self.gelu_tanh,
            )
        x = conv(x)
        if self.norm == "layer":
            x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm")(x)
        elif self.norm == "group":
            # torch GroupNorm(num_groups=C, num_channels=C) == per-channel
            # InstanceNorm over time.
            x = nn.GroupNorm(
                num_groups=self.out_dim, epsilon=1e-5, dtype=self.dtype, name="layer_norm"
            )(x)
        return _gelu(x, self.gelu_tanh)


class FeatureEncoder(nn.Module):
    """Raw waveform [B, T] -> conv features [B, S, conv_dim[-1]]."""

    config: WavLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = input_values[..., None].astype(self.dtype)  # [B, T, 1]
        for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
            if cfg.feat_extract_norm == "layer":
                norm = "layer"
            else:
                norm = "group" if i == 0 else "none"
            x = ConvLayer(
                dim, k, s, cfg.conv_bias, norm, cfg.layer_norm_eps, self.dtype,
                fused=cfg.fused_frontend, gelu_tanh=cfg.gelu_approx_tanh,
                name=f"conv_layers_{i}",
            )(x)
        return x


class FeatureProjection(nn.Module):
    config: WavLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="projection")(x)
        return nn.Dropout(cfg.feat_proj_dropout, deterministic=deterministic)(x)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding; weight-norm folded into `conv`."""

    config: WavLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, S, H]
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        h = nn.Conv(
            cfg.hidden_size, (k,), padding=[(k // 2, k // 2)],
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype, name="conv",
        )(x)
        if k % 2 == 0:  # SamePadLayer: drop the trailing frame for even kernels
            h = h[:, :-1, :]
        return _gelu(h, cfg.gelu_approx_tanh)


def relative_position_buckets(
    query_len: int, key_len: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """T5-style bidirectional log-bucketing of relative positions.

    Static-shape computation (numpy at trace time).  Mirrors HF WavLM's
    `_relative_positions_bucket` semantics.
    """
    context = np.arange(query_len, dtype=np.int64)[:, None]
    memory = np.arange(key_len, dtype=np.int64)[None, :]
    rel = memory - context  # [Lq, Lk]

    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    # floor rel at 1 in the log: rel < max_exact rows are overridden by
    # `is_small` below, this just avoids log(0).
    large = np.log(np.maximum(rel, 1).astype(np.float32) / max_exact) / math.log(
        max_distance / max_exact
    )
    large = (max_exact + large * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets  # [Lq, Lk] int


class GatedRelPosAttention(nn.Module):
    """Self-attention with WavLM's gated relative position bias.

    `position_bias` [H, L, L] is computed by the layer that owns
    `rel_attn_embed` (layer 0) and reused downstream; each layer gates it with
    sigmoid gates derived from its own (pre-projection) hidden states.
    """

    config: WavLMConfig
    has_relative_position_bias: bool
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    # Sequence-parallel hook: called with the UNFUSED attention inputs
    # (q/k/v [B,L,H,dh], pos_bias [H,L,L], gate [B,H,L], key_mask [B,L])
    # BEFORE any [B,H,L,L] bias materialisation — the contract
    # ops/ring_attention.ring_gated_attention needs to shard the frame axis.
    gated_attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, L, H*dh]
        key_mask: Optional[jnp.ndarray],
        position_bias: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        B, L, _ = x.shape
        H = cfg.num_attention_heads
        dh = cfg.hidden_size // H

        if position_bias is None:
            if not self.has_relative_position_bias:
                raise ValueError("first layer must own rel_attn_embed")
            buckets = relative_position_buckets(
                L, L, cfg.num_buckets, cfg.max_bucket_distance
            )
            rel_embed = nn.Embed(
                cfg.num_buckets, H, dtype=self.dtype, name="rel_attn_embed"
            )
            values = rel_embed(jnp.asarray(buckets))  # [L, L, H]
            position_bias = jnp.transpose(values, (2, 0, 1))  # [H, L, L]

        # --- gate from pre-projection hidden states (HF lines 168-183) ------
        # computed in the natural [B, L, H, dh] layout (a free view of x):
        # transposing x to [B, H, L, dh] first materialised a full-size copy
        # per layer just to feed an H*dh -> 8 projection
        gated = x.reshape(B, L, H, dh)
        rel_proj = nn.Dense(8, dtype=self.dtype, name="gru_rel_pos_linear")(gated)
        rel_proj = rel_proj.reshape(B, L, H, 2, 4).sum(-1)  # [B,L,H,2]
        gates = jax.nn.sigmoid(rel_proj)
        gate_a, gate_b = gates[..., 0], gates[..., 1]  # [B,L,H]
        gru_const = self.param(
            "gru_rel_pos_const", nn.initializers.ones, (1, H, 1, 1), jnp.float32
        )
        gate_out = gate_a * (gate_b * gru_const[0, :, 0, 0] - 1.0) + 2.0  # [B,L,H]
        gate_out = jnp.transpose(gate_out, (0, 2, 1))  # [B,H,L] (small copy)

        q = _dense(cfg, cfg.hidden_size, self.dtype, "q_proj")(x)
        k = _dense(cfg, cfg.hidden_size, self.dtype, "k_proj")(x)
        v = _dense(cfg, cfg.hidden_size, self.dtype, "v_proj")(x)

        if self.gated_attention_fn is not None:
            # exact-softmax only (same restriction as the trainable fused
            # kernel): silently skipping attention dropout would make a
            # seq-parallel fine-tune train with different regularization
            # than the single-device run it must reproduce
            if not deterministic and cfg.attention_dropout > 0.0:
                raise ValueError(
                    "sequence-parallel attention (gated_attention_fn) does "
                    "not implement attention dropout; set "
                    "attention_dropout: 0.0 (regularize with SpecAugment, "
                    "the recommended fine-tune recipe) or disable "
                    "seq_parallel for this run")
            out = self.gated_attention_fn(
                q.reshape(B, L, H, dh), k.reshape(B, L, H, dh),
                v.reshape(B, L, H, dh), position_bias, gate_out, key_mask,
            )
            out = out.reshape(B, L, cfg.hidden_size)
        elif cfg.fused_attention and deterministic:
            # head-PACKED kernel: q/k/v go in (and come out) exactly as the
            # Dense projections produce them — no [B,H,L,dh] relayout copies
            from fddm_asr_tpu.ops.flash_attention import (
                wavlm_gated_attention_heads_packed,
            )

            out = wavlm_gated_attention_heads_packed(
                q, k, v, position_bias, gate_out, key_mask, num_heads=H
            )
        elif cfg.fused_attention and cfg.attention_dropout == 0.0:
            # TRAINING-mode fused attention (custom VJP): forward + backward
            # both stream [bq, Lk] tiles through VMEM instead of the XLA
            # path's [B, H, L, L] HBM tensors — the dominant HBM traffic of
            # the fine-tune step.  Exact-softmax gradients only, hence the
            # attention_dropout == 0 gate (the recommended fine-tune recipe
            # regularizes with SpecAugment instead; see sample_time_mask).
            from fddm_asr_tpu.ops.flash_attention import (
                wavlm_gated_attention_heads_packed_trainable,
            )

            out = wavlm_gated_attention_heads_packed_trainable(
                q, k, v, position_bias, gate_out, key_mask, num_heads=H
            )
        else:
            q = q.reshape(B, L, H, dh)
            k = k.reshape(B, L, H, dh)
            v = v.reshape(B, L, H, dh)
            gated_bias = gate_out[..., None] * position_bias[None]  # [B,H,L,L]
            dropout_rng = None
            if not deterministic and cfg.attention_dropout > 0.0:
                dropout_rng = self.make_rng("dropout")
            attn_fn = self.attention_fn or dot_product_attention
            out = attn_fn(
                q, k, v, key_mask=key_mask, bias=gated_bias,
                dropout_rate=cfg.attention_dropout if not deterministic else 0.0,
                dropout_rng=dropout_rng,
            )
            out = out.reshape(B, L, cfg.hidden_size)
        out = _dense(cfg, cfg.hidden_size, self.dtype, "out_proj")(out)
        return out, position_bias


class FeedForward(nn.Module):
    config: WavLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        h = _dense(cfg, cfg.intermediate_size, self.dtype, "intermediate_dense")(x)
        h = _gelu(h, cfg.gelu_approx_tanh)
        h = nn.Dropout(cfg.activation_dropout, deterministic=deterministic)(h)
        h = _dense(cfg, cfg.hidden_size, self.dtype, "output_dense")(h)
        return nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(h)


class EncoderLayerStableLN(nn.Module):
    """Pre-LN layer (wavlm-large)."""

    config: WavLMConfig
    has_relative_position_bias: bool
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    gated_attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, key_mask, position_bias, deterministic: bool = True):
        cfg = self.config
        residual = x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x)
        h, position_bias = GatedRelPosAttention(
            cfg, self.has_relative_position_bias, self.dtype,
            attention_fn=self.attention_fn,
            gated_attention_fn=self.gated_attention_fn, name="attention",
        )(h, key_mask, position_bias, deterministic)
        h = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(h)
        x = residual + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)
        x = x + FeedForward(cfg, self.dtype, name="feed_forward")(h, deterministic)
        return x, position_bias


class EncoderLayerPostLN(nn.Module):
    """Post-LN layer (wavlm-base)."""

    config: WavLMConfig
    has_relative_position_bias: bool
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    gated_attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, key_mask, position_bias, deterministic: bool = True):
        cfg = self.config
        residual = x
        h, position_bias = GatedRelPosAttention(
            cfg, self.has_relative_position_bias, self.dtype,
            attention_fn=self.attention_fn,
            gated_attention_fn=self.gated_attention_fn, name="attention",
        )(x, key_mask, position_bias, deterministic)
        h = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(residual + h)
        x = x + FeedForward(cfg, self.dtype, name="feed_forward")(x, deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)
        return x, position_bias


class _ScanLayerBody(nn.Module):
    """One non-first encoder layer, shaped for nn.scan (carry=x, out=None)."""

    config: WavLMConfig
    deterministic: bool
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    gated_attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, key_mask, position_bias):
        cfg = self.config
        layer_cls = EncoderLayerStableLN if cfg.do_stable_layer_norm else EncoderLayerPostLN
        x, _ = layer_cls(
            cfg, has_relative_position_bias=False, dtype=self.dtype,
            attention_fn=self.attention_fn,
            gated_attention_fn=self.gated_attention_fn, name="layer",
        )(x, key_mask, position_bias, self.deterministic)
        return x, None


class Encoder(nn.Module):
    config: WavLMConfig
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    gated_attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic: bool = True):
        cfg = self.config
        S0 = x.shape[1]
        pad = (-S0) % max(cfg.seq_pad_multiple, 1)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            if key_mask is None:
                key_mask = jnp.broadcast_to(
                    jnp.arange(S0 + pad)[None, :] < S0, x.shape[:2]
                )
            else:
                key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
        if key_mask is not None:
            x = jnp.where(key_mask[..., None], x, 0.0)
        x = x + PositionalConvEmbedding(cfg, self.dtype, name="pos_conv_embed")(x)
        if not cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(x)

        layer_cls = EncoderLayerStableLN if cfg.do_stable_layer_norm else EncoderLayerPostLN
        x, position_bias = layer_cls(
            cfg, has_relative_position_bias=True, dtype=self.dtype,
            attention_fn=self.attention_fn,
            gated_attention_fn=self.gated_attention_fn, name="layers_0",
        )(x, key_mask, None, deterministic)

        n_rest = cfg.num_hidden_layers - 1
        if n_rest > 0 and cfg.scan_layers:
            # remat_layers: checkpoint each scanned layer so fine-tuning
            # (freeze=false) keeps O(1) layer activations live instead of
            # O(num_layers).  prevent_cse=False is the recommended setting
            # under scan (the scan boundary already prevents the unsafe CSE).
            if cfg.remat_layers:
                if cfg.remat_policy == "dots":
                    policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                elif cfg.remat_policy == "full":
                    policy = None
                else:
                    raise ValueError(
                        f"remat_policy must be 'full' or 'dots', got "
                        f"{cfg.remat_policy!r}")
                body = nn.remat(_ScanLayerBody, prevent_cse=False, policy=policy)
            else:
                body = _ScanLayerBody
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=n_rest,
            )(cfg, deterministic, self.dtype, self.attention_fn,
              self.gated_attention_fn, name="layers_scan")
            x, _ = scanned(x, key_mask, position_bias)
        else:
            if cfg.remat_layers and n_rest > 0:
                raise ValueError(
                    "remat_layers requires scan_layers=True (the unrolled "
                    "path is only used for parity tests, which never remat)"
                )
            for i in range(1, cfg.num_hidden_layers):
                x, position_bias = layer_cls(
                    cfg, has_relative_position_bias=False, dtype=self.dtype,
                    attention_fn=self.attention_fn,
                    gated_attention_fn=self.gated_attention_fn,
                    name=f"layers_{i}",
                )(x, key_mask, position_bias, deterministic)
        if cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x)
        return x[:, :S0] if pad else x


def sample_time_mask(rng, batch: int, seq_len: int,
                     mask_prob: float, mask_length: int) -> jnp.ndarray:
    """SpecAugment time masks [B, S] (True = masked), jit-friendly.

    HF's _compute_mask_indices (numpy, host-side) samples a per-row number
    of spans then scatters; this is the static-shape XLA equivalent: a fixed
    span count round(mask_prob * S / mask_length) per row with uniform span
    starts (spans may overlap, exactly as in HF's overlapping scatter).
    Masked frames are replaced by the learned masked_spec_embed — the
    standard WavLM fine-tuning regularizer (cheap [B, S] masks, unlike
    attention dropout's [B, H, S, S] tensors).
    """
    n_spans = max(1, round(mask_prob * seq_len / mask_length))
    starts = jax.random.randint(
        rng, (batch, n_spans), 0, max(1, seq_len - mask_length + 1))
    idx = starts[..., None] + jnp.arange(mask_length)           # [B, n, L]
    mask = jnp.zeros((batch, seq_len), bool)
    return mask.at[jnp.arange(batch)[:, None, None], idx].set(True)


class WavLMModel(nn.Module):
    """Waveform [B, T] (+ optional sample-level attention mask) -> [B, S, H].

    Matches HF WavLMModel.forward in eval mode (no SpecAugment/LayerDrop).
    `mask_time_indices` [B, S] bool optionally replaces masked frames with the
    learned `masked_spec_embed` vector (used only if the encoder is trained).
    """

    config: WavLMConfig
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    # Sequence-parallel attention hook (ops/ring_attention): receives
    # unfused q/k/v/pos_bias/gate/key_mask in every layer.
    gated_attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(
        self,
        input_values: jnp.ndarray,                  # [B, T] float waveform
        attention_mask: Optional[jnp.ndarray] = None,  # [B, T] True=valid sample
        mask_time_indices: Optional[jnp.ndarray] = None,
        mask_feature_indices: Optional[jnp.ndarray] = None,  # [B, H] bool
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        feats = FeatureEncoder(cfg, self.dtype, name="feature_extractor")(input_values)
        if cfg.freeze_feature_extractor:
            # HF freeze_feature_encoder() analogue: the conv front-end stays
            # frozen during fine-tuning (the standard wav2vec2/WavLM recipe —
            # it also removes the conv backward pass, which profiles at
            # several hundred ms/step at B=16x20s).  feature_projection and
            # the transformer still train.
            feats = jax.lax.stop_gradient(feats)
        S = feats.shape[1]

        feat_mask = None
        if attention_mask is not None:
            lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
            out_lengths = cfg.feat_extract_output_length(lengths)
            feat_mask = jnp.arange(S)[None, :] < out_lengths[:, None]

        x = FeatureProjection(cfg, self.dtype, name="feature_projection")(feats, deterministic)
        # created unconditionally (HF WavLM does too at its default
        # mask_time_prob=0.05) so randomly-initialized trees can later be
        # applied WITH SpecAugment masks without a param-tree mismatch
        masked_embed = self.param(
            "masked_spec_embed",
            nn.initializers.uniform(scale=1.0),
            (cfg.hidden_size,),
            jnp.float32,
        )
        if mask_time_indices is not None:
            x = jnp.where(mask_time_indices[..., None], masked_embed.astype(x.dtype), x)
        if mask_feature_indices is not None:
            # SpecAugment feature masks (HF mask_feature_prob): the masked
            # hidden dims are zeroed across ALL time steps of the row
            x = jnp.where(mask_feature_indices[:, None, :], 0.0, x)
        x = Encoder(cfg, self.dtype, attention_fn=self.attention_fn,
                    gated_attention_fn=self.gated_attention_fn, name="encoder")(
            x, feat_mask, deterministic
        )
        return x
