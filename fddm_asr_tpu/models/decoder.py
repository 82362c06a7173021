# -*- coding: utf-8 -*-
"""Non-autoregressive denoising transformer decoder f_theta(x_t, t, c) — Flax.

Predicts logits over the clean sequence x_0 from noised tokens x_t, the
diffusion timestep t and the acoustic condition c via self-attention,
cross-attention, FiLM gating and RoPE.

Behavioral reference: /root/reference/models/denoise_decoder.py (RoPEEmbedding
25-53, SinusoidalPositionEmbedding 56-71, FiLMLayer 74-89,
SinusoidalTimeEmbedding 92-119, DecoderBlock 122-192,
DenoisingTransformerDecoder 194-287).  Structure is matched op-for-op so that
(a) converted PyTorch checkpoints reproduce reference logits and (b) training
dynamics match.  Notable reference quirks reproduced deliberately:

  * RoPE is applied to the FULL d_model embedding BEFORE the q/k input
    projections (not per-head after projection, as standard RoPE would), and
    uses a nonstandard interleaved split: with emb = concat(freqs, freqs),
      rotated = concat(x_even * cos(emb)[..., ::2] - x_odd * sin(emb)[..., 1::2],
                       x_even * sin(emb)[..., ::2] + x_odd * cos(emb)[..., 1::2])
    (reference lines 42-53).  Reproduced numerically, not "fixed".
  * Post-LayerNorm residual blocks; no causal mask (non-autoregressive).
  * FiLM consumes the mask-pooled *raw* condition (mean over valid frames).
  * The time embedding uses freqs = exp(-linspace(log 1, log 10000, d/2)) and
    is added to every position through a Linear projection.

TPU-first design choices:
  * Pure Flax (linen) module; attention goes through a pluggable
    `attention_fn` (default: the XLA einsum path in
    `fddm_asr_tpu.ops.attention` — at L=64 text tokens the decoder is not
    attention-bound; the fused Pallas kernels in `ops.flash_attention`
    serve the WavLM encoder's 1k-frame sequences).
  * A `dtype` knob runs matmuls in bfloat16 (params stay float32); the head
    logits are always float32 for stable softmax/KL at K=8000.
  * Parameter tree uses separate q/k/v/out projections (TP-shardable along the
    heads axis); the converter splits torch's packed in_proj accordingly.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fddm_asr_tpu.ops.attention import dot_product_attention

Dtype = Any


def rope_tables(seq_len: int, d_model: int, base: float = 10000.0):
    """cos/sin tables of the reference RoPEEmbedding.forward (lines 35-40).

    Returns (cos, sin), each [seq_len, d_model], where emb = concat(f, f) and
    f[l, i] = l / base^(2i/d_model).
    """
    inv_freq = 1.0 / (base ** (jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [L, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [L, d]
    return jnp.cos(emb), jnp.sin(emb)


def apply_rotary_pos_emb(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """The reference's nonstandard interleaved rotation (lines 43-53).

    x: [..., L, d]; cos/sin: [L, d].
    """
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    cos_e = cos[..., 0::2]
    sin_o = sin[..., 1::2]
    sin_e = sin[..., 0::2]
    cos_o = cos[..., 1::2]
    return jnp.concatenate(
        [x1 * cos_e - x2 * sin_o, x1 * sin_e + x2 * cos_o], axis=-1
    )


def sinusoidal_position_embedding(seq_len: int, d_model: int, max_len: int = 10000) -> jnp.ndarray:
    """Reference SinusoidalPositionEmbedding.forward (lines 63-71)."""
    pos = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(max_len) / d_model)
    )
    pe = jnp.zeros((seq_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div_term))
    return pe


class SinusoidalTimeEmbedding(nn.Module):
    """DDPM-style timestep embedding + 4x MLP w/ SiLU (reference lines 92-119)."""

    d_model: int
    max_steps: int = 10000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        if t.ndim == 0:
            t = t[None]
        half = self.d_model // 2
        freqs = jnp.exp(
            -jnp.linspace(math.log(1.0), math.log(self.max_steps), half, dtype=jnp.float32)
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
        if self.d_model % 2 == 1:
            emb = jnp.pad(emb, ((0, 0), (0, 1)))
        emb = emb.astype(self.dtype)
        h = nn.Dense(self.d_model * 4, dtype=self.dtype, name="mlp_0")(emb)
        h = nn.silu(h)
        return nn.Dense(self.d_model, dtype=self.dtype, name="mlp_2")(h)


class FiLMLayer(nn.Module):
    """x * (1 + scale) + shift from a pooled condition vector (lines 74-89)."""

    d_model: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        scale = nn.Dense(self.d_model, dtype=self.dtype, name="scale_proj")(cond)[:, None, :]
        shift = nn.Dense(self.d_model, dtype=self.dtype, name="shift_proj")(cond)[:, None, :]
        return x * (1.0 + scale) + shift


def _qdense(quant: str, features: int, dtype, name: str):
    """nn.Dense, or the int8-MXU drop-in (same param layout) when quant=="int8".

    The decoder is trained but FIXED at inference, so dynamic symmetric
    quantization applies exactly as for the frozen encoder
    (fddm_asr_tpu/ops/quant.py); inference-only — training configs keep
    "none".  Quality-gated at the transcript level by
    scripts/validate_quant.py --variants (decoder rows).
    """
    if quant == "int8":
        from fddm_asr_tpu.ops.quant import Int8Dense

        return Int8Dense(features, dtype=dtype, name=name)
    if quant != "none":
        raise ValueError(
            f"decoder quant_dense={quant!r}: expected 'none' or 'int8'"
        )
    return nn.Dense(features, dtype=dtype, name=name)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (separate q/k/v/out Dense).

    key_padding_mask semantics follow the reference call sites: `mask` is
    True=KEEP per key position; masked keys get -inf scores.  Attention-weight
    dropout matches torch's placement (after softmax).
    """

    d_model: int
    nhead: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    quant_dense: str = "none"

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, d]
        key: jnp.ndarray,    # [B, Lk, d]
        value: jnp.ndarray,  # [B, Lk, d]
        key_mask: Optional[jnp.ndarray] = None,  # [B, Lk] True=keep
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, Lq, _ = query.shape
        Lk = key.shape[1]
        dh = self.d_model // self.nhead
        q = _qdense(self.quant_dense, self.d_model, self.dtype, "q_proj")(query)
        k = _qdense(self.quant_dense, self.d_model, self.dtype, "k_proj")(key)
        v = _qdense(self.quant_dense, self.d_model, self.dtype, "v_proj")(value)
        q = q.reshape(B, Lq, self.nhead, dh)
        k = k.reshape(B, Lk, self.nhead, dh)
        v = v.reshape(B, Lk, self.nhead, dh)

        dropout_rng = None
        if not deterministic and self.dropout > 0.0:
            dropout_rng = self.make_rng("dropout")
        attn_fn = self.attention_fn or dot_product_attention
        out = attn_fn(
            q, k, v,
            key_mask=key_mask,
            dropout_rate=self.dropout if not deterministic else 0.0,
            dropout_rng=dropout_rng,
        )  # [B, Lq, H, dh]
        out = out.reshape(B, Lq, self.d_model)
        return _qdense(self.quant_dense, self.d_model, self.dtype, "out_proj")(out)


def masked_mean_pool(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over the time axis honoring a True=keep mask (reference 181-185).

    The denominator is clamped (like AcousticEncoder's pooled path): a row
    with zero valid frames pools to 0 instead of 0/0 = NaN, which would
    poison that row's FiLM scale/shift and logits.  Identical numerics for
    any row with at least one valid frame."""
    if mask is None:
        return jnp.mean(x, axis=1)
    m = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), min=1.0)


class DecoderBlock(nn.Module):
    """Post-LN block: self-attn -> cross-attn -> FiLM -> FFN (lines 122-192)."""

    d_model: int
    nhead: int
    dim_ff: int
    dropout: float = 0.1
    use_film: bool = True
    pos_emb_type: str = "rope"
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    quant_dense: str = "none"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                    # [B, L, d]
        cond: jnp.ndarray,                 # [B, S, d]
        x_mask: Optional[jnp.ndarray],     # [B, L] True=keep
        c_mask: Optional[jnp.ndarray],     # [B, S] True=keep
        rope_cos: Optional[jnp.ndarray] = None,
        rope_sin: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        def drop(h):
            return nn.Dropout(self.dropout, deterministic=deterministic)(h)

        if self.pos_emb_type == "rope" and rope_cos is not None:
            q_in = k_in = apply_rotary_pos_emb(x, rope_cos, rope_sin).astype(x.dtype)
            v_in = x
        else:
            q_in = k_in = v_in = x

        x2 = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype,
            attention_fn=self.attention_fn, quant_dense=self.quant_dense,
            name="self_attn",
        )(q_in, k_in, v_in, key_mask=x_mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + drop(x2))

        x2 = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype,
            attention_fn=self.attention_fn, quant_dense=self.quant_dense,
            name="cross_attn",
        )(x, cond, cond, key_mask=c_mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + drop(x2))

        if self.use_film:
            cond_pooled = masked_mean_pool(cond, c_mask)
            x = FiLMLayer(self.d_model, self.dtype, name="film_layer")(x, cond_pooled)

        h = _qdense(self.quant_dense, self.dim_ff, self.dtype, "ff_0")(x)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default = exact erf
        h = drop(h)
        h = _qdense(self.quant_dense, self.d_model, self.dtype, "ff_3")(h)
        x = nn.LayerNorm(dtype=self.dtype, name="norm3")(x + drop(h))
        return x


class _ScanDecoderBlock(nn.Module):
    """DecoderBlock shaped for nn.scan (carry=x, per-step out=None)."""

    d_model: int
    nhead: int
    dim_ff: int
    dropout: float
    use_film: bool
    pos_emb_type: str
    deterministic: bool
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    quant_dense: str = "none"

    @nn.compact
    def __call__(self, x, cond, x_mask, c_mask, rope_cos, rope_sin):
        x = DecoderBlock(
            self.d_model, self.nhead, self.dim_ff, self.dropout,
            self.use_film, self.pos_emb_type, self.dtype,
            attention_fn=self.attention_fn, quant_dense=self.quant_dense,
            name="block",
        )(x, cond, x_mask, c_mask, rope_cos, rope_sin, self.deterministic)
        return x, None


class DenoisingTransformerDecoder(nn.Module):
    """f_theta(x_t, t, c) -> logits over x_0 (reference lines 194-287).

    Defaults match the reference ctor: d_model 768, 12 heads, 6 layers,
    ff 2048, dropout 0.1, rope positions, FiLM on.
    """

    vocab_size: int
    d_model: int = 768
    nhead: int = 12
    num_layers: int = 6
    dim_ff: int = 2048
    dropout: float = 0.1
    max_len: int = 2048
    pad_id: int = 0
    pos_emb_type: str = "rope"  # "rope" | "sinusoidal" | "learned"
    use_film: bool = True
    rope_base: float = 10000.0
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    # Compile all blocks as ONE lax.scan body with stacked params ("blocks_scan"
    # in the param tree) instead of unrolling num_layers copies into the HLO —
    # for paper-scale decoders (253 M+, 12+ layers) this keeps remote-compile
    # times flat.  Identical numerics (parity-tested); the torch-checkpoint
    # converter stacks/unstacks accordingly.
    scan_blocks: bool = False
    # Rematerialize each scanned block in backprop (training-side memory
    # lever for paper-scale decoders: O(1) live block activations in depth
    # instead of O(num_layers), same trade the encoder's remat_layers
    # makes).  Requires scan_blocks.  Identical numerics.
    remat_blocks: bool = False
    # "int8": run the q/k/v/out projections, FFN, and vocab head on the
    # int8 MXU (dynamic quantization — see _qdense).  Inference-only.
    quant_dense: str = "none"

    @nn.compact
    def __call__(
        self,
        xt: jnp.ndarray,                       # [B, L] int token ids
        t: jnp.ndarray,                        # [B] or scalar int timesteps
        cond: jnp.ndarray,                     # [B, S, d_model]
        x_mask: Optional[jnp.ndarray] = None,  # [B, L] True=keep
        c_mask: Optional[jnp.ndarray] = None,  # [B, S] True=keep
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, L = xt.shape
        cond = cond.astype(self.dtype)

        tok_emb = nn.Embed(
            self.vocab_size, self.d_model, dtype=self.dtype, name="tok_emb",
            embedding_init=_padding_zero_init(nn.initializers.normal(1.0), self.pad_id),
        )
        x = tok_emb(xt)
        # torch Embedding(padding_idx=pad_id) zeroes the pad row's GRADIENT
        # forever, not just its init (reference denoise_decoder.py:214).
        # Corrupted x_t hits pad_id at loss-active positions ~1/K of the
        # time, so without this mask the row would drift during training —
        # a training-dynamics parity divergence.  Masking the OUTPUT rows
        # blocks that gradient (the output no longer reads the pad row) and
        # reproduces torch's zero-vector lookup exactly.
        x = x * (xt != self.pad_id)[..., None].astype(x.dtype)

        rope_cos = rope_sin = None
        if self.pos_emb_type == "rope":
            rope_cos, rope_sin = rope_tables(L, self.d_model, self.rope_base)
        elif self.pos_emb_type == "sinusoidal":
            x = x + sinusoidal_position_embedding(L, self.d_model, self.max_len).astype(
                self.dtype
            )[None]
        elif self.pos_emb_type == "learned":
            pos_emb = nn.Embed(self.max_len, self.d_model, dtype=self.dtype, name="pos_emb")
            x = x + pos_emb(jnp.arange(L)[None, :])
        else:
            raise ValueError(f"unsupported pos_emb_type: {self.pos_emb_type}")

        t_emb = SinusoidalTimeEmbedding(self.d_model, dtype=self.dtype, name="time_emb")(t)
        t_bias = nn.Dense(self.d_model, dtype=self.dtype, name="time_proj")(t_emb)
        x = x + t_bias[:, None, :]

        if x_mask is None:
            x_mask = xt != self.pad_id
        # Guard degenerate all-pad rows: a fully-masked self-attention row is
        # softmax(-inf ...) = NaN (the reference torch module NaNs the same
        # way; its sampler can reach all-pad x_t states mid-chain, poisoning
        # p(x0) into argmax-ties).  Treat such rows as fully visible instead.
        x_mask = jnp.where(jnp.any(x_mask, axis=-1, keepdims=True), x_mask, True)

        if self.remat_blocks and not self.scan_blocks:
            raise ValueError("remat_blocks requires scan_blocks")
        if self.scan_blocks and self.num_layers > 0:
            # prevent_cse=False is the recommended setting under scan (the
            # scan boundary already prevents the unsafe CSE)
            body = (nn.remat(_ScanDecoderBlock, prevent_cse=False)
                    if self.remat_blocks else _ScanDecoderBlock)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 5,
                length=self.num_layers,
            )(
                self.d_model, self.nhead, self.dim_ff, self.dropout,
                self.use_film, self.pos_emb_type, deterministic, self.dtype,
                self.attention_fn, self.quant_dense, name="blocks_scan",
            )
            x, _ = scanned(x, cond, x_mask, c_mask, rope_cos, rope_sin)
        else:
            for i in range(self.num_layers):
                x = DecoderBlock(
                    self.d_model, self.nhead, self.dim_ff, self.dropout,
                    self.use_film, self.pos_emb_type, self.dtype,
                    attention_fn=self.attention_fn, quant_dense=self.quant_dense,
                    name=f"blocks_{i}",
                )(x, cond, x_mask, c_mask, rope_cos, rope_sin, deterministic)

        # Head logits in float32: softmax/KL over K=8000 classes needs f32.
        logits = _qdense(self.quant_dense, self.vocab_size, jnp.float32, "head")(
            x.astype(jnp.float32)
        )
        return logits

    def predict_x0(self, params, xt, t, cond, x_mask=None, c_mask=None):
        logits = self.apply(params, xt, t, cond, x_mask, c_mask, deterministic=True)
        return jax.nn.softmax(logits, axis=-1)


def _padding_zero_init(base_init, pad_id: int):
    """Zero the pad row at init, mirroring torch's Embedding(padding_idx=...)."""

    def init(key, shape, dtype=jnp.float32):
        emb = base_init(key, shape, dtype)
        return emb.at[pad_id].set(0.0)

    return init
