# -*- coding: utf-8 -*-
"""FDDMPipeline — the serving/eval layer tying together encoder, decoder,
schedule, sampler and tokenizer.

Builds every model from one `Config` (the reference spreads this across
train.py:511-540 and inference.py:73-160), loads reference `.pt` checkpoints
or orbax checkpoints, and exposes jitted entry points:

  encode_waveform(wave, lengths) -> (c, c_mask)
  decoder_forward(xt, t, c, x_mask, c_mask) -> logits
  sample(rng, cond, seq_len, **sampling) -> (ids, p_x0)
  transcribe(wave, ...) -> list[str]

Parity note: the reference's training/eval path calls the encoder WITHOUT
lengths, so no condition mask exists anywhere at inference (SURVEY hard part
#4).  `use_condition_mask=False` (default) reproduces that; enabling it masks
padded audio frames in cross-attention — usually better CER on short
utterances, but a deliberate deviation.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fddm_asr_tpu import diffusion as D
from fddm_asr_tpu.config import Config, resolve_special_ids
from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder
from fddm_asr_tpu.models.encoder import AcousticEncoder
from fddm_asr_tpu.models.wavlm import WavLMConfig
from fddm_asr_tpu.sampler import SamplerConfig, make_sample_fn
from fddm_asr_tpu.eval import ids_to_text


def build_wavlm_config(encoder_cfg: Config) -> WavLMConfig:
    """Map the reference YAML's encoder block to a WavLMConfig.

    `wavlm_name` containing "large" selects the large architecture (the
    reference hardcodes microsoft/wavlm-large); "tiny" selects the test
    config; an explicit dict under `wavlm_config` overrides field-by-field.
    """
    name = (encoder_cfg.get("wavlm_name") or "microsoft/wavlm-large").lower()
    if "tiny" in name:
        cfg = WavLMConfig.tiny_for_tests()
    elif "base" in name:
        cfg = WavLMConfig.base()
    else:
        # scan_layers at 24 layers: same numerics, minutes less compile time;
        # fused_attention: head-packed Pallas kernel on TPU (XLA elsewhere);
        # seq_pad_multiple=128: zero-width wrapper pads, identical real-frame
        # numerics (parity-tested).  For +8% more, set
        # encoder.wavlm_config.gelu_approx_tanh: true (deviates ~1e-3);
        # for +15% more, encoder.wavlm_config.quant_dense: "int8" runs the
        # encoder FFN/QKV matmuls on the int8 MXU (ops/quant.py; dynamic
        # quantization, same checkpoints, rel-L2 drift <5% on the encoder
        # output — tests/test_quant.py).
        cfg = dataclasses.replace(
            WavLMConfig.large(), scan_layers=True, fused_attention=True,
            seq_pad_multiple=128,
        )
    overrides = encoder_cfg.get("wavlm_config")
    if overrides:
        cfg = dataclasses.replace(cfg, **dict(overrides))
    if "scan_layers" in encoder_cfg:
        cfg = dataclasses.replace(cfg, scan_layers=bool(encoder_cfg["scan_layers"]))
    if "remat_layers" in encoder_cfg:
        cfg = dataclasses.replace(cfg, remat_layers=bool(encoder_cfg["remat_layers"]))
    elif not (overrides and "remat_layers" in overrides):
        # fine-tuning default: when the encoder is trained, remat the scanned
        # layers so activation memory stays O(1) in depth (see WavLMConfig)
        if not encoder_cfg.get("freeze", True) and cfg.scan_layers:
            cfg = dataclasses.replace(cfg, remat_layers=True)
    if "freeze_feature_extractor" in encoder_cfg:
        cfg = dataclasses.replace(
            cfg,
            freeze_feature_extractor=bool(encoder_cfg["freeze_feature_extractor"]))
    elif not (overrides and "freeze_feature_extractor" in overrides):
        # fine-tuning default: conv front-end stays frozen (the standard
        # wav2vec2/WavLM recipe, HF freeze_feature_encoder()); set
        # encoder.freeze_feature_extractor: false to train it too
        if not encoder_cfg.get("freeze", True):
            cfg = dataclasses.replace(cfg, freeze_feature_extractor=True)
    return cfg


class FDDMPipeline:
    def __init__(
        self,
        cfg: Config,
        decoder_params: Dict,
        encoder_params: Dict,
        sched: D.DiffusionSchedule,
        tokenizer,
        special_ids: Dict[str, Optional[int]],
        wavlm_config: WavLMConfig,
        use_condition_mask: bool = False,
        dtype: Any = jnp.float32,
    ) -> None:
        self.cfg = cfg
        self.sched = sched
        self.tokenizer = tokenizer
        self.special_ids = special_ids
        self.pad_id = special_ids["pad_id"]
        self.use_condition_mask = use_condition_mask
        self.dtype = dtype  # compute dtype of both modules (params stay f32)

        model_cfg = cfg.model
        d_model = model_cfg.d_model
        self.decoder = DenoisingTransformerDecoder(
            vocab_size=cfg.data.vocab_size,
            d_model=d_model,
            nhead=model_cfg.nhead,
            num_layers=model_cfg.num_layers,
            dim_ff=model_cfg.dim_ff,
            dropout=model_cfg.get("dropout", 0.1),
            max_len=1024,  # reference hardcodes 1024 (train.py:524, inference.py:143)
            pad_id=self.pad_id,
            pos_emb_type=model_cfg.get("pos_emb_type", "rope"),
            use_film=model_cfg.get("use_film", True),
            # scan_blocks: one lax.scan body over stacked layer params instead
            # of num_layers unrolled copies — same numerics, much smaller HLO
            # (matters for paper-scale 12+ layer decoders with remote compile).
            scan_blocks=model_cfg.get("scan_blocks", False),
            remat_blocks=model_cfg.get("remat_blocks", False),
            # model.quant_dense: "int8" runs the decoder's projections/FFN/
            # head on the int8 MXU at inference (same checkpoints; decoder
            # rows of the validate_quant.py gate)
            quant_dense=model_cfg.get("quant_dense", "none"),
            dtype=dtype,
        )
        enc_cfg = model_cfg.get("encoder", Config())
        self.encoder = AcousticEncoder(
            config=wavlm_config,
            d_model=d_model,
            proj=enc_cfg.get("proj", "linear"),
            pooling=enc_cfg.get("pooling", "none"),
            freeze=enc_cfg.get("freeze", True),
            dtype=dtype,
        )
        self.decoder_params = decoder_params
        self.encoder_params = encoder_params
        self.wavlm_config = wavlm_config  # kept for clone_with_wavlm_config
        self.mesh = None  # set by apply_mesh() for multi-chip inference

        self._encode_jit = jax.jit(self._encode)
        self._decode_jit = jax.jit(self._decoder_fwd)
        self._samplers: Dict[tuple, Callable] = {}

    # ------------------------------------------------------------- builders
    @classmethod
    def from_config(
        cls,
        cfg: Config,
        ckpt_path: Optional[str] = None,
        wavlm_params: Optional[Dict] = None,
        tokenizer=None,
        seed: Optional[int] = None,
        use_condition_mask: Optional[bool] = None,
        dtype: Any = None,
    ) -> "FDDMPipeline":
        # Default to the config seed: when no pretrained WavLM weights are
        # supplied the encoder is random-initialised, and training/inference
        # must derive the SAME encoder (checkpoints don't carry it — the
        # reference contract re-fetches the frozen encoder from HF).
        if seed is None:
            seed = int(cfg.get("seed", 0))
        if use_condition_mask is None:
            # model.encoder.condition_mask: config-driven masking so a model
            # TRAINED with masked cross-attention (train_lib reads the same
            # knob) is also evaluated/served masked.  Default False =
            # reference parity (no mask anywhere, quirk #4).
            use_condition_mask = bool(
                cfg.model.get("encoder", Config()).get("condition_mask", False))
        if dtype is None:
            # model.dtype: the COMPUTE dtype for inference/serving/export
            # surfaces (params stay f32).  bfloat16 is the TPU production
            # setting (the MXU runs bf16 at full rate; the shipped flagship
            # config sets it); float32 is the parity-suite default.
            # Training has its own knob (optim.dtype, default bfloat16 —
            # train_lib.py) so train-time eval already ran bf16.
            name = str(cfg.model.get("dtype", "float32")).lower()
            dtype = jnp.bfloat16 if name in ("bfloat16", "bf16") else jnp.float32
        from fddm_asr_tpu.tokenizer import load_tokenizer

        special = resolve_special_ids(cfg)
        if tokenizer is None:
            tok_path = cfg.data.get("tokenizer_path") or cfg.data.get(
                "tokenizer_model_path", "data/tokenizer/zh-TW_A/spm_zhTW_A.model"
            )
            tokenizer = load_tokenizer(tok_path)

        sched = D.make_schedule(
            K=cfg.data.vocab_size,
            T=cfg.diffusion["T"],
            beta_max=cfg.diffusion.get("beta_max", 0.2),
        )
        wavlm_config = build_wavlm_config(cfg.model.get("encoder", Config()))

        rng = jax.random.key(seed)
        rng_dec, rng_enc = jax.random.split(rng)

        self_args = dict(
            cfg=cfg, sched=sched, tokenizer=tokenizer, special_ids=special,
            wavlm_config=wavlm_config, use_condition_mask=use_condition_mask,
            dtype=dtype,
        )
        # build with placeholder params to init shapes
        pipeline = cls(
            decoder_params={}, encoder_params={}, **self_args
        )
        L0, S0 = 8, 16
        dec_vars = pipeline.decoder.init(
            rng_dec,
            jnp.zeros((1, L0), jnp.int32), jnp.ones((1,), jnp.int32),
            jnp.zeros((1, S0, cfg.model.d_model)),
        )
        loaded = None
        if ckpt_path:
            from fddm_asr_tpu.checkpoint import load_checkpoint_any

            loaded = load_checkpoint_any(
                ckpt_path, scan_blocks=bool(cfg.model.get("scan_blocks", False))
            )
            pipeline.decoder_params = {"params": loaded["decoder"]}
        else:
            # model.init_scheme: "torch" redraws the fresh init with the
            # reference's per-layer distributions (kaiming_uniform linears
            # with nonzero biases, xavier attention in_proj, sqrt(3) SMALLER
            # weights than flax's lecun_normal) — the round-5 fix for the
            # flagship convergence stall (models/torch_init.py).  "flax"
            # (default) keeps the original flax init for continuity with
            # the round 1-4 toy-recipe calibrations.
            scheme = str(cfg.model.get("init_scheme", "flax")).lower()
            if scheme == "torch":
                from fddm_asr_tpu.models.torch_init import torch_like_decoder_init

                dec_vars = {"params": torch_like_decoder_init(
                    jax.random.fold_in(rng_dec, 1), dec_vars["params"],
                    pad_id=int(special["pad_id"]))}
            elif scheme != "flax":
                raise ValueError(
                    f"model.init_scheme={scheme!r}: expected 'flax' or 'torch'")
            pipeline.decoder_params = dec_vars

        if wavlm_params is not None:
            pipeline.encoder_params = {"params": {"backbone": wavlm_params}}
            # the optional projection needs init if hidden != d_model
            if wavlm_config.hidden_size != cfg.model.d_model:
                enc_vars = pipeline.encoder.init(
                    rng_enc, jnp.zeros((1, 640), jnp.float32)
                )
                merged = dict(enc_vars["params"])
                merged["backbone"] = wavlm_params
                pipeline.encoder_params = {"params": merged}
        else:
            enc_vars = pipeline.encoder.init(rng_enc, jnp.zeros((1, 640), jnp.float32))
            pipeline.encoder_params = enc_vars

        # fine-tuned encoder: orbax training checkpoints (freeze: false)
        # carry either the full encoder vars or LoRA adapters — apply them
        # so inference transcribes with the tuned encoder, not the base one
        # (the reference contract never checkpoints its always-frozen
        # encoder; .pt files have no encoder entry and skip this)
        enc_loaded = loaded.get("encoder") if loaded else None
        if enc_loaded is not None:
            from fddm_asr_tpu.models import lora as LO

            adapters = LO.normalize_adapter_tree(enc_loaded)
            if adapters is not None:
                rank = LO.adapter_rank(adapters)
                # scale: the checkpoint's meta sidecar is authoritative (the
                # TRAINING-time alpha); the inference config is only the
                # fallback for sidecar-less checkpoints
                meta = loaded.get("meta") or {}
                enc_cfg = cfg.model.get("encoder", Config())
                alpha = meta.get("lora_alpha", enc_cfg.get("lora_alpha"))
                pipeline.encoder_params = LO.merge_lora(
                    pipeline.encoder_params, adapters,
                    LO.resolve_scale(rank, alpha))
            else:
                pipeline.encoder_params = enc_loaded
        # Place params on device ONCE.  Checkpoint loaders return HOST numpy
        # trees, and jit re-transfers host arguments on EVERY dispatch — for
        # wavlm-large (~1.2 GB f32) through this environment's relay that is
        # seconds per call, which silently throttled live serving to ~19
        # audio-s/s while the AOT path (which does this in aot.py:344) ran
        # 397.  device_put on an already-placed array is a no-op.
        pipeline.decoder_params = jax.device_put(pipeline.decoder_params)
        pipeline.encoder_params = jax.device_put(pipeline.encoder_params)
        return pipeline

    # --------------------------------------------------------- multi-device
    def clone_with_wavlm_config(self, **overrides) -> "FDDMPipeline":
        """A pipeline over the SAME params with encoder-config overrides
        (e.g. fused_attention) — avoids re-loading a multi-GB checkpoint
        just to change lowering choices (scripts/export_model.py builds the
        portable-attention StableHLO modules and the fused native
        executables from one load this way)."""
        return FDDMPipeline(
            cfg=self.cfg, decoder_params=self.decoder_params,
            encoder_params=self.encoder_params, sched=self.sched,
            tokenizer=self.tokenizer, special_ids=self.special_ids,
            wavlm_config=dataclasses.replace(self.wavlm_config, **overrides),
            use_condition_mask=self.use_condition_mask, dtype=self.dtype,
        )

    def apply_mesh(self, mesh, seq_parallel: bool = False) -> "FDDMPipeline":
        """Shard the pipeline over a jax Mesh for multi-chip inference.

        Params are placed by the dp/tp PartitionSpec rules
        (fddm_asr_tpu.parallel.decoder_param_spec); input batches are sharded
        on the "data" axis by encode_waveform/sample.  Under jit, GSPMD
        partitions the programs and inserts the ICI collectives — the same
        code path serves one chip (trivial 1x1 mesh) and a pod slice.
        Batch sizes must be divisible by the data-axis size.

        seq_parallel=True additionally shards the ENCODER FRAME AXIS across
        the "model" mesh axis with ring attention (ops/ring_attention) —
        long-audio inference where one utterance's attention spans chips.
        The encoder's seq_pad_multiple is rounded up so padded frame counts
        always divide the ring.
        """
        from fddm_asr_tpu.parallel import decoder_param_spec, shard_pytree

        self.mesh = mesh
        self.decoder_params = shard_pytree(self.decoder_params, mesh, decoder_param_spec)
        self.encoder_params = shard_pytree(self.encoder_params, mesh, decoder_param_spec)
        if seq_parallel:
            self.enable_seq_parallel(mesh)
        return self

    def enable_seq_parallel(self, mesh) -> bool:
        """Rebuild the encoder with the ring-attention hook so the FRAME
        axis shards across the mesh's "model" axis (ops/ring_attention);
        seq_pad_multiple is rounded up so padded frame counts divide the
        ring.  Shared by apply_mesh(seq_parallel=True) and the training
        loop (model.encoder.seq_parallel).  No-op (returns False) on a
        1-wide model axis."""
        import dataclasses
        import functools
        import math

        ring = int(mesh.shape.get("model", 1))
        if ring <= 1:
            return False
        from fddm_asr_tpu.ops.ring_attention import ring_gated_attention

        wcfg = self.encoder.config
        spm = math.lcm(max(int(wcfg.seq_pad_multiple), 1), ring)
        self.encoder = dataclasses.replace(
            self.encoder,
            config=dataclasses.replace(wcfg, seq_pad_multiple=spm),
            gated_attention_fn=functools.partial(
                ring_gated_attention, mesh=mesh, axis="model",
                batch_axis="data",
            ),
        )
        # _encode traces read self.encoder at call time but jit caches by
        # arg signature — drop any pre-replacement traces so the ring path
        # is what compiles
        self._encode_jit = jax.jit(self._encode)
        return True

    def _shard_batch(self, x):
        if x is None:
            return x
        if getattr(self, "mesh", None) is None:
            # EXPLICIT placement, not an implicit numpy jit-arg transfer:
            # through this environment's compile relay the implicit path
            # moves batch audio at ~10 MB/s (3.7-6.0 s for a 41 MB B=32
            # wave, measured round 3) while an explicit device_put streams
            # at ~1 GB/s (0.04 s).  device_put on an already-placed array
            # is a no-op, so callers handing us device arrays lose nothing.
            return jax.device_put(x)
        from fddm_asr_tpu.parallel import batch_sharding

        return jax.device_put(x, batch_sharding(self.mesh))

    # -------------------------------------------------------------- kernels
    # Params flow through jit as ARGUMENTS: closing them over would bake the
    # weights into the compiled program as constants (rejected by the TPU
    # remote-compile service for large models).
    def _encode(self, params, wave, lengths):
        # wire dtypes expand to float INSIDE the program so batch audio can
        # ship compact (int16 halves, mulaw uint8 quarters the H2D bytes —
        # the measured serving bottleneck); jit retraces per input dtype,
        # one compiled program each
        from fddm_asr_tpu.data.wire import decode_wire_jnp

        if wave.dtype == jnp.int16:
            wave = decode_wire_jnp(wave, "pcm16")
        elif wave.dtype == jnp.uint8:
            wave = decode_wire_jnp(wave, "mulaw8")
        return self.encoder.apply(params, wave, lengths, deterministic=True)

    def _decoder_fwd(self, params, xt, t, c, x_mask, c_mask):
        return self.decoder.apply(params, xt, t, c, x_mask, c_mask, deterministic=True)

    # ------------------------------------------------------------------ api
    def encode_waveform(
        self, wave: np.ndarray, lengths: Optional[np.ndarray] = None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        # compact wire dtypes (int16 pcm / uint8 mulaw) pass through to the
        # device untouched — _encode expands them in-program; anything else
        # is cast to f32 on host.  ONE explicit device_put (see _shard_batch)
        wave = np.asarray(wave)
        if wave.dtype not in (np.int16, np.uint8):
            wave = wave.astype(np.float32)
        wave = self._shard_batch(wave)
        if not self.use_condition_mask:
            lengths = None  # reference parity: encoder called without lengths
        feats, feat_mask, _ = self._encode_jit(
            self.encoder_params, wave,
            self._shard_batch(np.asarray(lengths)) if lengths is not None else None,
        )
        return feats, feat_mask

    def decoder_forward(self, xt, t, c, x_mask=None, c_mask=None):
        return self._decode_jit(
            self.decoder_params, jnp.asarray(xt), jnp.asarray(t), c,
            None if x_mask is None else jnp.asarray(x_mask),
            None if c_mask is None else c_mask,
        )

    def _sampler_for(self, key: tuple) -> Callable:
        if key not in self._samplers:
            (T_infer, r, greedy, posterior_mode, sampling_mode, temperature,
             ref_compat, repeat_penalty, *variant) = key
            scfg = SamplerConfig(
                K=self.cfg.data.vocab_size,
                T_train=self.cfg.diffusion["T"],
                T_infer=T_infer, r=r, greedy=greedy,
                posterior_mode=posterior_mode, sampling_mode=sampling_mode,
                temperature=temperature, ref_compat=ref_compat,
                repeat_penalty=repeat_penalty,
            )
            def decoder_apply(params, xt, t, cond, c_mask):
                return self.decoder.apply(
                    params, xt, t, cond, None, c_mask, deterministic=True
                )
            base = make_sample_fn(decoder_apply, self.sched, scfg)
            if variant and variant[0] == "conf":
                # sampler + decoded-span confidence fused into ONE program:
                # (ids, conf) out, so the [B, L, K] p_x0 is neither a program
                # output nor a second dispatch (each dispatch costs ~31 ms
                # through this environment's relay) — the AOT export path
                # fuses identically (aot.build_transcribe_fn)
                from fddm_asr_tpu.eval import batch_confidence_device

                def fused(params, rng, cond, seq_len, c_mask=None):
                    ids, p = base(params, rng, cond, seq_len=seq_len,
                                  c_mask=c_mask)
                    return ids, batch_confidence_device(
                        ids, p, self.pad_id, self.special_ids)

                self._samplers[key] = jax.jit(
                    fused, static_argnames=("seq_len",))
            else:
                self._samplers[key] = jax.jit(
                    base, static_argnames=("seq_len",))
        return self._samplers[key]

    def sample(
        self,
        rng: jax.Array,
        cond: jnp.ndarray,
        seq_len: int,
        c_mask: Optional[jnp.ndarray] = None,
        T_infer: int = 20,
        r: int = 5,
        greedy: bool = True,
        posterior_mode: str = "map",
        sampling_mode: str = "exact",
        temperature: float = 1.0,
        ref_compat: bool = True,
        repeat_penalty: float = 0.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        # ref_compat=False runs the CORRECTED multi-step posterior instead of
        # reproducing the reference's tensor-aliasing recurrence (see
        # diffusion.multi_step_coeffs); default True = reference parity.
        ids, p = self._sample_raw(
            rng, cond, seq_len, c_mask, T_infer=T_infer, r=r, greedy=greedy,
            posterior_mode=posterior_mode, sampling_mode=sampling_mode,
            temperature=temperature, ref_compat=ref_compat,
            repeat_penalty=repeat_penalty)
        return np.asarray(ids), np.asarray(p)

    def _sample_raw(self, rng, cond, seq_len, c_mask=None, **sampling):
        """sample() without the host pull: returns DEVICE (ids, p_x0) so hot
        paths (n-best selection) can reduce p_x0 on device instead of
        transferring [B, L, K] to host per batch."""
        return self._dispatch_sampler(None, rng, cond, seq_len, c_mask,
                                      **sampling)

    def _sample_conf_raw(self, rng, cond, seq_len, c_mask=None, **sampling):
        """_sample_raw fused with the decoded-span confidence reduction in
        the SAME compiled program: returns DEVICE (ids [B, L], conf [B]).
        The serving hot path — one dispatch per batch instead of sampler +
        confidence back-to-back, and p_x0 never materializes as a program
        output."""
        return self._dispatch_sampler(("conf",), rng, cond, seq_len, c_mask,
                                      **sampling)

    def _dispatch_sampler(
        self, variant, rng, cond, seq_len, c_mask,
        T_infer: int = 20, r: int = 5, greedy: bool = True,
        posterior_mode: str = "map", sampling_mode: str = "exact",
        temperature: float = 1.0, ref_compat: bool = True,
        repeat_penalty: float = 0.0,
    ):
        """One home for sampling defaults + sharding: the confidence and
        plain paths differ ONLY in the compiled program they select."""
        key = (T_infer, r, greedy, posterior_mode, sampling_mode,
               temperature, ref_compat, repeat_penalty) + (variant or ())
        fn = self._sampler_for(key)
        if not self.use_condition_mask:
            c_mask = None
        # shard directly-supplied conditions too (encode_waveform outputs are
        # already placed; device_put on a correctly-sharded array is a no-op)
        cond = self._shard_batch(cond)
        c_mask = self._shard_batch(c_mask)
        return fn(self.decoder_params, rng, cond, seq_len=seq_len, c_mask=c_mask)

    def sample_nbest(
        self,
        rng: jax.Array,
        cond: jnp.ndarray,
        seq_len: int,
        num_candidates: int,
        c_mask: Optional[jnp.ndarray] = None,
        **sampling,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Draw `num_candidates` independent trajectories per utterance.

        The encoder condition is computed ONCE by the caller; candidates
        fold into the batch dimension (cond repeated N-fold -> one sampler
        call at batch B*N, rows [u0c0, u0c1, ..., u1c0, ...]), so on TPU
        the candidates ride the MXU as extra batch rows instead of N
        sequential device calls.  Candidates differ through their random
        x_T init (drawn per padded row), so even greedy exact-mode sampling
        diversifies.  Returns (ids [B, N, L], p_x0 [B, N, L, K]).

        Under a device mesh, B*N must divide the data axis like any other
        batch.  Each distinct (B, N) compiles its own program (same rule as
        any new batch shape).
        """
        n = int(num_candidates)
        if n < 1:
            raise ValueError(f"num_candidates must be >= 1, got {n}")
        B = cond.shape[0]
        cond_rep = jnp.repeat(cond, n, axis=0)
        mask_rep = None if c_mask is None else jnp.repeat(c_mask, n, axis=0)
        ids, p = self.sample(rng, cond_rep, seq_len=seq_len, c_mask=mask_rep,
                             **sampling)
        return (ids.reshape(B, n, *ids.shape[1:]),
                p.reshape(B, n, *p.shape[1:]))

    def transcribe_nbest(
        self,
        wave: np.ndarray,
        lengths: Optional[np.ndarray] = None,
        seq_len: int = 64,
        rng: Optional[jax.Array] = None,
        num_candidates: int = 4,
        **sampling,
    ) -> List[List[Tuple[str, List[int], float]]]:
        """N-best decoding: per utterance, a list of (text, ids, confidence)
        sorted by confidence (decoded-span geometric-mean token probability)
        descending.  The serving-side productionization of the reference's
        multi-sample evaluation (evaluate.py:344-452, whose candidate voting
        is stubbed to sample 0); the eval-side equivalent is
        eval.evaluate_cer_with_multi_sample(voting="logprob")."""
        if wave.ndim == 1:
            wave = wave[None]
        c, c_mask = self.encode_waveform(wave, lengths)
        rng = rng if rng is not None else jax.random.key(0)
        n = int(num_candidates)
        if n < 1:
            raise ValueError(f"num_candidates must be >= 1, got {n}")
        B = c.shape[0]
        # sampler + confidence in ONE program; only ids [B*N, L] +
        # conf [B*N] cross to host (p_x0 would be B*N x L x K)
        ids_d, conf_d = self._sample_conf_raw(
            rng, jnp.repeat(c, n, axis=0), seq_len,
            None if c_mask is None else jnp.repeat(c_mask, n, axis=0),
            **sampling)
        confs = np.asarray(conf_d)
        ids = np.asarray(ids_d).reshape(B, n, -1)
        confs = confs.reshape(B, n)
        out = []
        for i in range(B):
            cands = [
                (self.ids_to_text(ids[i, j]), ids[i, j].tolist(),
                 float(confs[i, j]))
                for j in range(n)
            ]
            cands.sort(key=lambda c: c[2], reverse=True)
            out.append(cands)
        return out

    def ids_to_text(self, ids) -> str:
        return ids_to_text(
            ids, self.tokenizer, self.pad_id,
            self.special_ids.get("bos_id"), self.special_ids.get("eos_id"),
        )

    def transcribe(
        self,
        wave: np.ndarray,
        lengths: Optional[np.ndarray] = None,
        seq_len: int = 64,
        rng: Optional[jax.Array] = None,
        **sampling,
    ) -> List[str]:
        return [t for t, _ in self.transcribe_with_ids(
            wave, lengths, seq_len=seq_len, rng=rng, **sampling)]

    def transcribe_with_ids(
        self,
        wave: np.ndarray,
        lengths: Optional[np.ndarray] = None,
        seq_len: int = 64,
        rng: Optional[jax.Array] = None,
        with_confidence: bool = False,
        num_candidates: int = 1,
        **sampling,
    ):
        """Like transcribe, but returns [(text, raw_ids list)] per utterance
        (the reference's result JSON carries both — inference.py:247-255).

        with_confidence=True returns [(text, ids, confidence)] instead:
        confidence is the geometric mean of the model's probability for each
        emitted token (p_x0 of the final sampling step), computed over the
        decoded span (before eos, excluding pad/bos) — the standard ASR
        per-utterance confidence; 0.0 when nothing was decoded.

        num_candidates > 1 decodes best-of-N: N independent trajectories per
        utterance (one device call, candidates folded into the batch dim),
        keeping the highest-confidence one.  See transcribe_nbest for the
        full candidate lists.
        """
        return self.transcribe_with_ids_async(
            wave, lengths, seq_len=seq_len, rng=rng,
            with_confidence=with_confidence, num_candidates=num_candidates,
            **sampling)()

    def transcribe_with_ids_async(
        self,
        wave: np.ndarray,
        lengths: Optional[np.ndarray] = None,
        seq_len: int = 64,
        rng: Optional[jax.Array] = None,
        with_confidence: bool = False,
        num_candidates: int = 1,
        **sampling,
    ) -> Callable[[], list]:
        """Two-phase transcribe_with_ids: dispatches encode + sample
        (+ device confidence) and returns a finalize() producing the same
        rows.  JAX async dispatch means this returns once the work is
        ENQUEUED — the serving engine overlaps batch N+1's device execution
        with batch N's host-side decode (double buffering)."""
        if wave.ndim == 1:
            wave = wave[None]
        c, c_mask = self.encode_waveform(wave, lengths)
        rng = rng if rng is not None else jax.random.key(0)
        n = max(1, int(num_candidates))
        B = c.shape[0]
        if n > 1:
            # confidence is fused into the sampler program (one dispatch) —
            # needed regardless of with_confidence to pick the winner
            ids_d, conf_d = self._sample_conf_raw(
                rng, jnp.repeat(c, n, axis=0), seq_len,
                None if c_mask is None else jnp.repeat(c_mask, n, axis=0),
                **sampling)

            def finalize():
                confs = np.asarray(conf_d).reshape(B, n)
                ids = np.asarray(ids_d).reshape(B, n, -1)
                out = []
                for i in range(B):
                    k = int(np.argmax(confs[i]))
                    row = (self.ids_to_text(ids[i, k]), ids[i, k].tolist())
                    if with_confidence:
                        row = row + (float(confs[i, k]),)
                    out.append(row)
                return out

            return finalize

        if with_confidence:
            ids_d, conf_d = self._sample_conf_raw(rng, c, seq_len, c_mask,
                                                  **sampling)
        else:
            ids_d, _ = self._sample_raw(rng, c, seq_len, c_mask, **sampling)
            conf_d = None

        def finalize():
            confs = None if conf_d is None else np.asarray(conf_d)
            ids = np.asarray(ids_d)  # p_x0 stays on device
            out = []
            for i in range(ids.shape[0]):
                row = (self.ids_to_text(ids[i]), ids[i].tolist())
                if with_confidence:
                    row = row + (float(confs[i]),)
                out.append(row)
            return out

        return finalize

    def _utterance_confidence(self, ids_row, p_row) -> float:
        from fddm_asr_tpu.eval import utterance_confidence

        return utterance_confidence(ids_row, p_row, self.pad_id,
                                    self.special_ids)
