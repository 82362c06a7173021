# -*- coding: utf-8 -*-
"""Evaluation: CER/WER metrics + sampling-based dataset evaluation.

Behavioral reference: /root/reference/models/evaluate.py — `_ids_to_text_one`
(26-68), `logits_to_text` (70-92), `calculate_cer` (94-118), `calculate_wer`
(120-134), `evaluate_validation_loss` (190-245), `evaluate_cer_with_full_
sampling` (247-341), `evaluate_cer_with_jumpy_sampling` (454-477),
`evaluate_cer_with_multi_sample` (344-452), `evaluate_wer_with_jumpy_sampling`
(136-188).

Differences by design:
  * All sampling evaluation is BATCHED through one jitted sampler (the
    reference builds a fresh sampler per utterance inside loops — quirk #12);
    transcripts are decoded from the same argmax(p_x0) ids.
  * `evaluate_validation_loss` reproduces the reference's degenerate
    definition (t=1, x_t = x_0; quirk #8) because its numeric value is part
    of the observable log format.
  * Levenshtein is a banded numpy DP (row-vectorised) rather than a double
    Python loop.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fddm_asr_tpu import diffusion as D

__all__ = [
    "calculate_cer",
    "calculate_wer",
    "ids_to_text",
    "logits_to_text",
    "evaluate_validation_loss",
    "evaluate_validation_kl_sampled",
    "evaluate_cer_with_full_sampling",
    "evaluate_cer_with_jumpy_sampling",
    "evaluate_wer_with_jumpy_sampling",
    "evaluate_cer_with_multi_sample",
]


def _levenshtein(ref: Sequence, hyp: Sequence) -> int:
    """Edit distance; native C++ kernel when built, numpy DP fallback
    (fddm_asr_tpu.native)."""
    from fddm_asr_tpu import native

    return native.levenshtein(ref, hyp)


def calculate_cer(ref: str, hyp: str) -> float:
    """Character error rate (reference lines 94-118 semantics)."""
    if len(ref) == 0:
        return 0.0 if len(hyp) == 0 else 1.0
    return _levenshtein(ref, hyp) / float(len(ref))


def calculate_wer(ref: str, hyp: str) -> float:
    """Word error rate over whitespace-split tokens (reference 120-134)."""
    r = ref.strip().split()
    h = hyp.strip().split()
    if len(r) == 0:
        return 0.0
    return _levenshtein(r, h) / float(len(r))


def ids_to_text(
    ids: Sequence[int],
    tokenizer,
    pad_id: int,
    bos_id: Optional[int] = None,
    eos_id: Optional[int] = None,
) -> str:
    """Filter specials (skip pad/bos, stop at eos) then decode (ref 26-68)."""
    clean: List[int] = []
    for tid in np.asarray(ids).tolist():
        if tid == pad_id:
            continue
        if bos_id is not None and tid == bos_id:
            continue
        if eos_id is not None and tid == eos_id:
            break
        clean.append(int(tid))
    try:
        return tokenizer.DecodeIds(clean)
    except AttributeError:
        return tokenizer.decode(clean)


def logits_to_text(logits, tokenizer, pad_id, bos_id=None, eos_id=None) -> List[str]:
    pred = np.asarray(jnp.argmax(jnp.asarray(logits), axis=-1))
    return [ids_to_text(pred[i], tokenizer, pad_id, bos_id, eos_id) for i in range(pred.shape[0])]


# --------------------------------------------------------------- evaluators
def evaluate_validation_loss(pipeline, batches: Iterable) -> float:
    """Mean KL at t=1 with x_t = x_0 — the reference's (degenerate) val loss."""
    total, count = 0.0, 0
    for batch in batches:
        c, c_mask = pipeline.encode_waveform(batch.wave, batch.wave_lengths)
        x0 = jnp.asarray(batch.tokens)
        B = x0.shape[0]
        t = jnp.ones((B,), jnp.int32)
        logits = pipeline.decoder_forward(x0, t, c, x0 != pipeline.pad_id, c_mask)
        loss = D.kl_term(pipeline.sched, x0, x0, logits, t, x0 != pipeline.pad_id)
        total += float(loss) * B
        count += B
    return total / count if count else 0.0


def evaluate_validation_kl_sampled(
    pipeline,
    batches: Iterable,
    rng: Optional[jax.Array] = None,
    mask_pad_loss: bool = True,
) -> float:
    """NON-degenerate validation KL: random t ~ U{1..T}, x_t ~ q(x_t | x0).

    The reference's `evaluate_validation_loss` (evaluate.py:190-245) fixes
    t=1 and feeds x_t = x_0, which collapses to ~0 regardless of model
    quality (quirk #8 — reproduced above for log parity).  This variant
    mirrors the TRAINING objective instead: per-example uniform t over the
    full schedule and a real forward-corruption draw, so the value tracks
    whether the denoiser is actually learning.  Deterministic by default
    (fixed rng) so successive evals over a fixed val set are comparable —
    epoch-to-epoch movement is model movement, not noise re-draws.

    Opt-in from training via `log.val_kl: sampled` (logged as `val_kl`
    alongside the parity-degenerate `val_loss`).
    """
    rng = rng if rng is not None else jax.random.key(0)
    sched = pipeline.sched
    total, count = 0.0, 0
    for batch in batches:
        rng, rng_t, rng_q = jax.random.split(rng, 3)
        c, c_mask = pipeline.encode_waveform(batch.wave, batch.wave_lengths)
        x0 = jnp.asarray(batch.tokens)
        B = x0.shape[0]
        t = jax.random.randint(rng_t, (B,), 1, sched.T + 1)
        xt = D.sample_xt_tokens(sched, rng_q, x0, t)
        x_mask = x0 != pipeline.pad_id
        loss_mask = x_mask if mask_pad_loss else jnp.ones_like(x_mask)
        logits = pipeline.decoder_forward(xt, t, c, x_mask, c_mask)
        loss = D.kl_term_sparse(sched, xt, x0, logits, t, loss_mask)
        total += float(loss) * B
        count += B
    return total / count if count else 0.0


def _sampling_config_from_cfg(cfg, overrides: Optional[Dict] = None) -> Dict:
    inf = cfg.get("inference", {}) if cfg is not None else {}
    sc = {
        "T_infer": inf.get("T_infer", 20),
        "r": inf.get("r", 5),
        "greedy": inf.get("greedy", True),
        "posterior_mode": inf.get("posterior_mode", "map"),
        "sampling_mode": inf.get("sampling_mode", "exact"),
        "temperature": inf.get("temperature", 1.0),
        # opt-in repetition-penalized read-out (sampler.argmax_repeat_
        # penalized); 0.0 = reference-parity plain argmax
        "repeat_penalty": float(inf.get("repeat_penalty", 0.0)),
    }
    if overrides:
        sc.update({k: v for k, v in overrides.items() if v is not None})
    return sc


def evaluate_cer_with_full_sampling(
    pipeline,
    batches: Iterable,
    cfg=None,
    sampling_config: Optional[Dict] = None,
    rng: Optional[jax.Array] = None,
    metric: Callable[[str, str], float] = calculate_cer,
) -> float:
    """Batched jumpy-sampling CER over a dataset (reference 247-341)."""
    sc = _sampling_config_from_cfg(cfg, sampling_config)
    rng = rng if rng is not None else jax.random.key(0)
    total, count = 0.0, 0
    for batch in batches:
        rng, step_rng = jax.random.split(rng)
        c, c_mask = pipeline.encode_waveform(batch.wave, batch.wave_lengths)
        L = batch.tokens.shape[1]
        # device sampling; only the token ids cross to host — p_x0 ([B,L,K],
        # ~65 MB at flagship shapes) is not needed for CER/WER
        x_pred = np.asarray(
            pipeline._sample_raw(step_rng, c, L, c_mask, **sc)[0])
        hyps = [pipeline.ids_to_text(x_pred[i]) for i in range(x_pred.shape[0])]
        refs = [pipeline.ids_to_text(batch.tokens[i]) for i in range(batch.tokens.shape[0])]
        for ref, hyp in zip(refs, hyps):
            total += metric(ref, hyp)
            count += 1
    return total / count if count else 0.0


def evaluate_cer_with_jumpy_sampling(pipeline, batches, cfg=None, rng=None) -> float:
    return evaluate_cer_with_full_sampling(pipeline, batches, cfg, None, rng)


def evaluate_wer_with_jumpy_sampling(pipeline, batches, cfg=None, rng=None) -> float:
    sc = _sampling_config_from_cfg(cfg, {"greedy": True, "posterior_mode": "map"})
    return evaluate_cer_with_full_sampling(
        pipeline, batches, cfg, sc, rng, metric=calculate_wer
    )


def decoded_span_mask(ids_row: np.ndarray, pad_id: int,
                      special_ids: Dict[str, Optional[int]]) -> np.ndarray:
    """Boolean mask of the DECODED span: positions before the first eos
    that are neither pad nor bos — exactly the tokens ids_to_text keeps.
    Shared by confidence scoring (pipeline._utterance_confidence) and
    best-of-N logprob voting so the two can never drift apart."""
    ids_row = np.asarray(ids_row)
    end = len(ids_row)
    eos = special_ids.get("eos_id")
    if eos is not None:
        hits = np.nonzero(ids_row == eos)[0]
        if hits.size:
            end = int(hits[0])
    valid = np.zeros(len(ids_row), bool)
    valid[:end] = True
    valid &= ids_row != pad_id
    bos = special_ids.get("bos_id")
    if bos is not None:
        valid &= ids_row != bos
    return valid


def utterance_confidence(ids_row: np.ndarray, p_row: np.ndarray,
                         pad_id: int,
                         special_ids: Dict[str, Optional[int]]) -> float:
    """Geometric-mean probability of the emitted tokens (final-step p_x0)
    over the decoded span — the standard ASR per-utterance confidence; 0.0
    when nothing was decoded.  Shared by FDDMPipeline and the AOT
    ExportedPipeline so live and exported serving report the same score."""
    ids_row = np.asarray(ids_row)
    tok_p = np.asarray(p_row)[np.arange(len(ids_row)), ids_row]
    valid = decoded_span_mask(ids_row, pad_id, special_ids)
    if not valid.any():
        return 0.0
    return float(np.exp(np.log(np.maximum(tok_p[valid], 1e-12)).mean()))


def batch_confidence_device(ids, p, pad_id: int,
                            special_ids: Dict[str, Optional[int]]):
    """jnp mirror of utterance_confidence over a batch: [B, L] ids +
    [B, L, K] p_x0 -> [B] geometric-mean token probability over the
    decoded span, computed ON DEVICE.

    Serving calls this instead of pulling p_x0 to host: the [B, L, K]
    tensor is ~65 MB per flagship B=16 batch and was transferred on every
    served batch just to reduce to B floats.  Traceable/jittable; equality
    with the numpy utterance_confidence is pinned in tests/test_nbest.py.
    """
    import jax.numpy as jnp

    ids = jnp.asarray(ids)
    tok_p = jnp.take_along_axis(jnp.asarray(p), ids[..., None], axis=-1)[..., 0]
    eos = special_ids.get("eos_id")
    if eos is not None:
        valid = jnp.cumsum(ids == eos, axis=-1) == 0  # strictly before eos
    else:
        valid = jnp.ones(ids.shape, bool)
    valid = valid & (ids != pad_id)
    bos = special_ids.get("bos_id")
    if bos is not None:
        valid = valid & (ids != bos)
    n = valid.sum(axis=-1)
    logs = jnp.where(valid, jnp.log(jnp.maximum(tok_p, 1e-12)), 0.0)
    mean = logs.sum(axis=-1) / jnp.maximum(n, 1)
    return jnp.where(n > 0, jnp.exp(mean), 0.0)


def _decoded_span_logprob_mean(ids_row: np.ndarray, tok_p: np.ndarray,
                               pipeline) -> float:
    """Mean log p(token) over the decoded span; empty span (all pad)
    scores -inf so a sample with real content wins."""
    valid = decoded_span_mask(ids_row, pipeline.pad_id, pipeline.special_ids)
    if not valid.any():
        return -np.inf
    return float(np.log(np.maximum(tok_p[valid], 1e-20)).mean())


def evaluate_cer_with_multi_sample(
    pipeline, batches, cfg=None, sampling_config=None, num_samples: int = 3,
    rng=None, voting: str = "first",
) -> float:
    """N stochastic samples per utterance, drawn batched.

    voting="first" reproduces the reference (its voting is stubbed to take
    sample 0, reference 436-438); voting="majority" implements per-position
    token-id majority over the N samples — the aggregation the reference's
    comment promises; voting="logprob" picks, per utterance, the whole
    sample the model itself scores highest (sum of log p_x0 at the chosen
    tokens) — best-of-N by model confidence, which unlike "majority" can
    never splice tokens from different samples into an inconsistent mix.
    """
    # the reference's multi-sample evaluator uses DIFFERENT fallback defaults
    # than the other eval fns when cfg.inference omits keys: r=2 and
    # posterior_mode='average' (evaluate.py:379-385) vs r=5/'map' elsewhere.
    # Those defaults apply ONLY when sampling_config is None — a partial
    # sampling_config falls through to the generic sampler defaults there,
    # so mirror that all-or-nothing behavior exactly.
    if sampling_config is None:
        inf = cfg.get("inference", {}) if cfg is not None else {}
        sampling_config = {"r": inf.get("r", 2),
                           "posterior_mode": inf.get("posterior_mode", "average")}
    sc = _sampling_config_from_cfg(cfg, sampling_config)
    sc["greedy"] = False
    rng = rng if rng is not None else jax.random.key(0)
    total, count = 0.0, 0
    for batch in batches:
        c, c_mask = pipeline.encode_waveform(batch.wave, batch.wave_lengths)
        L = batch.tokens.shape[1]
        preds, scores = [], []
        for _ in range(num_samples):
            rng, step_rng = jax.random.split(rng)
            x_pred, p_x0 = pipeline.sample(step_rng, c, seq_len=L, c_mask=c_mask, **sc)
            preds.append(np.asarray(x_pred))
            if voting == "logprob":
                p = np.take_along_axis(
                    np.asarray(p_x0), np.asarray(x_pred)[..., None], axis=-1
                )[..., 0]                                        # [B, L]
                # Score only the DECODED span (pre-eos, non-pad/bos),
                # mirroring pipeline._utterance_confidence: the post-eos
                # tail is dropped by ids_to_text, so confidently-scored
                # garbage there must not sway which sample wins.  Mean
                # (not sum) so spans of different lengths compare fairly.
                scores.append(np.asarray([
                    _decoded_span_logprob_mean(
                        np.asarray(x_pred)[b], p[b], pipeline)
                    for b in range(p.shape[0])
                ]))
        if voting == "majority":
            stacked = np.stack(preds)                            # [N, B, L]
            def _mode(col):
                vals, counts = np.unique(col, return_counts=True)
                return vals[np.argmax(counts)]
            chosen = np.apply_along_axis(_mode, 0, stacked)
        elif voting == "logprob":
            stacked = np.stack(preds)                            # [N, B, L]
            best = np.argmax(np.stack(scores), axis=0)           # [B]
            chosen = stacked[best, np.arange(stacked.shape[1])]
        else:
            chosen = preds[0]
        hyps = [pipeline.ids_to_text(chosen[i]) for i in range(chosen.shape[0])]
        refs = [pipeline.ids_to_text(batch.tokens[i]) for i in range(batch.tokens.shape[0])]
        for ref, hyp in zip(refs, hyps):
            total += calculate_cer(ref, hyp)
            count += 1
    return total / count if count else 0.0
