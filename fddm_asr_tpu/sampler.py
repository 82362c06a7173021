# -*- coding: utf-8 -*-
"""Jumpy sampling — the inference-time denoising loop as ONE `jax.lax.scan`.

Behavioral reference: /root/reference/sampler/jumpy_sampler.py
(DiffusionJumpySampler 86-307, ModelAdapter 54-83).  The reference runs a
Python while-loop with a host round-trip per jump (its exact mode even runs a
per-batch Python loop *inside* the scheduler); here the entire trajectory
x_T -> x_0 compiles to a single scan with the decoder inside — zero host
round-trips, the explicit design goal of the rebuild.

Semantics matched to the reference:

  * Jump schedule: t starts at T_infer; each jump takes delta = min(r, t)
    (reference lines 285-288).  The (t, delta) pairs are static given
    (T_infer, r) and are precomputed as scan inputs.
  * Exact mode walks the *training* beta table with inference-axis steps
    t in 1..T_infer (reference quirk: `q_posterior_multi_step` is called with
    the raw inference t, lines 192-202 — only fast mode remaps axes).  This is
    deliberate parity; see SURVEY quirk #4.
  * Fast mode remaps t_infer -> t_train = round(clamp(t/T_infer * T_train,
    1, T_train)) and mixes alpha_bar * p(x0) + (1-alpha_bar)/K (lines
    139-151, 219-236).  Python banker's rounding is applied at trace time,
    matching `round()` in the reference.  The reference's lookup is
    off-by-one against its own q_sample convention — it returns
    abar_{t_train+1} — and IndexErrors at t_train == T_train (quirk #5);
    `ref_compat=True` (default) reproduces the shifted value (clamped at T
    instead of crashing), `ref_compat=False` uses the self-consistent
    abar_{t_train}.  See _fast_alpha_bar_targets.
  * posterior_mode == "max" -> argmax; anything else (including the 'map'
    string used by the reference eval code, which its sampler never
    recognises — quirk #6) falls through to greedy-argmax / temperature
    Categorical exactly like `_to_indices` (lines 153-162, 211-215).
  * No masks are passed to the decoder (reference ModelAdapter line 82); the
    decoder auto-derives x_mask = (x_t != pad_id).  `pass_masks=True` opts
    into honoring condition masks for batched padded inference — a framework
    extension the reference's one-utterance-at-a-time loop never needed.
  * Final output is argmax of the last p(x0) (lines 290-293).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fddm_asr_tpu.diffusion import DiffusionSchedule, q_posterior_multi_step

__all__ = [
    "SamplerConfig",
    "argmax_repeat_penalized",
    "build_jump_schedule",
    "make_sample_fn",
    "DiffusionJumpySampler",
    "ModelAdapter",
]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    K: int
    T_train: int
    T_infer: int = 20
    r: int = 5
    greedy: bool = True
    posterior_mode: str = "average"  # "average" | "max" | "map" (== average+greedy)
    sampling_mode: str = "exact"     # "exact" | "fast"
    temperature: float = 1.0
    ref_compat: bool = True          # reproduce reference multi-step recurrence
    # > 0 switches the FINAL read-out to a repetition-penalized sequential
    # argmax (see argmax_repeat_penalized); 0 = plain argmax (parity).
    repeat_penalty: float = 0.0


def build_jump_schedule(T_infer: int, r: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (t, delta) pairs of the while-loop `while t>0: delta=min(r,t)`."""
    ts, deltas = [], []
    t = T_infer
    while t > 0:
        d = min(r, t)
        ts.append(t)
        deltas.append(d)
        t -= d
    return np.asarray(ts, np.int32), np.asarray(deltas, np.int32)


def _fast_alpha_bar_targets(
    sched: DiffusionSchedule, cfg: SamplerConfig, ts: np.ndarray, deltas: np.ndarray
) -> np.ndarray:
    """Per-jump alpha_bar at the remapped train-axis target step (fast mode).

    Mirrors `_get_alpha_bar_for_t_infer` (reference jumpy_sampler.py:219-236):
    python round (banker's) of clamp(t/T_infer * T_train, 1, T_train);
    target 0 -> 1.0.

    Reference quirk #5 (reproduced when cfg.ref_compat, the default): the
    reference indexes its 0-indexed length-T buffer with the 1-based step
    (`self.alpha_bar[t_train_idx]`), returning abar_{t_train+1} — one step
    LESS noise than its own q_sample convention (`alpha_bar[t-1]`) — and
    IndexErrors outright at t_train == T_train.  Greedy fast mode is
    invariant (argmax(ab*p + (1-ab)/K) == argmax(p) for any ab > 0), but
    stochastic fast draws are calibrated against this exact table, so
    reference checkpoints need the shifted lookup.  ref_compat=False uses
    the self-consistent abar_{t_train}; both clamp at T instead of crashing.
    tests/test_sampler.py pins the table against the reference helper."""
    table = np.asarray(sched.alpha_bar_ext)
    out = []
    for t, d in zip(ts.tolist(), deltas.tolist()):
        target = max(0, t - d)
        if target <= 0:
            out.append(1.0)
            continue
        t_train = round(
            max(1.0, min(float(cfg.T_train), target / max(1, cfg.T_infer) * cfg.T_train))
        )
        idx = int(t_train) + 1 if cfg.ref_compat else int(t_train)
        out.append(float(table[min(idx, sched.T)]))
    return np.asarray(out, np.float32)


def argmax_repeat_penalized(p_last: jnp.ndarray, penalty: float) -> jnp.ndarray:
    """Left-to-right greedy read-out of p(x0) with an adjacent-repeat penalty.

    Framework extension (no reference counterpart): the half-trained scale
    runs decode correct anchors that degrade into repeated-token runs, and
    the repetition lives in x0hat itself (r=1 vs r=5 trajectories are
    identical) — so the mitigation belongs at the final read-out, not in
    the diffusion trajectory.  Position i's log-prob for the token chosen
    at position i-1 is reduced by `penalty`; a genuine repeat still wins
    when its evidence margin exceeds the penalty.  penalty=0 reduces to
    plain argmax.  One lax.scan over the L positions ([L, B, K] slices);
    L is tens of tokens, so this is noise next to the decoder scan.
    """
    logp = jnp.log(jnp.clip(p_last.astype(jnp.float32), min=1e-12))
    B, _, K = logp.shape

    def body(prev_idx, logp_i):
        scores = logp_i - penalty * jax.nn.one_hot(prev_idx, K, dtype=logp_i.dtype)
        idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return idx, idx

    init = jnp.full((B,), -1, jnp.int32)  # one_hot(-1) == 0: no penalty at i=0
    _, idxs = jax.lax.scan(body, init, jnp.swapaxes(logp, 0, 1))
    return jnp.swapaxes(idxs, 0, 1)


def make_sample_fn(
    decoder_apply: Callable,
    sched: DiffusionSchedule,
    cfg: SamplerConfig,
) -> Callable:
    """Builds sample(params, rng, cond_c, seq_len, c_mask=None) ->
    (x0_idx, p_x0_last).

    decoder_apply(params, xt [B,L] int, t [B] int, cond [B,S,D], c_mask) ->
    logits [B,L,K].  The returned fn is jit-compatible (seq_len static).
    `params` MUST flow through as an argument — closing model weights into
    the jitted function would bake them into the compiled program as
    constants (hundreds of MB of HLO; the TPU remote-compile service rejects
    such programs outright).
    """
    ts_np, deltas_np = build_jump_schedule(cfg.T_infer, cfg.r)
    ab_targets_np = _fast_alpha_bar_targets(sched, cfg, ts_np, deltas_np)

    def to_indices(rng, probs):
        if cfg.posterior_mode == "max" or cfg.greedy:
            return jnp.argmax(probs, axis=-1)
        logits = jnp.log(jnp.clip(probs, min=1e-12)) / cfg.temperature
        return jax.random.categorical(rng, logits, axis=-1)

    def sample(
        params,
        rng: jax.Array,
        cond_c: jnp.ndarray,            # [B, S, D]
        seq_len: int,
        c_mask: Optional[jnp.ndarray] = None,
        x_init: Optional[jnp.ndarray] = None,  # [B, seq_len] override of x_T
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B = cond_c.shape[0]
        rng, rng_init = jax.random.split(rng)
        if x_init is None:
            x_t = jax.random.randint(rng_init, (B, seq_len), 0, cfg.K, dtype=jnp.int32)
        else:
            x_t = x_init.astype(jnp.int32)

        ts = jnp.asarray(ts_np)
        deltas = jnp.asarray(deltas_np)
        ab_targets = jnp.asarray(ab_targets_np)
        step_rngs = jax.random.split(rng, len(ts_np))

        def body(carry, xs):
            x_t, _ = carry
            t, delta, ab_target, step_rng = xs
            t_b = jnp.full((B,), t, jnp.int32)
            logits = decoder_apply(params, x_t, t_b, cond_c, c_mask)
            p_x0 = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

            if cfg.sampling_mode == "exact":
                xt_onehot = jax.nn.one_hot(x_t, cfg.K, dtype=jnp.float32)
                p_next = q_posterior_multi_step(
                    sched, xt_onehot, p_x0, t_b, delta, ref_compat=cfg.ref_compat
                )
            else:  # fast: convex mix with uniform at the remapped target step
                p_next = ab_target * p_x0 + (1.0 - ab_target) / cfg.K

            x_next = to_indices(step_rng, p_next).astype(jnp.int32)
            # p_x0 rides in the CARRY: stacking it as a scan output would
            # allocate [n_steps, B, L, K] (~131 MB per step at B=32, L=128,
            # K=8000) when only the last step's value is consumed
            return (x_next, p_x0), None

        p0 = jnp.zeros((B, seq_len, cfg.K), jnp.float32)
        (_, p_x0_last), _ = jax.lax.scan(
            body, (x_t, p0), (ts, deltas, ab_targets, step_rngs)
        )
        if cfg.repeat_penalty > 0.0:
            x0_idx = argmax_repeat_penalized(p_x0_last, cfg.repeat_penalty)
        else:
            x0_idx = jnp.argmax(p_x0_last, axis=-1)
        return x0_idx, p_x0_last

    return sample


def _wrap_paramless(decoder_apply: Callable) -> Callable:
    def wrapped(params, xt, t, cond, c_mask):
        del params
        return decoder_apply(xt, t, cond, c_mask)

    return wrapped


class ModelAdapter:
    """API-parity shim for the reference's ModelAdapter (jumpy_sampler.py:
    54-83): normalises a decoder callable to predict_x0_logits(x_t, t, c).

    Migrating users can wrap `(flax_module, params)` or any callable; the
    framework-native path is `make_sample_fn(decoder_apply, ...)` which keeps
    params explicit for jit.
    """

    def __init__(self, decoder, params=None):
        self.decoder = decoder
        self.params = params

    def predict_x0_logits(self, x_t_idx, t, cond_c):
        if self.params is not None:  # flax module
            return self.decoder.apply(
                self.params, x_t_idx, t, cond_c, None, None, deterministic=True
            )
        return self.decoder(x_t_idx, t, cond_c)


class DiffusionJumpySampler:
    """Convenience wrapper mirroring the reference sampler's constructor/API.

    `decoder_apply` is bound with model params; `sample` jit-compiles once per
    (batch, seq_len) shape and runs the whole trajectory on device.
    """

    def __init__(
        self,
        sched: DiffusionSchedule,
        decoder_apply: Callable,
        K: int,
        T_train: int,
        T_infer: int = 20,
        r: int = 5,
        greedy: bool = True,
        posterior_mode: str = "average",
        sampling_mode: str = "exact",
        temperature: float = 1.0,
        ref_compat: bool = True,
        decoder_params=None,
        repeat_penalty: float = 0.0,
    ) -> None:
        self.cfg = SamplerConfig(
            K=K, T_train=T_train, T_infer=T_infer, r=r, greedy=greedy,
            posterior_mode=posterior_mode, sampling_mode=sampling_mode,
            temperature=temperature, ref_compat=ref_compat,
            repeat_penalty=repeat_penalty,
        )
        self.sched = sched
        self.decoder_params = decoder_params
        self._rng = jax.random.key(0)
        if decoder_params is None:
            # decoder_apply(xt, t, cond, c_mask) without a params arg
            decoder_apply = _wrap_paramless(decoder_apply)
        self._fn = jax.jit(
            make_sample_fn(decoder_apply, sched, self.cfg), static_argnames=("seq_len",)
        )

    def sample(
        self,
        cond_c: jnp.ndarray,
        seq_len: int,
        init: str = "uniform",  # "uniform" and "random" are identical (ref 275-280)
        rng: Optional[jax.Array] = None,
        c_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        del init
        if rng is None:
            # advance an internal key per call — the reference's torch global
            # RNG advances between calls, so repeated stochastic sample()
            # calls must yield DISTINCT trajectories (multi-sample voting
            # degenerates to one sample otherwise)
            self._rng, rng = jax.random.split(self._rng)
        return self._fn(self.decoder_params, rng, cond_c, seq_len=seq_len, c_mask=c_mask)

    def get_sampling_info(self) -> dict:
        c = self.cfg
        return {
            "sampling_mode": c.sampling_mode,
            "posterior_mode": c.posterior_mode,
            "T_infer": c.T_infer,
            "r": c.r,
            "greedy": c.greedy,
            "temperature": c.temperature,
            "K": c.K,
        }
