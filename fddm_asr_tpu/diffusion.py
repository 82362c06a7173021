# -*- coding: utf-8 -*-
"""Discrete (multinomial) diffusion over token sequences — pure-JAX core.

Implements the uniform-transition discrete diffusion of FDDM: each step applies
the K x K transition matrix

    M_t = (1 - beta_t) * I + (beta_t / K) * 11^T

which is never materialised; every quantity below reduces to the scalar pair
(a_t, b_t) = (1 - beta_t, beta_t / K).  The noise schedule is cosine:
beta_t = beta_max * sin^2(pi * t / (2 T)), alpha_bar_t = prod_{s<=t}(1 - beta_s).

Behavioral reference: /root/reference/fddm/sched/diffusion_scheduler.py
(q_sample: 31-50, q_posterior: 52-104, q_posterior_multi_step: 106-208,
w_prefix: 210-213).  Differences by design (TPU-first):

  * Everything is a pure function of a `DiffusionSchedule` pytree — jit /
    vmap / scan / shard_map friendly; no device state, no Python loops.
  * The reference computes the Delta-step transition-product coefficients with
    a per-batch-element Python loop (reference lines 144-164).  The product of
    uniform-mixture matrices has a closed form: each M_s satisfies
    a_s + K*b_s = 1, an invariant preserved under products, hence

        prod_{s=t-Delta+1}^{t} M_s  ==  a_cum * I + b_cum * 11^T
        a_cum = prod a_s = alpha_bar_t / alpha_bar_{t-Delta},
        b_cum = (1 - a_cum) / K.

    This is verified numerically against the reference recurrence in
    tests/test_diffusion.py.
  * `alpha_bar_ext` / `betas_ext` are length T+1 with index 0 == the identity
    step (alpha_bar_0 = 1, beta_0 = 0), fixing the reference's off-by-one where
    index T_train could overflow (reference sampler lines 230-236).

All math is float32: K can be 8000+, so probability mass per class is ~1e-4
and bf16 resolution is insufficient for posterior renormalisation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "q_sample",
    "sample_xt_tokens",
    "q_posterior",
    "q_posterior_multi_step",
    "multi_step_coeffs",
    "kl_term",
    "DiscreteDiffusionScheduler",
]

_EPS = 1e-8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed noise-schedule tables (a pytree of jnp arrays).

    Attributes:
      betas_ext:     [T+1] float32, betas_ext[0] = 0, betas_ext[t] = beta_t.
      alpha_bar_ext: [T+1] float32, alpha_bar_ext[0] = 1,
                     alpha_bar_ext[t] = prod_{s<=t} (1 - beta_s).
      beta_over_abar_prefix: [T+1] float32,
                     S_t = sum_{s<=t} beta_s / alpha_bar_{s-1} (S_0 = 0);
                     closed form of the reference's (aliasing-bugged) b-term
                     recurrence — see `multi_step_coeffs`.
      K: number of classes (tokenizer vocab size).    (static)
      T: number of diffusion steps.                   (static)
    """

    betas_ext: jnp.ndarray
    alpha_bar_ext: jnp.ndarray
    beta_over_abar_prefix: jnp.ndarray
    K: int = dataclasses.field(metadata=dict(static=True))
    T: int = dataclasses.field(metadata=dict(static=True))

    @property
    def betas(self) -> jnp.ndarray:
        """[T] table matching the reference's 0-indexed `betas` buffer."""
        return self.betas_ext[1:]

    @property
    def alpha_bar(self) -> jnp.ndarray:
        """[T] table matching the reference's `alpha_bar` buffer."""
        return self.alpha_bar_ext[1:]

    @property
    def w_prefix(self) -> jnp.ndarray:
        """w_t = prod_{s<=t}(1 - beta_s); weight table for L_fd (paper eq. 13)."""
        return self.alpha_bar_ext[1:]

    def w_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Per-example L_fd weight, t in 1..T -> alpha_bar_t."""
        return self.alpha_bar_ext[t]


def make_schedule(K: int, T: int, beta_max: float = 0.2) -> DiffusionSchedule:
    """Builds the cosine schedule beta_t = beta_max * sin^2(pi t / 2T).

    Matches reference diffusion_scheduler.py:25-29 bit-for-bit on the
    overlapping index range (verified in tests).
    """
    t = np.arange(1, T + 1, dtype=np.float32)
    betas = (beta_max * np.sin(0.5 * np.pi * (t / float(T))) ** 2).astype(np.float32)
    alpha_bar = np.cumprod(1.0 - betas).astype(np.float32)
    abar_ext64 = np.concatenate([[1.0], alpha_bar]).astype(np.float64)
    prefix = np.concatenate(
        [[0.0], np.cumsum(betas.astype(np.float64) / abar_ext64[:-1])]
    ).astype(np.float32)
    return DiffusionSchedule(
        betas_ext=jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.asarray(betas)]),
        alpha_bar_ext=jnp.concatenate([jnp.ones((1,), jnp.float32), jnp.asarray(alpha_bar)]),
        beta_over_abar_prefix=jnp.asarray(prefix),
        K=int(K),
        T=int(T),
    )


def _renorm(p: jnp.ndarray) -> jnp.ndarray:
    p = jnp.clip(p, min=_EPS)
    return p / jnp.clip(jnp.sum(p, axis=-1, keepdims=True), min=_EPS)


def q_sample(sched: DiffusionSchedule, x0_prob: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Forward corruption q(x_t | x_0) = alpha_bar_t * x0 + (1 - alpha_bar_t)/K.

    Args:
      x0_prob: [B, L, K] one-hot or probability rows.
      t:       [B] int timesteps in 1..T.
    Returns:
      [B, L, K] probability rows.  (reference q_sample, lines 31-50)
    """
    x0_prob = x0_prob.astype(jnp.float32)
    ab = sched.alpha_bar_ext[t][:, None, None]
    xt = ab * x0_prob + (1.0 - ab) / sched.K
    return _renorm(xt)


def sample_xt_tokens(
    sched: DiffusionSchedule, rng: jax.Array, x0_tokens: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Forward-diffuse discrete tokens: x0 ids -> x_t ids.

    Equivalent to the reference SchedulerAdapter.sample_q (train.py:180-188):
    one-hot -> q_sample -> per-position categorical draw, but without ever
    materialising the [B, L, K] one-hot.  The categorical of the one-hot
    q_sample row `ab*onehot(x0) + (1-ab)/K` decomposes EXACTLY as: emit x0
    with prob ab, else draw uniform over ALL K tokens — the uniform branch
    re-picks x0 with prob 1/K, supplying precisely the + (1-ab)/K mass.
    (Keeping with prob ab + (1-ab)/K AND resampling over all K — an earlier
    revision of this function — double-counts that mass: it inflates
    P(x_t = x0) by (1-p_keep)/K and shrinks every wrong-token probability
    by (K-1)/K.  tests/test_diffusion.py pins the exact marginals at K=2.)

    This keeps the hot path O(B*L) instead of O(B*L*K) — on TPU the [B,L,K]
    one-hot for K=8000 would dominate HBM traffic of the whole train step.
    """
    B, L = x0_tokens.shape
    ab = sched.alpha_bar_ext[t][:, None]  # [B,1]
    rng_keep, rng_unif = jax.random.split(rng)
    keep = jax.random.uniform(rng_keep, (B, L)) < ab
    rand_tok = jax.random.randint(rng_unif, (B, L), 0, sched.K, dtype=x0_tokens.dtype)
    return jnp.where(keep, x0_tokens, rand_tok)


def q_posterior(
    sched: DiffusionSchedule,
    xt_prob: jnp.ndarray,
    x0hat_prob: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Single-step posterior q(x_{t-1} | x_t, x0hat), reference lines 52-104.

    q propto (M_t^T x_t) . (M_{t-1} x0hat) / (x_t^T M_t x0hat), with the t=1
    boundary handled by M_0 = I (betas_ext[0] = 0).

    Reference design quirk (reproduced on purpose, pinned by
    tests/test_diffusion.py::test_posteriors_match_explicit_transition_matrices):
    the prior term applies the SINGLE transition M_{t-1} to x0hat, not the
    canonical D3PM prior Mbar_{t-1} (the cumulative product from x0).  The
    multi-step posterior below shares the same family (single M_{t-Delta}
    prior).  Since x0hat is a model OUTPUT the model trains against this
    exact objective, so the family is self-consistent — but it is not the
    textbook posterior, and checkpoints are only calibrated for it.
    """
    xt_prob = xt_prob.astype(jnp.float32)
    x0hat_prob = x0hat_prob.astype(jnp.float32)
    beta_t = sched.betas_ext[t][:, None, None]
    a_t, b_t = 1.0 - beta_t, beta_t / sched.K
    beta_tm1 = sched.betas_ext[jnp.maximum(t - 1, 0)][:, None, None]
    a_tm1, b_tm1 = 1.0 - beta_tm1, beta_tm1 / sched.K

    A = a_t * xt_prob + b_t
    Bv = a_tm1 * x0hat_prob + b_tm1
    dot = jnp.sum(xt_prob * x0hat_prob, axis=-1, keepdims=True)
    denom = a_t * dot + b_t
    return _renorm((A * Bv) / jnp.clip(denom, min=_EPS))


def multi_step_coeffs(
    sched: DiffusionSchedule, t: jnp.ndarray, delta, ref_compat: bool = True
) -> tuple:
    """Closed-form coefficients of the Delta-step transition product.

    Returns (a_cum, b_cum, a_target, b_target), each [B]:
      prod_{s=t_target+1}^{t} M_s == a_cum * I + b_cum * 11^T,
      M_{t_target}               == a_target * I + b_target * 11^T,
    with t_target = max(t - delta, 0) and M_0 = I.

    Replaces the reference's O(B * Delta) host loop (reference lines 144-183)
    with table lookups.

    ref_compat=True (default) reproduces the reference's *actual* recurrence,
    which differs from the documented math by a tensor-aliasing bug: in
      a_old = a_cumulative[i,0,0]           # a 0-d VIEW, not a copy
      a_cumulative[i,0,0] = a_s * a_old
      b_cumulative[i,0,0] = a_s * b_old + b_s * (a_old + K * b_old)
    (reference lines 160-164) the b-update reads the already-updated a, so the
    effective recurrence is b_n = b_{n-1} + b_s * a_n (using a_s + K b_s = 1),
    whose closed form is
      b_cum = (alpha_bar_t / K) * (S_t - S_{t-Delta}),
      S_t = sum_{s<=t} beta_s / alpha_bar_{s-1}.
    ref_compat=False uses the mathematically exact product
      b_cum = (1 - a_cum) / K.
    Both are verified against brute-force products / the reference loop in
    tests/test_diffusion.py.  The difference is O(beta^2) per step; compat
    mode is the default because transcript-level parity with reference
    checkpoints is a framework goal.
    """
    t = jnp.asarray(t)
    t_target = jnp.clip(t - delta, min=0)
    a_cum = sched.alpha_bar_ext[t] / sched.alpha_bar_ext[t_target]
    if ref_compat:
        b_cum = (sched.alpha_bar_ext[t] / sched.K) * (
            sched.beta_over_abar_prefix[t] - sched.beta_over_abar_prefix[t_target]
        )
    else:
        b_cum = (1.0 - a_cum) / sched.K
    beta_tgt = sched.betas_ext[t_target]
    a_target = 1.0 - beta_tgt
    b_target = beta_tgt / sched.K
    return a_cum, b_cum, a_target, b_target


def q_posterior_multi_step(
    sched: DiffusionSchedule,
    xt_prob: jnp.ndarray,
    x0hat_prob: jnp.ndarray,
    t: jnp.ndarray,
    delta,
    ref_compat: bool = True,
) -> jnp.ndarray:
    """Exact Delta-step posterior q(x_{t-Delta} | x_t, x0hat).

    q propto (M_{t:t-Delta+1}^T x_t) . (M_{t-Delta} x0hat)
           / (x_t^T M_{t:t-Delta+1} x0hat)

    Args:
      xt_prob:    [B, L, K] (one-hot of x_t in exact sampling).
      x0hat_prob: [B, L, K] model softmax.
      t:          [B] int current steps.
      delta:      python int or [B] int array of jump sizes.
      ref_compat: reproduce the reference's aliasing-bugged b-term (default);
                  see `multi_step_coeffs`.

    Matches the reference q_posterior_multi_step (lines 106-208) for inputs
    with t - delta >= 0 and steps within 1..T (verified in tests); the closed
    form replaces its per-batch Python loop.
    """
    xt_prob = xt_prob.astype(jnp.float32)
    x0hat_prob = x0hat_prob.astype(jnp.float32)
    a_c, b_c, a_tg, b_tg = multi_step_coeffs(sched, t, delta, ref_compat)
    a_c = a_c[:, None, None]
    b_c = b_c[:, None, None]
    a_tg = a_tg[:, None, None]
    b_tg = b_tg[:, None, None]

    sum_xt = jnp.sum(xt_prob, axis=-1, keepdims=True)
    sum_x0 = jnp.sum(x0hat_prob, axis=-1, keepdims=True)
    A = a_c * xt_prob + b_c * sum_xt
    Bv = a_tg * x0hat_prob + b_tg * sum_x0
    dot = jnp.sum(xt_prob * x0hat_prob, axis=-1, keepdims=True)
    denom = a_c * dot + b_c * sum_x0 * sum_xt
    return _renorm((A * Bv) / jnp.clip(denom, min=_EPS))


def kl_term(
    sched: DiffusionSchedule,
    xt: jnp.ndarray,
    x0: jnp.ndarray,
    logits_x0: jnp.ndarray,
    t: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Differentiable diffusion loss KL[q(x_{t-1}|x_t,x_0) || p_theta(x_{t-1}|x_t,c)].

    Mirrors the reference SchedulerAdapter.kl_term (train.py:190-255): the
    model posterior is built from x0hat = softmax(logits_x0); both posteriors
    share the unnormalised form (M_t^T x_t).(M_{t-1} x).  The reference never
    materialises normalised posteriors either — it divides by the analytic
    denominator x_t^T M_t x and computes KL on those (already normalised)
    rows.

    TPU-first difference: the reference scatters x0/xt into [B, L, K] one-hot
    tensors and does dense K-wide arithmetic.  Because both q and p share the
    factor (M_t^T x_t) and the one-hot structure makes most rows equal, the
    K-dim KL sum collapses to a closed form over three scalar cases per
    position (class == x0, class == xt, other), turning an O(B*L*K) kernel
    into O(B*L) plus one gather of the model probability at x0 and xt.
    We keep the dense formulation here for exact reference parity (it is the
    version parity-tested against torch), and expose the O(B*L) fast path as
    `kl_term_sparse` below; both agree to float32 tolerance in tests for
    well-conditioned inputs (see kl_term_sparse's docstring for the
    underflow regime where they intentionally differ).

    Args:
      xt, x0:    [B, L] int token ids.
      logits_x0: [B, L, V] model logits (any float dtype; upcast to f32).
      t:         [B] int steps in 1..T.
      x_mask:    [B, L] bool, True = valid (non-pad) position.
    Returns scalar loss.
    """
    logits_x0 = logits_x0.astype(jnp.float32)
    B, L, V = logits_x0.shape
    x0_hat = jax.nn.softmax(logits_x0, axis=-1)
    xt_onehot = jax.nn.one_hot(xt, V, dtype=jnp.float32)
    x0_onehot = jax.nn.one_hot(x0, V, dtype=jnp.float32)

    beta_t = sched.betas_ext[t][:, None, None]
    # Reference uses betas[(t-2).clamp(0)] masked to 0 at t==1; betas_ext[t-1]
    # with betas_ext[0] = 0 is identical.
    beta_prev = sched.betas_ext[jnp.maximum(t - 1, 0)][:, None, None]

    K = float(V)
    MtT_xt = (beta_t / K) + (1.0 - beta_t) * xt_onehot
    Mprev_x0 = (1.0 - beta_prev) * x0_onehot + beta_prev / K
    Mprev_x0hat = (1.0 - beta_prev) * x0_hat + beta_prev / K

    x0_at_xt = jnp.sum(x0_onehot * xt_onehot, axis=-1)  # [B, L] in {0,1}
    x0hat_at_xt = jnp.take_along_axis(x0_hat, xt[..., None], axis=-1)[..., 0]
    beta_t_bl = sched.betas_ext[t][:, None]
    denom_true = beta_t_bl / K + (1.0 - beta_t_bl) * x0_at_xt
    denom_pred = beta_t_bl / K + (1.0 - beta_t_bl) * x0hat_at_xt

    q_post = MtT_xt * Mprev_x0 / (denom_true[..., None] + _EPS)
    p_post = MtT_xt * Mprev_x0hat / (denom_pred[..., None] + _EPS)
    kl_token = jnp.sum(
        q_post * (jnp.log(q_post + _EPS) - jnp.log(p_post + _EPS)), axis=-1
    )  # [B, L]

    if x_mask is not None:
        valid = x_mask.astype(jnp.float32)
        kl_per_sample = jnp.sum(kl_token * valid, axis=1) / (jnp.sum(valid, axis=1) + _EPS)
    else:
        kl_per_sample = jnp.mean(kl_token, axis=1)
    return jnp.mean(kl_per_sample)


class DiscreteDiffusionScheduler:
    """Drop-in OO facade matching the reference class's constructor/API
    (reference diffusion_scheduler.py:17-213) over the pure-function core.

    For users migrating from the PyTorch reference: same signature
    `DiscreteDiffusionScheduler(K, T, device, beta_max)` (device ignored —
    placement is jit's job), same attributes `betas`/`alpha_bar`/`w_prefix`,
    same methods.  Arrays in/out are jnp (numpy accepted).
    """

    def __init__(self, K: int, T: int, device=None, beta_max: float = 0.2,
                 eps: float = 1e-8):
        del device, eps
        self.K = int(K)
        self.T = int(T)
        self.sched = make_schedule(K, T, beta_max)

    @property
    def betas(self):
        return self.sched.betas

    @property
    def alpha_bar(self):
        return self.sched.alpha_bar

    @property
    def w_prefix(self):
        return self.sched.w_prefix

    def q_sample(self, x0_prob, t):
        return q_sample(self.sched, jnp.asarray(x0_prob), jnp.asarray(t))

    def q_posterior(self, xt_prob, x0hat_prob, t):
        return q_posterior(
            self.sched, jnp.asarray(xt_prob), jnp.asarray(x0hat_prob), jnp.asarray(t)
        )

    def q_posterior_multi_step(self, xt_prob, x0hat_prob, t, delta, ref_compat=True):
        """EAGER-ONLY facade: do not jit/vmap through this method.

        The global clamp below materialises ``min(t)`` on the host
        (``int(jnp.min(t))``) to reproduce the reference's data-dependent
        entry behavior — under tracing that raises TracerConversionError by
        design.  Jitted code (the sampler) uses the pure
        ``q_posterior_multi_step`` function, which is trace-safe.
        """
        # Reference entry behavior (diffusion_scheduler.py:106-143): the jump
        # is clamped GLOBALLY to the smallest t in the batch, and a
        # non-positive jump returns xt_prob unchanged.  The pure function
        # below assumes per-element-valid (t, delta) — the sampler guarantees
        # that — so the reference semantics live here in the drop-in facade.
        t = jnp.asarray(t)
        delta = int(min(int(delta), int(jnp.min(t))))
        if delta <= 0:
            return jnp.asarray(xt_prob)
        return q_posterior_multi_step(
            self.sched, jnp.asarray(xt_prob), jnp.asarray(x0hat_prob),
            t, delta, ref_compat,
        )


def kl_term_sparse(
    sched: DiffusionSchedule,
    xt: jnp.ndarray,
    x0: jnp.ndarray,
    logits_x0: jnp.ndarray,
    t: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """O(B*L)-memory-traffic variant of `kl_term`.

    Agrees with the dense form to f32 tolerance for well-conditioned
    posteriors, but is NOT bit-equivalent in the underflow regime: the dense
    path computes log(p + 1e-8), saturating at -18.4 when the model posterior
    underflows the eps (confidently-wrong x0hat at small b_t, e.g.
    p ~ b_t * x0hat[x0] / x0hat[xt] < 1e-8 at K=8000, T=200), while this
    decomposition evaluates the true log via per-factor logs — more negative
    KL terms and NON-vanishing gradients exactly where the dense form's
    gradients die.  Keep the default dense form for reference parity;
    `optim.kl_impl: sparse` is a deliberate choice of the better-conditioned
    loss surface.

    Derivation: with e_i = one-hot rows, all K classes fall into at most three
    distinct (q_k, p_k) value groups: k == x0, k == xt and "other" (when
    xt == x0 the first two merge).  Membership counts are (1, 1, K-2) or
    (1, K-1).  The dense KL sum becomes a weighted sum over group
    representatives.  We still need the full log-softmax for p_k ("other"
    classes have p_k proportional to x0_hat_k) — that term reduces to an
    expectation under q's uniform tail, which is NOT sparse in general, so the
    exact collapse only removes the q-side densification.  Concretely:

        KL = sum_k q_k log q_k  -  sum_k q_k log p_k

    q has three distinct values; sum_k q_k log q_k is closed-form.  For the
    cross term, p_k = MtT_xt_k * Mprev_x0hat_k / denom_pred where MtT_xt_k
    takes two values (k == xt / else).  So
        sum_k q_k log p_k = sum_k q_k [log MtT_xt_k + log Mprev_x0hat_k] - log denom_pred
    and sum_k q_k log Mprev_x0hat_k needs the dense vector Mprev_x0hat — BUT
    q_k is constant (= q_other) on all k not in {x0, xt}, so
        sum_k q_k log Mprev_x0hat_k
          = q_other * sum_k log Mprev_x0hat_k                       (dense reduce)
            + (q_x0 - q_other) * log Mprev_x0hat_{x0}
            + (q_xt - q_other) * log Mprev_x0hat_{xt} * [xt != x0]
    The only dense op left is one K-wide log+reduce of the model distribution
    (fused by XLA into the softmax), with no [B,L,K] one-hot materialisation
    and no K-wide tensors for q.  ~3x less HBM traffic than `kl_term`.
    """
    logits_x0 = logits_x0.astype(jnp.float32)
    B, L, V = logits_x0.shape
    K = float(V)

    beta_t = sched.betas_ext[t][:, None]  # [B,1]
    beta_prev = sched.betas_ext[jnp.maximum(t - 1, 0)][:, None]
    a_t, b_t = 1.0 - beta_t, beta_t / K
    a_p, b_p = 1.0 - beta_prev, beta_prev / K

    same = (xt == x0).astype(jnp.float32)  # [B,L]
    # --- true posterior q: values at k==x0, k==xt, other --------------------
    # unnorm q_k = MtT_xt_k * Mprev_x0_k;  MtT_xt_k = b_t + a_t*[k==xt],
    # Mprev_x0_k = b_p + a_p*[k==x0].
    u_x0 = (b_t + a_t * same) * (b_p + a_p)
    u_xt = (b_t + a_t) * (b_p + a_p * same)
    u_other = b_t * b_p
    denom_true = b_t + a_t * same
    q_x0 = u_x0 / (denom_true + _EPS)
    q_xt = u_xt / (denom_true + _EPS)
    q_other = u_other / (denom_true + _EPS)

    # --- model posterior p pieces ------------------------------------------
    logp_x0hat = jax.nn.log_softmax(logits_x0, axis=-1)  # [B,L,V]
    x0_hat = jnp.exp(logp_x0hat)
    ph_x0 = jnp.take_along_axis(x0_hat, x0[..., None], axis=-1)[..., 0]
    ph_xt = jnp.take_along_axis(x0_hat, xt[..., None], axis=-1)[..., 0]
    denom_pred = b_t + a_t * ph_xt
    log_Mp = jnp.log(a_p[..., None] * x0_hat + b_p[..., None] + _EPS)  # [B,L,V]
    sum_log_Mp = jnp.sum(log_Mp, axis=-1)
    log_Mp_x0 = jnp.take_along_axis(log_Mp, x0[..., None], axis=-1)[..., 0]
    log_Mp_xt = jnp.take_along_axis(log_Mp, xt[..., None], axis=-1)[..., 0]

    log_b_t = jnp.log(b_t + _EPS)
    log_atbt = jnp.log(a_t + b_t + _EPS)

    # sum_k q_k log q_k (entropy side), honoring the +eps of the reference.
    def xlogx(x):
        return x * jnp.log(x + _EPS)

    ent = (
        jnp.where(same > 0.5, xlogx(q_x0), xlogx(q_x0) + xlogx(q_xt))
        + (K - 2.0 + same) * xlogx(q_other)
    )

    # cross term sum_k q_k log p_k, log p_k = log MtT_xt_k + log Mprev_x0hat_k - log denom_pred
    cross_mt = q_xt * log_atbt + jnp.where(same > 0.5, 0.0, q_x0 * log_b_t)
    cross_mt = cross_mt + (K - 2.0 + same) * q_other * log_b_t
    cross_mp = (
        q_other * sum_log_Mp
        + (q_x0 - q_other) * log_Mp_x0
        + jnp.where(same > 0.5, 0.0, (q_xt - q_other) * log_Mp_xt)
    )
    q_total = jnp.where(same > 0.5, q_x0, q_x0 + q_xt) + (K - 2.0 + same) * q_other
    cross = cross_mt + cross_mp - q_total * jnp.log(denom_pred + _EPS)

    kl_token = ent - cross
    if x_mask is not None:
        valid = x_mask.astype(jnp.float32)
        kl_per_sample = jnp.sum(kl_token * valid, axis=1) / (jnp.sum(valid, axis=1) + _EPS)
    else:
        kl_per_sample = jnp.mean(kl_token, axis=1)
    return jnp.mean(kl_per_sample)
