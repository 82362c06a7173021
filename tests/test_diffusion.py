# -*- coding: utf-8 -*-
"""Unit + parity tests for the discrete-diffusion core.

Parity tests run the reference PyTorch scheduler (imported from
/root/reference, never copied) on identical inputs and assert agreement.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fddm_asr_tpu import diffusion as D

from conftest import REFERENCE_ROOT, has_reference

K, T, BETA_MAX = 128, 50, 0.2


@pytest.fixture(scope="module")
def sched():
    return D.make_schedule(K=K, T=T, beta_max=BETA_MAX)


def _rand_probs(rng, B, L, K):
    p = rng.random((B, L, K)).astype(np.float32) ** 4
    return p / p.sum(-1, keepdims=True)


def _onehot(rng, B, L, K):
    idx = rng.integers(0, K, (B, L))
    out = np.zeros((B, L, K), np.float32)
    np.put_along_axis(out, idx[..., None], 1.0, axis=-1)
    return out, idx


# ---------------------------------------------------------------- unit tests
def test_schedule_tables(sched):
    betas = np.asarray(sched.betas)
    ab = np.asarray(sched.alpha_bar)
    t = np.arange(1, T + 1, dtype=np.float32)
    np.testing.assert_allclose(betas, BETA_MAX * np.sin(0.5 * np.pi * t / T) ** 2, rtol=1e-6)
    np.testing.assert_allclose(ab, np.cumprod(1 - betas), rtol=1e-6)
    assert float(sched.alpha_bar_ext[0]) == 1.0
    assert float(sched.betas_ext[0]) == 0.0


def test_q_sample_rows_normalise(sched, rng):
    x0, _ = _onehot(rng, 2, 6, K)
    t = jnp.asarray(rng.integers(1, T + 1, (2,)))
    xt = D.q_sample(sched, jnp.asarray(x0), t)
    np.testing.assert_allclose(np.asarray(xt).sum(-1), 1.0, atol=1e-5)


def test_q_posterior_rows_normalise(sched, rng):
    x0, _ = _onehot(rng, 2, 6, K)
    t = jnp.asarray(rng.integers(1, T + 1, (2,)))
    xt = D.q_sample(sched, jnp.asarray(x0), t)
    x0hat = _rand_probs(rng, 2, 6, K)
    post = D.q_posterior(sched, xt, jnp.asarray(x0hat), t)
    np.testing.assert_allclose(np.asarray(post).sum(-1), 1.0, atol=1e-5)


def test_multi_step_coeffs_match_bruteforce(sched):
    """Exact-math closed form a_cum/b_cum == brute-force K x K matrix product."""
    betas = np.asarray(sched.betas)
    for (t, delta) in [(1, 1), (5, 3), (T, T), (T, 5), (10, 10)]:
        M = np.eye(K)
        for step in range(t, t - delta, -1):
            a_s, b_s = 1 - betas[step - 1], betas[step - 1] / K
            M_s = a_s * np.eye(K) + b_s * np.ones((K, K))
            M = M_s @ M
        a_c, b_c, _, _ = D.multi_step_coeffs(sched, jnp.asarray([t]), delta, ref_compat=False)
        M_closed = float(a_c[0]) * np.eye(K) + float(b_c[0]) * np.ones((K, K))
        np.testing.assert_allclose(M, M_closed, atol=1e-5)


def test_multi_step_coeffs_ref_compat_matches_aliased_recurrence(sched):
    """ref_compat=True reproduces the reference's tensor-aliasing recurrence
    (b-update reads the already-updated a; reference lines 160-164)."""
    betas = np.asarray(sched.betas)
    for (t, delta) in [(1, 1), (5, 3), (T, T), (T, 5), (25, 3), (T, 1)]:
        a, b = 1.0, 0.0
        for step in range(t, t - delta, -1):
            a_s, b_s = 1 - float(betas[step - 1]), float(betas[step - 1]) / K
            a = a_s * a            # update a first ...
            b = a_s * b + b_s * (a + K * b)  # ... then b reads the NEW a
        a_c, b_c, _, _ = D.multi_step_coeffs(sched, jnp.asarray([t]), delta, ref_compat=True)
        np.testing.assert_allclose(float(a_c[0]), a, rtol=1e-5)
        np.testing.assert_allclose(float(b_c[0]), b, rtol=1e-4)


def test_multi_step_delta1_equals_single_step(sched, rng):
    x0, _ = _onehot(rng, 3, 5, K)
    t = jnp.asarray(rng.integers(2, T + 1, (3,)))
    xt = D.q_sample(sched, jnp.asarray(x0), t)
    x0hat = jnp.asarray(_rand_probs(rng, 3, 5, K))
    # Note: only the exact-math mode collapses to the single-step posterior at
    # delta=1; the reference's own multi_step(delta=1) differs from its
    # q_posterior by the aliasing bug (b_s*a_s vs b_s).
    p1 = D.q_posterior(sched, xt, x0hat, t)
    pm = D.q_posterior_multi_step(sched, xt, x0hat, t, 1, ref_compat=False)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(pm), atol=1e-5)


def test_sample_xt_tokens_marginals(sched):
    """Empirical keep-rate of the O(BL) token corruption matches
    p_keep = alpha_bar_t + (1-alpha_bar_t)/K."""
    B, L = 64, 256
    x0 = jnp.zeros((B, L), jnp.int32) + 7
    t = jnp.full((B,), 10, jnp.int32)
    xt = D.sample_xt_tokens(sched, jax.random.key(0), x0, t)
    ab = float(sched.alpha_bar_ext[10])
    p_keep = ab + (1 - ab) / K
    got = float((np.asarray(xt) == 7).mean())
    assert abs(got - p_keep) < 0.01


def test_sample_xt_tokens_exact_small_vocab():
    """K=2 pins the decomposition exactly: at full corruption (alpha_bar≈0)
    P(x_t = x0) must be 1/2 + ab/2 ≈ 1/2 — the double-counting bug (keep
    with prob ab+(1-ab)/K AND resample over all K) gives ≈ 3/4 here, far
    outside the tolerance that the K=128 marginals test cannot resolve."""
    sched2 = D.make_schedule(T=20, beta_max=0.999, K=2)
    n = 200_000
    x0 = jnp.zeros((1, n), jnp.int32)
    t = jnp.full((1,), 20, jnp.int32)
    ab = float(sched2.alpha_bar_ext[20])
    assert ab < 0.05  # the schedule really is near-fully corrupting
    xt = D.sample_xt_tokens(sched2, jax.random.key(3), x0, t)
    want = ab + (1 - ab) / 2
    got = float((np.asarray(xt) == 0).mean())
    assert abs(got - want) < 0.005, (got, want)
    # and every t agrees with the q_sample row's own x0 mass (K=5)
    sched5 = D.make_schedule(T=20, beta_max=0.6, K=5)
    x0 = jnp.zeros((1, n), jnp.int32)
    for tt in (1, 10, 20):
        t = jnp.full((1,), tt, jnp.int32)
        ab = float(sched5.alpha_bar_ext[tt])
        xt = D.sample_xt_tokens(sched5, jax.random.key(100 + tt), x0, t)
        want = ab + (1 - ab) / 5
        got = float((np.asarray(xt) == 0).mean())
        assert abs(got - want) < 0.005, (tt, got, want)


def test_kl_zero_when_model_predicts_truth(sched, rng):
    B, L = 2, 8
    x0 = jnp.asarray(rng.integers(0, K, (B, L)))
    t = jnp.asarray(rng.integers(1, T + 1, (B,)))
    xt = D.sample_xt_tokens(sched, jax.random.key(1), x0, t)
    logits = jax.nn.one_hot(x0, K) * 50.0  # near-delta on the truth
    loss = D.kl_term(sched, xt, x0, logits, t)
    assert float(loss) < 1e-3


def test_kl_sparse_matches_dense(sched, rng):
    B, L = 4, 16
    x0 = jnp.asarray(rng.integers(0, K, (B, L)))
    t = jnp.asarray(rng.integers(1, T + 1, (B,)))
    xt = D.sample_xt_tokens(sched, jax.random.key(2), x0, t)
    logits = jnp.asarray(rng.standard_normal((B, L, K)).astype(np.float32) * 3)
    mask = jnp.asarray(rng.random((B, L)) > 0.2)
    dense = float(D.kl_term(sched, xt, x0, logits, t, mask))
    sparse = float(D.kl_term_sparse(sched, xt, x0, logits, t, mask))
    assert abs(dense - sparse) < 5e-4 * max(1.0, abs(dense))


# ------------------------------------------------------------- parity tests
@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
class TestTorchParity:
    @pytest.fixture(scope="class")
    def ref_sched(self):
        import torch

        sys.path.insert(0, REFERENCE_ROOT)
        from fddm.sched.diffusion_scheduler import DiscreteDiffusionScheduler

        return DiscreteDiffusionScheduler(K=K, T=T, device=torch.device("cpu"), beta_max=BETA_MAX)

    def test_tables(self, sched, ref_sched):
        np.testing.assert_allclose(
            np.asarray(sched.betas), ref_sched.betas.numpy(), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sched.alpha_bar), ref_sched.alpha_bar.numpy(), rtol=1e-6
        )

    def test_q_sample(self, sched, ref_sched, rng):
        import torch

        x0 = _rand_probs(rng, 3, 7, K)
        t = rng.integers(1, T + 1, (3,))
        ours = D.q_sample(sched, jnp.asarray(x0), jnp.asarray(t))
        theirs = ref_sched.q_sample(torch.tensor(x0), torch.tensor(t))
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)

    def test_q_posterior(self, sched, ref_sched, rng):
        import torch

        xt = _rand_probs(rng, 3, 7, K)
        x0hat = _rand_probs(rng, 3, 7, K)
        for tval in [1, 2, T // 2, T]:
            t = np.full((3,), tval)
            ours = D.q_posterior(sched, jnp.asarray(xt), jnp.asarray(x0hat), jnp.asarray(t))
            theirs = ref_sched.q_posterior(torch.tensor(xt), torch.tensor(x0hat), torch.tensor(t))
            np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)

    def test_q_posterior_multi_step(self, sched, ref_sched, rng):
        import torch

        xt = _rand_probs(rng, 3, 7, K)
        x0hat = _rand_probs(rng, 3, 7, K)
        for (tval, delta) in [(5, 5), (T, 5), (T // 2, 3), (7, 1)]:
            t = np.full((3,), tval)
            ours = D.q_posterior_multi_step(
                sched, jnp.asarray(xt), jnp.asarray(x0hat), jnp.asarray(t), delta
            )
            theirs = ref_sched.q_posterior_multi_step(
                torch.tensor(xt), torch.tensor(x0hat), torch.tensor(t), delta
            )
            np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)

    def test_kl_term_vs_reference_adapter(self, sched, ref_sched, rng):
        """Parity with train.py's SchedulerAdapter.kl_term."""
        import importlib.util

        import torch

        # our repo has its own top-level train.py; load the reference's by
        # path under a distinct module name to avoid sys.modules collisions
        spec = importlib.util.spec_from_file_location(
            "_reference_train", os.path.join(REFERENCE_ROOT, "train.py")
        )
        ref_train = importlib.util.module_from_spec(spec)
        sys.modules["_reference_train"] = ref_train  # dataclasses need this
        sys.path.insert(0, REFERENCE_ROOT)
        spec.loader.exec_module(ref_train)
        adapter = ref_train.SchedulerAdapter(ref_sched)
        B, L = 4, 9
        x0 = rng.integers(0, K, (B, L))
        xt = rng.integers(0, K, (B, L))
        logits = rng.standard_normal((B, L, K)).astype(np.float32)
        t = rng.integers(1, T + 1, (B,))
        mask = rng.random((B, L)) > 0.3
        theirs = adapter.kl_term(
            torch.tensor(xt), torch.tensor(x0), torch.tensor(logits), torch.tensor(t),
            torch.tensor(mask),
        )
        ours = D.kl_term(
            sched, jnp.asarray(xt), jnp.asarray(x0), jnp.asarray(logits), jnp.asarray(t),
            jnp.asarray(mask),
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=2e-4)


def test_posteriors_match_explicit_transition_matrices():
    """First-principles pin via explicit K x K uniform-mixture matrices
    M_t = a_t I + b_t 11^T, independent of the torch reference.

    The implemented posterior family is the REFERENCE's (design quirk,
    reproduced on purpose):
        q(x_{t-d} | x_t, x0hat)  propto  (Mprod^T x_t) . (M_{t-d} x0hat)
    where the prior term applies the SINGLE transition M_{t-d} to x0hat —
    NOT the canonical D3PM prior Mbar_{t-d} (the cumulative product from
    x0).  This test pins both: the implemented formula matches the
    explicit-matrix computation exactly, and the canonical-prior variant
    demonstrably differs (so a future "fix" can't silently change
    semantics without touching this test)."""
    Ks, Ts = 4, 6
    s = D.make_schedule(K=Ks, T=Ts, beta_max=0.5)
    betas = np.asarray(s.betas_ext)      # [T+1], index 0 = 0.0 (M_0 = I)
    Ms = [np.eye(Ks)]
    for t in range(1, Ts + 1):
        a, b = 1.0 - betas[t], betas[t] / Ks
        Ms.append(a * np.eye(Ks) + b * np.ones((Ks, Ks)))
    Mbar = [np.eye(Ks)]
    for t in range(1, Ts + 1):
        Mbar.append(Ms[t] @ Mbar[t - 1])

    def explicit(xt, x0, t, delta, canonical=False):
        Mprod = np.eye(Ks)
        for s_ in range(t - delta + 1, t + 1):
            Mprod = Ms[s_] @ Mprod  # x_{t-delta} -> x_t
        like = Mprod.T[xt]          # P(x_t=xt | x_{t-delta}=j)  (symmetric)
        prior = (Mbar if canonical else Ms)[t - delta][:, x0]
        post = like * prior
        return post / post.sum()

    for t in range(2, Ts + 1):
        for delta in range(1, t):
            for xt_id, x0_id in [(0, 0), (1, 3), (2, 1)]:
                xt = jax.nn.one_hot(jnp.full((1, 1), xt_id), Ks)
                x0 = jax.nn.one_hot(jnp.full((1, 1), x0_id), Ks)
                tb = jnp.full((1,), t, jnp.int32)
                if delta == 1:
                    got = D.q_posterior(s, xt, x0, tb)
                    np.testing.assert_allclose(
                        np.asarray(got)[0, 0],
                        explicit(xt_id, x0_id, t, 1),
                        atol=1e-5, err_msg=f"single t={t}")
                got = D.q_posterior_multi_step(s, xt, x0, tb, delta,
                                               ref_compat=False)
                np.testing.assert_allclose(
                    np.asarray(got)[0, 0],
                    explicit(xt_id, x0_id, t, delta),
                    atol=1e-5, err_msg=f"multi t={t} delta={delta}")
    # the canonical-prior variant is a DIFFERENT distribution (t=3, d=1:
    # Mbar_2 vs M_2 priors) — guard against silently conflating the two
    assert not np.allclose(explicit(0, 0, 3, 1),
                           explicit(0, 0, 3, 1, canonical=True), atol=1e-4)
