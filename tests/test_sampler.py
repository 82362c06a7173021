# -*- coding: utf-8 -*-
"""Jumpy-sampler tests: schedule construction, jit/scan execution, and
trajectory parity against the reference torch sampler (greedy exact mode,
identical initial x_T and converted decoder weights)."""
import dataclasses
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, has_reference

from fddm_asr_tpu import diffusion as D
from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder
from fddm_asr_tpu.convert.torch_ckpt import decoder_params_from_state_dict
from fddm_asr_tpu.sampler import (
    DiffusionJumpySampler,
    SamplerConfig,
    build_jump_schedule,
    make_sample_fn,
)

V, Dm, H, LAYERS, FF = 64, 32, 4, 2, 64
B, L, S = 2, 12, 9
T_TRAIN = 50


def test_jump_schedule():
    ts, ds = build_jump_schedule(20, 5)
    assert ts.tolist() == [20, 15, 10, 5] and ds.tolist() == [5, 5, 5, 5]
    ts, ds = build_jump_schedule(20, 3)
    assert ts.tolist() == [20, 17, 14, 11, 8, 5, 2] and ds.tolist() == [3] * 6 + [2]
    ts, ds = build_jump_schedule(1, 5)
    assert ts.tolist() == [1] and ds.tolist() == [1]


def _dummy_decoder_apply(params, xt, t, cond, c_mask):
    del params
    # logits favoring (token index == position mod V), plus a t-dependent shift
    Lx = xt.shape[1]
    base = jax.nn.one_hot(jnp.arange(Lx) % V, V) * 5.0
    return jnp.broadcast_to(base, (xt.shape[0], Lx, V)) + 0.001 * t[:, None, None]


@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_sampler_runs_and_converges(mode):
    sched = D.make_schedule(V, T_TRAIN, 0.2)
    cfg = SamplerConfig(K=V, T_train=T_TRAIN, T_infer=10, r=3, greedy=True, sampling_mode=mode)
    fn = jax.jit(make_sample_fn(_dummy_decoder_apply, sched, cfg), static_argnames="seq_len")
    cond = jnp.zeros((B, S, Dm))
    x0, p = fn(None, jax.random.key(0), cond, seq_len=L)
    assert x0.shape == (B, L) and p.shape == (B, L, V)
    # the dummy decoder pins x0hat to position-mod-V tokens
    np.testing.assert_array_equal(np.asarray(x0[0]), np.arange(L) % V)


def test_sampler_stochastic_path_runs():
    sched = D.make_schedule(V, T_TRAIN, 0.2)
    cfg = SamplerConfig(
        K=V, T_train=T_TRAIN, T_infer=6, r=2, greedy=False, temperature=0.8,
        sampling_mode="fast",
    )
    fn = jax.jit(make_sample_fn(_dummy_decoder_apply, sched, cfg), static_argnames="seq_len")
    x0, _ = fn(None, jax.random.key(1), jnp.zeros((B, S, Dm)), seq_len=L)
    assert x0.shape == (B, L)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("T_infer,r", [(8, 3), (10, 5), (20, 7)])
def test_fast_alpha_bar_table_matches_reference(T_infer, r):
    """Quirk #5 pin: ref_compat fast-mode alpha_bar values equal the SHIPPED
    reference helper `_alpha_bar_at_t_train` at every jump target.

    The reference sampler was written for a 1-based [T+1] table ("index=0
    保留", jumpy_sampler.py:130-132) but its scheduler ships a 0-indexed
    [T] buffer, so `alpha_bar[t_train_idx]` returns abar_{t_train+1} — one
    step less noise than intended.  Greedy sampling is argmax-invariant to
    the mix, so only this direct table comparison can catch a drift.
    ref_compat=False must give the intended (self-consistent) abar_{t_train}.
    """
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from sampler.jumpy_sampler import DiffusionJumpySampler as RefSampler
    from fddm.sched.diffusion_scheduler import DiscreteDiffusionScheduler

    from fddm_asr_tpu.sampler import _fast_alpha_bar_targets

    ref_sched = DiscreteDiffusionScheduler(
        K=V, T=T_TRAIN, device=torch.device("cpu"), beta_max=0.2)
    ref_sampler = RefSampler(
        scheduler=ref_sched, decoder=torch.nn.Identity(), K=V,
        T_train=T_TRAIN, T_infer=T_infer, r=r, device=torch.device("cpu"))

    sched = D.make_schedule(V, T_TRAIN, 0.2)
    ts, deltas = build_jump_schedule(T_infer, r)
    cfg = SamplerConfig(K=V, T_train=T_TRAIN, T_infer=T_infer, r=r,
                        sampling_mode="fast", ref_compat=True)
    ours = _fast_alpha_bar_targets(sched, cfg, ts, deltas)
    for (t, d, got) in zip(ts.tolist(), deltas.tolist(), ours.tolist()):
        want = float(ref_sampler._alpha_bar_at_t_train(t - d))
        np.testing.assert_allclose(got, want, rtol=1e-6,
                                   err_msg=f"jump target {t - d}")

    # corrected mode: the intended 1-based lookup abar_{t_train}
    cfg_fix = dataclasses.replace(cfg, ref_compat=False)
    fixed = _fast_alpha_bar_targets(sched, cfg_fix, ts, deltas)
    table = np.asarray(sched.alpha_bar_ext)
    for (t, d, got) in zip(ts.tolist(), deltas.tolist(), fixed.tolist()):
        target = t - d
        if target <= 0:
            assert got == 1.0
            continue
        t_train = round(max(1.0, min(float(T_TRAIN),
                                     target / T_infer * T_TRAIN)))
        np.testing.assert_allclose(got, float(table[int(t_train)]), rtol=1e-6)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_trajectory_parity_vs_reference(mode, rng):
    """Greedy deterministic trajectory: same weights, same x_T -> same tokens."""
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from models.denoise_decoder import DenoisingTransformerDecoder as RefDecoder
    from sampler.jumpy_sampler import DiffusionJumpySampler as RefSampler
    from fddm.sched.diffusion_scheduler import DiscreteDiffusionScheduler

    torch.manual_seed(3)
    ref_dec = RefDecoder(
        vocab_size=V, d_model=Dm, nhead=H, num_layers=LAYERS, dim_ff=FF,
        dropout=0.0, max_len=64, pad_id=0,
    )
    ref_dec.eval()
    ref_sched = DiscreteDiffusionScheduler(
        K=V, T=T_TRAIN, device=torch.device("cpu"), beta_max=0.2
    )
    ref_sampler = RefSampler(
        scheduler=ref_sched, decoder=ref_dec, K=V, T_train=T_TRAIN,
        T_infer=8, r=3, greedy=True, posterior_mode="average",
        sampling_mode=mode, temperature=1.0, device=torch.device("cpu"),
    )

    cond = rng.standard_normal((B, S, Dm)).astype(np.float32)
    x_init = rng.integers(0, V, (B, L)).astype(np.int64)

    # reference: monkeypatch torch.randint used for init so both start equal
    orig_randint = torch.randint
    torch.randint = lambda *a, **k: torch.tensor(x_init)
    try:
        with torch.no_grad():
            ref_x0, ref_p = ref_sampler.sample(torch.tensor(cond), seq_len=L)
    finally:
        torch.randint = orig_randint

    model = DenoisingTransformerDecoder(
        vocab_size=V, d_model=Dm, nhead=H, num_layers=LAYERS, dim_ff=FF,
        dropout=0.0, max_len=64, pad_id=0,
    )
    params = {"params": decoder_params_from_state_dict(ref_dec.state_dict())}

    def decoder_apply(p, xt, t, c, c_mask):
        return model.apply(p, xt, t, c, None, c_mask, deterministic=True)

    sched = D.make_schedule(V, T_TRAIN, 0.2)
    cfg = SamplerConfig(
        K=V, T_train=T_TRAIN, T_infer=8, r=3, greedy=True,
        posterior_mode="average", sampling_mode=mode,
    )
    fn = jax.jit(make_sample_fn(decoder_apply, sched, cfg), static_argnames="seq_len")
    x0, p = fn(params, jax.random.key(0), jnp.asarray(cond), seq_len=L,
               x_init=jnp.asarray(x_init))

    match = (np.asarray(x0) == ref_x0.numpy()).mean()
    assert match == 1.0, f"token match rate {match}"
    np.testing.assert_allclose(np.asarray(p), ref_p.numpy(), atol=5e-4)


def test_wrapper_api():
    sched = D.make_schedule(V, T_TRAIN, 0.2)
    s = DiffusionJumpySampler(
        sched, _dummy_decoder_apply, K=V, T_train=T_TRAIN, T_infer=4, r=2,
        decoder_params={},
    )
    x0, p = s.sample(jnp.zeros((1, S, Dm)), seq_len=L)
    assert x0.shape == (1, L)
    info = s.get_sampling_info()
    assert info["T_infer"] == 4 and info["K"] == V


# ---------------------------------------------------------------- repeat penalty
def test_argmax_repeat_penalized_exact_values():
    from fddm_asr_tpu.sampler import argmax_repeat_penalized

    K = 8
    # pos0: token 5 (strong).  pos1: 5 vs 7 within the penalty margin ->
    # penalty flips it to 7.  pos2: a genuine repeat of 7 with a LARGE
    # margin survives the penalty.  pos3: 7 vs 2 within margin -> flips
    # (the penalty chains off the DECODED prefix, not the raw argmax).
    p = np.full((1, 4, K), 1e-6, np.float32)
    p[0, 0, 5] = 0.9
    p[0, 1, 5], p[0, 1, 7] = 0.50, 0.45
    p[0, 2, 7], p[0, 2, 1] = 0.90, 0.05
    p[0, 3, 7], p[0, 3, 2] = 0.50, 0.45
    out = np.asarray(argmax_repeat_penalized(jnp.asarray(p), 0.5))
    np.testing.assert_array_equal(out[0], [5, 7, 7, 2])
    # penalty=0 must reduce to the plain argmax (parity read-out)
    out0 = np.asarray(argmax_repeat_penalized(jnp.asarray(p), 0.0))
    np.testing.assert_array_equal(out0[0], np.argmax(p[0], -1))


def test_sampler_repeat_penalty_changes_decode():
    # a decoder pinning every position to one token: plain argmax emits a
    # constant run; the penalized read-out must break it at every other
    # position (the feature must CHANGE the output, not just not-crash)
    def rep_decoder(params, xt, t, cond, c_mask):
        del params
        logits = jnp.full((xt.shape[0], xt.shape[1], V), -4.0)
        logits = logits.at[..., 3].set(2.0)   # dominant everywhere
        logits = logits.at[..., 9].set(1.9)   # runner-up within margin
        return logits

    sched = D.make_schedule(V, T_TRAIN, 0.2)
    base = SamplerConfig(K=V, T_train=T_TRAIN, T_infer=6, r=2, greedy=True)
    pen = dataclasses.replace(base, repeat_penalty=0.5)
    cond = jnp.zeros((B, S, Dm))
    fn0 = jax.jit(make_sample_fn(rep_decoder, sched, base), static_argnames="seq_len")
    fn1 = jax.jit(make_sample_fn(rep_decoder, sched, pen), static_argnames="seq_len")
    x_plain, _ = fn0(None, jax.random.key(0), cond, seq_len=L)
    x_pen, _ = fn1(None, jax.random.key(0), cond, seq_len=L)
    np.testing.assert_array_equal(np.asarray(x_plain[0]), np.full(L, 3))
    expect = np.where(np.arange(L) % 2 == 0, 3, 9)
    np.testing.assert_array_equal(np.asarray(x_pen[0]), expect)


def test_pipeline_repeat_penalty_plumbing(tmp_path):
    # the knob must reach the compiled sampler through the pipeline cache
    # key: same pipeline, same rng, penalty on/off -> different programs
    from fddm_asr_tpu.sampler import argmax_repeat_penalized  # noqa: F401

    from fddm_asr_tpu.config import Config
    from fddm_asr_tpu.pipeline import FDDMPipeline

    class _Tok:
        def encode(self, text):
            return [4]

        def decode(self, ids):
            return ""

    cfg = Config({
        "seed": 0,
        "data": {"vocab_size": V, "pad_id": 0, "eos_id": 2, "max_len": L,
                 "sample_rate": 16000, "max_seconds": 1.0},
        "model": {"d_model": 16, "nhead": 2, "num_layers": 1, "dim_ff": 32,
                  "dropout": 0.0,
                  "encoder": {"wavlm_name": "tiny", "freeze": True,
                              "proj": "linear", "pooling": "none"},
                  "projector": {"d_proj": 8}},
        "diffusion": {"T": T_TRAIN, "beta_max": 0.2},
        "inference": {"T_infer": 4, "r": 2, "greedy": True},
    })
    pipe = FDDMPipeline.from_config(cfg, tokenizer=_Tok(), seed=0)
    rng = jax.random.key(0)
    cond = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 16)),
                       jnp.float32)
    ids0, _ = pipe.sample(rng, cond, seq_len=L, T_infer=4, r=2)
    ids1, _ = pipe.sample(rng, cond, seq_len=L, T_infer=4, r=2,
                          repeat_penalty=0.25)
    assert ids0.shape == ids1.shape == (1, L)
    assert len(pipe._samplers) == 2  # distinct compiled programs
