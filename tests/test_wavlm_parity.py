# -*- coding: utf-8 -*-
"""Numerical parity: Flax WavLM vs transformers.WavLMModel (random weights,
tiny config, both stable-LN "large"-style and post-LN "base"-style variants).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from fddm_asr_tpu.models.wavlm import WavLMConfig, WavLMModel
from fddm_asr_tpu.convert.wavlm_convert import wavlm_params_from_state_dict

B, T = 2, 3200  # 0.2 s @ 16 kHz -> 9 frames


def _tiny_hf_config(stable: bool):
    from transformers import WavLMConfig as HFConfig

    return HFConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[16] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_bias=stable,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable,
        num_buckets=32,
        max_bucket_distance=80,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        mask_time_prob=0.0,
        mask_feature_prob=0.0,
        layerdrop=0.0,
    )


@pytest.mark.parametrize("stable", [True, False], ids=["large-style", "base-style"])
@pytest.mark.parametrize("with_mask", [False, True])
def test_wavlm_parity(stable, with_mask, rng):
    import torch
    from transformers import WavLMModel as HFModel

    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config(stable)
    hf = HFModel(hf_cfg)
    hf.eval()

    config = WavLMConfig.from_hf(hf_cfg)
    params = {"params": wavlm_params_from_state_dict(hf.state_dict(), config)}
    model = WavLMModel(config)

    wav = rng.standard_normal((B, T)).astype(np.float32)
    attn = None
    attn_t = None
    if with_mask:
        attn = np.ones((B, T), np.int64)
        attn[1, T // 2 :] = 0
        attn_t = torch.tensor(attn)

    with torch.no_grad():
        ref = hf(torch.tensor(wav), attention_mask=attn_t).last_hidden_state.numpy()
    ours = np.asarray(
        model.apply(
            params, jnp.asarray(wav),
            attention_mask=jnp.asarray(attn.astype(bool)) if attn is not None else None,
            deterministic=True,
        )
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_wavlm_scan_layers_parity(rng):
    """scan_layers=True (stacked lax.scan body) matches the unrolled model."""
    import dataclasses

    import torch
    from transformers import WavLMModel as HFModel

    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config(True)
    hf_cfg.num_hidden_layers = 4
    hf = HFModel(hf_cfg)
    hf.eval()

    wav = rng.standard_normal((B, T)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(wav)).last_hidden_state.numpy()

    for scan in (False, True):
        config = dataclasses.replace(WavLMConfig.from_hf(hf_cfg), scan_layers=scan)
        params = {"params": wavlm_params_from_state_dict(hf.state_dict(), config)}
        if scan:
            stacked = params["params"]["encoder"]["layers_scan"]["layer"]
            assert stacked["attention"]["q_proj"]["kernel"].shape[0] == 3
        ours = np.asarray(
            WavLMModel(config).apply(params, jnp.asarray(wav), deterministic=True)
        )
        np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("stable", [True, False], ids=["large-style", "base-style"])
@pytest.mark.parametrize("with_mask", [False, True])
def test_wavlm_seq_pad_parity(stable, with_mask, rng):
    """seq_pad_multiple>1 (zero frames + key mask) leaves real frames unchanged."""
    import dataclasses

    import torch
    from transformers import WavLMModel as HFModel

    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config(stable)
    hf = HFModel(hf_cfg)
    hf.eval()

    wav = rng.standard_normal((B, T)).astype(np.float32)
    attn = None
    if with_mask:
        attn = np.ones((B, T), bool)
        attn[1, T // 2 :] = False

    out = {}
    for mult in (1, 16):  # 9 frames -> padded to 16
        config = dataclasses.replace(
            WavLMConfig.from_hf(hf_cfg), seq_pad_multiple=mult
        )
        params = {"params": wavlm_params_from_state_dict(hf.state_dict(), config)}
        out[mult] = np.asarray(
            WavLMModel(config).apply(
                params, jnp.asarray(wav),
                attention_mask=jnp.asarray(attn) if attn is not None else None,
                deterministic=True,
            )
        )
    assert out[1].shape == out[16].shape  # pad is sliced off
    np.testing.assert_allclose(out[16], out[1], atol=1e-5, rtol=1e-5)


def test_wavlm_gelu_tanh_close(rng):
    """gelu_approx_tanh=True stays within bf16-noise distance of exact erf —
    and actually changes the numerics (a silent no-op of the flag, shipped
    ON in the flagship bench config, would pass a closeness-only check)."""
    import dataclasses

    import torch
    from transformers import WavLMModel as HFModel

    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config(True)
    hf = HFModel(hf_cfg)
    hf.eval()
    wav = rng.standard_normal((B, T)).astype(np.float32)

    out = {}
    for tanh in (False, True):
        # single variable: only the GELU flavor changes between runs
        config = dataclasses.replace(
            WavLMConfig.from_hf(hf_cfg), gelu_approx_tanh=tanh
        )
        params = {"params": wavlm_params_from_state_dict(hf.state_dict(), config)}
        out[tanh] = np.asarray(
            WavLMModel(config).apply(params, jnp.asarray(wav), deterministic=True)
        )
    assert np.isfinite(out[True]).all()
    np.testing.assert_allclose(out[True], out[False], atol=5e-2, rtol=5e-2)
    assert float(np.max(np.abs(out[True] - out[False]))) > 1e-7, (
        "tanh-GELU output identical to erf: gelu_approx_tanh is a no-op")


def test_feat_extract_output_length():
    cfg = WavLMConfig.tiny_for_tests()
    # hop 320: 0.2 s -> 9 frames (conv formula, not ceil(T/320))
    assert cfg.feat_extract_output_length(3200) == 9
    assert cfg.feat_extract_output_length(320000) == 999
