# -*- coding: utf-8 -*-
"""Numerical parity: Flax denoising decoder vs the reference torch decoder.

Random-initialised reference module -> weight conversion -> identical inputs
-> logits must agree to float32 tolerance.
"""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import REFERENCE_ROOT, has_reference

from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder
from fddm_asr_tpu.convert.torch_ckpt import (
    decoder_params_from_state_dict,
    decoder_state_dict_from_params,
)

V, D, H, LAYERS, FF = 50, 32, 4, 2, 64
B, L, S = 2, 10, 13

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def _make_ref_decoder(pos_emb_type="rope", use_film=True):
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from models.denoise_decoder import DenoisingTransformerDecoder as RefDecoder

    torch.manual_seed(0)
    dec = RefDecoder(
        vocab_size=V, d_model=D, nhead=H, num_layers=LAYERS, dim_ff=FF,
        dropout=0.1, max_len=64, pad_id=0, pos_emb_type=pos_emb_type,
        use_film=use_film,
    )
    dec.eval()
    return dec


def _inputs(rng):
    xt = rng.integers(1, V, (B, L))
    xt[0, -2:] = 0  # pad tail to exercise the auto x_mask path
    t = rng.integers(1, 200, (B,))
    cond = rng.standard_normal((B, S, D)).astype(np.float32)
    c_mask = np.ones((B, S), bool)
    c_mask[1, -4:] = False
    return xt, t, cond, c_mask


@pytest.mark.parametrize("pos_emb_type", ["rope", "sinusoidal", "learned"])
@pytest.mark.parametrize("use_film", [True, False])
def test_logits_parity(pos_emb_type, use_film, rng):
    import torch

    ref = _make_ref_decoder(pos_emb_type, use_film)
    params = {"params": decoder_params_from_state_dict(
        ref.state_dict(), pos_emb_type=pos_emb_type, use_film=use_film
    )}
    model = DenoisingTransformerDecoder(
        vocab_size=V, d_model=D, nhead=H, num_layers=LAYERS, dim_ff=FF,
        dropout=0.1, max_len=64, pad_id=0, pos_emb_type=pos_emb_type,
        use_film=use_film,
    )
    xt, t, cond, c_mask = _inputs(rng)
    with torch.no_grad():
        ref_logits = ref(
            torch.tensor(xt), torch.tensor(t), torch.tensor(cond),
            x_mask=None, c_mask=torch.tensor(c_mask),
        ).numpy()
    ours = np.asarray(
        model.apply(
            params, jnp.asarray(xt), jnp.asarray(t), jnp.asarray(cond),
            None, jnp.asarray(c_mask), deterministic=True,
        )
    )
    np.testing.assert_allclose(ours, ref_logits, atol=2e-4, rtol=1e-3)


def test_scan_blocks_parity(rng):
    """scan_blocks=True (one lax.scan body, stacked params) == unrolled logits."""
    ref = _make_ref_decoder()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    xt, t, cond, c_mask = _inputs(rng)
    args = (jnp.asarray(xt), jnp.asarray(t), jnp.asarray(cond),
            None, jnp.asarray(c_mask))
    out = {}
    for scan in (False, True):
        params = {"params": decoder_params_from_state_dict(sd, scan_blocks=scan)}
        model = DenoisingTransformerDecoder(
            vocab_size=V, d_model=D, nhead=H, num_layers=LAYERS, dim_ff=FF,
            dropout=0.1, max_len=64, pad_id=0, scan_blocks=scan,
        )
        out[scan] = np.asarray(model.apply(*(params,) + args, deterministic=True))
    np.testing.assert_allclose(out[True], out[False], atol=1e-5, rtol=1e-5)


def test_scan_blocks_state_dict_round_trip():
    """torch sd -> stacked scan params -> torch sd preserves every tensor."""
    ref = _make_ref_decoder()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = decoder_params_from_state_dict(sd, scan_blocks=True)
    assert "blocks_scan" in params and "blocks_0" not in params
    sd2 = decoder_state_dict_from_params(params)
    for k, v in sd.items():
        np.testing.assert_allclose(sd2[k], v, err_msg=k, atol=0)


def test_state_dict_round_trip(rng):
    """flax -> torch-format -> flax preserves every tensor."""
    ref = _make_ref_decoder()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = decoder_params_from_state_dict(sd)
    sd2 = decoder_state_dict_from_params(params)
    for k, v in sd.items():
        np.testing.assert_allclose(sd2[k], v, err_msg=k, atol=0)


def test_export_loads_into_reference(tmp_path, rng):
    """A .pt exported from flax params loads strict=True into the reference."""
    import torch

    ref = _make_ref_decoder()
    params = decoder_params_from_state_dict(ref.state_dict())
    from fddm_asr_tpu.convert.torch_ckpt import save_reference_checkpoint

    path = str(tmp_path / "ckpt.pt")
    save_reference_checkpoint(path, params, epoch=3, step=17)
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 3 and raw["step"] == 17
    missing, unexpected = ref.load_state_dict(raw["decoder"], strict=False)
    assert not missing and not unexpected
