# -*- coding: utf-8 -*-
"""Fused conv+LN+GELU kernel: XLA-reference parity (pallas interpret mode on
CPU) across all wavlm extractor geometries, plus flax-layer equivalence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fddm_asr_tpu.ops.conv_frontend import (
    conv_ln_gelu,
    conv_ln_gelu_pallas,
    conv_ln_gelu_xla,
)


@pytest.mark.parametrize(
    "k,s,cin,cout,T",
    [
        (10, 5, 1, 64, 5120),   # waveform layer (reframed to k=2,s=1 frames)
        (3, 2, 32, 64, 1027),   # mid layers
        (2, 2, 32, 64, 1026),   # tail layers
    ],
)
def test_pallas_matches_xla(k, s, cin, cout, T, rng):
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (cout,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)

    ref = conv_ln_gelu_xla(x, w, b, scale, bias, s)
    got = conv_ln_gelu(x, w, b, scale, bias, s, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_gelu_tanh_variant_matches_xla(rng):
    """gelu_tanh=True (WavLMConfig.gelu_approx_tanh under fused_frontend)
    flows through BOTH the fused kernel and the XLA path.  Regression: the
    fused branch used to silently drop the flag and compute exact-erf."""
    k, s, cin, cout, T = 3, 2, 32, 64, 515
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (cout,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)

    ref_tanh = conv_ln_gelu_xla(x, w, b, scale, bias, s, gelu_tanh=True)
    ref_erf = conv_ln_gelu_xla(x, w, b, scale, bias, s, gelu_tanh=False)
    assert float(jnp.max(jnp.abs(ref_tanh - ref_erf))) > 1e-6  # distinct fns
    got = conv_ln_gelu(x, w, b, scale, bias, s, interpret=True, gelu_tanh=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_tanh),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("gelu_tanh", [False, True])
def test_matches_flax_conv_layer(rng, gelu_tanh):
    """XLA reference == the flax ConvLayer ('layer' norm) it replaces,
    for both GELU variants."""
    from fddm_asr_tpu.models.wavlm import ConvLayer

    k, s, cin, cout, T = 3, 2, 16, 32, 500
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
    layer = ConvLayer(cout, k, s, True, "layer", 1e-5, gelu_tanh=gelu_tanh)
    params = layer.init(jax.random.key(0), x)
    ref = layer.apply(params, x)
    p = params["params"]
    got = conv_ln_gelu_xla(
        x, p["conv"]["kernel"], p["conv"]["bias"],
        p["layer_norm"]["scale"], p["layer_norm"]["bias"], s,
        gelu_tanh=gelu_tanh,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
