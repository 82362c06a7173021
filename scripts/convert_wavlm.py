#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Convert pretrained WavLM weights (HuggingFace) to the framework's orbax
format for fast loading on TPU hosts.

    python scripts/convert_wavlm.py --src microsoft/wavlm-large \
        --out ckpts/wavlm_large.orbax

`--src` may be a HF hub id (requires network) or a local directory containing
config.json + pytorch_model.bin/model.safetensors.  The output directory is
accepted by `train.py --wavlm-ckpt` and `inference.py --wavlm-ckpt`.

Optionally `--verify` runs a layer-output comparison between the source torch
model and the converted Flax model on random audio.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--scan-layers", action="store_true", default=True)
    ap.add_argument("--no-scan-layers", dest="scan_layers", action="store_false")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from transformers import WavLMModel as HFWavLMModel

    from fddm_asr_tpu.checkpoint import save_orbax
    from fddm_asr_tpu.convert.wavlm_convert import wavlm_params_from_state_dict
    from fddm_asr_tpu.models.wavlm import WavLMConfig

    print(f"loading {args.src} ...")
    hf = HFWavLMModel.from_pretrained(args.src)
    config = dataclasses.replace(
        WavLMConfig.from_hf(hf.config), scan_layers=args.scan_layers
    )
    params = wavlm_params_from_state_dict(hf.state_dict(), config)

    if args.verify:
        import numpy as np
        import jax.numpy as jnp
        import torch

        from fddm_asr_tpu.models.wavlm import WavLMModel

        wav = np.random.default_rng(0).standard_normal((1, 16000)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.tensor(wav)).last_hidden_state.numpy()
        ours = np.asarray(
            WavLMModel(config).apply({"params": params}, jnp.asarray(wav))
        )
        err = float(np.abs(ours - ref).max())
        print(f"verification max abs err: {err:.2e}")
        assert err < 5e-3, "conversion mismatch"

    save_orbax(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
