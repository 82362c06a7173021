"""FDDM-ASR-TPU: a TPU-native JAX framework for non-autoregressive ASR via
discrete (multinomial) diffusion over token sequences.

This is a ground-up TPU-first rebuild of the capabilities of the FDDM-asr
reference (PyTorch, single-GPU research repo): a frozen WavLM-large acoustic
encoder conditions a denoising transformer decoder f_theta(x_t, t, c) that
predicts clean-token distributions; training minimizes a diffusion KL plus a
periodic Barlow-Twins-style cross-modal feature-decorrelation loss (L_fd);
inference runs jumpy sampling compiled to a single `jax.lax.scan`.

Layer map (bottom-up):
  - `fddm_asr_tpu.diffusion`   discrete-diffusion schedule + posteriors (pure fns)
  - `fddm_asr_tpu.models`      Flax modules: WavLM encoder, denoising decoder,
                               projection heads
  - `fddm_asr_tpu.losses`      diffusion KL + L_fd
  - `fddm_asr_tpu.sampler`     jumpy sampler as one lax.scan
  - `fddm_asr_tpu.ops`         Pallas kernels (flash attention) + audio DSP
  - `fddm_asr_tpu.parallel`    mesh construction + sharding rules (dp/tp)
  - `fddm_asr_tpu.data`        host data pipeline: wav IO, manifests, batching
  - `fddm_asr_tpu.tokenizer`   SentencePiece-compatible BPE codec + trainer
  - `fddm_asr_tpu.train_lib`   jitted train step + training loop
  - `fddm_asr_tpu.eval`        CER/WER + sampling-based evaluation
  - `fddm_asr_tpu.checkpoint`  orbax-native + torch-.pt interop
"""

__version__ = "0.1.0"

# Samples covered by the conv front-end's FIRST output frame (kernel 10
# stride 5, then six stride-2 stages — models/wavlm.py
# feat_extract_output_length): inputs shorter than this produce ZERO encoder
# frames, whose all-masked attention rows would reach the decoder.  Every
# serving/inference surface clamps per-row lengths to this floor (serve.py,
# inference.py, fddm_asr_tpu/aot.py).  Lives here (import-light) so serve.py
# can import it without pulling jax/flax at module import time.
CONV_RECEPTIVE_FIELD = 400
