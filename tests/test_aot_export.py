# -*- coding: utf-8 -*-
"""AOT export artifacts (fddm_asr_tpu/aot.py): serialized StableHLO
transcribe step + params + tokenizer, loadable without model code.

Pins: token-identical transcripts vs the live pipeline at the same padded
batch shape; bucket padding/selection; bf16-safe param round-trip; a FRESH
process loading the artifact without constructing Flax modules; the export
CLI surface.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SAMPLING = dict(T_infer=8, r=4, greedy=True, posterior_mode="map",
                sampling_mode="exact", ref_compat=True)
SEQ_LEN = 12
N = 8000  # 0.5 s at 16 kHz


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("aot_synth"))
    from scripts.make_synth_data import main as make

    make(["--out", out, "--n", "4", "--seconds", "0.5"])
    return out


@pytest.fixture(scope="module")
def pipeline(synth):
    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.pipeline import FDDMPipeline

    cfg = load_config(f"{synth}/config.yaml")
    return FDDMPipeline.from_config(cfg)


@pytest.fixture(scope="module")
def artifact(synth, pipeline):
    from fddm_asr_tpu import aot

    art = os.path.join(synth, "artifact")
    tok = pipeline.cfg.data.get("tokenizer_path")
    aot.save_artifact(pipeline, art, [(2, N)], seq_len=SEQ_LEN,
                      sampling=SAMPLING, tokenizer_path=tok)
    return art


def _wave(rows, samples=N, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((rows, samples)).astype(np.float32)


def test_exported_matches_live_pipeline(pipeline, artifact):
    import jax
    from fddm_asr_tpu import aot

    ep = aot.ExportedPipeline.load(artifact)
    wave = _wave(2)
    got = ep.transcribe_with_ids(wave, seed=7)
    ref = pipeline.transcribe_with_ids(
        wave, seq_len=SEQ_LEN, rng=jax.random.key(np.uint32(7)), **SAMPLING)
    assert [g[1] for g in got] == [r[1] for r in ref]
    assert [g[0] for g in got] == [r[0] for r in ref]
    # different seed must change the trajectory (x_T init is seed-driven) —
    # guards against the seed arg being silently ignored in the export
    other = ep.transcribe_with_ids(wave, seed=8)
    assert [g[1] for g in got] != [o[1] for o in other]


def test_bucket_padding_and_selection(pipeline, artifact):
    import jax
    from fddm_asr_tpu import aot

    ep = aot.ExportedPipeline.load(artifact)
    # 1 row, shorter audio -> zero-padded into the (2, N) bucket; must match
    # the live pipeline run at the SAME padded shape (transcripts depend on
    # the padded batch shape — documented engine contract)
    short = _wave(1, N - 1024, seed=3)
    got = ep.transcribe_with_ids(short, seed=5)
    assert len(got) == 1
    padded = np.zeros((2, N), np.float32)
    padded[0, : N - 1024] = short[0]
    ref = pipeline.transcribe_with_ids(
        padded, seq_len=SEQ_LEN, rng=jax.random.key(np.uint32(5)), **SAMPLING)
    assert got[0][1] == ref[0][1]

    assert ep.pick_bucket(1, 100) == (2, N)
    with pytest.raises(ValueError):
        ep.pick_bucket(3, N)  # no bucket with batch >= 3
    with pytest.raises(ValueError):
        ep.pick_bucket(1, N + 1)  # audio longer than any bucket


def test_params_npz_bf16_roundtrip(tmp_path):
    import jax.numpy as jnp
    from fddm_asr_tpu import aot

    enc = {"params": {"w": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3),
                      "inner": {"b": np.float32([1.5, -2.0])}}}
    dec = {"params": {"emb": np.arange(4, dtype=np.int32)}}
    path = str(tmp_path / "p.npz")
    aot.save_params_npz(path, enc, dec)
    enc2, dec2 = aot.load_params_npz(path)
    assert enc2["params"]["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(enc["params"]["w"], np.float32),
                                  np.asarray(enc2["params"]["w"], np.float32))
    np.testing.assert_array_equal(enc2["params"]["inner"]["b"],
                                  np.float32([1.5, -2.0]))
    np.testing.assert_array_equal(dec2["params"]["emb"],
                                  np.arange(4, dtype=np.int32))
    assert dec2["params"]["emb"].dtype == np.int32


def test_fresh_process_loads_without_model_code(pipeline, artifact, tmp_path):
    """The whole point of the artifact: a serving host deserializes and runs
    with NO Flax module construction.  The subprocess bans the model modules
    outright, so a regression that sneaks a model import into the load path
    fails loudly."""
    import jax

    wave = _wave(2, seed=11)
    expected = pipeline.transcribe_with_ids(
        wave, seq_len=SEQ_LEN, rng=jax.random.key(np.uint32(3)), **SAMPLING)
    wav_path = str(tmp_path / "wave.npy")
    np.save(wav_path, wave)
    exp_path = str(tmp_path / "expected.json")
    with open(exp_path, "w") as f:
        json.dump([list(e[1]) for e in expected], f)

    script = f"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"  # sitecustomize bakes axon in — assign
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {REPO!r})
# ban model construction: loading must never touch the Flax model modules
import builtins
_real_import = builtins.__import__
def _guard(name, *a, **k):
    if name.startswith("fddm_asr_tpu.models") or name.startswith("flax"):
        raise ImportError(f"model code imported at serving time: {{name}}")
    return _real_import(name, *a, **k)
builtins.__import__ = _guard
import numpy as np
from fddm_asr_tpu.aot import ExportedPipeline
ep = ExportedPipeline.load({artifact!r})
wave = np.load({wav_path!r})
got = [ids for _, ids in ep.transcribe_with_ids(wave, seed=3)]
expected = json.load(open({exp_path!r}))
assert got == expected, (got, expected)
print("FRESH_PROCESS_OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    assert "FRESH_PROCESS_OK" in res.stdout


def test_serve_exported_artifact(synth, artifact):
    """serve.py --exported: HTTP serving straight off the AOT artifact —
    engine params derive from the artifact meta, transcripts are
    deterministic (identical to a direct ExportedPipeline call at the
    engine's padded shape and rng counter)."""
    import threading
    import urllib.request

    import serve
    from fddm_asr_tpu import aot
    from fddm_asr_tpu.data.audio_io import load_audio

    args = serve.parse_args([
        "--exported", artifact, "--port", "0", "--max-wait-ms", "5",
    ])
    with pytest.warns(UserWarning, match="condition-mask off"):
        srv = serve.build_server(args)
    # engine config came from the artifact meta, not flags
    assert srv.engine.max_batch == 2
    assert srv.engine.bucket == N and srv.engine.max_samples == N
    assert srv.engine.seq_len == SEQ_LEN
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            health = json.loads(r.read().decode("utf-8"))
        assert health["exported"] == artifact
        assert health["T_infer"] == SAMPLING["T_infer"]

        wav_path = f"{synth}/data/processed/clips/test_000.wav"
        req = urllib.request.Request(
            base + "/v1/transcribe", data=open(wav_path, "rb").read(),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=300) as r:
            res = json.loads(r.read().decode("utf-8"))
        assert set(res) >= {"wav", "text", "ids", "confidence", "T_infer"}
        assert res["T_infer"] == SAMPLING["T_infer"]

        # deterministic: first batch uses rng counter 1; the engine padded
        # the clip to its (1, bucket) shape before the adapter call
        wave, _sr = load_audio(wav_path, target_sr=16000, mono=True)
        ep = aot.ExportedPipeline.load(artifact)
        padded = np.zeros((1, N), np.float32)
        padded[0, : len(wave)] = wave
        exp_text, exp_ids, exp_conf = ep.transcribe_with_ids(
            padded, lengths=np.array([max(len(wave), 400)]), seed=1,
            with_confidence=True)[0]
        assert res["ids"] == exp_ids
        assert res["text"] == exp_text
        assert abs(res["confidence"] - exp_conf) < 1e-6
    finally:
        srv.shutdown()
        srv.engine.shutdown()


def test_serve_exported_long_form(synth, artifact):
    """Uploads longer than the largest bucket split into windows (engine
    max_seconds comes from the artifact meta) and the texts join."""
    import threading
    import urllib.request

    import serve

    args = serve.parse_args([
        "--exported", artifact, "--port", "0", "--max-wait-ms", "5",
    ])
    with pytest.warns(UserWarning, match="condition-mask off"):
        srv = serve.build_server(args)
    assert srv.engine.max_samples == N  # from the artifact meta (0.5 s)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        import io
        import struct

        pcm = (np.random.default_rng(4).standard_normal(int(1.2 * 16000))
               * 3000).astype("<i2")
        hdr = (b"RIFF" + struct.pack("<I", 36 + pcm.nbytes) + b"WAVEfmt "
               + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
               + b"data" + struct.pack("<I", pcm.nbytes))
        req = urllib.request.Request(
            base + "/v1/transcribe", data=hdr + pcm.tobytes(),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=300) as r:
            res = json.loads(r.read().decode("utf-8"))
        assert "error" not in res, res
        assert len(res["chunks"]) >= 2  # 1.2 s through 0.5 s windows
        assert res["text"] == "".join(res["chunks"])
    finally:
        srv.shutdown()
        srv.engine.shutdown()


def test_bench_serve_exported(artifact, capsys):
    """scripts/bench_serve.py --exported: serving bench off the artifact,
    with cold-start timings in the JSON row."""
    import warnings

    from scripts.bench_serve import main as bench_main

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # condition-mask-off artifact
        bench_main(["--exported", artifact, "--concurrency", "2",
                    "--duration-s", "1", "--audio-seconds", "0.5",
                    "--device", "cpu"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["metric"] == "serve_rtfx" and row["serving"] == "exported"
    assert row["errors"] == 0 and row["value"] > 0
    assert row["cold_start_s"]["build"] > 0
    assert row["cold_start_s"]["first_request"] >= row["cold_start_s"]["build"]


@pytest.fixture(scope="module")
def mesh_artifact(synth, tmp_path_factory):
    """A SHARDED artifact: dp=4 x tp=2 mesh captured into the modules."""
    from fddm_asr_tpu import aot
    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.parallel import make_mesh, MeshSpec
    from fddm_asr_tpu.pipeline import FDDMPipeline

    cfg = load_config(f"{synth}/config.yaml")
    pipe = FDDMPipeline.from_config(cfg)  # fresh — don't mutate the shared one
    pipe.apply_mesh(make_mesh(MeshSpec(data=4, model=2)))
    art = str(tmp_path_factory.mktemp("aot_mc") / "artifact")
    aot.save_artifact(pipe, art, [(4, N)], seq_len=SEQ_LEN,
                      sampling=SAMPLING,
                      tokenizer_path=cfg.data.get("tokenizer_path"))
    return art


def test_multichip_artifact_matches_single_device(pipeline, mesh_artifact):
    """Sharded export/load is token-exact vs the single-device pipeline;
    params are placed on the reconstructed mesh once at load."""
    import jax
    from fddm_asr_tpu import aot

    ep = aot.ExportedPipeline.load(mesh_artifact)
    assert ep.meta["mesh"] == {"axis_names": ["data", "model"],
                               "shape": [4, 2]}
    assert ep.mesh is not None and dict(ep.mesh.shape) == {"data": 4,
                                                           "model": 2}
    # params live on the mesh (placed once, not per call)
    leaf = jax.tree.leaves(ep.dec_params)[0]
    assert len(leaf.sharding.device_set) == 8
    wave = _wave(4, seed=5)
    got = ep.transcribe_with_ids(wave, seed=9)
    ref = pipeline.transcribe_with_ids(
        wave, seq_len=SEQ_LEN, rng=jax.random.key(np.uint32(9)), **SAMPLING)
    assert [g[1] for g in got] == [r[1] for r in ref]


def test_multichip_export_validates_batch_divisibility(synth):
    from fddm_asr_tpu import aot
    from fddm_asr_tpu.config import load_config
    from fddm_asr_tpu.parallel import make_mesh, MeshSpec
    from fddm_asr_tpu.pipeline import FDDMPipeline

    cfg = load_config(f"{synth}/config.yaml")
    pipe = FDDMPipeline.from_config(cfg)
    pipe.apply_mesh(make_mesh(MeshSpec(data=4, model=2)))
    with pytest.raises(ValueError, match="divisible"):
        aot.export_transcribe(pipe, 3, N, SEQ_LEN, SAMPLING)


def test_multichip_artifact_fresh_process(pipeline, mesh_artifact, tmp_path):
    """Mesh reconstruction + once-only param placement in a process that
    never builds the models (same import ban as the single-device test)."""
    import jax

    wave = _wave(4, seed=13)
    expected = pipeline.transcribe_with_ids(
        wave, seq_len=SEQ_LEN, rng=jax.random.key(np.uint32(2)), **SAMPLING)
    wav_path = str(tmp_path / "wave.npy")
    np.save(wav_path, wave)
    exp_path = str(tmp_path / "expected.json")
    with open(exp_path, "w") as f:
        json.dump([list(e[1]) for e in expected], f)

    script = f"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
        " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {REPO!r})
import builtins
_real_import = builtins.__import__
def _guard(name, *a, **k):
    if name.startswith("fddm_asr_tpu.models") or name.startswith("flax"):
        raise ImportError(f"model code imported at serving time: {{name}}")
    return _real_import(name, *a, **k)
builtins.__import__ = _guard
import numpy as np
from fddm_asr_tpu.aot import ExportedPipeline
ep = ExportedPipeline.load({mesh_artifact!r})
assert dict(ep.mesh.shape) == {{"data": 4, "model": 2}}
wave = np.load({wav_path!r})
got = [ids for _, ids in ep.transcribe_with_ids(wave, seed=2)]
expected = json.load(open({exp_path!r}))
assert got == expected, (got, expected)
print("FRESH_MC_OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    assert "FRESH_MC_OK" in res.stdout


def test_serve_mesh_artifact_batch_multiple(mesh_artifact):
    """serve --exported on a sharded artifact aligns engine batch buckets
    to the data-axis size recorded in the meta."""
    import serve

    args = serve.parse_args(["--exported", mesh_artifact, "--port", "0"])
    with pytest.warns(UserWarning, match="condition-mask off"):
        srv = serve.build_server(args)
    try:
        assert srv.engine.batch_multiple == 4
        assert srv.engine.max_batch == 4
    finally:
        # serve_forever() was never started: socketserver.shutdown() would
        # block forever waiting for the loop to acknowledge — close instead
        srv.server_close()
        srv.engine.shutdown()


def test_cli_bucket_grid_parsing():
    from scripts.export_model import parse_buckets

    assert parse_buckets("1,8", "5,20") == [
        (1, 80000), (1, 320000), (8, 80000), (8, 320000)]
    assert parse_buckets("2", "0.5") == [(2, 8000)]
    with pytest.raises(ValueError):
        parse_buckets("", "20")


def test_serve_requires_exported_or_config():
    import serve

    args = serve.parse_args(["--port", "0"])
    with pytest.raises(SystemExit, match="either --exported"):
        serve.build_server(args)


def test_export_cli(synth, pipeline, tmp_path):
    """scripts/export_model.py: .pt checkpoint -> artifact -> transcripts
    identical to a live pipeline built from the same checkpoint."""
    import jax
    from fddm_asr_tpu.convert.torch_ckpt import save_reference_checkpoint
    from fddm_asr_tpu import aot
    from scripts.export_model import main as export_main

    ckpt = str(tmp_path / "m.pt")
    save_reference_checkpoint(
        ckpt, pipeline.decoder_params["params"],
        pos_emb_type=pipeline.cfg.model.get("pos_emb_type", "rope"))
    out = str(tmp_path / "artifact")
    rc = export_main([
        "--ckpt", ckpt,
        "--main-config", f"{synth}/config.yaml",
        "--diffusion-config", f"{synth}/config.yaml",
        "--tokenizer", f"{synth}/data/tokenizer/toy/spm_toy.model",
        "--out", out, "--batch-sizes", "2", "--seconds", "0.5",
        "--seq-len", str(SEQ_LEN), "--T-infer", "8", "--r", "4", "--greedy",
        "--posterior-mode", "map", "--device", "cpu",
    ])
    assert rc == 0
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["buckets"] == [[2, N]]

    ep = aot.ExportedPipeline.load(out)
    wave = _wave(2, seed=21)
    got = ep.transcribe_with_ids(wave, seed=1)

    import inference as infer_cli

    class _Args:
        main_config = f"{synth}/config.yaml"
        diffusion_config = f"{synth}/config.yaml"
        tokenizer = f"{synth}/data/tokenizer/toy/spm_toy.model"
        wavlm_ckpt = None

    _Args.ckpt = ckpt
    live = infer_cli.build_pipeline(_Args)
    ref = live.transcribe_with_ids(
        wave, seq_len=SEQ_LEN, rng=jax.random.key(np.uint32(1)), **SAMPLING)
    assert [g[1] for g in got] == [r[1] for r in ref]


def test_serve_exported_nonmultiple_buckets(synth, pipeline):
    """Duration buckets whose largest is NOT a multiple of the smallest:
    the engine rounds audio up to multiples of the SMALLEST bucket, which
    can overshoot the largest exported module (regression: with {0.3 s,
    0.5 s} buckets a 0.35 s upload rounded to 0.6 s and pick_bucket raised,
    failing the whole batch).  The round-up must clamp at max_samples."""
    import serve
    from fddm_asr_tpu import aot

    art = os.path.join(synth, "artifact_grid")
    tok = pipeline.cfg.data.get("tokenizer_path")
    meta = aot.save_artifact(pipeline, art, [(1, 4800), (1, 8000)],
                             seq_len=SEQ_LEN, sampling=SAMPLING,
                             tokenizer_path=tok)
    # the meta records the RESOLVED sampling config (defaults the caller
    # omitted are what the StableHLO baked in, e.g. temperature)
    assert meta["sampling"]["temperature"] == 1.0
    assert meta["sampling"]["sampling_mode"] == "exact"

    args = serve.parse_args(["--exported", art, "--port", "0",
                             "--max-wait-ms", "5"])
    with pytest.warns(UserWarning, match="condition-mask off"):
        srv = serve.build_server(args)
    try:
        res = srv.engine.submit(_wave(1, 5600, seed=9)[0], "mid.wav")
        assert "error" not in res, res
        assert isinstance(res["text"], str)
    finally:
        srv.server_close()
        srv.engine.shutdown()


def test_legacy_two_output_artifact_fallback(synth, pipeline, artifact,
                                              monkeypatch):
    """Artifacts written BEFORE the device_confidence meta key returned
    (ids, p_x0) only; the loader must fall back to the host-side
    confidence reduction and produce the same scores."""
    import jax

    from fddm_asr_tpu import aot

    def legacy_build(pl, seq_len, sampling, input_encoding="f32"):
        from fddm_asr_tpu.sampler import SamplerConfig, make_sample_fn

        s = aot.resolve_sampling(sampling)
        scfg = SamplerConfig(
            K=pl.cfg.data.vocab_size, T_train=pl.cfg.diffusion["T"],
            T_infer=s["T_infer"], r=s["r"], greedy=s["greedy"],
            posterior_mode=s["posterior_mode"],
            sampling_mode=s["sampling_mode"], temperature=s["temperature"],
            ref_compat=s["ref_compat"])

        def decoder_apply(params, xt, t, cond, c_mask):
            return pl.decoder.apply(params, xt, t, cond, None, c_mask,
                                    deterministic=True)

        sample_fn = make_sample_fn(decoder_apply, pl.sched, scfg)
        use_cmask = bool(pl.use_condition_mask)

        def step(enc_params, dec_params, seed, wave, lengths):
            rng = jax.random.key(seed)
            feats, feat_mask, _ = pl.encoder.apply(
                enc_params, wave, lengths if use_cmask else None,
                deterministic=True)
            return sample_fn(dec_params, rng, feats, seq_len=seq_len,
                             c_mask=feat_mask if use_cmask else None)

        return step

    monkeypatch.setattr(aot, "build_transcribe_fn", legacy_build)
    art = os.path.join(synth, "artifact_legacy")
    tok = pipeline.cfg.data.get("tokenizer_path")
    aot.save_artifact(pipeline, art, [(2, N)], seq_len=SEQ_LEN,
                      sampling=SAMPLING, tokenizer_path=tok)
    # strip the meta key the way an old writer would never have set it
    meta_path = os.path.join(art, "meta.json")
    meta = json.load(open(meta_path))
    meta.pop("device_confidence")
    json.dump(meta, open(meta_path, "w"))

    ep = aot.ExportedPipeline.load(art)
    wave = _wave(2, seed=12)
    got = ep.transcribe_with_ids(wave, seed=3, with_confidence=True)
    # current-format artifact at the same shapes/seed must agree exactly
    ep_new = aot.ExportedPipeline.load(artifact)
    want = ep_new.transcribe_with_ids(wave, seed=3, with_confidence=True)
    assert [g[1] for g in got] == [w[1] for w in want]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 1e-6


def test_native_executable_modules(synth, pipeline, artifact, tmp_path):
    """Native (serialize_executable) modules: token-identical to the
    StableHLO path, native-only buckets extend pick_bucket, and a
    fingerprint mismatch falls back to StableHLO silently."""
    import shutil

    from fddm_asr_tpu import aot

    art = str(tmp_path / "native_art")
    shutil.copytree(artifact, art)
    # baseline: StableHLO-only transcripts
    wave = _wave(2)
    hlo = aot.ExportedPipeline.load(art).transcribe_with_ids(wave, seed=7)

    # (2, N) native over the same bucket + (4, N) native-ONLY bucket
    meta = aot.save_native_modules(pipeline, art, [(2, N), (4, N)],
                                   seq_len=SEQ_LEN, sampling=SAMPLING)
    assert meta["native"]["buckets"] == [[2, N], [4, N]]
    ep = aot.ExportedPipeline.load(art)
    assert set(ep.native) == {(2, N), (4, N)}
    got = ep.transcribe_with_ids(wave, seed=7)
    assert [g[1] for g in got] == [h[1] for h in hlo]
    assert [g[0] for g in got] == [h[0] for h in hlo]
    # native-only bucket serves rows the StableHLO set cannot
    assert ep.pick_bucket(3, N) == (4, N)
    try:
        out3 = ep.transcribe_with_ids(_wave(3, seed=2), seed=9,
                                      with_confidence=True)
        assert len(out3) == 3 and all(len(e) == 3 for e in out3)
    except (RuntimeError, Exception) as e:  # noqa: BLE001
        # XLA:CPU's AOT loader has a global fusion-name registry that can
        # break when several deserialized executables coexist in-process
        # ("Buffer Definition Event ... not found"); a native-ONLY bucket
        # has no StableHLO fallback, so this execution is best-effort on
        # CPU (the TPU path round-trips cleanly — measured on v5e)
        if "not found" not in str(e):
            raise

    # mismatched fingerprint -> native modules ignored, StableHLO serves
    with open(os.path.join(art, "meta.json")) as f:
        m = json.load(f)
    m["native"]["device_kind"] = "some-other-accelerator"
    with open(os.path.join(art, "meta.json"), "w") as f:
        json.dump(m, f)
    ep2 = aot.ExportedPipeline.load(art)
    assert ep2.native == {}
    got2 = ep2.transcribe_with_ids(wave, seed=7)
    assert [g[1] for g in got2] == [h[1] for h in hlo]
    with pytest.raises(ValueError):
        ep2.pick_bucket(3, N)  # native-only bucket gone with the mismatch

    # guard: sampling drift between module families must be rejected
    with pytest.raises(ValueError, match="same sampling"):
        aot.save_native_modules(pipeline, art, [(2, N)], seq_len=SEQ_LEN,
                                sampling={**SAMPLING, "T_infer": 9})


def test_pcm16_input_encoding_artifact(synth, pipeline, tmp_path):
    """input_encoding=pcm16: wave travels as int16 (half the H2D bytes —
    the measured serving bottleneck) and the program expands /32768.
    Token-identical to the live pipeline fed the same quantized values;
    int16 input is accepted directly (engine fast path)."""
    import jax

    from fddm_asr_tpu import aot

    art = str(tmp_path / "pcm16_art")
    tok = pipeline.cfg.data.get("tokenizer_path")
    aot.save_artifact(pipeline, art, [(2, N)], seq_len=SEQ_LEN,
                      sampling=SAMPLING, tokenizer_path=tok,
                      input_encoding="pcm16")
    ep = aot.ExportedPipeline.load(art)
    assert ep.input_encoding == "pcm16"
    wave = _wave(2) * 0.1  # keep inside [-1, 1] so quantization is linear
    i16 = np.clip(np.round(wave * 32768.0), -32768, 32767).astype(np.int16)
    got = ep.transcribe_with_ids(wave, seed=7)
    ref = pipeline.transcribe_with_ids(
        i16.astype(np.float32) / 32768.0, seq_len=SEQ_LEN,
        rng=jax.random.key(np.uint32(7)), **SAMPLING)
    assert [g[1] for g in got] == [r[1] for r in ref]
    got2 = ep.transcribe_with_ids(i16, seed=7)
    assert [g[1] for g in got2] == [g[1] for g in got]

    # native modules inherit the artifact's encoding
    aot.save_native_modules(pipeline, art, [(2, N)], seq_len=SEQ_LEN,
                            sampling=SAMPLING)
    ep2 = aot.ExportedPipeline.load(art)
    assert set(ep2.native) == {(2, N)}
    got3 = ep2.transcribe_with_ids(wave, seed=7)
    assert [g[1] for g in got3] == [g[1] for g in got]


def test_mulaw8_input_encoding_artifact(synth, pipeline, tmp_path):
    """mulaw8 wire encoding: uint8 companded upload (quarter of f32),
    expanded on device; token-identical to the live pipeline fed the
    companded-then-expanded float wave."""
    import jax

    from fddm_asr_tpu import aot
    from fddm_asr_tpu.data.wire import mulaw_decode_np, mulaw_encode

    art = str(tmp_path / "mulaw_art")
    tok = pipeline.cfg.data.get("tokenizer_path")
    aot.save_artifact(pipeline, art, [(2, N)], seq_len=SEQ_LEN,
                      sampling=SAMPLING, tokenizer_path=tok,
                      input_encoding="mulaw8")
    ep = aot.ExportedPipeline.load(art)
    assert ep.input_encoding == "mulaw8"
    wave = _wave(2) * 0.1
    got = ep.transcribe_with_ids(wave, seed=7)
    ref = pipeline.transcribe_with_ids(
        mulaw_decode_np(mulaw_encode(wave)), seq_len=SEQ_LEN,
        rng=jax.random.key(np.uint32(7)), **SAMPLING)
    assert [g[1] for g in got] == [r[1] for r in ref]


def test_wire_codec_roundtrip():
    from fddm_asr_tpu.data.wire import (
        decode_wire_jnp, encode_wire, mulaw_decode_np, mulaw_encode,
        wire_dtype,
    )

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(16000) * 0.2).clip(-1, 1).astype(np.float32)
    # mulaw8: companded SNR on speech-level signals is ~35+ dB
    y = mulaw_decode_np(mulaw_encode(x))
    snr = 10 * np.log10((x ** 2).mean() / ((x - y) ** 2).mean())
    assert snr > 30, snr
    # pcm16 round-trip is exact for 16-bit-PCM-representable values
    i16 = (x * 32768.0).round().clip(-32768, 32767)
    x16 = (i16 / 32768.0).astype(np.float32)
    w = encode_wire(x16, "pcm16")
    assert w.dtype == np.int16
    assert np.array_equal(np.asarray(decode_wire_jnp(w, "pcm16")), x16)
    # jnp and np mulaw decoders agree bit-for-bit on all 256 codes
    codes = np.arange(256, dtype=np.uint8)
    assert np.allclose(np.asarray(decode_wire_jnp(codes, "mulaw8")),
                       mulaw_decode_np(codes), atol=1e-7)
    assert wire_dtype("mulaw8") == np.uint8
    with pytest.raises((ValueError, KeyError)):
        wire_dtype("pcm24")
