# -*- coding: utf-8 -*-
"""AOT deployment artifacts: serialize the fused encode+sample transcribe
step with `jax.export` (StableHLO) into a self-contained directory that
serves WITHOUT the model code.

The reference has no deployment story at all (its inference path rebuilds
torch modules from YAML every run — /root/reference/inference.py:96-160);
this is the TPU-native production packaging layer: a versioned, ahead-of-
time-lowered program per (batch, samples) bucket, the parameters, and the
tokenizer, in one directory.  Loading needs only jax + numpy +
fddm_asr_tpu's tokenizer/eval helpers — no Flax modules are constructed,
so serving hosts never trace or re-lower the model and cold-start is one
deserialize instead of a full trace+compile.

Artifact layout (a directory)::

    meta.json                    format/version/bucket/sampling metadata
    module_b{B}_n{N}.jaxexport   serialized jax.export.Exported per bucket
    params.npz                   encoder+decoder params (raw-byte leaves,
                                 bf16-safe — ml_dtypes dtypes round-trip)
    tokenizer/<file>             copied tokenizer model (+ sidecars)

Exported calling convention (fixed across buckets)::

    call(enc_params, dec_params, seed_u32, wave_f32[B,N], lengths_i32[B])
        -> (ids_i32[B,seq_len], p_x0_f32[B,seq_len,K], conf_f32[B])

conf is the decoded-span geometric-mean token probability, reduced INSIDE
the program (eval.batch_confidence_device) so serving fetches ids+conf only
and the p_x0 tensor never crosses to host.  Artifacts written before the
`device_confidence` meta key returned (ids, p_x0); the loader handles both.

`seed` feeds `jax.random.key` INSIDE the program, so a live
`FDDMPipeline.transcribe(..., rng=jax.random.key(seed))` at the same padded
batch shape produces token-identical transcripts (pinned in
tests/test_aot_export.py).  `lengths` is ignored unless the pipeline was
built with `use_condition_mask=True` (reference parity passes no masks at
inference — SURVEY hard part #4) but is always part of the signature so
callers never branch.

Multi-platform notes: pass `platforms=("cpu", "tpu")` to lower one artifact
for both.  Pallas kernels do NOT survive the StableHLO export round-trip on
current TPU toolchains: the serialized Mosaic fused-attention kernel fails
to RECOMPILE at load ("Invalid relayout ... vector<1x1024xi1>", measured on
v5e) even though the live pipeline — which lowers the kernel fresh per
trace — runs it fine.  scripts/export_model.py therefore builds export
pipelines with the portable XLA attention by default (--fused-attention
auto|on|off); pass `on` only on toolchains where the round-trip works.

NATIVE EXECUTABLE modules close that gap: `save_native_modules` compiles
the FUSED pipeline ahead of time on the deployment backend and serializes
the finished PjRt executable (jax.experimental.serialize_executable) as
`native_b{B}_n{N}.jaxexec` next to the portable StableHLO modules.  Mosaic
kernels survive — the executable is the post-compile machine program, no
re-lowering happens at load (round-trip measured bit-exact on v5e).  The
cost is portability: a native module only loads on the same platform +
device kind (+ jax version) it was compiled on, so the loader checks the
recorded fingerprint and silently falls back to the StableHLO module when
it does not match.  Same calling convention and token-identical outputs —
which module family served a bucket is visible in ExportedPipeline.native.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

FORMAT_VERSION = 1
_META = "meta.json"
_PARAMS = "params.npz"
_TOKDIR = "tokenizer"


# --------------------------------------------------------------------------
# parameter tree <-> npz  (raw bytes per leaf: np.savez cannot hold ml_dtypes
# bfloat16 without pickling, and np.issubdtype misclassifies it — CLAUDE.md)
# --------------------------------------------------------------------------
def _flatten_named(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = []
        for p in path:
            if not hasattr(p, "key"):
                raise TypeError(
                    f"params must be nested dicts; got path entry {p!r}")
            keys.append(str(p.key))
        flat[prefix + "/" + "/".join(keys)] = np.asarray(leaf)
    return flat


def _dtype_from_name(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bfloat16/float8 live here, not in numpy

        return np.dtype(getattr(ml_dtypes, name))


def save_params_npz(path: str, enc_params: Any, dec_params: Any) -> None:
    flat = {}
    flat.update(_flatten_named(enc_params, "enc"))
    flat.update(_flatten_named(dec_params, "dec"))
    spec = {k: {"dtype": a.dtype.name, "shape": list(a.shape)}
            for k, a in flat.items()}
    payload = {k: np.frombuffer(a.tobytes(), dtype=np.uint8)
               for k, a in flat.items()}
    payload["__spec__"] = np.frombuffer(
        json.dumps(spec).encode("utf-8"), dtype=np.uint8)
    np.savez(path, **payload)


def load_params_npz(path: str) -> Tuple[Dict, Dict]:
    with np.load(path) as z:
        spec = json.loads(bytes(z["__spec__"]).decode("utf-8"))
        trees: Dict[str, Dict] = {"enc": {}, "dec": {}}
        for name, info in spec.items():
            arr = np.frombuffer(
                bytes(z[name]), dtype=_dtype_from_name(info["dtype"])
            ).reshape(info["shape"])
            parts = name.split("/")
            node = trees[parts[0]]
            for k in parts[1:-1]:
                node = node.setdefault(k, {})
            node[parts[-1]] = arr
    return trees["enc"], trees["dec"]


# --------------------------------------------------------------------------
# export side
# --------------------------------------------------------------------------
def resolve_sampling(sampling: Dict[str, Any]) -> Dict[str, Any]:
    """Fill every sampling default the exported module will bake in, so the
    artifact meta records exactly what the StableHLO runs (a partial dict
    would otherwise make loaders guess — and misreport — the defaults)."""
    return {
        "T_infer": int(sampling.get("T_infer", 20)),
        "r": int(sampling.get("r", 5)),
        "greedy": bool(sampling.get("greedy", True)),
        "posterior_mode": sampling.get("posterior_mode", "map"),
        "sampling_mode": sampling.get("sampling_mode", "exact"),
        "temperature": float(sampling.get("temperature", 1.0)),
        "ref_compat": bool(sampling.get("ref_compat", True)),
        "repeat_penalty": float(sampling.get("repeat_penalty", 0.0)),
    }


def build_transcribe_fn(pipeline, seq_len: int, sampling: Dict[str, Any],
                        input_encoding: str = "f32"):
    """Fused encode+sample step with the fixed AOT calling convention.

    `pipeline` is a live FDDMPipeline; `sampling` takes the same keys as
    FDDMPipeline.sample (T_infer/r/greedy/posterior_mode/sampling_mode/
    temperature/ref_compat).

    input_encoding="pcm16": the wave argument is int16 PCM, expanded to
    float32/32768 as the program's first op.  Exists because host->device
    bandwidth is the serving bottleneck in relay-attached environments
    (measured 40 MB/s round 3: a B=32 x 20 s f32 batch costs ~1.0 s to
    upload vs 0.25 s to compute) — int16 halves the bytes and is LOSSLESS
    for audio that arrived as 16-bit PCM (every WAV upload and pcm16
    stream; float sources quantize at ~96 dB SNR).
    """
    from fddm_asr_tpu.sampler import SamplerConfig, make_sample_fn

    s = resolve_sampling(sampling)
    scfg = SamplerConfig(
        K=pipeline.cfg.data.vocab_size,
        T_train=pipeline.cfg.diffusion["T"],
        T_infer=s["T_infer"],
        r=s["r"],
        greedy=s["greedy"],
        posterior_mode=s["posterior_mode"],
        sampling_mode=s["sampling_mode"],
        temperature=s["temperature"],
        ref_compat=s["ref_compat"],
        repeat_penalty=s["repeat_penalty"],
    )

    def decoder_apply(params, xt, t, cond, c_mask):
        return pipeline.decoder.apply(
            params, xt, t, cond, None, c_mask, deterministic=True)

    sample_fn = make_sample_fn(decoder_apply, pipeline.sched, scfg)
    use_cmask = bool(pipeline.use_condition_mask)

    from fddm_asr_tpu.eval import batch_confidence_device

    pad_id = pipeline.pad_id
    special = dict(pipeline.special_ids)

    from fddm_asr_tpu.data.wire import decode_wire_jnp, wire_dtype

    wire_dtype(input_encoding)  # validate

    def transcribe_step(enc_params, dec_params, seed, wave, lengths):
        rng = jax.random.key(seed)
        wave = decode_wire_jnp(wave, input_encoding)  # wire -> f32 on device
        feats, feat_mask, _ = pipeline.encoder.apply(
            enc_params, wave, lengths if use_cmask else None,
            deterministic=True)
        c_mask = feat_mask if use_cmask else None
        ids, p = sample_fn(dec_params, rng, feats, seq_len=seq_len,
                           c_mask=c_mask)
        # [B] decoded-span confidence reduced inside the program: serving
        # then fetches ids+conf only — the [B, L, K] p_x0 output stays on
        # device (it remains an output for API continuity / inspection)
        conf = batch_confidence_device(ids, p, pad_id, special)
        return ids, p, conf

    return transcribe_step


def _tree_specs(tree: Any):
    # leaves are jax/numpy arrays — read shape/dtype without materializing
    # (np.asarray would pull every device leaf to host once per bucket)
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)


def _bucket_specs(pipeline, batch: int, num_samples: int,
                  input_encoding: str = "f32"):
    """(enc, dec, seed, wave, lengths) ShapeDtypeStructs for one bucket —
    sharding-annotated when the pipeline has a mesh applied."""
    from fddm_asr_tpu.data.wire import wire_dtype

    wave_dtype = wire_dtype(input_encoding)
    mesh = getattr(pipeline, "mesh", None)
    if mesh is None:
        enc_specs = _tree_specs(pipeline.encoder_params)
        dec_specs = _tree_specs(pipeline.decoder_params)
        wave_spec = jax.ShapeDtypeStruct((batch, num_samples), wave_dtype)
        len_spec = jax.ShapeDtypeStruct((batch,), np.int32)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_ways = int(mesh.shape.get("data", 1))
        if batch % data_ways:
            raise ValueError(
                f"bucket batch {batch} must be divisible by the mesh "
                f"data-axis size {data_ways}")

        def placed_spec(a):
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)

        enc_specs = jax.tree.map(placed_spec, pipeline.encoder_params)
        dec_specs = jax.tree.map(placed_spec, pipeline.decoder_params)
        wave_spec = jax.ShapeDtypeStruct(
            (batch, num_samples), wave_dtype,
            sharding=NamedSharding(mesh, P("data", None)))
        len_spec = jax.ShapeDtypeStruct(
            (batch,), np.int32, sharding=NamedSharding(mesh, P("data")))
    return (enc_specs, dec_specs, jax.ShapeDtypeStruct((), np.uint32),
            wave_spec, len_spec)


def export_transcribe(
    pipeline,
    batch: int,
    num_samples: int,
    seq_len: int,
    sampling: Dict[str, Any],
    platforms: Optional[Sequence[str]] = None,
    input_encoding: str = "f32",
) -> jax_export.Exported:
    """Lower ONE (batch, num_samples) bucket to a jax.export.Exported.

    If the pipeline has a device mesh applied (FDDMPipeline.apply_mesh),
    the exported module is SHARDED: param shardings are captured from the
    placed arrays, the batch rides the "data" axis, and the artifact
    requires mesh-size devices at load time (multi-chip serving without
    model code).  Token-exact vs the single-device export — pinned in
    tests/test_aot_export.py.
    """
    fn = build_transcribe_fn(pipeline, seq_len, sampling, input_encoding)
    specs = _bucket_specs(pipeline, batch, num_samples, input_encoding)
    exp = jax_export.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms else None,
    )(*specs)
    return exp


# --------------------------------------------------------------------------
# native executable modules (post-compile serialization; kernels survive)
# --------------------------------------------------------------------------
def native_fingerprint() -> Dict[str, str]:
    """Compatibility key a serialized executable is valid under: the PjRt
    machine program is backend-specific, unlike StableHLO."""
    d = jax.devices()[0]
    return {"platform": d.platform, "device_kind": d.device_kind,
            "jax_version": jax.__version__}


def compile_transcribe(pipeline, batch: int, num_samples: int, seq_len: int,
                       sampling: Dict[str, Any],
                       input_encoding: str = "f32"):
    """AOT-compile ONE bucket on the CURRENT backend (jit → lower →
    compile).  Unlike export_transcribe this keeps whatever kernels the
    live pipeline uses — Pallas fused attention included."""
    fn = build_transcribe_fn(pipeline, seq_len, sampling, input_encoding)
    specs = _bucket_specs(pipeline, batch, num_samples, input_encoding)
    return jax.jit(fn).lower(*specs).compile()


def save_native_modules(
    pipeline,
    out_dir: str,
    buckets: Sequence[Tuple[int, int]],
    seq_len: int,
    sampling: Dict[str, Any],
) -> Dict[str, Any]:
    """Compile + serialize native executables for `buckets` into an EXISTING
    artifact directory (written by save_artifact) and record them in the
    meta.  The pipeline passed here is typically the FUSED one (live
    defaults) while save_artifact received the portable-attention build —
    same params, token-identical outputs, different lowering.

    Returns the updated meta dict."""
    import pickle

    from jax.experimental import serialize_executable as se

    meta_path = os.path.join(out_dir, _META)
    with open(meta_path) as f:
        meta = json.load(f)
    baked = resolve_sampling(sampling)
    if meta.get("sampling") != baked:
        raise ValueError(
            "native modules must bake the same sampling as the StableHLO "
            f"modules: artifact has {meta.get('sampling')}, got {baked}")
    if int(seq_len) != int(meta["seq_len"]):
        raise ValueError(
            f"native seq_len {seq_len} != artifact seq_len {meta['seq_len']}")
    enc = meta.get("input_encoding", "f32")
    for b, n in buckets:
        comp = compile_transcribe(pipeline, b, n, seq_len, sampling, enc)
        payload, in_tree, out_tree = se.serialize(comp)
        with open(os.path.join(out_dir, f"native_b{b}_n{n}.jaxexec"),
                  "wb") as f:
            f.write(pickle.dumps((payload, in_tree, out_tree)))
    meta["native"] = {
        "buckets": sorted([int(b), int(n)] for b, n in buckets),
        **native_fingerprint(),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def save_artifact(
    pipeline,
    out_dir: str,
    buckets: Sequence[Tuple[int, int]],
    seq_len: int,
    sampling: Dict[str, Any],
    tokenizer_path: str,
    platforms: Optional[Sequence[str]] = None,
    input_encoding: str = "f32",
) -> Dict[str, Any]:
    """Export every bucket + params + tokenizer into `out_dir`; returns the
    meta dict.  `buckets` is a list of (batch, num_samples)."""
    os.makedirs(out_dir, exist_ok=True)
    for b, n in buckets:
        exp = export_transcribe(pipeline, b, n, seq_len, sampling, platforms,
                                input_encoding)
        with open(os.path.join(out_dir, f"module_b{b}_n{n}.jaxexport"),
                  "wb") as f:
            f.write(exp.serialize())
    save_params_npz(os.path.join(out_dir, _PARAMS),
                    pipeline.encoder_params, pipeline.decoder_params)

    tokdir = os.path.join(out_dir, _TOKDIR)
    os.makedirs(tokdir, exist_ok=True)
    tok_file = os.path.basename(tokenizer_path)
    shutil.copy2(tokenizer_path, os.path.join(tokdir, tok_file))
    # sidecars the loader falls back to (.vocab / vocab.json next to .model)
    stem = os.path.splitext(tokenizer_path)[0]
    for side in (stem + ".vocab",
                 os.path.join(os.path.dirname(tokenizer_path), "vocab.json")):
        if os.path.exists(side):
            shutil.copy2(side, os.path.join(tokdir, os.path.basename(side)))

    mesh = getattr(pipeline, "mesh", None)
    meta = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "mesh": (None if mesh is None else
                 {"axis_names": list(mesh.axis_names),
                  "shape": [int(mesh.shape[a]) for a in mesh.axis_names]}),
        "platforms": list(platforms) if platforms else None,
        "seq_len": int(seq_len),
        # resolved, not raw: the meta must state exactly what the modules
        # baked in, including defaults the caller omitted
        "sampling": resolve_sampling(sampling),
        "buckets": [[int(b), int(n)] for b, n in sorted(buckets)],
        "vocab_size": int(pipeline.cfg.data.vocab_size),
        "special_ids": {k: (None if v is None else int(v))
                        for k, v in pipeline.special_ids.items()},
        "use_condition_mask": bool(pipeline.use_condition_mask),
        # modules return (ids, p_x0, conf): per-utterance confidence is
        # reduced inside the program (loaders of 2-output artifacts from
        # before this key fall back to a host-side reduction)
        "device_confidence": True,
        # wire dtype of the wave argument: "pcm16" halves H2D bytes and is
        # lossless for 16-bit-PCM sources (absent == "f32", pre-round-3)
        "input_encoding": input_encoding,
        "tokenizer_file": tok_file,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


# --------------------------------------------------------------------------
# serving side — needs NO model code
# --------------------------------------------------------------------------
class ExportedPipeline:
    """Loads an AOT artifact and transcribes.  Buckets are picked as the
    smallest (batch, samples) that fit; waveforms are zero-padded into the
    bucket.  NOTE transcripts depend on the padded batch SHAPE (the sampler
    draws x_T per padded row — same contract as the live engine, CLAUDE.md),
    so fixed buckets are part of the artifact's observable behavior."""

    def __init__(self, path: str):
        with open(os.path.join(path, _META)) as f:
            self.meta = json.load(f)
        if self.meta["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta['format_version']} is newer "
                f"than this loader ({FORMAT_VERSION})")
        self._modules: Dict[Tuple[int, int], jax_export.Exported] = {}
        for b, n in self.meta["buckets"]:
            fn = os.path.join(path, f"module_b{b}_n{n}.jaxexport")
            with open(fn, "rb") as f:
                self._modules[(b, n)] = jax_export.deserialize(
                    bytearray(f.read()))
        self.enc_params, self.dec_params = load_params_npz(
            os.path.join(path, _PARAMS))
        self.mesh = None
        mesh_meta = self.meta.get("mesh")
        if mesh_meta:
            self._place_on_mesh(mesh_meta)
        else:
            # place params on the default device ONCE — leaving them as host
            # numpy would make every .call() re-transfer the full weight set
            # (hundreds of MB for the flagship) per served batch
            self.enc_params = jax.device_put(self.enc_params)
            self.dec_params = jax.device_put(self.dec_params)
        # native executables (fused kernels survive; backend-specific):
        # loaded only when the recorded fingerprint matches this process's
        # backend — otherwise the portable StableHLO modules serve alone.
        # After mesh placement: a deserialized executable must be pinned to
        # exactly its device assignment (mesh devices, or the one default)
        self.native: Dict[Tuple[int, int], Any] = {}
        nat = self.meta.get("native")
        if nat and all(nat.get(k) == v
                       for k, v in native_fingerprint().items()):
            import pickle

            from jax.experimental import serialize_executable as se

            exec_devices = (list(self.mesh.devices.flatten())
                            if self.mesh is not None else [jax.devices()[0]])
            for b, n in nat["buckets"]:
                fn = os.path.join(path, f"native_b{b}_n{n}.jaxexec")
                try:
                    with open(fn, "rb") as f:
                        payload, in_tree, out_tree = pickle.loads(f.read())
                    self.native[(int(b), int(n))] = se.deserialize_and_load(
                        payload, in_tree, out_tree,
                        execution_devices=exec_devices)
                except Exception as e:  # noqa: BLE001 — per-module fallback
                    import warnings

                    warnings.warn(
                        f"native module {os.path.basename(fn)} failed to "
                        f"load ({e}); this bucket serves via its StableHLO "
                        "module", stacklevel=2)
        from fddm_asr_tpu.tokenizer import load_tokenizer

        self.tokenizer = load_tokenizer(
            os.path.join(path, _TOKDIR, self.meta["tokenizer_file"]))
        self.special_ids = self.meta["special_ids"]
        self.pad_id = self.special_ids["pad_id"]
        # wire dtype of the wave input ("pcm16" halves H2D bytes); the
        # serving engine reads this to build int16 batch buffers directly
        self.input_encoding = self.meta.get("input_encoding", "f32")

    @classmethod
    def load(cls, path: str) -> "ExportedPipeline":
        return cls(path)

    def _place_on_mesh(self, mesh_meta: Dict[str, Any]) -> None:
        """Sharded artifact: rebuild the mesh over local devices and place
        the params ONCE with the shardings the module recorded (no model
        code — in_shardings_jax maps the serialized HloShardings onto our
        mesh).  Wave/seed stay host-side; Exported.call places them per
        the recorded input shardings."""
        from jax.sharding import Mesh

        n = int(np.prod(mesh_meta["shape"]))
        devs = jax.devices()
        if len(devs) < n:
            raise ValueError(
                f"sharded artifact needs {n} devices "
                f"(mesh {mesh_meta}), this process has {len(devs)}")
        self.mesh = Mesh(np.array(devs[:n]).reshape(mesh_meta["shape"]),
                         tuple(mesh_meta["axis_names"]))
        mod = next(iter(self._modules.values()))
        flat_sh = mod.in_shardings_jax(self.mesh)
        enc_leaves, enc_td = jax.tree.flatten(self.enc_params)
        dec_leaves, dec_td = jax.tree.flatten(self.dec_params)
        ne, nd = len(enc_leaves), len(dec_leaves)
        if ne + nd + 3 != len(flat_sh):  # + seed, wave, lengths
            raise ValueError(
                f"artifact params ({ne}+{nd} leaves) do not match the "
                f"module signature ({len(flat_sh)} args)")
        self.enc_params = jax.tree.unflatten(enc_td, [
            jax.device_put(l, s)
            for l, s in zip(enc_leaves, flat_sh[:ne])])
        self.dec_params = jax.tree.unflatten(dec_td, [
            jax.device_put(l, s)
            for l, s in zip(dec_leaves, flat_sh[ne:ne + nd])])
        # per-call input placement (transcribe_with_ids_async device_puts
        # wave/lengths explicitly): the module's recorded shardings
        self._wave_sharding = flat_sh[-2]
        self._len_sharding = flat_sh[-1]

    # ------------------------------------------------------------- buckets
    def pick_bucket(self, rows: int, samples: int) -> Tuple[int, int]:
        # native-only buckets (e.g. a large serving batch compiled only as
        # an executable) count too — the union is what the artifact serves
        avail = set(self._modules) | set(self.native)
        fits = [(b, n) for b, n in avail if b >= rows and n >= samples]
        if not fits:
            raise ValueError(
                f"no exported bucket fits batch={rows} samples={samples}; "
                f"available: {sorted(avail)}")
        return min(fits, key=lambda bn: (bn[1], bn[0]))

    # ----------------------------------------------------------------- api
    def transcribe_with_ids(
        self,
        wave: np.ndarray,
        lengths: Optional[np.ndarray] = None,
        seed: int = 0,
        with_confidence: bool = False,
    ) -> List[Tuple]:
        return self.transcribe_with_ids_async(
            wave, lengths, seed=seed, with_confidence=with_confidence)()

    def transcribe_with_ids_async(
        self,
        wave: np.ndarray,
        lengths: Optional[np.ndarray] = None,
        seed: int = 0,
        with_confidence: bool = False,
    ):
        """Two-phase variant: dispatches the exported .call and returns a
        finalize() producing the same rows — the serving engine overlaps
        batch N+1's device execution with batch N's host decode."""
        from fddm_asr_tpu.eval import ids_to_text, utterance_confidence

        from fddm_asr_tpu.data.wire import (
            encode_wire, silence_value, wire_dtype,
        )

        enc = self.meta.get("input_encoding", "f32")
        wdt = wire_dtype(enc)
        if np.asarray(wave).dtype == wdt:
            wave = np.asarray(wave)  # already wire-ready (engine fast path)
        else:
            # encode floats to the wire dtype here (lossless for 16-bit-PCM
            # sources under pcm16; companded under mulaw8 — see data/wire)
            wave = encode_wire(np.asarray(wave, np.float32), enc)
        if wave.ndim == 1:
            wave = wave[None]
        rows, samples = wave.shape
        if lengths is None:
            lengths = np.full((rows,), samples, np.int32)
        b, n = self.pick_bucket(rows, samples)
        wave_p = np.full((b, n), silence_value(enc), wdt)
        wave_p[:rows, :samples] = wave
        # clamp to one conv-frame's receptive field: shorter lengths yield
        # ZERO encoder frames whose all-masked attention rows would reach
        # the decoder (same guard as serve.py's engine); bucket pad rows get
        # the same floor
        from fddm_asr_tpu import CONV_RECEPTIVE_FIELD

        floor = min(CONV_RECEPTIVE_FIELD, n)
        len_p = np.full((b,), floor, np.int32)
        len_p[:rows] = np.maximum(np.asarray(lengths, np.int32), floor)
        # EXPLICIT input placement: handing numpy straight to the module
        # call moves audio at ~10 MB/s through this environment's relay
        # (3.7-6.0 s for a B=32 wave) vs ~1 GB/s for a device_put (0.04 s)
        # — measured round 3; the device-resident call then runs at the
        # offline bench's 0.26 s/step
        if self.mesh is not None:
            wave_p = jax.device_put(wave_p, self._wave_sharding)
            len_p = jax.device_put(len_p, self._len_sharding)
        else:
            wave_p = jax.device_put(wave_p)
            len_p = jax.device_put(len_p)
        call_args = (self.enc_params, self.dec_params, np.uint32(seed),
                     wave_p, len_p)
        # native modules are BEST-EFFORT: a deserialized executable can
        # fail at call or result-pull time (e.g. XLA:CPU AOT loads on a
        # host whose machine features differ from the compile machine) —
        # demote the bucket to its StableHLO module and retry, so a bad
        # native module degrades performance, never availability
        native = self.native.get((b, n))
        outs = None
        if native is not None:  # fused-kernel executable — preferred
            try:
                outs = native(*call_args)
            except Exception as e:  # noqa: BLE001 — fallback below
                self._demote_native((b, n), e)
                native = None
        if outs is None:
            outs = self._modules[(b, n)].call(*call_args)
        device_conf = bool(self.meta.get("device_confidence"))

        def pull(outs):
            conf = None
            if device_conf:
                ids, p, conf_d = outs
                if with_confidence:
                    # ids + [B] conf are the ONLY host transfers; the
                    # [B, L, K] p_x0 output stays on device
                    conf = np.asarray(conf_d)
            else:  # legacy 2-output artifact: reduce confidence host-side
                ids, p = outs
                if with_confidence:
                    p = np.asarray(p)
            ids_np = np.asarray(ids)[:rows]
            out = []
            for i, row in enumerate(ids_np):
                entry = (ids_to_text(row, self.tokenizer, self.pad_id,
                                     self.special_ids.get("bos_id"),
                                     self.special_ids.get("eos_id")),
                         row.tolist())
                if with_confidence:
                    entry = entry + (
                        float(conf[i]) if conf is not None else
                        utterance_confidence(row, np.asarray(p[i]),
                                             self.pad_id, self.special_ids),)
                out.append(entry)
            return out

        def finalize():
            try:
                return pull(outs)
            except Exception as e:  # noqa: BLE001 — native-result fallback
                if native is None or (b, n) not in self._modules:
                    raise
                self._demote_native((b, n), e)
                return pull(self._modules[(b, n)].call(*call_args))

        return finalize

    def _demote_native(self, bucket: Tuple[int, int], err: Exception) -> None:
        import warnings

        self.native.pop(bucket, None)
        if bucket not in self._modules:
            raise RuntimeError(
                f"native-only bucket {bucket} failed with no StableHLO "
                f"fallback module") from err
        warnings.warn(
            f"native module for bucket {bucket} failed ({err}); bucket "
            "demoted to its StableHLO module", stacklevel=3)

    def transcribe(self, wave, lengths=None, seed: int = 0) -> List[str]:
        return [t for t, _ in
                self.transcribe_with_ids(wave, lengths, seed=seed)]
