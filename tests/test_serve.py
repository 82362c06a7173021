# -*- coding: utf-8 -*-
"""Batching HTTP inference server (serve.py): endpoints, dynamic batching,
result-JSON schema, and fault isolation."""
import json
import os
import sys
import threading
import urllib.request

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from scripts.make_synth_data import main as make

    out = str(tmp_path_factory.mktemp("servesynth"))
    make(["--out", out, "--n", "4", "--seconds", "0.5"])

    # train one checkpoint so the server has weights to load
    import train as train_cli

    train_cli.main([
        "--config", f"{out}/config.yaml", "--device", "cpu",
        "--mesh", "data=4,model=2", "--max-steps-per-epoch", "2",
        "--no-pt-export",
    ])

    import serve

    args = serve.parse_args([
        "--config", f"{out}/config.yaml",
        "--ckpt", f"{out}/ckpts/best_model.orbax",
        "--port", "0",  # ephemeral
        "--max-batch", "4", "--max-wait-ms", "150",
    ])
    srv = serve.build_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, out, srv
    srv.shutdown()
    srv.engine.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read().decode("utf-8"))


def _post(url, data, ctype):
    req = urllib.request.Request(url, data=data, headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode("utf-8"))


def test_healthz(server):
    base, _, _ = server
    code, obj = _get(base + "/healthz")
    assert code == 200 and obj["status"] == "ok"
    assert obj["T_infer"] and obj["r"]


def test_transcribe_upload_and_path(server):
    base, out, _ = server
    wav_path = f"{out}/data/processed/clips/test_000.wav"

    # raw WAV upload
    code, obj = _post(base + "/v1/transcribe", open(wav_path, "rb").read(),
                      "audio/wav")
    assert code == 200, obj
    assert set(obj) >= {"wav", "text", "ids", "T_infer", "r", "greedy",
                        "posterior_mode"}  # reference result schema
    assert isinstance(obj["ids"], list) and obj["ids"]

    # JSON path mode reads the same audio through the file branch.  NOTE:
    # transcripts are NOT comparable across requests — x_T init depends on
    # the engine's rng counter and the padded batch shape (CLAUDE.md) — so
    # pin that the path branch produced a real decode, not its content.
    code2, obj2 = _post(base + "/v1/transcribe",
                        json.dumps({"path": wav_path}).encode(),
                        "application/json")
    assert code2 == 200
    assert obj2["wav"] == wav_path
    assert isinstance(obj2["text"], str)
    assert isinstance(obj2["ids"], list) and obj2["ids"]
    assert obj2["confidence"] == obj2["confidence"]  # finite, not NaN


def test_concurrent_requests_batch(server):
    base, out, srv = server
    before = _get(base + "/stats")[1]["requests"]  # subset-run safe
    paths = [f"{out}/data/processed/clips/test_{i:03d}.wav" for i in range(4)]
    results = [None] * 4

    def call(i):
        results[i] = _post(base + "/v1/transcribe",
                           json.dumps({"path": paths[i]}).encode(),
                           "application/json")

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None and r[0] == 200 for r in results), results

    code, stats = _get(base + "/stats")
    assert code == 200
    assert stats["requests"] - before >= 4
    assert stats["errors"] == 0
    # dynamic batching coalesced at least one multi-request batch
    assert stats["mean_batch_size"] > 1.0 or stats["batches"] < stats["requests"]


def test_sub_frame_audio_is_finite(server, tmp_path):
    """Audio shorter than one conv frame (400 samples) must transcribe
    without NaN: the engine clamps lengths to the 400-sample receptive
    field exactly like inference.py.  Regression: unclamped lengths gave
    the encoder zero valid frames, whose all-masked attention rows
    NaN-poisoned features, transcripts, and confidence (invalid JSON)."""
    import numpy as np
    from fddm_asr_tpu.data.audio_io import save_wav

    base, _, _ = server
    rng = np.random.default_rng(0)
    wav_path = str(tmp_path / "tiny.wav")
    save_wav(wav_path, rng.uniform(-0.1, 0.1, 320).astype(np.float32), 16000)

    code, obj = _post(base + "/v1/transcribe", open(wav_path, "rb").read(),
                      "audio/wav")
    assert code == 200, obj
    # json.loads is strict about NaN only via parse_constant; assert directly
    assert "confidence" in obj and obj["confidence"] == obj["confidence"]
    assert isinstance(obj["text"], str)


def test_bad_request(server):
    base, _, _ = server
    code, obj = _post(base + "/v1/transcribe", b"not a wav", "audio/wav")
    assert code == 400 and "error" in obj


def test_path_mode_restrictions(server):
    """JSON path mode: --audio-root allowlisting and the non-loopback
    lockout (any HTTP client could otherwise read server-side files)."""
    import serve

    base, out, srv = server
    wav_path = f"{out}/data/processed/clips/test_000.wav"
    engine = srv.engine
    echo = {"model": "test"}

    # non-loopback bind without --audio-root: path mode disabled
    handler = serve.make_handler(engine, echo, audio_root=None,
                                 loopback_only_paths=True)
    import http.server
    import threading as th

    s2 = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    th.Thread(target=s2.serve_forever, daemon=True).start()
    b2 = f"http://127.0.0.1:{s2.server_address[1]}"
    try:
        code, obj = _post(b2 + "/v1/transcribe",
                          json.dumps({"path": wav_path}).encode(),
                          "application/json")
        assert code == 403 and "path mode disabled" in obj["error"]
    finally:
        s2.shutdown()

    # audio_root allowlist: inside passes, traversal outside is rejected
    # without leaking filesystem details
    handler = serve.make_handler(engine, echo, audio_root=out)
    s3 = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    th.Thread(target=s3.serve_forever, daemon=True).start()
    b3 = f"http://127.0.0.1:{s3.server_address[1]}"
    try:
        code, obj = _post(b3 + "/v1/transcribe",
                          json.dumps({"path": wav_path}).encode(),
                          "application/json")
        assert code == 200, obj
        sneaky = f"{out}/data/../../../../../etc/passwd"
        code, obj = _post(b3 + "/v1/transcribe",
                          json.dumps({"path": "/etc/passwd"}).encode(),
                          "application/json")
        assert code == 403 and obj["error"] == "path outside --audio-root"
        code, obj = _post(b3 + "/v1/transcribe",
                          json.dumps({"path": sneaky}).encode(),
                          "application/json")
        assert code == 403
        # unreadable path inside the root: generic error, no exception text
        code, obj = _post(b3 + "/v1/transcribe",
                          json.dumps({"path": f"{out}/nope.wav"}).encode(),
                          "application/json")
        assert code == 400 and "could not read audio" in obj["error"]
        assert "nope.wav" not in obj["error"]
    finally:
        s3.shutdown()


def test_long_audio_chunks_and_joins(server):
    """Uploads longer than --max-seconds split into windows that ride the
    batcher; the response joins the chunk texts (reference-style long-form)."""
    base, out, srv = server
    # shrink the engine's window below the 0.5 s test clip so it chunks
    srv.engine.max_samples = int(0.4 * 16000)
    try:
        src = f"{out}/data/processed/clips/test_000.wav"
        body = open(src, "rb").read()  # 0.5 s > 0.4 s window -> 2 chunks
        code, obj = _post(base + "/v1/transcribe", body, "audio/wav")
        assert code == 200, obj
        assert "chunks" in obj and len(obj["chunks"]) == 2
        assert obj["text"] == "".join(obj["chunks"])
        assert obj["chunk_seconds"] == 0.4
    finally:
        srv.engine.max_samples = int(30.0 * 16000)


def test_batch_padding_row_independence(server):
    """The pow-of-two batch-dim padding must not alter real rows: same rng,
    different pad-row content -> identical transcripts for rows 0-2 (device
    rows are independent; compiled-program count is what padding buys)."""
    import numpy as np
    import jax

    _, _, srv = server
    eng = srv.engine
    rng = np.random.default_rng(0)
    real = rng.standard_normal((3, 8000)).astype(np.float32)

    def run(pad_row):
        wave = np.zeros((4, 8000), np.float32)
        wave[:3] = real
        wave[3] = pad_row
        lengths = np.array([8000] * 3 + [1600], np.int64)
        return eng.pipeline.transcribe_with_ids(
            wave, lengths, seq_len=eng.seq_len, rng=jax.random.key(5),
            **eng.sampling)

    a = run(np.zeros(8000, np.float32))
    b = run(rng.standard_normal(8000).astype(np.float32))
    for (ta, ia), (tb, ib) in zip(a[:3], b[:3]):
        assert list(ia) == list(ib) and ta == tb


def test_non_pow2_concurrency(server):
    """3 concurrent requests (padded device batch of 4) all succeed."""
    base, out, srv = server
    paths = [f"{out}/data/processed/clips/test_{i:03d}.wav" for i in range(3)]
    results = [None] * 3

    def call(i):
        results[i] = _post(base + "/v1/transcribe",
                           json.dumps({"path": paths[i]}).encode(),
                           "application/json")

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None and r[0] == 200 for r in results), results


def test_serve_with_mesh_seq_parallel(server):
    """--mesh data=2,model=4 --seq-parallel: a sharded serving engine
    (batch buckets rounded up to the data axis) returns the same greedy
    transcript as a data-parallel-only server.  Both servers are FRESH so
    their engines issue the same rng key to the same padded batch shape
    (Bp=2 via batch_multiple) — sharding must then be numerics-preserving.
    """
    import serve

    _, out, _ = server
    wav_path = f"{out}/data/processed/clips/test_000.wav"

    def run_once(mesh_args):
        args = serve.parse_args([
            "--config", f"{out}/config.yaml",
            "--ckpt", f"{out}/ckpts/best_model.orbax",
            "--port", "0", "--max-batch", "4", "--max-wait-ms", "50",
        ] + mesh_args)
        srv2 = serve.build_server(args)
        t = threading.Thread(target=srv2.serve_forever, daemon=True)
        t.start()
        try:
            base2 = f"http://127.0.0.1:{srv2.server_address[1]}"
            code, obj = _post(base2 + "/v1/transcribe",
                              json.dumps({"path": wav_path}).encode(),
                              "application/json")
            assert code == 200, obj
            _, stats = _get(base2 + "/stats")
            assert stats["batches"] >= 1
            return obj
        finally:
            srv2.shutdown()
            srv2.engine.shutdown()

    want = run_once(["--mesh", "data=2,model=1"])
    got = run_once(["--mesh", "data=2,model=4", "--seq-parallel"])
    assert got["ids"] == want["ids"]


def test_batch_multiple_must_divide_max_batch():
    import serve

    with pytest.raises(ValueError, match="multiple of the mesh"):
        serve.BatchingEngine(None, {}, 8, max_batch=6, batch_multiple=4)


def test_bucket_batch_size_respects_batch_multiple():
    """Non-power-of-two data axes (e.g. 3): every bucketed batch size must
    divide by batch_multiple AND stay within max_batch."""
    import serve

    eng = serve.BatchingEngine(None, {}, 8, max_batch=6, batch_multiple=3)
    try:
        sizes = {n: eng._bucket_batch_size(n) for n in range(1, 7)}
        assert all(s % 3 == 0 and s <= 6 and s >= n
                   for n, s in sizes.items()), sizes
        assert sizes[1] == 3 and sizes[4] == 6 and sizes[6] == 6

        eng2 = serve.BatchingEngine(None, {}, 8, max_batch=16, batch_multiple=1)
        assert [eng2._bucket_batch_size(n) for n in (1, 2, 3, 5, 9)] == \
            [1, 2, 4, 8, 16]
    finally:
        eng.shutdown()
        eng2.shutdown()


def test_bench_serve_script(server, capsys):
    """scripts/bench_serve.py produces the serving-benchmark JSON line with
    perfect batch coalescing under closed-loop load."""
    from scripts.bench_serve import main as bench_main

    _, out, _ = server
    bench_main([
        "--config", f"{out}/config.yaml",
        "--ckpt", f"{out}/ckpts/best_model.orbax",
        "--duration-s", "2", "--audio-seconds", "0.5",
        "--T-infer", "4", "--r", "2", "--seq-len", "8",
        "--repeats", "2", "--concurrency-sweep", "1,2",
    ])
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()[-2:]]
    # knee curve: one row per offered concurrency, each the median of
    # --repeats measured windows with the per-window wait covariate
    assert [r["offered_concurrency"] for r in rows] == [1, 2]
    for res in rows:
        assert res["metric"] == "serve_rtfx" and res["value"] > 0
        assert res["errors"] == 0 and res["requests"] > 0
        assert res["latency_ms"]["p95"] > 0
        assert len(res["windows"]) == 2
        assert res["value"] == sorted(res["windows"])[1]  # median
        assert len(res["window_wait_ms"]) == 2


def test_bench_serve_stream(server, capsys):
    """scripts/bench_serve.py --stream: the duplex streaming bench reports
    RTFx plus the live-audio latencies (first partial, post-EOS final)."""
    from scripts.bench_serve import main as bench_main

    _, out, _ = server
    bench_main([
        "--config", f"{out}/config.yaml",
        "--ckpt", f"{out}/ckpts/best_model.orbax",
        "--concurrency", "2", "--duration-s", "4", "--audio-seconds", "1.0",
        "--stream", "--window-seconds", "0.4", "--chunk-ms", "50",
        "--T-infer", "4", "--r", "2", "--seq-len", "8",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["metric"] == "serve_stream_rtfx" and res["value"] > 0
    assert res["errors"] == 0, res
    assert res["streams"] > 0
    # 1.0 s at a 0.4 s window must commit >= 1 partial before the tail
    assert res["partials_per_stream"] >= 1
    assert res["first_partial_ms"]["p50"] > 0
    assert res["final_after_eos_ms"]["p95"] > 0


def test_stream_client_cli(server, capsys):
    """scripts/stream_client.py: paced duplex upload against a live server,
    partials printed as NDJSON lines, final aggregate returned."""
    from scripts.stream_client import main as client_main

    base, out, srv = server
    wav = f"{out}/data/processed/clips/test_000.wav"
    srv.engine.max_samples = int(0.3 * 16000)  # 0.5 s clip -> 2 windows
    try:
        final = client_main(["--url", base, "--wav", wav,
                             "--pace", "0", "--chunk-ms", "50"])
    finally:
        srv.engine.max_samples = int(30.0 * 16000)
    captured = capsys.readouterr()
    lines = [json.loads(l) for l in captured.out.splitlines() if l.strip()]
    assert lines, "no NDJSON lines printed"
    assert "error" not in final, final
    assert lines[-1] == final  # last printed line IS the aggregate
    assert final["text"] == "".join(final["chunks"])
    summary = json.loads(captured.err.strip().splitlines()[-1])
    assert summary["partials"] >= 1
    assert summary["final_after_eos_ms"] > 0


def test_serve_num_candidates(server):
    """--num-candidates on the live server: best-of-N per request, the
    result echoes num_candidates, and exported serving rejects the flag."""
    import threading

    import numpy as np
    import pytest

    import serve

    _, out, _ = server
    args = serve.parse_args([
        "--config", f"{out}/config.yaml",
        "--ckpt", f"{out}/ckpts/best_model.orbax",
        "--port", "0", "--max-batch", "4", "--max-wait-ms", "5",
        "--num-candidates", "2",
    ])
    srv = serve.build_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        wave = (np.random.default_rng(0).standard_normal(8000) * 0.1
                ).astype(np.float32)
        res = srv.engine.submit(wave, "x.wav")
        assert "error" not in res, res
        assert res["num_candidates"] == 2
        assert 0.0 <= res["confidence"] <= 1.0
    finally:
        srv.shutdown()
        srv.engine.shutdown()

    bad = serve.parse_args(["--exported", "/nonexistent", "--port", "0",
                            "--num-candidates", "2"])
    with pytest.raises(SystemExit, match="num-candidates"):
        serve.build_server(bad)


def test_streaming_long_form(server):
    """POST /v1/transcribe?stream=1: NDJSON — one line per long-form window
    as it completes (chunk_index/chunk_count tags), final line = the exact
    aggregate the non-streaming path returns."""
    import numpy as np

    base, out, srv = server
    srv.engine.max_samples = int(0.4 * 16000)
    try:
        src = f"{out}/data/processed/clips/test_000.wav"
        body = open(src, "rb").read()  # 0.5 s > 0.4 s window -> 2 chunks
        req = urllib.request.Request(
            base + "/v1/transcribe?stream=1", data=body,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith(
                "application/x-ndjson")
            lines = [json.loads(l) for l in
                     r.read().decode("utf-8").splitlines() if l.strip()]
        assert len(lines) == 3  # 2 window partials + 1 aggregate
        partials, final = lines[:-1], lines[-1]
        for i, p in enumerate(partials):
            assert p["chunk_index"] == i and p["chunk_count"] == 2
            assert isinstance(p["text"], str)
        assert "error" not in final
        assert final["chunks"] == [p["text"] for p in partials]
        assert final["text"] == "".join(final["chunks"])

        # short upload: one tagged partial + the plain single result
        short = np.zeros(3200, np.float32)
        import io
        import struct
        pcm = (short * 32767).astype("<i2")
        hdr = (b"RIFF" + struct.pack("<I", 36 + pcm.nbytes) + b"WAVEfmt "
               + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
               + b"data" + struct.pack("<I", pcm.nbytes))
        req = urllib.request.Request(
            base + "/v1/transcribe?stream=1", data=hdr + pcm.tobytes(),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=300) as r:
            lines = [json.loads(l) for l in
                     r.read().decode("utf-8").splitlines() if l.strip()]
        assert len(lines) == 2
        assert lines[0]["chunk_index"] == 0 and lines[0]["chunk_count"] == 1
        assert "chunk_index" not in lines[1]
        assert lines[1]["text"] == lines[0]["text"]
    finally:
        srv.engine.max_samples = int(30.0 * 16000)


def test_pcm_stream_decoder():
    """Incremental PCM decode must survive network chunks splitting samples
    mid-byte and reject unknown formats."""
    import numpy as np

    import serve

    rng = np.random.default_rng(0)
    f = rng.uniform(-1, 1, 1001).astype(np.float32)

    dec = serve._PcmStreamDecoder("f32")
    raw = f.tobytes()
    parts = [raw[:7], raw[7:7], raw[7:4000], raw[4000:]]  # odd splits + empty
    out = np.concatenate([dec.decode(p) for p in parts])
    assert out.shape == f.shape and np.array_equal(out, f)
    assert dec._carry == b""

    i = (f * 32767).astype("<i2")
    dec = serve._PcmStreamDecoder("pcm16")
    raw = i.tobytes()
    out = np.concatenate([dec.decode(raw[:3]), dec.decode(raw[3:])])
    assert np.array_equal(out, i.astype(np.float32) / 32768.0)

    with pytest.raises(ValueError, match="unsupported stream format"):
        serve._PcmStreamDecoder("mp3")


def _fake_engine(serve, **kw):
    """Engine over a no-device fake pipeline (echoes per-row markers)."""

    class Fake:
        use_condition_mask = True

        def transcribe_with_ids(self, wave, lengths=None, seq_len=None,
                                rng=None, with_confidence=False, **_):
            return [("x", [1], 1.0)] * wave.shape[0]

    kw.setdefault("max_wait_ms", 1)
    return serve.BatchingEngine(Fake(), {"T_infer": 4, "r": 2}, 8,
                                max_batch=4, **kw)


def test_streaming_session_chunks_match_offline_plan():
    """A fully-fed StreamingSession must commit byte-identical chunks to
    the offline plan_silence_chunks cut of the whole recording, regardless
    of how the audio was split across feed() calls — streaming and batch
    ingestion then ride identical device requests."""
    import numpy as np

    import serve
    from fddm_asr_tpu.data.audio_io import plan_silence_chunks

    rng = np.random.default_rng(1)
    wave = rng.uniform(-0.5, 0.5, 50_000).astype(np.float32)
    # carve silent pauses so the cut search has real minima to find
    for s in (9_000, 21_500, 34_000, 44_800):
        wave[s:s + 700] *= 0.001

    win = 16_000
    eng = _fake_engine(serve, max_seconds=win / 16000.0)
    try:
        sess = serve.StreamingSession(eng, "live")
        assert sess.win == win
        # feed in awkward pieces (incl. empty) — cuts are stream-absolute
        pieces = np.split(wave, [1, 3_333, 3_333, 17_000, 17_401, 40_007])
        for p in pieces:
            sess.feed(p)
        outs = list(sess.finish())
        spans = plan_silence_chunks(wave, win)
        assert len(sess._reqs) == len(spans)
        for req, (s, e) in zip(sess._reqs, spans):
            assert np.array_equal(req.wave, wave[s:e])
        # NDJSON contract: one tagged partial per window + the aggregate
        assert len(outs) == len(spans) + 1
        for i, p in enumerate(outs[:-1]):
            assert p["chunk_index"] == i and p["chunk_count"] == len(spans)
        final = outs[-1]
        assert final["wav"] == "live" and "error" not in final
        assert final["chunks"] == [p["text"] for p in outs[:-1]]
        assert [r.name for r in sess._reqs] == \
            [f"live#chunk{i}" for i in range(len(spans))]
    finally:
        eng.shutdown()


def test_streaming_session_single_window_and_lifecycle():
    """Short audio: one plain-named request, aggregate == its result;
    feed() after finish() raises; window_seconds clamps to the engine's."""
    import numpy as np

    import serve

    eng = _fake_engine(serve, max_seconds=1.0)
    try:
        sess = serve.StreamingSession(eng, "short")
        sess.feed(np.zeros(3000, np.float32))
        assert list(sess.poll()) == []  # nothing committed below one window
        outs = list(sess.finish())
        assert len(outs) == 2
        assert outs[0]["chunk_index"] == 0 and outs[0]["chunk_count"] == 1
        assert outs[1]["wav"] == "short" and "chunks" not in outs[1]
        assert sess._reqs[0].name == "short"  # single chunk: plain name
        with pytest.raises(RuntimeError, match="finish"):
            sess.feed(np.zeros(10, np.float32))

        # clamps: above the engine window, and to the 2-frame floor
        assert serve.StreamingSession(eng, "a", window_seconds=99).win == \
            eng.max_samples
        assert serve.StreamingSession(eng, "b", window_seconds=0.001).win == 800
    finally:
        eng.shutdown()


def test_streaming_session_error_and_window_contract():
    """A window error surfaces exactly ONCE, as finish()'s aggregate (the
    submit_stream contract): poll() yields no partials past it and feed()
    stops committing.  The multi-chunk aggregate's chunk_seconds reflects
    the SESSION window, not the engine max."""
    import numpy as np

    import serve

    # engine max 30 s, session window 0.5 s: aggregate must say 0.5
    eng = _fake_engine(serve, max_seconds=30.0)
    try:
        sess = serve.StreamingSession(eng, "w", window_seconds=0.5)
        sess.feed(np.zeros(int(1.7 * 16000), np.float32))
        outs = list(sess.finish())
        assert len(outs) >= 3 and "chunks" in outs[-1]
        assert outs[-1]["chunk_seconds"] == pytest.approx(0.5)
    finally:
        eng.shutdown()

    # a shut-down engine fails requests at enqueue — deterministic errors
    eng = _fake_engine(serve, max_seconds=0.5)
    eng.shutdown()
    sess = serve.StreamingSession(eng, "e")
    sess.feed(np.zeros(3 * 8000 + 100, np.float32))
    assert list(sess.poll()) == []          # error swallowed, not a partial
    assert sess._errored
    n_before = len(sess._reqs)
    sess.feed(np.zeros(3 * 8000, np.float32))
    assert len(sess._reqs) == n_before      # no new device work
    outs = list(sess.finish())
    assert len(outs) == 1 and outs[0]["error"]


def test_stream_endpoint_malformed_chunk_framing(server):
    """A garbage chunk-size line mid-upload must surface an in-band
    'stream aborted' NDJSON error line with a terminated chunked response —
    not a hung thread or a traceback-truncated stream."""
    import socket as socket_mod

    base, _, _ = server
    host, port = base.split("//")[1].split(":")
    s = socket_mod.create_connection((host, int(port)), timeout=120)
    try:
        s.sendall(
            b"POST /v1/transcribe/stream?format=pcm16 HTTP/1.1\r\n"
            b"Host: x\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"10\r\n" + b"\x00" * 16 + b"\r\n"
            b"zz\r\n"  # malformed size line
        )
        buf = b""
        while b"0\r\n\r\n" not in buf:
            data = s.recv(65536)
            if not data:
                break
            buf += data
        text = buf.decode("utf-8", "replace")
        assert " 200 " in text.splitlines()[0]
        assert "stream aborted" in text and "chunk-size" in text
        assert buf.endswith(b"0\r\n\r\n")  # properly terminated response
    finally:
        s.close()


def test_stream_endpoint_chunked_pcm(server):
    """POST /v1/transcribe/stream with Transfer-Encoding: chunked pcm16:
    NDJSON partials stream back, final line is the aggregate; f32 fixed-
    length bodies and bad formats are covered too."""
    import http.client

    import numpy as np

    base, out, srv = server
    host = base.split("//")[1]
    srv.engine.max_samples = int(0.4 * 16000)  # 0.7 s upload -> 2 windows
    try:
        rng = np.random.default_rng(0)
        wave = (rng.uniform(-0.2, 0.2, int(0.7 * 16000))).astype(np.float32)
        pcm = (wave * 32767).astype("<i2").tobytes()

        def blocks():
            for i in range(0, len(pcm), 3001):  # odd size: splits samples
                yield pcm[i:i + 3001]

        conn = http.client.HTTPConnection(host, timeout=300)
        conn.request("POST", "/v1/transcribe/stream?format=pcm16",
                     body=blocks(), encode_chunked=True)
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("application/x-ndjson")
        lines = [json.loads(l) for l in
                 resp.read().decode("utf-8").splitlines() if l.strip()]
        conn.close()
        assert len(lines) == 3, lines  # 2 window partials + aggregate
        for i, p in enumerate(lines[:-1]):
            assert p["chunk_index"] == i and isinstance(p["text"], str)
        final = lines[-1]
        assert "error" not in final, final
        assert final["text"] == "".join(p["text"] for p in lines[:-1])

        # fixed-length f32 body (Content-Length path of the same endpoint)
        body = wave[:4000].tobytes()
        conn = http.client.HTTPConnection(host, timeout=300)
        conn.request("POST", "/v1/transcribe/stream?format=f32", body=body,
                     headers={"Content-Length": str(len(body))})
        resp = conn.getresponse()
        lines = [json.loads(l) for l in
                 resp.read().decode("utf-8").splitlines() if l.strip()]
        conn.close()
        assert resp.status == 200 and len(lines) == 2
        assert lines[0]["chunk_count"] == 1
        assert lines[1]["text"] == lines[0]["text"]

        # unknown format: clean 400, no stream started
        code, obj = _post(base + "/v1/transcribe/stream?format=mp3",
                          b"\x00\x00", "application/octet-stream")
        assert code == 400 and "unsupported stream format" in obj["error"]
    finally:
        srv.engine.max_samples = int(30.0 * 16000)


def test_request_timeout_configurable():
    """request_timeout_s bounds submit()/submit_stream() waits (the first
    request on a fresh flagship server waits out a >600 s remote compile —
    --request-timeout-s raises the ceiling; this pins the plumbing with a
    tiny value and a stalled pipeline)."""
    import time

    import numpy as np

    import serve

    class Stalled:
        use_condition_mask = True

        def transcribe_with_ids(self, *a, **k):
            time.sleep(2.0)
            return []

    eng = serve.BatchingEngine(Stalled(), {}, 8, max_batch=2,
                               max_wait_ms=1, request_timeout_s=0.2)
    try:
        t0 = time.perf_counter()
        res = eng.submit(np.zeros(1600, np.float32), "x.wav")
        assert "timed out" in res.get("error", ""), res
        assert time.perf_counter() - t0 < 1.5
        out = list(eng.submit_stream(np.zeros(1600, np.float32), "y.wav"))
        assert len(out) == 1 and "timed out" in out[0]["error"]
    finally:
        eng.shutdown()


def test_warmup_warms_every_bucket_and_confidence_program():
    """_warmup must mirror _dispatch: one call per batch-bucket level with
    with_confidence=True (the device-confidence program is jitted separately
    from the sampler — warming only the sampler leaves a remote compile
    mid-traffic) and raw int seeds for takes_seed adapters (AOT exported
    servers, which also run warmup now)."""
    import numpy as np

    import serve

    calls = []

    class Recorder:
        use_condition_mask = True
        takes_seed = True  # exported-adapter convention: raw int seeds

        def transcribe_with_ids(self, wave, lengths=None, seq_len=None,
                                rng=None, with_confidence=False, **_):
            calls.append((wave.shape, with_confidence, rng))
            return [("", [0], 0.0)] * wave.shape[0]

    eng = serve.BatchingEngine(Recorder(), {}, 8, max_batch=8, max_wait_ms=1)
    try:
        serve._warmup(eng, "1", 8)
    finally:
        eng.shutdown()
    assert [c[0][0] for c in calls] == [1, 2, 4, 8]  # every bucket level
    assert all(c[1] is True for c in calls)          # confidence program too
    assert all(isinstance(c[2], int) for c in calls)  # raw seed, not PRNG key
    # warmed shapes registered: the loop must not treat them as cold
    assert {(b, 16000) for b in (1, 2, 4, 8)} <= eng._warm_shapes
    assert eng._rng_counter == 0  # transcripts comparable to unwarmed server


def test_cold_shape_dispatch_does_not_block_ready_results():
    """Dispatching a COLD (B, T) shape blocks in trace + remote compile —
    the loop must answer a finished in-flight batch FIRST instead of
    head-of-line blocking its clients behind the new shape's compile."""
    import time

    import numpy as np

    import serve

    seen = set()

    class ColdCompilePipeline:
        use_condition_mask = True

        def transcribe_with_ids_async(self, wave, lengths=None, seq_len=None,
                                      rng=None, with_confidence=False, **_):
            if wave.shape not in seen:   # "remote XLA compile" per new shape
                seen.add(wave.shape)
                time.sleep(2.0)
            rows = [("ok", [1], 1.0)] * wave.shape[0]
            return lambda: rows

    eng = serve.BatchingEngine(ColdCompilePipeline(), {}, 8, max_batch=2,
                               max_wait_ms=1, bucket_seconds=1.0)
    try:
        r1 = eng._plan_requests(np.zeros(1600, np.float32), "a.wav")
        eng._enqueue(r1)          # dispatch blocks ~2 s in the cold compile
        time.sleep(0.3)
        # arrives mid-compile; different duration bucket -> another cold shape
        r2 = eng._plan_requests(np.zeros(17000, np.float32), "b.wav")
        eng._enqueue(r2)
        # r1's results are ready the moment its dispatch returns (t ~= 2.0 s);
        # without the cold-shape check the loop would dispatch r2's shape
        # first and r1 would wait out BOTH compiles (~4 s)
        assert r1[0].done.wait(timeout=3.2), \
            "ready batch head-of-line blocked behind a cold-shape compile"
        assert r2[0].done.wait(timeout=5.0)
        snap = eng.stats_snapshot()
        assert snap["requests"] == 2 and snap["errors"] == 0
    finally:
        eng.shutdown()


def test_pipeline_depth_overlaps_and_preserves_results():
    """pipeline_depth=3: up to 3 batches ride the device at once (dispatch
    overlap observed), every request still gets its own correct result, and
    finalize order follows dispatch order."""
    import threading
    import time

    import numpy as np

    import serve

    inflight = {"now": 0, "max": 0}
    lock = threading.Lock()

    class SlowPipeline:
        use_condition_mask = True

        def transcribe_with_ids_async(self, wave, lengths=None, seq_len=None,
                                      rng=None, with_confidence=False, **_):
            # device work simulated by the ASYNC window: dispatch returns
            # immediately, finalize blocks 80 ms later
            with lock:
                inflight["now"] += 1
                inflight["max"] = max(inflight["max"], inflight["now"])
            marks = [float(wave[i].sum()) for i in range(wave.shape[0])]
            t_done = time.perf_counter() + 0.08

            def fin():
                delay = t_done - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)
                with lock:
                    inflight["now"] -= 1
                return [(f"m{m:.0f}", [int(m)], 1.0) for m in marks]

            return fin

    eng = serve.BatchingEngine(SlowPipeline(), {"T_infer": 4, "r": 2}, 8,
                               max_batch=1, max_wait_ms=1, pipeline_depth=3)
    try:
        results = {}

        def client(i):
            wave = np.full(1600, 1.0, np.float32) * i
            results[i] = eng.submit(wave, f"u{i}.wav", timeout_s=20)

        # max_batch=1 forces one batch per request -> the loop must pipeline
        # across batches to overlap the 80 ms "device" windows
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(1, 13)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(1, 13):
            assert results[i]["text"] == f"m{1600 * i}", results[i]
        assert inflight["max"] >= 3, \
            f"expected >=3 overlapping batches, saw {inflight['max']}"
        snap = eng.stats_snapshot()
        assert snap["requests"] == 12 and snap["errors"] == 0
    finally:
        eng.shutdown()
