"""HTTP serving endpoint (audio_algebra_tpu/serve.py) — end-to-end over a
real socket with the tiny CLAPDAE config (CPU; random weights)."""
import http.client
import io
import json
import threading
import wave

import numpy as np
import pytest

from audio_algebra_tpu.given_models import CLAPDAE
from audio_algebra_tpu.serve import MirageService, encode_wav, make_server

from test_given_models import TINY_CLAPDAE


@pytest.fixture(scope="module")
def server():
    model = CLAPDAE(**TINY_CLAPDAE)
    model.demo_samples = 4096
    service = MirageService(model=model, model_choice="tiny", verbose=False)
    srv = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv.server_address
    srv.shutdown()


def _conn(addr):
    return http.client.HTTPConnection(addr[0], addr[1], timeout=300)


def test_health(server):
    c = _conn(server)
    c.request("GET", "/health")
    r = c.getresponse()
    assert r.status == 200
    body = json.loads(r.read())
    assert body["ok"] is True and body["model"] == "tiny"


def test_embed_text(server):
    c = _conn(server)
    c.request("POST", "/embed", json.dumps({"text": "a piano melody"}),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 200
    emb = np.asarray(json.loads(r.read())["embedding"])
    assert emb.shape == (1, 1, 512)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-3)


def test_embed_audio_wav(server):
    rng = np.random.default_rng(0)
    wav = encode_wav(np.tanh(rng.standard_normal((2, 4096))) * 0.5, 48000)
    c = _conn(server)
    c.request("POST", "/embed", wav, {"Content-Type": "audio/wav"})
    r = c.getresponse()
    assert r.status == 200
    emb = np.asarray(json.loads(r.read())["embedding"])
    assert emb.shape == (1, 1, 512)


def test_embed_audio_flac_sniffed(server):
    """FLAC bytes posted with a generic content type: magic sniffing must
    route them through the native FLAC decoder."""
    import io
    from audio_algebra_tpu.utils import audio_io
    from audio_algebra_tpu.utils.flac_write import write_flac
    if audio_io._native_lib() is None:
        import pytest
        pytest.skip("native codec not built")
    import tempfile, os
    rng = np.random.default_rng(1)
    x = np.tanh(rng.standard_normal((2, 4096))).astype(np.float32) * 0.5
    with tempfile.NamedTemporaryFile(suffix=".flac", delete=False) as f:
        path = f.name
    try:
        write_flac(path, x, 48000)
        data = open(path, "rb").read()
    finally:
        os.unlink(path)
    c = _conn(server)
    c.request("POST", "/embed", data, {"Content-Type": "application/octet-stream"})
    r = c.getresponse()
    assert r.status == 200
    emb = np.asarray(json.loads(r.read())["embedding"])
    assert emb.shape == (1, 1, 512)


def test_generate_returns_playable_wav(server):
    c = _conn(server)
    spec = {"text": ["warm pad", "icy pad"], "interp": 0.25,
            "steps": 2, "outer_steps": 2, "cfg_scale": 2.0, "seed": 7}
    c.request("POST", "/generate", json.dumps(spec),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    info = json.loads(r.getheader("X-Generate-Info"))
    raw = r.read()
    with wave.open(io.BytesIO(raw)) as w:
        assert w.getframerate() == 48000
        assert w.getnchannels() == 2
        frames = w.getnframes()
    assert frames == info["samples"] > 0
    pcm = np.frombuffer(raw[-frames * 4:], "<i2")
    assert np.isfinite(pcm).all() and np.abs(pcm).max() <= 32767


def test_generate_with_init_audio(server):
    """img2img path: base64 WAV init audio -> resample/loop -> latents ->
    partial-noise generation (reference mirage.py:392-409)."""
    import base64
    rng = np.random.default_rng(3)
    wav = encode_wav(np.tanh(rng.standard_normal((2, 2048))) * 0.5, 48000)
    spec = {"text": ["warm pad"], "steps": 2, "outer_steps": 2,
            "init_audio_b64": base64.b64encode(wav).decode(),
            "init_strength": 0.5}
    c = _conn(server)
    c.request("POST", "/generate", json.dumps(spec),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 200
    with wave.open(io.BytesIO(r.read())) as w:
        assert w.getnframes() > 0


def test_micro_batching_coalesces_concurrent_requests():
    """4 concurrent same-config requests must run as ONE padded generate
    (the TPU serving win: per-item throughput at batch 4 ~2.7x batch 1),
    each request getting an independent sample."""
    model = CLAPDAE(**TINY_CLAPDAE)
    model.demo_samples = 4096
    service = MirageService(model=model, model_choice="tiny", verbose=False,
                            batch_window_s=0.5, max_batch=8)
    e = np.zeros(512)
    e[3] = 1.0
    spec = {"embeddings": [e.tolist()], "steps": 2, "outer_steps": 2}
    results, errors = [None] * 4, []

    def worker(i):
        try:
            results[i] = service.generate_wav(dict(spec))
        except Exception as exc:             # surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors
    assert all(r is not None for r in results)
    assert service.batcher.coalesced_requests == 4
    assert service.batcher.batched_runs <= 2     # one run, two if racy
    # distinct noise slots -> distinct audio per request
    pcms = [np.frombuffer(r[0][44:], "<i2") for r in results]
    assert any(not np.array_equal(pcms[0], p) for p in pcms[1:])
    h = service.health()
    assert h["coalesced_requests"] == 4 and h["requests_served"] == 4
    # a seeded request bypasses the batcher (reproducibility contract)
    before = service.batcher.coalesced_requests
    service.generate_wav({"embeddings": [e.tolist()], "steps": 2,
                          "outer_steps": 2, "seed": 11})
    assert service.batcher.coalesced_requests == before


def test_generate_algebra_and_errors(server):
    c = _conn(server)
    # weighted algebra over precomputed embeddings: no model embed needed
    e1 = np.zeros(512); e1[0] = 1.0
    e2 = np.zeros(512); e2[1] = 1.0
    spec = {"embeddings": [e1.tolist(), e2.tolist()],
            "weights": [1.0, -0.5], "algebra": True,
            "steps": 2, "outer_steps": 2}
    c.request("POST", "/generate", json.dumps(spec),
              {"Content-Type": "application/json"})
    r0 = c.getresponse()
    assert r0.status == 200
    r0.read()
    # no prompt at all -> 400, server stays alive
    c2 = _conn(server)
    c2.request("POST", "/generate", json.dumps({"steps": 2}),
               {"Content-Type": "application/json"})
    r = c2.getresponse()
    assert r.status == 400
    assert "no prompt" in json.loads(r.read())["error"]
    c3 = _conn(server)
    c3.request("GET", "/health")
    assert c3.getresponse().status == 200


def test_gui_page(server):
    """GET / serves the dependency-free HTML GUI (the reference's Gradio
    Blocks role, reference mirage.py:520-651)."""
    c = _conn(server)
    c.request("GET", "/")
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type", "").startswith("text/html")
    page = r.read().decode()
    for needle in ("MIRAGE", "/generate", "algebra", "init_audio_b64"):
        assert needle in page


def test_init_audio_mp3_and_mono(server):
    """Init audio decodes by CONTENT, not by an assumed .wav extension
    (the GUI file input accepts audio/*), and mono init audio duplicates
    to stereo before the 2-channel latent encoder (the CLI path's
    unpack_audio_tup contract)."""
    import base64
    from pathlib import Path
    mp3 = (Path(__file__).resolve().parent.parent / "examples"
           / "guitar_dry.mp3").read_bytes()
    for b64 in (base64.b64encode(mp3).decode(),
                base64.b64encode(encode_wav(
                    np.tanh(np.random.default_rng(5).standard_normal(
                        (1, 2048))) * 0.5, 48000)).decode()):
        spec = {"text": ["warm pad"], "steps": 2, "outer_steps": 2,
                "init_audio_b64": b64, "init_strength": 0.5}
        c = _conn(server)
        c.request("POST", "/generate", json.dumps(spec),
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 200, r.read()
        with wave.open(io.BytesIO(r.read())) as w:
            assert w.getnframes() > 0


def test_init_strength_one_returns_audio(server):
    """init_strength=1.0 (the GUI input's max) truncates the resample
    schedule to NOTHING — the init latents pass through instead of
    raising IndexError."""
    import base64
    wav = encode_wav(np.tanh(np.random.default_rng(6).standard_normal(
        (2, 2048))) * 0.5, 48000)
    spec = {"text": ["warm pad"], "steps": 2, "outer_steps": 2,
            "init_audio_b64": base64.b64encode(wav).decode(),
            "init_strength": 1.0}
    c = _conn(server)
    c.request("POST", "/generate", json.dumps(spec),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 200, r.read()
    with wave.open(io.BytesIO(r.read())) as w:
        assert w.getnframes() > 0


def test_generate_rejects_out_of_range_params(server):
    """Sampler params are validated BEFORE compiling anything: each
    distinct value is a fresh XLA program in a never-evicted cache, so
    out-of-range values are a 400, not a compile."""
    bad = [{"steps": 0}, {"steps": 10_000}, {"outer_steps": 0},
           {"batch_size": 99}, {"cfg_scale": float("nan")}]
    for extra in bad:
        spec = {"text": ["x"], "steps": 2, "outer_steps": 2, **extra}
        c = _conn(server)
        c.request("POST", "/generate", json.dumps(spec),
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 400, (extra, r.read())
        assert "out of range" in json.loads(r.read())["error"]


def test_basic_auth(monkeypatch):
    """MIRAGE_USERNAME/MIRAGE_PASSWORD (the reference GUI's env contract,
    reference mirage.py:639) gate every route except /health."""
    import base64
    monkeypatch.setenv("MIRAGE_USERNAME", "alice")
    monkeypatch.setenv("MIRAGE_PASSWORD", "s3cret")
    model = CLAPDAE(**TINY_CLAPDAE)
    model.demo_samples = 4096
    service = MirageService(model=model, model_choice="tiny", verbose=False)
    srv = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        addr = srv.server_address
        c = _conn(addr)
        c.request("GET", "/health")         # probes stay open
        assert c.getresponse().status == 200
        c2 = _conn(addr)
        c2.request("GET", "/")
        r = c2.getresponse()
        assert r.status == 401
        assert r.getheader("WWW-Authenticate", "").startswith("Basic")
        c3 = _conn(addr)
        c3.request("POST", "/embed", json.dumps({"text": "hi"}),
                   {"Content-Type": "application/json"})
        assert c3.getresponse().status == 401
        token = base64.b64encode(b"alice:s3cret").decode()
        c4 = _conn(addr)
        c4.request("POST", "/embed", json.dumps({"text": "hi"}),
                   {"Content-Type": "application/json",
                    "Authorization": f"Basic {token}"})
        assert c4.getresponse().status == 200
    finally:
        srv.shutdown()


def test_health_reports_tokenizer_backend(server):
    c = _conn(server)
    c.request("GET", "/health")
    body = json.loads(c.getresponse().read())
    assert body["text_tokenizer"] in ("bpe", "hf-cache", "byte-fallback")
    assert body["strict_text"] is False


def test_text_fallback_fails_loud():
    """VERDICT r4 item 6: on an asset-less image, text prompts must not
    fail soft — non-strict responses carry a machine-readable
    tokenizer_warning; strict mode refuses with 409 + remediation body."""
    model = CLAPDAE(**TINY_CLAPDAE)
    model.demo_samples = 4096
    for strict in (False, True):
        service = MirageService(model=model, model_choice="tiny",
                                verbose=False, strict_text=strict)
        # force the degraded backend so the test is deterministic whether
        # or not tokenizer assets exist on this machine
        service.tokenizer_backend = "byte-fallback"
        srv = make_server(service, "127.0.0.1", 0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            addr = srv.server_address
            c = _conn(addr)
            c.request("POST", "/embed", json.dumps({"text": "low brass"}),
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            if strict:
                assert r.status == 409
                body = json.loads(r.read())
                assert body["error"] == "text_tokenizer_unavailable"
                assert "fetch_tokenizer" in body["fix"]
            else:
                assert r.status == 200
                body = json.loads(r.read())
                assert "byte-level fallback" in body["tokenizer_warning"]
            c2 = _conn(addr)
            c2.request("POST", "/generate",
                       json.dumps({"text": ["hi"], "steps": 2,
                                   "outer_steps": 2}),
                       {"Content-Type": "application/json"})
            r2 = c2.getresponse()
            if strict:
                assert r2.status == 409
                assert json.loads(r2.read())["error"] == \
                    "text_tokenizer_unavailable"
            else:
                assert r2.status == 200
                info = json.loads(r2.getheader("X-Generate-Info"))
                assert "byte-level fallback" in info["tokenizer_warning"]
                r2.read()
            # embeddings-only requests are unaffected by strictness
            c3 = _conn(addr)
            emb = np.zeros(512); emb[0] = 1.0
            c3.request("POST", "/generate",
                       json.dumps({"embeddings": [emb.tolist()], "steps": 2,
                                   "outer_steps": 2}),
                       {"Content-Type": "application/json"})
            assert c3.getresponse().status == 200
        finally:
            srv.shutdown()


@pytest.mark.slow
def test_serve_with_seq_mesh():
    """VERDICT r4 item 9: the multi-chip latency path is reachable from
    the serving surface — --mesh seq=N routes /generate through
    CLAPDAE.generate_seqpar on a seq-sharded mesh (virtual devices here);
    init-audio requests fall back to the single-program path."""
    model = CLAPDAE(**TINY_CLAPDAE)
    model.demo_samples = 4096
    service = MirageService(model=model, model_choice="tiny", verbose=False,
                            mesh_spec="seq=4")
    assert service.mesh is not None and service.mesh.shape["seq"] == 4
    srv = make_server(service, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        addr = srv.server_address
        c = _conn(addr)
        c.request("GET", "/health")
        assert json.loads(c.getresponse().read())["mesh"] == {"seq": 4}
        emb = np.zeros(512); emb[0] = 1.0
        c2 = _conn(addr)
        c2.request("POST", "/generate",
                   json.dumps({"embeddings": [emb.tolist()], "steps": 2,
                               "outer_steps": 2}),
                   {"Content-Type": "application/json"})
        r = c2.getresponse()
        assert r.status == 200
        wav = r.read()
        assert wav[:4] == b"RIFF" and len(wav) > 1000
        # init-audio falls back to the single-program generate
        import base64
        raw = encode_wav(np.zeros((2, 4096), np.float32), 48000)
        c3 = _conn(addr)
        c3.request("POST", "/generate",
                   json.dumps({"embeddings": [emb.tolist()], "steps": 2,
                               "outer_steps": 2,
                               "init_audio_b64":
                                   base64.b64encode(raw).decode()}),
                   {"Content-Type": "application/json"})
        assert c3.getresponse().status == 200
    finally:
        srv.shutdown()
