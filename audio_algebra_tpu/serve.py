"""MIRAGE serving — a dependency-free HTTP endpoint around CLAPDAE.

The reference serves MIRAGE through a Gradio Blocks GUI plus basic-auth
`launch()` (reference mirage.py:520-651) — a heavyweight interactive stack.
This module is the production serving surface of the rebuild: a stdlib
`ThreadingHTTPServer` wrapping ONE warm `CLAPDAE`, with requests serialized
onto the single chip by a lock. All jit programs are cached per shape, so
steady-state latency is exactly the `generate()` wall time recorded in
BASELINE.md (6.1-6.5x realtime bf16 / 7.1-7.4x turbo at batch 1-8 on one
v5e; restarts cost minutes — see docs/performance.md "Cold start"). Set
MIRAGE_USERNAME + MIRAGE_PASSWORD to require basic auth on every route
except /health (the reference GUI's auth contract, mirage.py:639).

Endpoints:
  GET  /          -> dependency-free HTML GUI (prompt boxes, slerp/algebra
                     controls, init-audio upload, inline player — the
                     reference's Gradio Blocks role)
  GET  /health    -> {"ok": true, "model": "22s", "sample_size": N, ...}
  POST /embed     -> {"text": "..."} JSON, or WAV/MP3 bytes with an audio/*
                     Content-Type -> {"embedding": [[[...512 floats]]]}
  POST /generate  -> JSON spec -> 16-bit PCM WAV bytes (48 kHz stereo)

Generate spec (all keys optional except at least one prompt source):
  {"text": ["low brass"],              # text prompt(s), CLAP-embedded
   "embeddings": [[...512 floats]],    # pre-computed unit embeddings
   "weights": [1.0, -0.5],             # algebra weights (with "algebra")
   "algebra": false,                   # weighted-sum vs slerp combine
   "interp": 0.5,                      # slerp t (two+ prompts, no algebra)
   "cfg_scale": 4.0, "steps": 150, "outer_steps": 100,
   "batch_size": 1, "seed": -1,
   "init_audio_b64": "<base64 WAV>",    # img2img init (loop-repeated)
   "init_strength": 0.4}

The embed/combine semantics mirror `mirage.process_audio` (reference
mirage.py:255-453): slerp interpolation between prompts by default, or the
renormalized weighted sum ("AUDIO ALLLLGEEEBRRAA", reference :375-381).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import tempfile
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

__all__ = ["MirageService", "TokenizerUnavailable", "make_server", "main"]


class TokenizerUnavailable(RuntimeError):
    """Text prompt refused: no RoBERTa tokenizer assets and the service is
    in strict-text mode (AA_STRICT_TEXT=1 / --strict-text). Maps to HTTP
    409 with a remediation body — byte-fallback embeddings are
    confidently-wrong audio, which a strict deployment must not serve."""


def _sniff_suffix(data: bytes) -> str:
    """Pick the loader extension from the magic bytes: RIFF/WAVE -> .wav,
    fLaC -> .flac, OggS -> .ogg, anything else (ID3 tag or bare MPEG
    sync) -> .mp3. The GUI file input accepts audio/* and posts raw
    bytes, so the extension must come from the content, not the route."""
    magic = data[:4]
    if magic == b"RIFF":
        return ".wav"
    if magic == b"fLaC":
        return ".flac"
    if magic == b"OggS":
        return ".ogg"
    return ".mp3"


def _decode_audio_bytes(data: bytes, suffix: Optional[str] = None
                        ) -> np.ndarray:
    """Posted audio bytes -> (C, N) float32 at 48 kHz via the repo loader
    (WAV + MP3 through the native codec). One shared path for /embed and
    the init-audio decode so fixes can't drift between them."""
    from audio_algebra_tpu.utils.audio_io import load_audio
    with tempfile.NamedTemporaryFile(suffix=suffix or _sniff_suffix(data),
                                     delete=False) as f:
        f.write(data)
        path = f.name
    try:
        return load_audio(path, sr=48000)
    finally:
        os.unlink(path)


def encode_wav(audio: np.ndarray, sample_rate: int = 48000) -> bytes:
    """(C, N) float audio -> 16-bit PCM WAV bytes (stdlib only)."""
    a = np.asarray(audio, np.float32)
    if a.ndim == 1:
        a = a[None]
    pcm = (np.clip(a, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.T.tobytes())           # interleave channels
    return buf.getvalue()


_GUI_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>MIRAGE</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:680px;margin:2rem auto;
      padding:0 1rem;color:#222}
 h1{font-weight:600} fieldset{border:1px solid #ccc;border-radius:8px;
      margin:0 0 1rem;padding:.75rem 1rem}
 label{display:block;margin:.4rem 0 .15rem;font-size:.85rem;color:#555}
 input[type=text],input[type=number]{width:100%;box-sizing:border-box;
      padding:.4rem;border:1px solid #bbb;border-radius:6px}
 .row{display:flex;gap:.75rem}.row>div{flex:1}
 button{padding:.55rem 1.4rem;border:0;border-radius:8px;background:#333;
      color:#fff;font-size:1rem;cursor:pointer}
 button:disabled{background:#999}
 audio{width:100%;margin-top:1rem}
 #status{margin-left:1rem;color:#777;font-size:.9rem}
</style></head><body>
<h1>MIRAGE &mdash; text-to-audio algebra</h1>
<p>Browser front-end for the <code>/generate</code> endpoint (the
reference app's Gradio GUI, rebuilt dependency-free).</p>
<fieldset><legend>Prompts</legend>
 <label>Prompt A</label><input type="text" id="pa" value="low brass">
 <label>Prompt B (optional; slerp or algebra)</label>
 <input type="text" id="pb" value="">
 <div class="row">
  <div><label>Interp t (slerp)</label>
   <input type="number" id="interp" value="0.5" step="0.05" min="0" max="1"></div>
  <div><label><input type="checkbox" id="algebra"> weighted algebra</label>
   <label>Weights (comma-sep)</label>
   <input type="text" id="weights" value="1.0, -0.5"></div>
 </div>
</fieldset>
<fieldset><legend>Sampler</legend>
 <div class="row">
  <div><label>Inner steps</label><input type="number" id="steps" value="150"></div>
  <div><label>Outer steps</label><input type="number" id="outer" value="100"></div>
  <div><label>CFG scale</label><input type="number" id="cfg" value="4.0" step="0.5"></div>
  <div><label>Variations</label><input type="number" id="bs" value="1" min="1" max="8"></div>
 </div>
 <label>Init audio (optional, img2img)</label>
 <input type="file" id="init" accept="audio/*">
 <label>Init strength</label>
 <input type="number" id="strength" value="0.4" step="0.05" min="0" max="1">
</fieldset>
<button id="go">Generate</button><span id="status"></span>
<audio id="out" controls></audio>
<script>
const $=id=>document.getElementById(id);
$('go').onclick=async()=>{
 const spec={text:[$('pa').value], steps:+$('steps').value,
   outer_steps:+$('outer').value, cfg_scale:+$('cfg').value,
   batch_size:+$('bs').value, interp:+$('interp').value};
 if($('pb').value) spec.text.push($('pb').value);
 if($('algebra').checked){spec.algebra=true;
   spec.weights=$('weights').value.split(',').map(Number);}
 const f=$('init').files[0];
 if(f){const u=new Uint8Array(await f.arrayBuffer());let s='';
   for(let i=0;i<u.length;i+=0x8000)
     s+=String.fromCharCode.apply(null,u.subarray(i,i+0x8000));
   spec.init_audio_b64=btoa(s);
   spec.init_strength=+$('strength').value;}
 $('go').disabled=true;$('status').textContent='generating\\u2026';
 try{
  const r=await fetch('/generate',{method:'POST',body:JSON.stringify(spec)});
  if(!r.ok){throw new Error((await r.json()).error)}
  $('out').src=URL.createObjectURL(await r.blob());$('out').play();
  $('status').textContent='done ('+(r.headers.get('X-Generate-Info')||'')+')';
 }catch(e){$('status').textContent='error: '+e.message}
 $('go').disabled=false;
};
</script></body></html>"""


class _Pending:
    """One queued generate request awaiting its micro-batch slot."""

    __slots__ = ("emb", "key", "event", "result", "error")

    def __init__(self, emb, key):
        self.emb = emb
        self.key = key
        self.event = threading.Event()
        self.result = None
        self.error = None


class _MicroBatcher:
    """Coalesce concurrent single-variation /generate requests into one
    padded batch — the TPU serving win: measured per-item throughput at
    batch 4 is ~2.7x batch 1 (BASELINE.md MIRAGE rows), because the
    decode UNet's tiles under-fill below batch 16 and fixed per-step
    overheads amortize. Requests arriving within `window_s` of each other
    whose (steps, outer_steps, cfg_scale) agree run as ONE generate()
    call, padded to a power of two (bounded jit-program count: programs
    exist only for batch {1, 2, 4, 8}); pad slots repeat the last
    embedding and their outputs are discarded. Each slot draws distinct
    noise inside generate(), so coalesced requests get independent
    samples."""

    def __init__(self, service: "MirageService", window_s: float = 0.05,
                 max_batch: int = 8):
        self.service = service
        self.window_s = window_s
        self.max_batch = max_batch
        self.queue: "list[_Pending]" = []
        self.cv = threading.Condition()
        self.batched_runs = 0
        self.coalesced_requests = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, emb: np.ndarray, key: tuple) -> np.ndarray:
        p = _Pending(np.asarray(emb, np.float32).reshape(1, 1, -1), key)
        with self.cv:
            self.queue.append(p)
            self.cv.notify()
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.result

    def _take_group(self) -> "list[_Pending]":
        """Block for work, linger `window_s` for co-batchable arrivals,
        then take the largest same-key group."""
        with self.cv:
            while not self.queue:
                self.cv.wait()
            deadline = time.monotonic() + self.window_s
            while len(self.queue) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self.cv.wait(timeout=remaining):
                    break
            key = self.queue[0].key
            group = [p for p in self.queue if p.key == key][: self.max_batch]
            for p in group:
                self.queue.remove(p)
            return group

    def _loop(self):
        while True:
            group = self._take_group()
            n = len(group)
            pad_n = 1 << (n - 1).bit_length()          # next power of two
            embs = [p.emb for p in group]
            embs += [embs[-1]] * (pad_n - n)
            steps, outer_steps, cfg_scale = group[0].key
            try:
                with self.service.lock:
                    fakes, _ = self.service._model_generate(
                        np.concatenate(embs, axis=0),
                        cfg_scales=cfg_scale, demo_steps=steps,
                        outer_steps=outer_steps, batch_size=pad_n,
                        flatten=False)
                    self.batched_runs += 1
                    self.coalesced_requests += n
                fakes = np.asarray(fakes, np.float32)
                for i, p in enumerate(group):
                    p.result = fakes[i]
            except Exception as e:                     # pragma: no cover
                for p in group:
                    p.error = e
            finally:
                for p in group:
                    p.event.set()


class MirageService:
    """One warm model + a chip lock. `model` is injectable for tests
    (any object with .embed/.generate/.sample_size); by default the
    mirage model cache supplies a full CLAPDAE. `batch_window_s` > 0
    enables request micro-batching (see _MicroBatcher)."""

    def __init__(self, model=None, model_choice: str = "22s",
                 half: bool = True, verbose: bool = True,
                 batch_window_s: float = 0.0, max_batch: int = 8,
                 strict_text: Optional[bool] = None,
                 mesh_spec: Optional[str] = None):
        if model is None:
            from .embedding_math import get_model_ready
            model = get_model_ready(model_choice, verbose=verbose, half=half)
        self.model = model
        self.model_choice = model_choice
        self.lock = threading.Lock()
        self._stats_lock = threading.Lock()   # requests_served is bumped
        self.verbose = verbose                # from concurrent handlers
        self.requests_served = 0
        self.max_batch = max_batch
        # basic auth, same env contract as the reference GUI launch()
        # (reference mirage.py:639): both vars set -> required on every
        # route except /health
        user = os.environ.get("MIRAGE_USERNAME", "")
        pw = os.environ.get("MIRAGE_PASSWORD", "")
        self.auth: Optional[tuple] = (user, pw) if user and pw else None
        self.batcher = (_MicroBatcher(self, batch_window_s, max_batch)
                        if batch_window_s > 0 else None)
        # Multi-chip latency path: with --mesh seq=N the outer diffusion
        # stage runs sequence-parallel over N chips (parallel/infer.py);
        # init-audio requests fall back to the single-program generate.
        self.mesh = None
        if mesh_spec:
            from .parallel import mesh_from_spec
            self.mesh = mesh_from_spec(mesh_spec)
            if "seq" not in self.mesh.axis_names:
                raise ValueError(f"--mesh {mesh_spec!r}: serving shards "
                                 "over a 'seq' axis (e.g. seq=4)")
        # Text-prompt tokenizer status, probed once at startup: on an
        # asset-less image text tokenization silently degrades to byte-level
        # ids (see models/clap.py tokenize), which an HTTP client would never
        # learn from a stdout warning. strict_text=True (or AA_STRICT_TEXT=1)
        # refuses text prompts with 409; default surfaces a machine-readable
        # warning on every affected response instead.
        if strict_text is None:
            strict_text = os.environ.get("AA_STRICT_TEXT", "0") == "1"
        self.strict_text = strict_text
        from .models.clap import tokenizer_backend
        self.tokenizer_backend, self._tok_reason = tokenizer_backend()
        if self.tokenizer_backend == "byte-fallback" and verbose:
            print("serve: WARNING — no RoBERTa tokenizer assets; text "
                  "prompts use byte-level fallback ids (degraded "
                  "embeddings). Vendor assets with tools/fetch_tokenizer.py"
                  + (" [strict: text prompts will be refused with 409]"
                     if strict_text else ""))

    def text_tokenizer_warning(self) -> Optional[str]:
        """None when text tokenization is exact; otherwise the
        machine-readable degradation notice (raises TokenizerUnavailable
        under strict_text)."""
        if self.tokenizer_backend != "byte-fallback":
            return None
        msg = ("text tokenizer unavailable: byte-level fallback ids in use "
               "(text embeddings are semantically degraded). Vendor RoBERTa "
               "vocab.json+merges.txt via tools/fetch_tokenizer.py or set "
               "AA_ROBERTA_VOCAB.")
        if self.strict_text:
            raise TokenizerUnavailable(msg)
        return msg

    def _count_request(self):
        with self._stats_lock:
            self.requests_served += 1

    def _model_generate(self, emb, **kw):
        """One generate call, routed through the sequence-parallel path
        when a mesh is configured (caller holds self.lock). init-audio
        requests stay single-program: the img2img resample isn't sharded."""
        if self.mesh is not None and kw.get("init_audio_latents") is None:
            kw.pop("init_audio_latents", None)
            kw.pop("init_strength", None)
            return self.model.generate_seqpar(emb, self.mesh, axis="seq",
                                              **kw)
        return self.model.generate(emb, **kw)

    # ------------------------------------------------------------ embed ---
    def embed_text(self, text: str) -> np.ndarray:
        with self.lock:
            return np.asarray(self.model.embed(text), np.float32)

    def embed_audio_bytes(self, data: bytes,
                          suffix: Optional[str] = None) -> np.ndarray:
        """Decode posted audio (suffix sniffed from the bytes when not
        forced by Content-Type), embed. Resampling happens in load_audio."""
        audio = _decode_audio_bytes(data, suffix)
        with self.lock:
            return np.asarray(self.model.embed(audio), np.float32)

    def _init_latents_from_bytes(self, data: bytes) -> np.ndarray:
        """Decode audio bytes, loop-repeat to sample_size, encode to
        stage-2 latents (reference mirage.py:392-409)."""
        audio = _decode_audio_bytes(data)
        if audio.shape[0] == 1:
            # mono -> stereo duplication, matching the CLI path (the AE
            # encoder is 2-channel; mirage.unpack_audio_tup does the same)
            audio = np.concatenate([audio, audio], axis=0)
        need = int(self.model.sample_size)
        reps = int(np.ceil(need / audio.shape[-1]))
        looped = np.tile(audio, (1, reps))[:, :need]
        with self.lock:
            return np.asarray(self.model.encode_audio_latents(looped[None]))

    # --------------------------------------------------------- generate ---
    def generate_wav(self, spec: dict) -> tuple[bytes, dict]:
        """Run embed -> combine -> generate -> crossfade; returns
        (wav_bytes, info). Mirrors mirage.process_audio's combine rules."""
        from .embedding_math import (interp_embeddings,
                                     weighted_algebra)
        from audio_algebra_tpu.utils.audio_io import crossfade_flatten

        texts = spec.get("text") or []
        if isinstance(texts, str):
            texts = [texts]
        # strict mode refuses BEFORE any chip work; else carried into info
        tok_warning = (self.text_tokenizer_warning()
                       if any(t for t in texts) else None)
        embeddings = [np.asarray(e, np.float32).reshape(1, 1, -1)
                      for e in spec.get("embeddings") or []]

        with self.lock:
            for t in texts:
                if t:
                    embeddings.append(np.asarray(self.model.embed(t),
                                                 np.float32))
        if not embeddings:
            raise ValueError(
                "no prompt: supply 'text' and/or 'embeddings'")
        if len(embeddings) == 1:
            emb = embeddings[0]
        elif spec.get("algebra"):
            weights = spec.get("weights") or [1.0] * len(embeddings)
            emb = weighted_algebra(embeddings, weights)
        else:
            t = float(spec.get("interp", 0.5))
            emb = interp_embeddings(embeddings[0], embeddings[1], t)
            for extra in embeddings[2:]:
                emb = interp_embeddings(emb, extra, t)

        seed = int(spec.get("seed", -1))
        # validate sampler params: each distinct (steps, shape, cfg) value
        # compiles a fresh XLA program under the chip lock and lives in the
        # jit cache forever, so out-of-range client values are a 400, not a
        # new compile. Ranges match the reference GUI sliders (steps 10-250,
        # mirage.py:588-590) with headroom; batch caps at the reference's
        # max variation batch (mirage.py:696).
        steps = int(spec.get("steps", 150))
        outer_steps = int(spec.get("outer_steps", 100))
        cfg_scale = float(spec.get("cfg_scale", 4.0))
        batch_size = int(spec.get("batch_size", 1))
        if not 1 <= steps <= 500:
            raise ValueError(f"steps={steps} out of range [1, 500]")
        if not 1 <= outer_steps <= 500:
            raise ValueError(f"outer_steps={outer_steps} out of range "
                             f"[1, 500]")
        if not 1 <= batch_size <= self.max_batch:
            raise ValueError(f"batch_size={batch_size} out of range "
                             f"[1, {self.max_batch}]")
        if not (np.isfinite(cfg_scale) and -100.0 <= cfg_scale <= 100.0):
            raise ValueError(f"cfg_scale={cfg_scale} out of range")

        init_latents = None
        if spec.get("init_audio_b64"):
            # img2img: partial-noise init from looping audio (reference
            # mirage.py:392-409); base64 WAV/MP3 in the JSON spec
            import base64
            raw = base64.b64decode(spec["init_audio_b64"])
            init_latents = self._init_latents_from_bytes(raw)

        if (self.batcher is not None and batch_size == 1 and seed < 0
                and init_latents is None):
            # coalescible: one variation, no pinned RNG
            fakes = self.batcher.submit(
                emb, (steps, outer_steps, cfg_scale))[None]
            self._count_request()
        else:
            with self.lock:
                if seed >= 0:
                    import jax
                    from .utils.prng import host_key
                    self.model._key = host_key(seed)
                fakes, _ = self._model_generate(
                    emb, cfg_scales=cfg_scale, demo_steps=steps,
                    outer_steps=outer_steps, batch_size=batch_size,
                    init_audio_latents=init_latents,
                    init_strength=float(spec.get("init_strength", 0.4)),
                    flatten=False)
            self._count_request()

        out = crossfade_flatten(np.asarray(fakes, np.float32))
        info = {"batch_size": int(spec.get("batch_size", 1)),
                "samples": int(out.shape[-1]), "sample_rate": 48000}
        if tok_warning:
            info["tokenizer_warning"] = tok_warning
        return encode_wav(out, 48000), info

    def health(self) -> dict:
        h = {"ok": True, "model": self.model_choice,
             "sample_size": int(getattr(self.model, "sample_size", 0)),
             "requests_served": self.requests_served,
             "text_tokenizer": self.tokenizer_backend,
             "strict_text": self.strict_text}
        if self.mesh is not None:
            h["mesh"] = {a: int(self.mesh.shape[a])
                         for a in self.mesh.axis_names}
        if self.batcher is not None:
            h["batched_runs"] = self.batcher.batched_runs
            h["coalesced_requests"] = self.batcher.coalesced_requests
        return h


def _make_handler(service: MirageService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):     # quiet unless verbose
            if service.verbose:
                super().log_message(fmt, *args)

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _authorized(self) -> bool:
            """Basic auth when MIRAGE_USERNAME/MIRAGE_PASSWORD are set
            (the reference GUI's auth contract, mirage.py:639); /health
            stays open for probes."""
            if service.auth is None or self.path.rstrip("/") == "/health":
                return True
            import base64
            header = self.headers.get("Authorization") or ""
            if header.startswith("Basic "):
                try:
                    got = base64.b64decode(header[6:]).decode()
                except Exception:
                    return False
                user, _, pw = got.partition(":")
                if (user, pw) == service.auth:
                    return True
            self.send_response(401)
            self.send_header("WWW-Authenticate", 'Basic realm="MIRAGE"')
            body = b'{"error": "unauthorized"}'
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return False

        def do_GET(self):
            if not self._authorized():
                return
            if self.path.rstrip("/") == "":
                self._send(200, _GUI_HTML.encode(), "text/html; charset=utf-8")
            elif self.path.rstrip("/") == "/health":
                self._send_json(200, service.health())
            else:
                self._send_json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if not self._authorized():
                return
            n = int(self.headers.get("Content-Length") or 0)
            data = self.rfile.read(n)
            ctype = (self.headers.get("Content-Type") or "").lower()
            try:
                if self.path == "/embed":
                    # audio/* Content-Type, or octet-stream (curl's
                    # default) whose magic is WAV/FLAC/OGG/ID3-tagged MP3
                    has_magic = (data[:4] in (b"RIFF", b"fLaC", b"OggS")
                                 or data[:3] == b"ID3")
                    is_audio = ctype.startswith("audio/") or (
                        not ctype.startswith("application/json") and has_magic)
                    if is_audio:
                        # suffix sniffed from the bytes — Content-Type
                        # subtype lies often enough (audio/* file inputs)
                        emb = service.embed_audio_bytes(data)
                        body = {"embedding": emb.tolist()}
                    else:
                        spec = json.loads(data or b"{}")
                        warn = service.text_tokenizer_warning()  # may 409
                        emb = service.embed_text(str(spec["text"]))
                        body = {"embedding": emb.tolist()}
                        if warn:
                            body["tokenizer_warning"] = warn
                    self._send_json(200, body)
                elif self.path == "/generate":
                    spec = json.loads(data or b"{}")
                    wav, info = service.generate_wav(spec)
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(wav)))
                    self.send_header("X-Generate-Info", json.dumps(info))
                    self.end_headers()
                    self.wfile.write(wav)
                else:
                    self._send_json(404, {"error": f"no route {self.path}"})
            except TokenizerUnavailable as e:
                self._send_json(409, {
                    "error": "text_tokenizer_unavailable",
                    "detail": str(e),
                    "fix": "vendor RoBERTa assets via "
                           "tools/fetch_tokenizer.py (or AA_ROBERTA_VOCAB), "
                           "or serve without --strict-text to accept "
                           "degraded byte-fallback embeddings"})
            except (ValueError, KeyError) as e:
                self._send_json(400, {"error": str(e)})
            except Exception as e:             # surface, don't kill the server
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_server(service: MirageService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Bind (port 0 = ephemeral); caller runs .serve_forever()."""
    return ThreadingHTTPServer((host, port), _make_handler(service))


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description="MIRAGE HTTP serving endpoint")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8950)
    p.add_argument("--model", choices=["22s", "66s"], default="22s")
    p.add_argument("--no-half", action="store_true",
                   help="serve in f32 (default bf16, the app default)")
    p.add_argument("--turbo", action="store_true",
                   help="int8 turbo mode: +13-16%% realtime at every serving "
                        "batch via the int8-in-fold path (~3.4%% rel RMS)")
    p.add_argument("--warmup", action="store_true",
                   help="compile the default-config generate before binding")
    p.add_argument("--batch-window", type=float, default=0.05,
                   help="micro-batching window in seconds (0 disables); "
                        "concurrent same-config requests run as one batch")
    p.add_argument("--max-batch", type=int, default=8,
                   help="micro-batch cap (reference max variation batch)")
    p.add_argument("--mesh", type=str, default=None, metavar="seq=N",
                   help="run the outer diffusion stage sequence-parallel "
                        "over N chips (multi-chip latency serving); "
                        "init-audio requests fall back to single-program")
    p.add_argument("--strict-text", action="store_true",
                   help="refuse text prompts with 409 when no exact "
                        "RoBERTa tokenizer assets are present (default: "
                        "serve with a tokenizer_warning in responses); "
                        "also via AA_STRICT_TEXT=1")
    args = p.parse_args(argv)

    if args.turbo:
        os.environ["AA_TURBO_INT8"] = "1"
    # persistent XLA compile cache: a restarted server reuses the previous
    # process's compiles — seconds instead of the 290 s cold compile
    from audio_algebra_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    service = MirageService(model_choice=args.model, half=not args.no_half,
                            batch_window_s=args.batch_window,
                            max_batch=args.max_batch,
                            strict_text=args.strict_text or None,
                            mesh_spec=args.mesh)
    if args.warmup:
        print("serve: warmup generate (compiles the serving programs)...")
        service.generate_wav({"text": ["warmup"], "steps": 150,
                              "outer_steps": 100, "batch_size": 1})
    server = make_server(service, args.host, args.port)
    if service.auth is None and args.host not in ("127.0.0.1", "localhost",
                                                  "::1"):
        print("serve: WARNING — listening on a non-loopback interface with "
              "no auth; set MIRAGE_USERNAME and MIRAGE_PASSWORD to require "
              "basic auth (the reference GUI's contract)")
    print(f"serve: MIRAGE ({args.model}) listening on "
          f"http://{args.host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
