"""Audio IO + chunking (host boundary).

The reference delegated file IO to aeiou.load_audio -> torchaudio's C++
(ffmpeg/libsndfile) backends (reference datasets.py:17, Destructo.ipynb
cell 15). This environment ships neither, so the native work item lives
here: WAV PCM/float via a zero-dependency numpy codec, and MP3 via the
in-repo C++ decoder (native/audio_codec.cpp) loaded over ctypes. Decoded
audio is resampled on device with ops.resample.

`batch_it_crazy` reproduces aeiou.core.batch_it_crazy's contract (chop an
arbitrary-length signal into a batch of fixed-size chunks, zero-padding the
tail) — it is how the Destructo demo batches long files (cell 17).
"""
from __future__ import annotations

import ctypes
import os
import struct
import wave
from pathlib import Path

import numpy as np

_NATIVE = None


def _native_lib():
    """Load the C++ codec library (built from native/), or None."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    here = Path(__file__).resolve().parents[2] / "native" / "libaacodec.so"
    for cand in (here, Path(__file__).resolve().parents[1] / "native" / "libaacodec.so"):
        if cand.exists():
            lib = ctypes.CDLL(str(cand))
            lib.aa_decode_mp3.restype = ctypes.c_longlong
            lib.aa_decode_mp3.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.aa_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            try:
                lib.aa_decode_batch.restype = ctypes.c_int
                lib.aa_decode_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                    ctypes.POINTER(ctypes.c_longlong),
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ]
            except AttributeError:      # older .so without the batch entry
                pass
            _NATIVE = lib
            return lib
    return None


# ------------------------------------------------------------------- WAV ---

def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 array (channels, frames), sample_rate).

    Handles 8/16/24/32-bit PCM and IEEE float32 (format tag 3) — the wave
    stdlib module plus manual 24-bit/float unpacking.
    """
    path = os.path.expanduser(str(path))
    with open(path, "rb") as f:
        header = f.read(12)
        if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
            raise ValueError(f"not a RIFF/WAVE file: {path}")
        fmt_tag, channels, sr, sampwidth = None, None, None, None
        data = None
        while True:
            chunk_hdr = f.read(8)
            if len(chunk_hdr) < 8:
                break
            cid, csize = chunk_hdr[:4], struct.unpack("<I", chunk_hdr[4:])[0]
            payload = f.read(csize + (csize & 1))[:csize]
            if cid == b"fmt ":
                fmt_tag, channels, sr = struct.unpack("<HHI", payload[:8])
                sampwidth = struct.unpack("<H", payload[14:16])[0] // 8
                if fmt_tag == 0xFFFE and csize >= 40:  # WAVE_FORMAT_EXTENSIBLE
                    fmt_tag = struct.unpack("<H", payload[24:26])[0]
            elif cid == b"data":
                data = payload
        if data is None or fmt_tag is None:
            raise ValueError(f"malformed WAV (missing fmt/data): {path}")

    if fmt_tag == 3 and sampwidth == 4:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif fmt_tag == 1 and sampwidth == 2:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif fmt_tag == 1 and sampwidth == 4:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif fmt_tag == 1 and sampwidth == 3:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        ints = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        x = ints.astype(np.float32) / 8388608.0
    elif fmt_tag == 1 and sampwidth == 1:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV format tag={fmt_tag} width={sampwidth}")
    x = x.reshape(-1, channels).T.copy()
    return x, sr


def write_wav(path: str, audio: np.ndarray, sample_rate: int, subtype: str = "pcm16") -> None:
    """Write (channels, frames) float32 in [-1,1] as WAV (pcm16 or float32)."""
    path = os.path.expanduser(str(path))
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    frames = audio.T  # (N, C)
    if subtype == "pcm16":
        with wave.open(path, "wb") as w:
            w.setnchannels(frames.shape[1])
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            pcm = np.clip(frames, -1.0, 1.0)
            w.writeframes(np.round(pcm * 32767.0).astype("<i2").tobytes())
    elif subtype == "float32":
        data = frames.astype("<f4").tobytes()
        n_ch, byte_rate = frames.shape[1], sample_rate * frames.shape[1] * 4
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, n_ch, sample_rate, byte_rate, n_ch * 4, 32))
            f.write(b"data" + struct.pack("<I", len(data)) + data)
    else:
        raise ValueError(f"unknown subtype {subtype!r}")


def _native_decode(entry: str, path: str, kind: str) -> tuple[np.ndarray, int]:
    """Call a native `(path, float**, int*, int*) -> frames` decode entry."""
    lib = _native_lib()
    if lib is None or not hasattr(lib, entry):
        raise RuntimeError(
            f"{kind} decoding requires the native codec: run `make -C native` "
            "to build libaacodec.so"
        )
    fn = getattr(lib, entry)
    fn.restype = ctypes.c_longlong
    fn.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    buf = ctypes.POINTER(ctypes.c_float)()
    ch, sr = ctypes.c_int(0), ctypes.c_int(0)
    n = fn(path.encode(), ctypes.byref(buf), ctypes.byref(ch), ctypes.byref(sr))
    if n <= 0:
        raise ValueError(f"{kind} decode failed ({n}): {path}")
    arr = np.ctypeslib.as_array(buf, shape=(int(n) * ch.value,)).reshape(int(n), ch.value).T.copy()
    lib.aa_free(buf)
    return arr.astype(np.float32), sr.value


def decode_mp3(path: str) -> tuple[np.ndarray, int]:
    """Decode an MP3 via the native C++ decoder -> ((C, N) float32, sr)."""
    return _native_decode("aa_decode_mp3", path, "MP3")


def decode_flac(path: str) -> tuple[np.ndarray, int]:
    """Decode FLAC via the from-scratch native decoder (flac_decoder.cpp)."""
    return _native_decode("aa_read_flac", path, "FLAC")


def decode_ogg(path: str) -> tuple[np.ndarray, int]:
    """Decode OGG/Vorbis via the dlopen'd libvorbisfile (vorbis_codec.cpp)."""
    return _native_decode("aa_decode_ogg", path, "OGG")


def encode_ogg(path: str, audio: np.ndarray, sample_rate: int,
               quality: float = 0.4) -> None:
    """Encode (C, N) float32 in [-1,1] as OGG/Vorbis via libvorbisenc."""
    lib = _native_lib()
    if lib is None or not hasattr(lib, "aa_encode_ogg"):
        raise RuntimeError("OGG encoding requires the native codec")
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    interleaved = np.ascontiguousarray(audio.T, dtype=np.float32)
    lib.aa_encode_ogg.restype = ctypes.c_int
    lib.aa_encode_ogg.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
    ]
    rc = lib.aa_encode_ogg(
        str(path).encode(),
        interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        interleaved.shape[0], audio.shape[0], sample_rate, quality)
    if rc != 0:
        raise ValueError(f"ogg encode failed ({rc}): {path}")


def decode_batch(paths, num_threads: int = 0):
    """Decode many files in ONE native call on a C++ thread pool (the
    native data-loader primitive: the GIL is released for the whole batch,
    unlike per-file ctypes calls). Returns a list aligned with `paths` of
    ((C, N) float32, sr) or None for files that failed.

    Falls back to sequential Python decode when the native library (or its
    batch entry point) is unavailable.
    """
    paths = [os.path.expanduser(str(p)) for p in paths]
    lib = _native_lib()
    if lib is None or not hasattr(lib, "aa_decode_batch"):
        out = []
        for p in paths:
            try:
                out.append(load_audio_raw(p))
            except Exception:
                out.append(None)
        return out
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    bufs = (ctypes.POINTER(ctypes.c_float) * n)()
    frames = (ctypes.c_longlong * n)()
    chans = (ctypes.c_int * n)()
    rates = (ctypes.c_int * n)()
    lib.aa_decode_batch(c_paths, n, num_threads, bufs, frames, chans, rates)
    out = []
    for i in range(n):
        if frames[i] <= 0 or not bufs[i]:
            out.append(None)
            continue
        total = int(frames[i]) * chans[i]
        arr = np.ctypeslib.as_array(bufs[i], shape=(total,)) \
            .reshape(int(frames[i]), chans[i]).T.copy()
        lib.aa_free(bufs[i])
        out.append((arr.astype(np.float32), rates[i]))
    return out


def load_audio_raw(path: str):
    """Read a file at its native rate -> ((C, N) float32, sr)."""
    ext = Path(str(path)).suffix.lower()
    if ext == ".mp3":
        return decode_mp3(str(path))
    if ext == ".flac":
        return decode_flac(str(path))
    if ext in (".ogg", ".oga"):
        return decode_ogg(str(path))
    return read_wav(str(path))


# ----------------------------------------------------------- load_audio ---

def load_audio(path: str, sr: int = 48000, verbose: bool = False) -> np.ndarray:
    """aeiou.load_audio-equivalent: read file, resample to `sr` -> (C, N) f32."""
    path = os.path.expanduser(str(path))
    ext = Path(path).suffix.lower()
    if ext == ".mp3":
        audio, in_sr = decode_mp3(path)
    elif ext in (".wav", ".wave"):
        audio, in_sr = read_wav(path)
    elif ext == ".flac":
        audio, in_sr = decode_flac(path)
    elif ext in (".ogg", ".oga"):
        audio, in_sr = decode_ogg(path)
    else:
        raise ValueError(f"unsupported audio format: {ext}")
    if in_sr != sr:
        if verbose:
            print(f"load_audio: resampling {path} {in_sr} -> {sr}")
        # host-side numpy resample: file lengths are arbitrary, so a device
        # resample would compile one XLA program per length
        from ..ops.resample import resample_np

        audio = resample_np(audio, in_sr, sr)
    return audio


def save_audio(path: str, audio, sample_rate: int) -> None:
    """Write audio, format picked by extension (the reference's
    torchaudio.save use): .wav -> 16-bit PCM, .flac -> the pure-Python
    FLAC encoder, .ogg -> Vorbis via the native codec."""
    ext = Path(str(path)).suffix.lower()
    if ext == ".flac":
        from .flac_write import write_flac

        write_flac(path, np.asarray(audio), sample_rate)
    elif ext in (".ogg", ".oga"):
        encode_ogg(path, np.asarray(audio), sample_rate)
    else:
        write_wav(path, np.asarray(audio), sample_rate, subtype="pcm16")


# ------------------------------------------------------------- chunking ---

def batch_it_crazy(x, chunk_size: int, max_batch_size: int | None = None) -> np.ndarray:
    """Chop (C, N) or (N,) into a batch (B, C, chunk_size), zero-padding the
    tail chunk (aeiou.core.batch_it_crazy contract; Destructo.ipynb cell 17).
    """
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[None, :]
    c, n = x.shape
    n_chunks = max(1, int(np.ceil(n / chunk_size)))
    padded = np.zeros((c, n_chunks * chunk_size), dtype=np.float32)
    padded[:, :n] = x[:, : n_chunks * chunk_size]
    batch = padded.reshape(c, n_chunks, chunk_size).transpose(1, 0, 2)
    if max_batch_size is not None:
        batch = batch[:max_batch_size]
    return batch


def crossfade_flatten(fakes, sr: int = 48000, fade_secs: float = 1.5, fade_type: str = "sine"):
    """Flatten a batch (B, C, N) to (C, ~B*N) with equal-power crossfades.

    Reference mirage.py:189-206: stitches batched generations into one take;
    fade_type in {'sine','linear','sqrt'}.
    """
    fakes = np.asarray(fakes, dtype=np.float32)
    b, c, n = fakes.shape
    if b == 1:
        return fakes[0]
    ov = min(int(fade_secs * sr), n // 2)
    ramp = np.linspace(0.0, 1.0, ov, dtype=np.float32)
    if fade_type == "sine":
        fade_in = np.sin(0.5 * np.pi * ramp)
    elif fade_type == "sqrt":
        fade_in = np.sqrt(ramp)
    else:
        fade_in = ramp
    fade_out = fade_in[::-1]

    total = b * n - (b - 1) * ov
    out = np.zeros((c, total), dtype=np.float32)
    pos = 0
    for i in range(b):
        seg = fakes[i].copy()
        if i > 0:
            seg[:, :ov] *= fade_in
        if i < b - 1:
            seg[:, -ov:] *= fade_out
        out[:, pos : pos + n] += seg
        pos += n - ov
    return out
