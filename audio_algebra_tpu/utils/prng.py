"""Host-side PRNG key management for the axon relay.

Why this exists: an EAGER `jax.random.PRNGKey(0)` dispatched to the TPU
through the axon relay measured **388 s** on this image (the relay
compiles the tiny eager threefry seed program server-side and nothing
caches it), while the identical op on the in-process CPU backend takes
0.2 s. Threefry is a deterministic, platform-independent algorithm, so
keys and splits computed on the CPU backend are BIT-IDENTICAL to
device-computed ones — fixed-seed goldens (tests/goldens/generation.json)
are unaffected.

Keys are returned as plain host numpy `(2,) uint32` arrays (the classic
key format): uncommitted, so a jitted TPU function consumes them with an
8-byte transfer, and `np.asarray(key)` in host logic is free instead of a
device round-trip. In-graph random ops (`jax.random.normal` inside jit)
are untouched — those compile into the surrounding program and were never
the problem.
"""
from __future__ import annotations

import functools

import jax
import numpy as np

__all__ = ["host_key", "host_split", "host_fold_in", "host_normal",
           "host_cast"]


@functools.lru_cache(maxsize=1)
def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:        # cpu backend absent: fall back to the default
        return None


def _on_cpu(fn):
    dev = _cpu_device()
    if dev is None:
        out = fn()
    else:
        with jax.default_device(dev):
            out = fn()
    try:
        return np.asarray(out)
    except jax.errors.TracerArrayConversionError:
        # called under a trace (the key became part of the jaxpr): hand the
        # traced value back — the host-side shortcut only applies eagerly
        return out


def _np_or_tracer(x):
    try:
        return np.asarray(x)
    except jax.errors.TracerArrayConversionError:
        return x
    except TypeError:
        # new-style typed key (jax.random.key): np.asarray refuses the
        # opaque key dtype — unwrap to raw uint32 key data, which the CPU
        # split/fold_in accepts and which stays bit-identical
        try:
            return np.asarray(jax.random.key_data(x))
        except jax.errors.TracerArrayConversionError:
            return x


def host_key(seed: int) -> np.ndarray:
    """`jax.random.PRNGKey(seed)` computed on the CPU backend, as numpy."""
    return _on_cpu(lambda: jax.random.PRNGKey(int(seed)))


def host_split(key, num: int = 2) -> np.ndarray:
    """`jax.random.split` on the CPU backend. Accepts numpy or jax keys
    (tracers pass through and stay in-graph); returns a (num, 2) uint32
    numpy array (bit-identical to on-device)."""
    k = _np_or_tracer(key)
    return _on_cpu(lambda: jax.random.split(k, num))


def host_fold_in(key, data: int) -> np.ndarray:
    """`jax.random.fold_in` on the CPU backend, as numpy."""
    k = _np_or_tracer(key)
    return _on_cpu(lambda: jax.random.fold_in(k, int(data)))


def host_normal(key, shape, dtype=None):
    """`jax.random.normal` computed on the CPU backend, returned as numpy.

    Why: an EAGER normal on the axon relay compiles a fresh threefry
    program server-side per process (measured r5: the warm-restart path
    spent minutes re-compiling tiny eager ops even with every big program
    a persistent-cache HIT — .r5_logs/warm_restart.json 290-452 s).
    Threefry is platform-deterministic, so CPU draws are bit-identical;
    a jitted consumer takes the numpy array as a plain transfer. Under a
    trace (tracer key), falls through to the in-graph normal."""
    import jax.numpy as jnp
    k = _np_or_tracer(key)
    if not isinstance(k, np.ndarray):          # tracer: stay in-graph
        return jax.random.normal(key, shape, dtype or jnp.float32)
    out = _on_cpu(lambda: jax.random.normal(
        jnp.asarray(k), shape, dtype or jnp.float32))
    return out


def host_cast(x, dtype):
    """astype computed host-side (no relay compile), returned as UNCOMMITTED
    numpy (bf16 via ml_dtypes) — a committed CPU jax array would change the
    consuming jit's device assignment and therefore its persistent-cache
    key (measured: it forced a fresh compile of the serving programs)."""
    try:
        arr = np.asarray(x)
    except Exception:                           # tracer: stay in-graph
        return x.astype(dtype)
    return arr.astype(np.dtype(jax.numpy.dtype(dtype)))
