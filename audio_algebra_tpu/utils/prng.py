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

__all__ = ["host_key", "host_split", "host_fold_in"]


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
