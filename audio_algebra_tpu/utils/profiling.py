"""Tracing / profiling helpers.

The reference had no profiling beyond %%time magics and tqdm bars
(SURVEY.md §5). Here: `trace()` wraps jax.profiler for TensorBoard-viewable
device traces, `StepTimer` gives EMA-smoothed step timing with proper
device synchronisation (value fetch — block_until_ready returns early on
the axon relay, measured), and `flops_estimate` reads XLA's cost analysis
for a jitted function.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


def enable_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at a stable directory.

    VERDICT r2 item 4: the MIRAGE/serve cold-start paid 290 s (bf16) /
    97 s (int8) of XLA compile on EVERY process start because only
    bench.py wired the cache. Every long-lived entrypoint (serve.py,
    mirage.py, the trainers) calls this at startup so a restart reuses
    the previous process's compiles (seconds instead of minutes).
    Resolution order: explicit arg > $AA_COMPILE_CACHE > the repo-root
    .jax_cache (shared with bench.py and tests/conftest.py)."""
    import os
    import pathlib
    if cache_dir is None:
        cache_dir = os.environ.get("AA_COMPILE_CACHE")
    if cache_dir is None:
        cache_dir = str(pathlib.Path(__file__).resolve().parents[2]
                        / ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir


def wait_for_backend(retries: int = 5, delay_s: float = 30.0,
                     configure_cache: bool = True):
    """Initialise the JAX backend with bounded retries.

    The axon relay intermittently refuses backend setup with a transient
    "UNAVAILABLE: TPU backend setup/compile error" on first contact
    (observed killing whole bench runs) — retry a few times before giving
    up so one hiccup doesn't void a measurement. Also points the
    persistent compilation cache at the repo (identical shapes then
    compile in seconds on reruns). One shared helper: bench.py,
    tools/bench_mirage.py and tools/profile.py all need the same rule."""
    import sys
    if configure_cache:
        enable_compile_cache()
    for attempt in range(retries + 1):
        try:
            return jax.devices()
        except RuntimeError as e:
            if attempt == retries:
                raise
            print(f"# backend init failed ({e}); retry "
                  f"{attempt + 1}/{retries} in {delay_s:.0f}s",
                  file=sys.stderr)
            time.sleep(delay_s)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Device trace context: view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(value) -> float:
    """Force real completion by fetching a scalar from the device."""
    leaf = jax.tree_util.tree_leaves(value)[0]
    return float(jnp.ravel(leaf)[0])


class StepTimer:
    """EMA step timer with device sync. Usage:
        with timer.step(out_arr): ...   # or timer.tick(out_arr)
    """

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0 = time.time()

    def tick(self, sync_value=None) -> float:
        if sync_value is not None:
            sync(sync_value)
        dt = time.time() - self._t0
        self._t0 = time.time()
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt

    def rate(self, units_per_step: float = 1.0) -> float:
        return units_per_step / self.avg if self.avg else 0.0


def flops_estimate(jitted_fn, *args) -> Optional[float]:
    """XLA cost-analysis FLOPs for a jitted function at given args."""
    try:
        lowered = jitted_fn.lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None
