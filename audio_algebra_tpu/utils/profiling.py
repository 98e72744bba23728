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
