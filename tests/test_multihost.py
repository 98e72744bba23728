"""Unit tests for parallel.multihost (env parsing + single-process paths).

The cluster paths themselves need real multi-process jax; what IS testable
on one host: the env-var/no-op decision logic of initialize_distributed,
rank-0 gating, HostPrinter, and global_batch_sharding placement on a mesh.
"""
import numpy as np
import pytest

import jax

from audio_algebra_tpu.parallel import make_mesh
from audio_algebra_tpu.parallel.multihost import (
    initialize_distributed, is_main_process, HostPrinter,
    global_batch_sharding)


def test_initialize_noop_without_env(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False


def test_initialize_noop_single_process(monkeypatch):
    # a coordinator with num_processes=1 must not try to start a cluster
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    assert initialize_distributed() is False


def test_initialize_explicit_args_override_env(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    # explicit num_processes=1 wins over the env's 4 -> no-op
    assert initialize_distributed(num_processes=1) is False


def test_is_main_process_and_hostprinter(capsys):
    assert is_main_process() is True   # single-process run
    HostPrinter("pfx")("hello")
    assert "hello" in capsys.readouterr().out


def test_global_batch_sharding_places_on_mesh():
    mesh = make_mesh(n_devices=8)
    place = global_batch_sharding(mesh, per_host_batch=16)
    arr = place(np.arange(16 * 3, dtype=np.float32).reshape(16, 3))
    assert arr.shape == (16, 3)
    # sharded over the data axis: each device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(2, 3)}
    np.testing.assert_allclose(np.asarray(arr)[3],
                               np.arange(9, 12, dtype=np.float32))
