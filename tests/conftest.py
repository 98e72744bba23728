"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip hardware isn't available in CI; sharding tests run on a virtual
8-device CPU mesh (the driver separately dry-runs the multi-chip path).
These env vars must be set before jax initialises.
"""
import os

# The image's sitecustomize imports jax before conftest runs, so env vars are
# too late for jax's import-time config read — use config.update instead.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib  # noqa: E402
import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compilation cache: model/wrapper compiles dominate suite
# time; cached runs cut the slow half from minutes to seconds.
_cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The native codec .so is deliberately NOT committed (unreviewable binary);
# build it on demand so codec tests run everywhere the toolchain exists.
_native = pathlib.Path(__file__).resolve().parents[1] / "native"
if not (_native / "libaacodec.so").exists():
    subprocess.run(["make", "-C", str(_native)], check=False,
                   capture_output=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
