"""Mesh + sharding helpers."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a device mesh. Default: 1-D 'data' mesh over all local devices.

    `shape` splits devices over multiple axes, e.g. shape=(4, 2),
    axis_names=('data', 'model') for dp x tp.
    """
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def mesh_from_spec(spec: str) -> Mesh:
    """Parse a user-facing mesh spec like 'seq=4' or 'data=2,seq=4' into a
    Mesh over local devices (row-major: first axis is outermost). The CLI
    surface for multi-chip serving — e.g. `mirage.py --mesh seq=4` runs
    the outer diffusion stage sequence-parallel over 4 chips."""
    axes, sizes = [], []
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        name, eq, val = part.partition("=")
        if not eq or not val.strip().isdigit() or int(val) < 1:
            raise ValueError(
                f"bad mesh spec {spec!r}: expected 'axis=N[,axis=N...]', "
                f"got component {part!r}")
        axes.append(name.strip())
        sizes.append(int(val))
    if not axes:
        raise ValueError(f"empty mesh spec {spec!r}")
    need = int(np.prod(sizes))
    have = len(jax.devices())
    if need > have:
        raise ValueError(
            f"mesh spec {spec!r} needs {need} devices, have {have}")
    return make_mesh(n_devices=need, axis_names=tuple(axes),
                     shape=tuple(sizes))


def batch_sharding(mesh: Mesh, axis: str = "data", ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
