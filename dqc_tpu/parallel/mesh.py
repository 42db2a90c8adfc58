"""Device-mesh management and sharding helpers.

The reference has no distributed execution at all (SURVEY §2.10); this module
is the TPU-native scale-out layer designed from the workload's own axes:

  dp   — batch of molecules (neural-XC training, geometry screening)
  grid — quadrature points (the long axis: 1e5-1e6 points; XC work is
         pointwise + one psum, the ring-attention-shaped axis here)
  tp   — tensor parallelism over the density-fitting auxiliary dimension
         (naux ~ 3-5x nao): each device holds a j3c slab, the fitted
         coefficients/Coulomb assembly reduce with one psum over ICI

Usage: `with use_mesh(make_mesh(...)):` around jitted calls; the XC
integration layer consults the active mesh and applies sharding constraints
on the grid axis so XLA partitions AO evaluation/density work across
devices and inserts the psum for energies.
"""
from __future__ import annotations

import contextlib
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(n_dp: int = 1, n_grid: int = 1, n_tp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_dp * n_grid * n_tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(n_dp, n_grid, n_tp)
    return Mesh(arr, axis_names=("dp", "grid", "tp"))


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        with mesh:
            yield mesh
    finally:
        _ACTIVE_MESH = prev


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def shard_axis(x, name: str, axis: int = 0):
    """Apply a sharding constraint binding array axis `axis` to mesh axis
    `name` (no-op without an active mesh or when the mesh lacks the axis)."""
    mesh = _ACTIVE_MESH
    if mesh is None or name not in mesh.axis_names:
        return x
    spec = [None] * x.ndim
    spec[axis] = name
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def shard_grid_axis(x, axis: int = 0):
    """Sharding constraint over the 'grid' mesh axis (see shard_axis)."""
    return shard_axis(x, "grid", axis)


def replicated(x):
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P()))
