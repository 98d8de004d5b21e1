"""Device mesh construction (SURVEY.md §3 C20, §6 distributed backend).

A 2-D `jax.sharding.Mesh` with axes ('y', 'x') matching the grid axes;
fields (nz, ny, nx) are sharded P(None, 'y', 'x') — layers always local
(SURVEY.md §3 parallelism checklist).  Multihost runs call
`jax.distributed.initialize()` before `make_mesh` so jax.devices() spans
the pod slice; intra-slice traffic then rides ICI, bootstrap over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from beom_tpu.core.config import Config
from beom_tpu.core.state import State

SPEC2 = P("y", "x")
SPEC3 = P(None, "y", "x")


def make_mesh(mesh_y: int, mesh_x: int,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = jax.devices() if devices is None else list(devices)
    n = mesh_y * mesh_x
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(mesh_y, mesh_x)
    return Mesh(arr, axis_names=("y", "x"))


def spec_for(a) -> P:
    return SPEC3 if a.ndim == 3 else SPEC2


def shard_state(state: State, mesh: Mesh) -> State:
    """Place State arrays on the mesh: (nz, ny, nx) -> P(None, 'y', 'x')."""
    def put(a):
        if a.ndim >= 2:
            return jax.device_put(a, NamedSharding(mesh, spec_for(a)))
        return jax.device_put(a, NamedSharding(mesh, P()))
    return jax.tree.map(put, state)


def shard_pytree(tree, mesh: Mesh):
    """Shard every array field in a Grid/Forcing pytree.

    2-D (ny, nx) and 3-D (nz|nc, ny, nx) fields go P(..., 'y', 'x');
    anything else is replicated.
    """
    def put(a):
        if a.ndim == 3:
            return jax.device_put(a, NamedSharding(mesh, SPEC3))
        if a.ndim == 2:
            return jax.device_put(a, NamedSharding(mesh, SPEC2))
        return jax.device_put(a, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)
