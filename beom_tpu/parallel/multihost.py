"""Multihost bootstrap and gather helpers (SURVEY.md §6 "distributed
communication backend": intra-slice collectives ride ICI, cross-host
bootstrap and out-of-slice traffic ride DCN).

On a pod slice each host runs the same program; `init()` wires them into
one JAX runtime (DCN rendezvous), after which `jax.devices()` spans the
whole slice and parallel/mesh.make_mesh builds the global ('y','x')
mesh exactly as in the single-host case — nothing else in the framework
changes, which is the point of doing all distribution through
shard_map + NamedSharding.

Single-host (and the sandbox) skip init() entirely; every helper
degrades to a no-op.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU-pod auto-detection.

    With no arguments, TPU pod environments self-configure from the
    metadata server; explicit args support GPU/CPU clusters and tests.
    Safe to skip on a single host.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def is_primary() -> bool:
    return jax.process_index() == 0


def gather_to_host(x) -> Optional[np.ndarray]:
    """Fetch a (possibly sharded) global array to process 0.

    Returns the full ndarray on the primary process, None elsewhere.
    Used by io/snapshots for full-state restart dumps; per-shard
    snapshot files (each host writes its addressable shards) are the
    scalable alternative for very large grids.
    """
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(x)
    g = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(g) if is_primary() else None
