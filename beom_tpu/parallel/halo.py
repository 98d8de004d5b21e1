"""Halo exchange over the device mesh (SURVEY.md §3 C21, §4.2).

Two-phase neighbour exchange with `lax.ppermute` (compiles to ICI
point-to-point on TPU): pad y first, then pad x on the y-padded array so
the corner halos are carried for free.  The mesh wraps (periodic), which
matches the periodic-roll operator convention of core/ops.py — physical
walls come from the mask, so a wrapped halo never transports signal
across land.

Everything here runs *inside* `shard_map`: arrays are local shard
blocks (..., ny_l, nx_l), axis names refer to the ('y', 'x') mesh.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax import lax

# pad2d implementation selector, applied at *trace* time (the choice is
# static program structure): 'ppermute' (XLA collectives, the default)
# or 'rdma' (one Pallas kernel per exchange, parallel/rdma_halo.py).
_PAD_IMPL = "ppermute"


@contextlib.contextmanager
def impl(name: str):
    """Select the halo implementation while tracing (see
    dist.make_dist_stepper, which applies Config.halo_impl)."""
    global _PAD_IMPL
    if name not in ("ppermute", "rdma"):
        raise ValueError(f"unknown halo impl {name!r}")
    old, _PAD_IMPL = _PAD_IMPL, name
    try:
        yield
    finally:
        _PAD_IMPL = old


def _ring_perm(axis_name: str, up: bool):
    n = lax.axis_size(axis_name)
    if up:       # data moves to the next-higher index (wraps)
        return [(i, (i + 1) % n) for i in range(n)]
    return [((i + 1) % n, i) for i in range(n)]


def pad_axis(a, w: int, axis: int, axis_name: str):
    """Pad local block with w neighbour cells on each side along `axis`."""
    if w == 0:
        return a
    n = lax.axis_size(axis_name)
    lo = lax.slice_in_dim(a, 0, w, axis=axis)                 # my low edge
    hi = lax.slice_in_dim(a, a.shape[axis] - w, a.shape[axis], axis=axis)
    if n == 1:
        # single shard along this axis: halo is my own wrap (periodic)
        return jnp.concatenate([hi, a, lo], axis=axis)
    from_low = lax.ppermute(hi, axis_name, _ring_perm(axis_name, up=True))
    from_high = lax.ppermute(lo, axis_name, _ring_perm(axis_name, up=False))
    return jnp.concatenate([from_low, a, from_high], axis=axis)


def pad2d(a, w: int):
    """Halo-pad the trailing (y, x) axes: y phase then x phase (corners
    ride the x phase of the already-y-padded block)."""
    if _PAD_IMPL == "rdma" and w > 0:
        from beom_tpu.parallel.rdma_halo import rdma_pad2d
        return rdma_pad2d(a, w)
    a = pad_axis(a, w, axis=a.ndim - 2, axis_name="y")
    a = pad_axis(a, w, axis=a.ndim - 1, axis_name="x")
    return a


def crop2d(a, w: int):
    """Drop the w-wide halo ring from the trailing (y, x) axes."""
    if w == 0:
        return a
    return a[..., w:-w, w:-w]


def psum2(x):
    """Global scalar sum over the full ('y', 'x') mesh."""
    return lax.psum(x, ("y", "x"))


def dist_dot(a, b):
    """Global dot product of *unpadded* local blocks (CG reductions)."""
    return psum2(jnp.sum(a * b))


def dist_dots(pairs):
    """Batched global dots with ONE psum of the stacked partial sums —
    the whole CG iteration's reduction traffic in a single allreduce
    (SURVEY.md §8 hard part 2; solvers/elliptic.cg_solve `dots`)."""
    return psum2(jnp.stack([jnp.sum(a * b) for a, b in pairs]))
