"""Pallas RDMA halo exchange (SURVEY.md §3 C21 — the native tier of the
comm backend; §6 "distributed communication backend").

`rdma_pad2d(a, w)` is a drop-in for halo.pad2d *inside* shard_map over
the ('y', 'x') mesh, implemented as ONE Pallas kernel per exchange
using `pltpu.make_async_remote_copy` (direct ICI RDMA) instead of XLA
`ppermute` + concatenate:

  * the padded block is written in place — no XLA concat materializing
    three copies of the array per padded axis;
  * the two exchange phases (y rows, then full-height x columns so the
    corners ride the x phase, exactly halo.pad2d's convention) run in
    one kernel launch: the x-phase send waits only on the *local*
    y-phase receive — no cross-device barrier between phases;
  * on a single-shard mesh axis the halo is the periodic self-wrap,
    copied locally inside the kernel (matching halo.pad_axis).

A barrier semaphore handshake with the four ring neighbours guards
buffer/semaphore reuse across consecutive launches (the standard Pallas
distributed pattern; `collective_id` in CompilerParams).

Testing: real RDMA needs a multi-chip slice; the Pallas TPU interpreter
(`pltpu.InterpretParams`) simulates cross-device DMA on the 8-virtual-
device CPU mesh, so 1-vs-8-device equivalence runs in plain pytest
(tests/dist/test_rdma_halo.py) — the same seam-coverage strategy as the
ppermute path.  Enable per-run with Config.halo_impl='rdma'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MESH = pltpu.DeviceIdType.MESH


def _halo_kernel(nbr_ref, a_ref, o_ref, send_sem, recv_sem, *,
                 w: int, NY: int, NX: int):
    """nbr_ref: SMEM int32[6] = (my_y, my_x, up, down, right, left) —
    neighbour coordinates are computed *outside* the kernel (the
    interpret-mode vma checker rejects axis arithmetic in-kernel)."""
    L, ly, lx = a_ref.shape
    my_y = nbr_ref[0]
    my_x = nbr_ref[1]
    up = nbr_ref[2]
    down = nbr_ref[3]
    right = nbr_ref[4]
    left = nbr_ref[5]

    # interior
    o_ref[:, w:w + ly, w:w + lx] = a_ref[:]

    # reuse barrier with every RDMA partner
    if NY > 1 or NX > 1:
        barrier = pltpu.get_barrier_semaphore()
        n_sig = 0
        if NY > 1:
            pltpu.semaphore_signal(barrier, device_id=(up, my_x),
                                   device_id_type=_MESH)
            pltpu.semaphore_signal(barrier, device_id=(down, my_x),
                                   device_id_type=_MESH)
            n_sig += 2
        if NX > 1:
            pltpu.semaphore_signal(barrier, device_id=(my_y, right),
                                   device_id_type=_MESH)
            pltpu.semaphore_signal(barrier, device_id=(my_y, left),
                                   device_id_type=_MESH)
            n_sig += 2
        pltpu.semaphore_wait(barrier, n_sig)

    # --- y phase: my edge rows -> neighbours' y-halo rows -------------
    if NY == 1:
        o_ref[:, 0:w, w:w + lx] = a_ref[:, ly - w:ly, :]
        o_ref[:, w + ly:w + ly + w, w:w + lx] = a_ref[:, 0:w, :]
    else:
        # halo.pad_axis: the block above me (index my_y+1) sees my HIGH
        # rows as its low halo, and vice versa
        cp_up = pltpu.make_async_remote_copy(
            a_ref.at[:, pl.ds(ly - w, w), :],
            o_ref.at[:, pl.ds(0, w), pl.ds(w, lx)],
            send_sem.at[0], recv_sem.at[0],
            device_id=(up, my_x), device_id_type=_MESH)
        cp_dn = pltpu.make_async_remote_copy(
            a_ref.at[:, pl.ds(0, w), :],
            o_ref.at[:, pl.ds(w + ly, w), pl.ds(w, lx)],
            send_sem.at[1], recv_sem.at[1],
            device_id=(down, my_x), device_id_type=_MESH)
        cp_up.start()
        cp_dn.start()
        cp_up.wait()
        cp_dn.wait()

    # --- x phase: full-height columns of the y-padded block (corners
    # ride along); source includes the y halos just received, so this
    # send is ordered after the local y-phase wait — no global barrier
    if NX == 1:
        o_ref[:, :, 0:w] = o_ref[:, :, lx:lx + w]
        o_ref[:, :, w + lx:w + lx + w] = o_ref[:, :, w:2 * w]
    else:
        cp_r = pltpu.make_async_remote_copy(
            o_ref.at[:, :, pl.ds(lx, w)],
            o_ref.at[:, :, pl.ds(0, w)],
            send_sem.at[2], recv_sem.at[2],
            device_id=(my_y, right), device_id_type=_MESH)
        cp_l = pltpu.make_async_remote_copy(
            o_ref.at[:, :, pl.ds(w, w)],
            o_ref.at[:, :, pl.ds(w + lx, w)],
            send_sem.at[3], recv_sem.at[3],
            device_id=(my_y, left), device_id_type=_MESH)
        cp_r.start()
        cp_l.start()
        cp_r.wait()
        cp_l.wait()


@functools.lru_cache(maxsize=None)
def _pad_call(L, ly, lx, dtype, w, NY, NX, interpret):
    kernel = functools.partial(_halo_kernel, w=w, NY=NY, NX=NX)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # the padded block varies across both mesh axes (vma) — required
        # by shard_map's replication checker
        out_shape=jax.ShapeDtypeStruct((L, ly + 2 * w, lx + 2 * w),
                                       dtype, vma=frozenset({"y", "x"})),
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))] * 2,
        compiler_params=pltpu.CompilerParams(collective_id=7),
        interpret=pltpu.InterpretParams() if interpret else False,
    )


def rdma_pad2d(a, w: int):
    """Drop-in for halo.pad2d (must run inside shard_map over
    ('y', 'x')): pad the trailing (y, x) axes with w neighbour cells
    per side via direct RDMA."""
    if w == 0:
        return a
    NY = lax.axis_size("y")
    NX = lax.axis_size("x")
    interpret = jax.default_backend() != "tpu"
    lead = a.shape[:-2]
    ly, lx = a.shape[-2:]
    a3 = a.reshape((-1, ly, lx))

    # neighbour coordinates, vma-completed over both mesh axes so they
    # stack into one SMEM operand
    my_y = lax.axis_index("y")
    my_x = lax.axis_index("x")
    nbr = jnp.stack([
        lax.pcast(my_y.astype(jnp.int32), ("x",), to="varying"),
        lax.pcast(my_x.astype(jnp.int32), ("y",), to="varying"),
        lax.pcast(((my_y + 1) % NY).astype(jnp.int32), ("x",), to="varying"),
        lax.pcast(((my_y + NY - 1) % NY).astype(jnp.int32), ("x",), to="varying"),
        lax.pcast(((my_x + 1) % NX).astype(jnp.int32), ("y",), to="varying"),
        lax.pcast(((my_x + NX - 1) % NX).astype(jnp.int32), ("y",), to="varying"),
    ])
    out = _pad_call(a3.shape[0], ly, lx, a.dtype, w, NY, NX,
                    interpret)(nbr, a3)
    return out.reshape(lead + (ly + 2 * w, lx + 2 * w))
