"""Distributed fused band kernel: the Pallas tier composed with the
mesh tier, with the ICI halo exchange OVERLAPPED with interior stencil
compute (SURVEY.md §3 C21/C23, §8 Phase 4 — the north star's headline
sentence; r1 VERDICT item 1).

Plan (runs INSIDE shard_map over the ('y', 'x') mesh):

  * x halos: exchanged OUTSIDE the kernel (one `halo.pad_axis` over the
    'x' ring per step, or a local wrap when mesh_x == 1) — full-width
    bands keep x contiguous in lanes, so the x halo is cheap and the
    y axis is where overlap pays;
  * statics (H, masks, f_q, forcing): padded (wy, wx) ONCE at setup —
    every band reads rows [i*by, i*by + by + 2*wy) of the padded
    array, no wrap cases, no remote traffic;
  * y halos of the dynamic fields (h, u, v): the FIRST grid iteration
    starts `make_async_remote_copy` RDMA sends of this shard's edge
    rows (already x-padded, so corners ride along) to both y
    neighbours, then computes the interior bands; the bands that need
    the remote rows — global band order (j+1) % nbands puts the two
    edge bands LAST — wait on their receive semaphore only when they
    are reached.  The ICI transfer therefore rides under
    (nbands - 2) bands of VPU work;
  * a barrier-semaphore handshake with the two y neighbours at kernel
    entry orders each step's sends after the neighbours' previous-step
    reads (standard Pallas collective reuse pattern, collective_id 8 —
    the x-phase rdma_halo kernel uses 7);
  * mesh_y == 1 degrades to the single-chip periodic self-wrap DMA,
    mesh_y == 2 / nbands == 2 stay correct but have no interior bands
    to hide the transfer behind.

1-vs-8-virtual-device equivalence for fb and split runs in pytest via
the Pallas TPU interpreter (tests/dist/test_pallas_dist.py), like the
rdma_halo kernel.  Enable with Config(backend='pallas', mesh_y>1).

TEMPORAL BLOCKING (Config.steps_per_pass = k): the caller's band body
advances k model steps per pass against a k-fold-wider halo
(fused_fb._halo_y), so the RDMA exchange count per model step drops
k-fold.  Crossover: the halo is k*8 rows each way (k*(8 + 2*nsub
rounded up) for split), so a shard must have ny_l >= 2*k*wy_1 + 8
rows, and the redundant-compute fraction 2*k*wy_1/ny_l grows with k —
at ny_l = 256 and k = 2 it is 12.5 %, at ny_l = 128 it is 25 %, which
roughly cancels the saved exchange unless the run is latency- (not
compute-) bound.  config.validate caps k at 2 under a mesh.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beom_tpu.core.config import Config
from beom_tpu.stencils.band import band_grid_forcing

_MESH = pltpu.DeviceIdType.MESH


def _dist_band_kernel(scal_ref, nbr_ref, *args, cfg: Config, by: int,
                      wy: int, names: tuple, n_dyn: int, n_out: int,
                      body: Callable, NY: int, ny_l: int):
    """args layout:
       <nf input refs (ANY)> <n_out out refs (VMEM)>
       <nf double-buffered VMEM band scratch (2, ...)>
       <n_dyn recv VMEM bufs (lead, 2, wy, nxp)>
       <band-copy sems (nf, 2)> <send sems (n_dyn, 2)> <recv sems (n_dyn, 2)>
    Dynamic inputs are (lead, ny_l, nxp); statics are y-padded
    (lead?, ny_l + 2*wy, nxp)."""
    nf = len(names)
    ins = args[:nf]
    outs = args[nf:nf + n_out]
    bufs = args[nf + n_out:2 * nf + n_out]
    recvs = args[2 * nf + n_out:2 * nf + n_out + n_dyn]
    copy_sems, send_sems, recv_sems = args[-3:]

    j = pl.program_id(0)
    nbands = pl.num_programs(0)
    nb = jnp.asarray(nbands, j.dtype) if hasattr(j, "dtype") else nbands
    i = lax.rem(j + 1, nb)              # edge bands (0, nbands-1) last
    rows = by + 2 * wy
    my_y, my_x = nbr_ref[0], nbr_ref[1]
    up, down = nbr_ref[2], nbr_ref[3]

    def al(off):
        return pl.multiple_of(off, 8)

    # --- first iteration: handshake, then launch the y-edge RDMA ------
    def remote_copy(k, d):
        """Edge-row send d of dynamic field k ((lead, ny_l, nxp)):
        d=0: my TOP wy rows -> up-neighbour's LOW slot (what arrives in
        MY low slot came from my down neighbour, SPMD symmetry);
        d=1: my BOTTOM wy rows -> down-neighbour's HIGH slot."""
        ref, rbuf = ins[k], recvs[k]
        if d == 0:
            return pltpu.make_async_remote_copy(
                ref.at[:, pl.ds(al(ny_l - wy), wy), :],
                rbuf.at[:, 0], send_sems.at[k, 0], recv_sems.at[k, 0],
                device_id=(up, my_x), device_id_type=_MESH)
        return pltpu.make_async_remote_copy(
            ref.at[:, pl.ds(0, wy), :],
            rbuf.at[:, 1], send_sems.at[k, 1], recv_sems.at[k, 1],
            device_id=(down, my_x), device_id_type=_MESH)

    if NY > 1:
        @pl.when(j == 0)
        def _():
            barrier = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(barrier, device_id=(up, my_x),
                                   device_id_type=_MESH)
            pltpu.semaphore_signal(barrier, device_id=(down, my_x),
                                   device_id_type=_MESH)
            pltpu.semaphore_wait(barrier, 2)
            for k in range(n_dyn):
                remote_copy(k, 0).start()
                remote_copy(k, 1).start()

    # --- band input DMA: double-buffered across grid iterations --------
    # iteration jj prefetches iteration jj+1's band while jj computes,
    # so the local HBM reads hide under VPU work (same pattern as
    # stencils/band._band_kernel); the remote halo rows keep their own
    # recv buffers and are only waited on by the (last-ordered) edge
    # bands.
    def band_dmas(jj, slot, start: bool):
        b = lax.rem(jj + 1, nb)          # band computed at iteration jj
        is_b0 = b == 0
        is_bl = b == nbands - 1
        for k in range(nf):
            ref, buf = ins[k], bufs[k]

            def sg(ref_rows, buf_rows, k=k, ref=ref, buf=buf):
                if len(ref.shape) == 3:
                    src = ref.at[:, ref_rows, :]
                    dst = buf.at[slot, :, buf_rows, :]
                else:
                    src = ref.at[ref_rows, :]
                    dst = buf.at[slot, buf_rows, :]
                cp = pltpu.make_async_copy(src, dst,
                                           copy_sems.at[k, slot])
                cp.start() if start else cp.wait()

            if k >= n_dyn:
                # static: already y-padded, single in-range copy
                sg(pl.ds(al(b * by), rows), pl.ds(0, rows))
                continue

            @pl.when(jnp.logical_and(jnp.logical_not(is_b0),
                                     jnp.logical_not(is_bl)))
            def _(sg=sg):
                sg(pl.ds(al(b * by - wy), rows), pl.ds(0, rows))

            @pl.when(is_b0)
            def _(sg=sg):
                sg(pl.ds(0, by + wy), pl.ds(wy, by + wy))

            @pl.when(is_bl)
            def _(sg=sg):
                sg(pl.ds(al(ny_l - by - wy), by + wy),
                   pl.ds(0, by + wy))

    slot = lax.rem(j, jnp.asarray(2, j.dtype))
    next_slot = lax.rem(j + 1, jnp.asarray(2, j.dtype))

    @pl.when(j == 0)
    def _():
        band_dmas(j, slot, start=True)             # prime
    @pl.when(j + 1 < nbands)
    def _():
        band_dmas(j + 1, next_slot, start=True)    # prefetch
    band_dmas(j, slot, start=False)                # wait for this band

    is_band0 = i == 0
    is_last = i == nbands - 1

    # --- edge bands: fill the remote (or self-wrap) halo rows ----------
    for k in range(n_dyn):
        ref, buf, rbuf = ins[k], bufs[k], recvs[k]

        def sg_edge(ref_rows, buf_rows, k=k, ref=ref, buf=buf):
            cp = pltpu.make_async_copy(
                ref.at[:, ref_rows, :],
                buf.at[slot, :, buf_rows, :],
                copy_sems.at[k, slot])
            cp.start()
            cp.wait()

        if NY == 1:
            @pl.when(is_band0)
            def _(sg_edge=sg_edge):
                sg_edge(pl.ds(al(ny_l - wy), wy), pl.ds(0, wy))

            @pl.when(is_last)
            def _(sg_edge=sg_edge):
                sg_edge(pl.ds(0, wy), pl.ds(by + wy, wy))
        else:
            @pl.when(is_band0)
            def _(buf=buf, rbuf=rbuf, k=k):
                remote_copy(k, 0).wait_recv()
                buf[slot, :, 0:wy, :] = rbuf[:, 0]

            @pl.when(is_last)
            def _(buf=buf, rbuf=rbuf, k=k):
                remote_copy(k, 1).wait_recv()
                buf[slot, :, by + wy:rows, :] = rbuf[:, 1]

    # --- physics on the haloed band ------------------------------------
    f = {name: b[slot] for name, b in zip(names, bufs)}
    grid_t, forcing_t = band_grid_forcing(f, cfg)
    n = scal_ref[0].astype(jnp.int32)
    t = scal_ref[1].astype(f["mask"].dtype)
    results = body(f, grid_t, forcing_t, (n, t))

    for out_ref, res in zip(outs, results):
        if res.ndim == 3:
            out_ref[:] = res[:, wy:wy + by, :]
        else:
            out_ref[:] = res[wy:wy + by, :]

    # --- drain the send semaphores before the kernel retires -----------
    if NY > 1:
        @pl.when(j == nbands - 1)
        def _():
            for k in range(n_dyn):
                remote_copy(k, 0).wait_send()
                remote_copy(k, 1).wait_send()


def make_dist_band_call(cfg: Config, body: Callable,
                        dyn: dict, statics: dict,
                        out_leads: tuple, wy: int,
                        ny_l: int, nxp: int, NY: int,
                        by=None, interpret: bool = False,
                        vmem_limit_bytes: int = 100 * 1024 * 1024,
                        band_target: int = 256):
    """Build call(scal, nbr, *dyn, *statics) -> outputs, for use INSIDE
    shard_map.  dyn: name -> example (lead, ny_l, nxp) local block;
    statics: name -> y-padded example (lead?, ny_l + 2*wy, nxp);
    nbr: int32[4] = (my_y, my_x, up, down) mesh coordinates."""
    # valid bands: divisors of ny_l, multiples of 8, >= wy (interior
    # band addressing needs by - wy >= 0), small enough that a haloed
    # band fits the block
    cands = [t for t in range(8, ny_l + 1, 8)
             if ny_l % t == 0 and t >= wy and t + 2 * wy <= ny_l]
    if by is None:
        if not cands:
            raise ValueError(
                f"no valid band height for halo {wy} on local block of "
                f"{ny_l} rows; use fewer y-devices or a larger grid")
        # prefer >= 4 bands so two interior bands hide the RDMA
        target = min(band_target, max(8, ny_l // 4))
        by = max([t for t in cands if t <= target], default=min(cands))
    if by not in cands:
        raise ValueError(
            f"band height {by} incompatible with halo {wy} on local "
            f"block of {ny_l} rows")
    rows = by + 2 * wy
    dt = cfg.npdtype
    n_dyn = len(dyn)
    names = tuple(dyn) + tuple(statics)
    examples = list(dyn.values()) + list(statics.values())

    def buf_for(a):      # leading 2 = double-buffer slots
        if a.ndim == 3:
            return pltpu.VMEM((2, a.shape[0], rows, nxp), dt)
        return pltpu.VMEM((2, rows, nxp), dt)

    bufs = [buf_for(a) for a in examples]
    recvs = [pltpu.VMEM((a.shape[0], 2, wy, nxp), dt)
             for a in list(dyn.values())]

    kernel = functools.partial(
        _dist_band_kernel, cfg=cfg, by=by, wy=wy, names=names,
        n_dyn=n_dyn, n_out=len(out_leads), body=body, NY=NY, ny_l=ny_l)

    nbands = ny_l // by
    out_specs, out_shape = [], []
    vma = frozenset({"y", "x"})
    for lead in out_leads:
        if lead:
            out_specs.append(pl.BlockSpec(
                lead + (by, nxp),
                lambda j, _l=len(lead): (0,) * _l + ((j + 1) % nbands, 0),
                memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(lead + (ny_l, nxp), dt,
                                                  vma=vma))
        else:
            out_specs.append(pl.BlockSpec(
                (by, nxp), lambda j: ((j + 1) % nbands, 0),
                memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((ny_l, nxp), dt,
                                                  vma=vma))

    call = pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(names),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=bufs + recvs + [
            pltpu.SemaphoreType.DMA((len(names), 2)),
            pltpu.SemaphoreType.DMA((n_dyn, 2)),
            pltpu.SemaphoreType.DMA((n_dyn, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
            collective_id=8,
            dimension_semantics=("arbitrary",)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )
    return call


def neighbour_coords():
    """(my_y, my_x, up, down) int32 vector, vma-completed over both
    mesh axes (must be called inside shard_map over ('y', 'x'))."""
    NY = lax.axis_size("y")
    NX = lax.axis_size("x")
    my_y = lax.axis_index("y")
    my_x = lax.axis_index("x")
    return jnp.stack([
        lax.pcast(my_y.astype(jnp.int32), ("x",), to="varying"),
        lax.pcast(my_x.astype(jnp.int32), ("y",), to="varying"),
        lax.pcast(((my_y + 1) % NY).astype(jnp.int32), ("x",), to="varying"),
        lax.pcast(((my_y + NY - 1) % NY).astype(jnp.int32), ("x",), to="varying"),
    ])
