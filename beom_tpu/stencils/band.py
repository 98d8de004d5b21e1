"""Generic full-width band-kernel machinery for Pallas TPU stencils
(SURVEY.md §3 C23, §4.4).

Every stencil kernel in this package shares one memory plan:

  * the grid is tiled into full-width row bands — x-rolls inside the
    kernel ARE the global periodic wrap (no x halo, no padding pass);
  * each band DMAs rows [i*by - wy, i*by + by + wy) of every operand
    from the *unpadded* HBM arrays into VMEM scratch, with the y wrap
    handled by split copies at the first/last band;
  * the physics runs on the haloed VMEM block (a roll on the padded
    band equals the global roll for all interior rows), and the
    interior `by` rows are written back.

`make_band_call(...)` packages that plan around an arbitrary
`body(f, grid_t, forcing_t, scal) -> tuple of arrays`: `f` maps field
name -> haloed VMEM block, `grid_t`/`forcing_t` are band-local Grid /
Forcing pytrees (every static field streamed as an operand — the
kernels are VPU-bound, so recomputing masks/f in-kernel would cost the
binding resource to save the spare one), and `scal` is the (n, t) step
scalars from SMEM.  fused_fb.py (fb/split schemes) and
fused_projection.py (rigid-lid / implicit-FS phases) are both
instances.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing


def choose_band(ny: int, target: int) -> int:
    """Largest divisor of ny that is <= target and a multiple of 8."""
    best = 8
    for t in range(8, min(ny, target) + 1, 8):
        if ny % t == 0:
            best = t
    return best


def static_fields(grid: Grid, forcing: Forcing, cfg: Config) -> dict:
    """The grid/forcing arrays streamed to every band kernel: always
    H/mask/taux/tauy, plus sponge/OBC/tide operands when enabled.

    The staggered masks and beta-plane f are RECOMPUTED in-kernel from
    the centre mask (band_grid_forcing), not streamed: streaming them
    as four extra operands was measured 8% SLOWER on the 2048^2 fb
    bench (4.37 vs 4.74 G pt/s) — the kernel sits close to both the
    VPU and HBM ceilings, and the extra DMA outweighs the ~15 vector
    ops/pt it saves.  The distributed kernel (stencils/dist_band.py)
    streams them instead, since shard-local reconstruction would need
    global row offsets in-kernel."""
    fields = {"H": grid.H, "mask": grid.mask,
              "taux": forcing.taux, "tauy": forcing.tauy}
    if cfg.sponge:
        fields["sponge"] = forcing.sponge
        fields["h_ext"] = forcing.h_ext
    if cfg.obc:
        fields.setdefault("h_ext", forcing.h_ext)
        fields["obc_u"] = forcing.obc_u
        fields["obc_v"] = forcing.obc_v
        fields["obc_h"] = forcing.obc_h
        if cfg.tides:
            fields["tide_amp"] = forcing.tide_amp
            fields["tide_phase"] = forcing.tide_phase
    return fields


def band_grid_forcing(f: dict, cfg: Config, i=None, by=None, rows=None):
    """Assemble band-local Grid/Forcing from the haloed operand blocks.

    If the staggered masks / f_q are streamed (distributed kernel),
    they are used directly; otherwise they are reconstructed from the
    centre mask and the global row index i*by - wy (the make_grid
    formulas; single-chip kernels — see static_fields for why)."""
    from beom_tpu.core import ops

    mb = f["mask"]
    rows, nx = mb.shape
    dt32 = mb.dtype
    if "mask_u" in f:
        grid_t = Grid(H=f["H"], mask=mb, mask_u=f["mask_u"],
                      mask_v=f["mask_v"], mask_q=f["mask_q"],
                      f_q=f["f_q"])
    else:
        mu = mb * ops.sxp(mb)
        mv = mb * ops.syp(mb)
        mq = mu * ops.sxp(ops.syp(mb)) * ops.syp(mb)
        ny = cfg.ny
        wy = (rows - by) // 2
        j_global = (jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 0)
                    + i * by - wy)
        j_global = jnp.where(j_global < 0, j_global + ny,
                             jnp.where(j_global >= ny, j_global - ny,
                                       j_global))
        y_q = (j_global.astype(dt32) + 0.5) * cfg.dy
        fq = cfg.f0 + cfg.beta * y_q
        grid_t = Grid(H=f["H"], mask=mb, mask_u=mu, mask_v=mv,
                      mask_q=mq, f_q=fq)
    zc = jnp.zeros((max(len(cfg.tides), 1), rows, nx), dt32)
    z3 = jnp.zeros((cfg.nz, rows, nx), dt32)
    z2 = jnp.zeros((rows, nx), dt32)
    forcing_t = Forcing(
        taux=f["taux"], tauy=f["tauy"],
        sponge=f.get("sponge", z2), h_ext=f.get("h_ext", z3),
        obc_u=f.get("obc_u", z2), obc_v=f.get("obc_v", z2),
        obc_h=f.get("obc_h", z2),
        tide_amp=f.get("tide_amp", zc),
        tide_phase=f.get("tide_phase", zc))
    return grid_t, forcing_t


def _tiled_kernel(scal_ref,                 # SMEM [2] as f32
                  *args, cfg: Config, by: int, wy: int,
                  bx: int, wx: int,
                  names: tuple, n_out: int, body: Callable):
    """x-tiled fallback kernel (grid = (ny//by, nx//bx)): operands
    arrive PRE-PADDED in x (nx + 2*wx columns, the periodic wrap done
    once per step in XLA), so each tile DMAs a contiguous
    (rows, bx + 2*wx) window and only the y wrap needs split copies.
    No cross-iteration double buffering — this is the capability tier
    for nx beyond the full-width VMEM plan (SURVEY.md §4.4), not the
    speed path."""
    ny = cfg.ny
    i = pl.program_id(0)
    j = pl.program_id(1)
    nbands = pl.num_programs(0)
    nf = len(names)
    ins = args[:nf]
    outs = args[nf:nf + n_out]
    bufs = args[nf + n_out:nf + n_out + nf]
    sems = args[-1]
    rows = by + 2 * wy
    cols = bx + 2 * wx

    def al(off):
        return pl.multiple_of(off, 8)

    for k in range(nf):
        ref, buf = ins[k], bufs[k]

        def seg(ref_rows, buf_rows, s, k=k, ref=ref, buf=buf):
            # the lane-dim offset must be PROVABLY divisible by the
            # 128-lane tiling on hardware (Mosaic rejects a weaker
            # hint; caught on-TPU in r5 — interpret mode never checks)
            xs = pl.ds(pl.multiple_of(j * bx,
                                      128 if bx % 128 == 0 else 8),
                       cols)
            if len(ref.shape) == 3:
                src = ref.at[:, ref_rows, xs]
                dst = buf.at[:, buf_rows, :]
            else:
                src = ref.at[ref_rows, xs]
                dst = buf.at[buf_rows, :]
            cp = pltpu.make_async_copy(src, dst, sems.at[k, s])
            cp.start()
            return cp

        @pl.when(jnp.logical_and(i > 0, i < nbands - 1))
        def _(seg=seg):
            seg(pl.ds(al(i * by - wy), rows), pl.ds(0, rows), 0).wait()

        @pl.when(i == 0)
        def _(seg=seg):
            c1 = seg(pl.ds(al(ny - wy), wy), pl.ds(0, wy), 0)
            c2 = seg(pl.ds(0, by + wy), pl.ds(wy, by + wy), 1)
            c1.wait()
            c2.wait()

        @pl.when(jnp.logical_and(i == nbands - 1, nbands > 1))
        def _(seg=seg):
            c1 = seg(pl.ds(al(i * by - wy), by + wy),
                     pl.ds(0, by + wy), 0)
            c2 = seg(pl.ds(0, wy), pl.ds(by + wy, wy), 1)
            c1.wait()
            c2.wait()

    f = {name: b[:] for name, b in zip(names, bufs)}
    grid_t, forcing_t = band_grid_forcing(f, cfg, i, by, rows)

    n = scal_ref[0].astype(jnp.int32)
    t = scal_ref[1].astype(f["mask"].dtype)
    results = body(f, grid_t, forcing_t, (n, t))

    for out_ref, res in zip(outs, results):
        if res.ndim == 3:
            out_ref[:] = res[:, wy:wy + by, wx:wx + bx]
        else:
            out_ref[:] = res[wy:wy + by, wx:wx + bx]


def _band_kernel(scal_ref,                  # SMEM [2] as f32
                 *args, cfg: Config, by: int, wy: int,
                 names: tuple, n_out: int, body: Callable):
    """args = <len(names) ANY input refs> <n_out VMEM out refs>
    <len(names) double-buffered VMEM window scratch> <DMA sems>.

    Input DMAs are double-buffered across grid iterations: iteration i
    prefetches band i+1's rows into the other buffer slot before
    computing band i, so the HBM reads (~30 of the ~50 B/pt of step
    traffic) ride under the previous band's VPU work instead of
    serialising with it (r1 shipped start-then-wait per operand)."""
    ny, nx = cfg.ny, cfg.nx
    i = pl.program_id(0)
    nbands = pl.num_programs(0)
    nf = len(names)
    ins = args[:nf]
    outs = args[nf:nf + n_out]
    bufs = args[nf + n_out:nf + n_out + nf]
    sems = args[-1]
    rows = by + 2 * wy

    def al(off):         # by and wy are multiples of 8, so offsets are
        return pl.multiple_of(off, 8)

    def band_dmas(b, slot, start: bool):
        """Start (or wait for) the copies filling buffer slot `slot`
        with rows [b*by - wy, b*by + by + wy) of every operand, the y
        wrap handled by split copies at the first/last band.  Start
        and wait happen in different grid iterations, so the copy
        descriptors are reconstructed (canonical cross-iteration DMA
        pattern); predicates depend only on b, identical both times."""
        for k in range(nf):
            ref, buf = ins[k], bufs[k]

            def seg(ref_rows, buf_rows, s, k=k, ref=ref, buf=buf):
                if len(ref.shape) == 3:
                    src = ref.at[:, ref_rows, :]
                    dst = buf.at[slot, :, buf_rows, :]
                else:
                    src = ref.at[ref_rows, :]
                    dst = buf.at[slot, buf_rows, :]
                cp = pltpu.make_async_copy(src, dst, sems.at[k, slot, s])
                cp.start() if start else cp.wait()

            @pl.when(jnp.logical_and(b > 0, b < nbands - 1))
            def _(seg=seg):
                seg(pl.ds(al(b * by - wy), rows), pl.ds(0, rows), 0)

            @pl.when(b == 0)
            def _(seg=seg):
                seg(pl.ds(al(ny - wy), wy), pl.ds(0, wy), 0)
                seg(pl.ds(0, by + wy), pl.ds(wy, by + wy), 1)

            @pl.when(jnp.logical_and(b == nbands - 1, nbands > 1))
            def _(seg=seg):
                seg(pl.ds(al(b * by - wy), by + wy), pl.ds(0, by + wy), 0)
                seg(pl.ds(0, wy), pl.ds(by + wy, wy), 1)

    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))
    next_slot = jax.lax.rem(i + 1, jnp.asarray(2, i.dtype))

    @pl.when(i == 0)
    def _():
        band_dmas(i, slot, start=True)          # prime band 0

    @pl.when(i + 1 < nbands)
    def _():
        band_dmas(i + 1, next_slot, start=True)  # prefetch next band

    band_dmas(i, slot, start=False)              # wait for this band

    f = {name: b[slot] for name, b in zip(names, bufs)}
    grid_t, forcing_t = band_grid_forcing(f, cfg, i, by, rows)

    n = scal_ref[0].astype(jnp.int32)
    t = scal_ref[1].astype(f["mask"].dtype)
    results = body(f, grid_t, forcing_t, (n, t))

    for out_ref, res in zip(outs, results):
        if res.ndim == 3:
            out_ref[:] = res[:, wy:wy + by, :]
        else:
            out_ref[:] = res[wy:wy + by, :]


def make_band_call(grid: Grid, forcing: Forcing, cfg: Config,
                   body: Callable,
                   dyn: dict,
                   out_leads: tuple,
                   wy: int,
                   by: Optional[int] = None,
                   interpret: bool = False,
                   vmem_limit_bytes: int = 100 * 1024 * 1024,
                   band_target: int = 256):
    """Build call(scal, *dyn_arrays) -> tuple of global outputs.

    dyn: name -> example array (3-D (lead, ny, nx) or 2-D (ny, nx)) —
    the per-step operands, streamed after the static grid/forcing set.
    out_leads: tuple of leading dims per output; () means 2-D (ny, nx),
    (nz,) means (nz, ny, nx).
    body: see module docstring; must return len(out_leads) arrays over
    the haloed band, cropped here to the interior rows.
    """
    ny, nx = cfg.ny, cfg.nx
    by = by or choose_band(ny, band_target)
    if ny // by < 2:                   # the wrap DMAs assume >= 2 bands
        by = choose_band(ny, ny // 2)
    if by + 2 * wy > ny:               # interior-band DMA is traced
        by = choose_band(ny, ny - 2 * wy)  # unconditionally: rows <= ny
    dt = cfg.npdtype

    # full-width bands must fit VMEM: ~nf operand buffers of
    # (rows, nx) each plus live temporaries.  Shrink the band while a
    # clear estimate overflows; when even the smallest band is too wide
    # the grid is too wide for the full-width plan (x-tiling fallback
    # not implemented) — raise a clear error instead of an opaque
    # Mosaic allocation failure.
    def est_bytes(by_):
        # calibrated against Mosaic's scoped-vmem accounting: ~15 live
        # (lead, rows, nx) values per layer (operands + physics
        # temporaries) + ~16 2-D planes; nz=2/by=256/nx=2048 measured
        # 102.9 MiB, nz=1 ~70 MiB.  Double-buffered operand windows add
        # one extra copy of every streamed field (3 nz-lead dynamics +
        # ~4 2-D statics, + sponge/OBC extras).
        units = 16 + 15 * cfg.nz
        units += 4 + 3 * cfg.nz
        if cfg.sponge or cfg.obc:
            units += 3 * (1 + cfg.nz)
            units += 3 * (1 + cfg.nz)
        return units * (by_ + 2 * wy) * nx * dt.itemsize
    while (est_bytes(by) > vmem_limit_bytes and by // 2 >= max(8, wy)
           and ny % (by // 2) == 0):
        by //= 2
    if est_bytes(by) > vmem_limit_bytes:
        # full-width bands cannot fit VMEM at this nx: fall back to the
        # 2-D (by, bx) tile plan (x halos via a once-per-step XLA wrap
        # pad; SURVEY.md §4.4) instead of raising
        return make_tiled_band_call(
            grid, forcing, cfg, body, dyn, out_leads, wy,
            interpret=interpret, vmem_limit_bytes=vmem_limit_bytes)

    if ny % by:
        raise ValueError(f"by={by} must divide ny={ny}")
    if by < wy or by + 2 * wy > ny:
        raise ValueError(
            f"band height {by} incompatible with halo {wy} on ny={ny}")
    rows = by + 2 * wy

    statics = static_fields(grid, forcing, cfg)
    names = tuple(dyn) + tuple(statics)
    examples = list(dyn.values()) + list(statics.values())
    nf = len(names)

    def buf_for(a):      # leading 2 = double-buffer slots
        if a.ndim == 3:
            return pltpu.VMEM((2, a.shape[0], rows, nx), dt)
        return pltpu.VMEM((2, rows, nx), dt)

    bufs = [buf_for(a) for a in examples]

    kernel = functools.partial(_band_kernel, cfg=cfg, by=by, wy=wy,
                               names=names, n_out=len(out_leads),
                               body=body)

    out_specs, out_shape = [], []
    for lead in out_leads:
        if lead:
            out_specs.append(pl.BlockSpec(
                lead + (by, nx),
                lambda i, _l=len(lead): (0,) * _l + (i, 0),
                memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(lead + (ny, nx), dt))
        else:
            out_specs.append(pl.BlockSpec((by, nx), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((ny, nx), dt))

    call = pl.pallas_call(
        kernel,
        grid=(ny // by,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * nf,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=bufs + [pltpu.SemaphoreType.DMA((nf, 2, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )

    static_vals = tuple(statics.values())

    def apply(scal, *dyn_arrays, statics=None):
        """statics: optional tuple overriding the closed-over grid/
        forcing operands — pass them as explicit jit ARGUMENTS when
        the caller's jit would otherwise capture them as constants
        (at 8192^2 the ~2 GB constant payload exceeds the sandbox's
        remote-compile request limit; bench/stencil.bench_fb_large)."""
        vals = static_vals if statics is None else statics
        return call(scal, *dyn_arrays, *vals)

    return apply


def _pad_x(a, wx: int):
    """Periodic wrap pad along the minor (x) axis."""
    return jnp.concatenate([a[..., -wx:], a, a[..., :wx]], axis=-1)


def make_tiled_band_call(grid: Grid, forcing: Forcing, cfg: Config,
                         body: Callable,
                         dyn: dict,
                         out_leads: tuple,
                         wy: int,
                         by: Optional[int] = None,
                         bx: Optional[int] = None,
                         wx: int = 128,
                         interpret: bool = False,
                         vmem_limit_bytes: int = 100 * 1024 * 1024):
    """2-D (by, bx)-tile fallback for grids whose full-width bands
    exceed VMEM (nx ≳ 16-32k single-chip; SURVEY.md §4.4).

    The x wrap is materialized ONCE per step by an XLA pad of the
    dynamic fields (statics pre-padded at setup), so the kernel's x
    halo is a contiguous in-range read; wx = 128 keeps lane-aligned
    DMAs and covers every stencil radius used here.  Costs one extra
    XLA read+write pass of h,u,v per step plus 2*wx/bx redundant
    compute — the capability tier, not the speed path (the full-width
    plan stays the default whenever it fits)."""
    ny, nx = cfg.ny, cfg.nx
    dt = cfg.npdtype

    bx_c = ([t for t in range(128, nx + 1, 128) if nx % t == 0]
            or [t for t in range(8, nx + 1, 8) if nx % t == 0])
    if not bx_c:
        raise ValueError(f"nx={nx} has no multiple-of-8 tile width")
    by_c = [t for t in range(8, ny + 1, 8)
            if ny % t == 0 and t + 2 * wy <= ny]
    if not by_c:
        raise ValueError(f"ny={ny} incompatible with halo {wy}")

    def est(by_, bx_):
        units = 16 + 15 * cfg.nz + 4 + 3 * cfg.nz
        if cfg.sponge or cfg.obc:
            units += 6 * (1 + cfg.nz)
        return units * (by_ + 2 * wy) * (bx_ + 2 * wx) * dt.itemsize

    if by is None or bx is None:
        # largest (by, bx) under the limit, preferring wide tiles (lane
        # utilization) then tall bands (smaller y-halo fraction)
        best = None
        for bx_ in sorted(bx_c, reverse=True):
            for by_ in sorted(by_c, reverse=True):
                if est(by_, bx_) <= vmem_limit_bytes:
                    cost = (by_ + 2 * wy) * (bx_ + 2 * wx) / (by_ * bx_)
                    if best is None or cost < best[0]:
                        best = (cost, by_, bx_)
                    break
        if best is None:
            raise ValueError(
                f"no (by, bx) tile of grid ({ny}, {nx}) fits "
                f"{vmem_limit_bytes / 2 ** 20:.0f} MiB of VMEM")
        _, by, bx = best
    rows, cols = by + 2 * wy, bx + 2 * wx

    statics = {k: _pad_x(v, wx)
               for k, v in static_fields(grid, forcing, cfg).items()}
    names = tuple(dyn) + tuple(statics)
    examples = list(dyn.values()) + list(statics.values())
    nf = len(names)

    def buf_for(a):
        if a.ndim == 3:
            return pltpu.VMEM((a.shape[0], rows, cols), dt)
        return pltpu.VMEM((rows, cols), dt)

    bufs = [buf_for(a) for a in examples]
    kernel = functools.partial(_tiled_kernel, cfg=cfg, by=by, wy=wy,
                               bx=bx, wx=wx, names=names,
                               n_out=len(out_leads), body=body)

    out_specs, out_shape = [], []
    for lead in out_leads:
        if lead:
            out_specs.append(pl.BlockSpec(
                lead + (by, bx),
                lambda i, j, _l=len(lead): (0,) * _l + (i, j),
                memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(lead + (ny, nx), dt))
        else:
            out_specs.append(pl.BlockSpec((by, bx), lambda i, j: (i, j),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((ny, nx), dt))

    call = pl.pallas_call(
        kernel,
        grid=(ny // by, nx // bx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * nf,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=bufs + [pltpu.SemaphoreType.DMA((nf, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )

    static_vals = tuple(statics.values())

    def apply(scal, *dyn_arrays):
        padded = tuple(_pad_x(a, wx) for a in dyn_arrays)
        return call(scal, *padded, *static_vals)

    return apply
