"""Fused forward-backward step as a single Pallas TPU kernel
(SURVEY.md §3 C23, §4.4 — the native performance tier).

One HBM pass per step.  The grid is tiled into full-width row bands:
each kernel instance owns rows [i*by, (i+1)*by) at full nx width, so

  * x-direction rolls inside the kernel ARE the global periodic wrap —
    no x halo, no alignment padding, no redundant x compute;
  * only a y halo (HALO_Y rows) is needed, DMA'd straight from the
    *unpadded* HBM arrays with wrap handled by split copies at the
    first/last band — there is no XLA pre-pad pass at all;
  * mask_u/mask_v/mask_q and the beta-plane f_q are derived in-kernel
    from the centre mask and the row index (exactly the make_grid
    formulas), halving static-field traffic.

The tile then runs the *identical* physics of stepping/fb.py (same
trick as the distributed path: a periodic roll on a y-padded band
equals the global roll for all interior rows).  Single source of truth
— physics fixes propagate to the XLA path, the shard_map path and this
kernel alike; parity is pinned by tests/unit/test_pallas.py (interpret
mode) and the on-hardware bitwise check in the verify flow.

Traffic per point per step (f32, nz=1, by=128):
  read (h,u,v,H,mask,taux,tauy) * (1 + 2*24/128) + write (h,u,v)
  = 7 * 1.375 + 3 = 12.6 words = 50 B  ->  bound ~16 G pts/s on v5e.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing
from beom_tpu.core.state import State
from beom_tpu.core import ops
from beom_tpu.stepping import fb as fb_mod

# Stencil radius of one fb_step is <= 14, or <= 17 with wet/dry gating
# (see parallel/dist.required_halo); rounded up to a multiple of 8
# (f32 sublane tiling).  The kernel is VPU-bound (~260 vector ops per
# point ~ 1 Top/s at the measured rate), so halo rows cost compute
# 1:1 — use the tight value per config.
HALO_Y_BASE = 16
HALO_Y_WETDRY = 24


def _halo_y(cfg: Config) -> int:
    return HALO_Y_WETDRY if (cfg.wetdry or cfg.obc) else HALO_Y_BASE


def _band_kernel(scal_ref,                  # SMEM [n, t] as f32
                 *args, cfg: Config, by: int, wy: int,
                 names: tuple):
    """args = <len(names) ANY input refs> <3 VMEM out refs> <len(names)
    VMEM window scratch> <DMA sems>.  `names` lists the streamed fields
    (always h, u, v, H, mask, taux, tauy; plus sponge/h_ext/obc_*/
    tide_* when the config enables them)."""
    nz = cfg.nz
    ny, nx = cfg.ny, cfg.nx
    i = pl.program_id(0)
    nbands = pl.num_programs(0)
    nf = len(names)
    ins = args[:nf]
    ho_ref, uo_ref, vo_ref = args[nf:nf + 3]
    bufs = args[nf + 3:nf + 3 + nf]
    sems = args[-1]
    rows = by + 2 * wy

    def dma_band(k, ref, buf):
        """Fill buf with rows [i*by - wy, i*by + by + wy) of ref,
        wrapping periodically at the first/last band."""
        def seg(ref_rows, buf_rows, sem):
            if len(ref.shape) == 3:
                src = ref.at[:, ref_rows, :]
                dst = buf.at[:, buf_rows, :]
            else:
                src = ref.at[ref_rows, :]
                dst = buf.at[buf_rows, :]
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            return cp

        def al(off):     # by and wy are multiples of 8, so offsets are
            return pl.multiple_of(off, 8)

        @pl.when(jnp.logical_and(i > 0, i < nbands - 1))
        def _():
            seg(pl.ds(al(i * by - wy), rows), pl.ds(0, rows),
                sems.at[k, 0]).wait()

        @pl.when(i == 0)
        def _():
            c1 = seg(pl.ds(al(ny - wy), wy), pl.ds(0, wy),
                     sems.at[k, 0])
            c2 = seg(pl.ds(0, by + wy), pl.ds(wy, by + wy),
                     sems.at[k, 1])
            c1.wait()
            c2.wait()

        @pl.when(jnp.logical_and(i == nbands - 1, nbands > 1))
        def _():
            c1 = seg(pl.ds(al(i * by - wy), by + wy),
                     pl.ds(0, by + wy), sems.at[k, 0])
            c2 = seg(pl.ds(0, wy), pl.ds(by + wy, wy), sems.at[k, 1])
            c1.wait()
            c2.wait()

    for k, (r, b) in enumerate(zip(ins, bufs)):
        dma_band(k, r, b)

    f = {name: b[:] for name, b in zip(names, bufs)}
    hb, ub, vb = f["h"], f["u"], f["v"]
    mb = f["mask"]

    # --- derive staggered masks + beta-plane f at corners in-kernel ----
    mu = mb * ops.sxp(mb)
    mv = mb * ops.syp(mb)
    mq = mu * ops.sxp(ops.syp(mb)) * ops.syp(mb)
    dt32 = hb.dtype
    j_global = (jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 0)
                + i * by - wy)
    # periodic band wrap: j in [0, ny)
    j_global = jnp.where(j_global < 0, j_global + ny,
                         jnp.where(j_global >= ny, j_global - ny,
                                   j_global))
    y_q = (j_global.astype(dt32) + 0.5) * cfg.dy
    fq = cfg.f0 + cfg.beta * y_q

    grid_t = Grid(H=f["H"], mask=mb, mask_u=mu, mask_v=mv, mask_q=mq,
                  f_q=fq)
    zc = jnp.zeros((max(len(cfg.tides), 1), rows, nx), dt32)
    z3 = jnp.zeros((nz, rows, nx), dt32)
    z2 = jnp.zeros((rows, nx), dt32)
    forcing_t = Forcing(
        taux=f["taux"], tauy=f["tauy"],
        sponge=f.get("sponge", z2), h_ext=f.get("h_ext", z3),
        obc_u=f.get("obc_u", z2), obc_v=f.get("obc_v", z2),
        obc_h=f.get("obc_h", z2),
        tide_amp=f.get("tide_amp", zc),
        tide_phase=f.get("tide_phase", zc))

    n = scal_ref[0].astype(jnp.int32)
    t = scal_ref[1].astype(dt32)
    out = fb_mod.fb_step(State(h=hb, u=ub, v=vb, t=t, n=n),
                         grid_t, forcing_t, cfg)

    sl = (slice(None), slice(wy, wy + by), slice(None))
    ho_ref[:] = out.h[sl]
    uo_ref[:] = out.u[sl]
    vo_ref[:] = out.v[sl]


def _choose_band(ny: int, target: int) -> int:
    """Largest divisor of ny that is <= target and a multiple of 8."""
    best = 8
    for t in range(8, min(ny, target) + 1, 8):
        if ny % t == 0:
            best = t
    return best


def make_pallas_stepper(grid: Grid, forcing: Forcing, cfg: Config,
                        by: Optional[int] = None,
                        bx: Optional[int] = None,   # unused (full width)
                        interpret: bool = False,
                        vmem_limit_bytes: int = 100 * 1024 * 1024):
    """Returns step(state) -> state running the fused band kernel.

    All five canonical configs are supported: sponge/OBC/tide fields
    are streamed as extra kernel operands only when the config enables
    them.  Restriction (raised): fb scheme only; rigid-lid/implicit-FS
    use the blocked red-black kernel path instead.  f is beta-plane
    (affine), derived in-kernel.
    """
    if cfg.scheme != "fb":
        raise ValueError("pallas stepper currently implements scheme='fb'")
    wy = _halo_y(cfg)
    ny, nx = cfg.ny, cfg.nx
    by = by or _choose_band(ny, 256)
    if ny // by < 2:                   # the wrap DMAs assume >= 2 bands
        by = _choose_band(ny, ny // 2)
    if ny % by:
        raise ValueError(f"by={by} must divide ny={ny}")
    if by < wy or by + wy > ny:
        raise ValueError(
            f"band height {by} incompatible with halo {wy} on ny={ny}")
    nz = cfg.nz
    dt = cfg.npdtype
    rows = by + 2 * wy

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
    names = ("h", "u", "v") + tuple(fields)
    statics = tuple(fields.values())
    nf = len(names)

    def buf_for(name, a=None):
        if name in ("h", "u", "v"):
            return pltpu.VMEM((nz, rows, nx), dt)
        if a.ndim == 3:
            return pltpu.VMEM((a.shape[0], rows, nx), dt)
        return pltpu.VMEM((rows, nx), dt)

    bufs = [buf_for(n) for n in ("h", "u", "v")] + \
           [buf_for(n, a) for n, a in fields.items()]

    kernel = functools.partial(_band_kernel, cfg=cfg, by=by, wy=wy,
                               names=names)

    out_spec = pl.BlockSpec((nz, by, nx), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(ny // by,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * nf,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((nz, ny, nx), dt)
                        for _ in range(3)),
        scratch_shapes=bufs + [pltpu.SemaphoreType.DMA((nf, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )

    @jax.jit
    def step(state: State) -> State:
        scal = jnp.stack([state.n.astype(dt), state.t.astype(dt)])
        h1, u1, v1 = call(scal, state.h, state.u, state.v, *statics)
        return State(h=h1, u=u1, v=v1, t=state.t + cfg.dt,
                     n=state.n + 1)

    return step
