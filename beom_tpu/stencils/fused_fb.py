"""Fused forward-backward step as a single Pallas TPU kernel
(SURVEY.md §3 C23, §4.4 — the native performance tier).

One HBM pass per step: the grid is tiled into (by, bx) VMEM blocks; each
kernel instance DMAs its halo-padded window of every field from HBM,
traces the *identical* physics code of stepping/fb.py on the VMEM tiles
(same trick as the distributed path — a periodic roll on a padded tile
equals the global roll for all interior cells), and writes back only the
interior.  Single source of truth: any fix to physics/ is picked up by
the XLA path, the shard_map path and this kernel alike; parity is pinned
by tests/unit/test_pallas.py.

Traffic per point per step (f32, nz=1): read h,u,v + statics, write
h,u,v ≈ 60-80 B — versus the measured ~440 B of the op-by-op XLA path.

The prognostic fields are wrap-padded by the stencil radius W in XLA
before the kernel (one fused pad copy); static fields are padded once
at stepper construction.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing
from beom_tpu.core.state import State
from beom_tpu.stepping import fb as fb_mod

# Stencil radius of one fb_step is <= 17 incl. wet/dry gating (see
# parallel/dist.required_halo).  Mosaic constrains HBM window slices to
# the (8, 128) f32 tiling: the y halo must keep (by + 2*wy) a multiple
# of 8 and the x halo must keep (bx + 2*wx) a multiple of 128 with
# 128-aligned offsets — so the halos are asymmetric: 24 rows, 64 lanes.
HALO_Y = 24
HALO_X = 64


def _pad_wrap(a, wy, wx):
    """Periodic pad of the trailing (y, x) axes."""
    pad = [(0, 0)] * (a.ndim - 2) + [(wy, wy), (wx, wx)]
    return jnp.pad(a, pad, mode="wrap")


def pad_statics(grid: Grid, forcing: Forcing, wy: int = HALO_Y,
                wx: int = HALO_X):
    pg = jax.tree.map(lambda a: _pad_wrap(a, wy, wx), grid)
    pf = jax.tree.map(lambda a: _pad_wrap(a, wy, wx), forcing)
    return pg, pf


def _tile_kernel(scal_ref,                 # SMEM: [n, t] as f32
                 h_ref, u_ref, v_ref,      # ANY (HBM): padded prognostics
                 H_ref, m_ref, mu_ref, mv_ref, mq_ref, fq_ref,
                 tx_ref, ty_ref,           # ANY: padded statics
                 ho_ref, uo_ref, vo_ref,   # VMEM out tiles (by, bx)
                 *scratch, cfg: Config, by: int, bx: int, wy: int,
                 wx: int):
    """One (by, bx) tile of the fused step; scratch = 11 VMEM windows +
    a DMA semaphore array."""
    nz = cfg.nz
    i = pl.program_id(0)
    j = pl.program_id(1)
    sems = scratch[-1]
    bufs = scratch[:-1]
    ins = (h_ref, u_ref, v_ref, H_ref, m_ref, mu_ref, mv_ref, mq_ref,
           fq_ref, tx_ref, ty_ref)

    def window(ref):
        ys = pl.ds(i * by, by + 2 * wy)
        xs = pl.ds(pl.multiple_of(j * bx, 128), bx + 2 * wx)
        return ref.at[:, ys, xs] if len(ref.shape) == 3 else ref.at[ys, xs]

    copies = [pltpu.make_async_copy(window(r), b, sems.at[k])
              for k, (r, b) in enumerate(zip(ins, bufs))]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    (hb, ub, vb, Hb, mb, mub, mvb, mqb, fqb, txb, tyb) = \
        [b[:] for b in bufs]

    grid_t = Grid(H=Hb, mask=mb, mask_u=mub, mask_v=mvb, mask_q=mqb,
                  f_q=fqb)
    zc = jnp.zeros((max(len(cfg.tides), 1),) + txb.shape, txb.dtype)
    z3 = jnp.zeros((nz,) + txb.shape, txb.dtype)
    forcing_t = Forcing(taux=txb, tauy=tyb,
                        sponge=jnp.zeros_like(txb), h_ext=z3,
                        obc_u=jnp.zeros_like(txb),
                        obc_v=jnp.zeros_like(txb),
                        obc_h=jnp.zeros_like(txb),
                        tide_amp=zc, tide_phase=zc)

    n = scal_ref[0].astype(jnp.int32)
    t = scal_ref[1].astype(hb.dtype)
    state_t = State(h=hb, u=ub, v=vb, t=t, n=n)
    out = fb_mod.fb_step(state_t, grid_t, forcing_t, cfg)

    sl = (slice(None), slice(wy, wy + by), slice(wx, wx + bx))
    ho_ref[:] = out.h[sl]
    uo_ref[:] = out.u[sl]
    vo_ref[:] = out.v[sl]


def _choose_tile(n: int, target: int, mult: int) -> int:
    """Largest divisor of n that is <= target and a multiple of mult."""
    best = mult
    for t in range(mult, min(n, target) + 1, mult):
        if n % t == 0:
            best = t
    return best


def make_pallas_stepper(grid: Grid, forcing: Forcing, cfg: Config,
                        by: Optional[int] = None,
                        bx: Optional[int] = None,
                        interpret: bool = False,
                        vmem_limit_bytes: int = 64 * 1024 * 1024):
    """Returns step(state) -> state running the fused kernel.

    Restrictions (asserted): fb scheme; no sponge/OBC/tides (their
    fields are zeroed in-kernel; the XLA path handles those configs
    until the kernel grows the extra operands).
    """
    if cfg.scheme != "fb":
        raise ValueError("pallas stepper currently implements scheme='fb'")
    if cfg.sponge or cfg.obc or cfg.tides:
        raise ValueError("pallas stepper: sponge/OBC/tides not wired yet")
    wy0, wx0 = HALO_Y, HALO_X
    ny, nx = cfg.ny, cfg.nx
    # bx must be a multiple of 128 so HBM window offsets stay
    # lane-tiling-aligned (Mosaic memref_slice constraint)
    by = by or _choose_tile(ny, 256, 8)
    bx = bx or _choose_tile(nx, 512, 128 if not interpret else 8)
    nz = cfg.nz
    dt = cfg.npdtype

    pg, pf = pad_statics(grid, forcing, wy0, wx0)
    statics = (pg.H, pg.mask, pg.mask_u, pg.mask_v, pg.mask_q, pg.f_q,
               pf.taux, pf.tauy)

    win_y, win_x = by + 2 * wy0, bx + 2 * wx0
    bufs3 = [pltpu.VMEM((nz, win_y, win_x), dt) for _ in range(3)]
    bufs2 = [pltpu.VMEM((win_y, win_x), dt) for _ in range(8)]

    kernel = functools.partial(_tile_kernel, cfg=cfg, by=by, bx=bx,
                               wy=wy0, wx=wx0)

    out_spec = pl.BlockSpec((nz, by, bx), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(ny // by, nx // bx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 11,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((nz, ny, nx), dt)
                        for _ in range(3)),
        scratch_shapes=bufs3 + bufs2 + [pltpu.SemaphoreType.DMA((11,))],
        # the traced step holds ~30 live window-sized temporaries; the
        # default 16 MiB scoped-VMEM limit is conservative on v5e
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )

    @jax.jit
    def step(state: State) -> State:
        scal = jnp.stack([state.n.astype(dt), state.t.astype(dt)])
        hp = _pad_wrap(state.h, wy0, wx0)
        up = _pad_wrap(state.u, wy0, wx0)
        vp = _pad_wrap(state.v, wy0, wx0)
        h1, u1, v1 = call(scal, hp, up, vp, *statics)
        return State(h=h1, u=u1, v=v1, t=state.t + cfg.dt, n=state.n + 1)

    return step
