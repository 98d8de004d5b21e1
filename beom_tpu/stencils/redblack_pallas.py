"""Temporally-blocked red-black SOR as a Pallas TPU kernel
(SURVEY.md §3 C22/C23 — the native tier of the elliptic solver).

Red-black SOR is HBM-bound when each sweep streams the grid; but k
consecutive sweeps only widen the dependence cone by k rows/columns, so
a band loaded into VMEM with a k-deep halo can run k full sweeps
on-chip before writing back — k sweeps for ONE HBM pass instead of k.
CG cannot be blocked this way (global dot products each iteration),
which is exactly why red-black is the production solver at scale
(SURVEY.md §4.3).

Bands are full-width (x-rolls = global periodic wrap, as in
fused_fb.py).  Within one kernel launch every band sees the same input
x, so the k sweeps use halo values that lag by up to k sweeps across
band boundaries — the classic overlapped/block-Jacobi approximation of
temporal blocking.  Convergence-wise this is intermediate between
Jacobi and strict SOR; the solve loop simply runs launches until the
residual criterion is met (solve_pallas), and correctness is judged by
the residual, not by matching strict-SOR iterates.  With k = 8 and
bands of 256 rows the lag region is 3 % of each band.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid
from beom_tpu.solvers import elliptic


def _rb_kernel(x_ref, b_ref, Hu_ref, Hv_ref, m_ref,   # ANY (ny, nx)
               *rest, ny: int, nx: int, dx: float, dy: float,
               by: int, wy: int, k: int,
               lam: float, omega: float, reverse: bool,
               residual: bool = False):
    if residual:                      # outputs (x', r = b - A x')
        out_ref, r_ref = rest[0], rest[1]
        scratch = rest[2:]
    else:
        out_ref = rest[0]
        scratch = rest[1:]
    i = pl.program_id(0)
    nbands = pl.num_programs(0)
    rows = by + 2 * wy
    sems = scratch[-1]
    bufs = scratch[:-1]
    ins = (x_ref, b_ref, Hu_ref, Hv_ref, m_ref)

    def dma_band(kk, ref, buf):
        def seg(ref_rows, buf_rows, sem):
            cp = pltpu.make_async_copy(ref.at[ref_rows, :],
                                       buf.at[buf_rows, :], sem)
            cp.start()
            return cp

        def al(off):
            return pl.multiple_of(off, 8)

        @pl.when(jnp.logical_and(i > 0, i < nbands - 1))
        def _():
            seg(pl.ds(al(i * by - wy), rows), pl.ds(0, rows),
                sems.at[kk, 0]).wait()

        @pl.when(i == 0)
        def _():
            c1 = seg(pl.ds(al(ny - wy), wy), pl.ds(0, wy),
                     sems.at[kk, 0])
            c2 = seg(pl.ds(0, by + wy), pl.ds(wy, by + wy),
                     sems.at[kk, 1])
            c1.wait()
            c2.wait()

        @pl.when(jnp.logical_and(i == nbands - 1, nbands > 1))
        def _():
            c1 = seg(pl.ds(al(i * by - wy), by + wy),
                     pl.ds(0, by + wy), sems.at[kk, 0])
            c2 = seg(pl.ds(0, wy), pl.ds(by + wy, wy), sems.at[kk, 1])
            c1.wait()
            c2.wait()

    for kk, (r, bf) in enumerate(zip(ins, bufs)):
        dma_band(kk, r, bf)

    x, b, Hu, Hv, m = [bf[:] for bf in bufs]
    rdx2 = 1.0 / dx ** 2
    rdy2 = 1.0 / dy ** 2
    diag = -((Hu + ops.sxm(Hu)) * rdx2 + (Hv + ops.sym(Hv)) * rdy2) - lam
    inv_diag = jnp.where(diag != 0,
                         1.0 / jnp.where(diag == 0.0, 1.0, diag), 0.0)

    # global checkerboard: parity of (global row + column)
    jrow = (jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 0)
            + i * by - wy)
    jrow = jnp.where(jrow < 0, jrow + ny,
                     jnp.where(jrow >= ny, jrow - ny, jrow))
    icol = jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 1)
    red = (((jrow + icol) % 2) == 0).astype(x.dtype) * m
    black = (1.0 - (((jrow + icol) % 2) == 0).astype(x.dtype)) * m

    def halfsweep(x, colour):
        nb = (Hu * ops.sxp(x) + ops.sxm(Hu) * ops.sxm(x)) * rdx2 \
           + (Hv * ops.syp(x) + ops.sym(Hv) * ops.sym(x)) * rdy2
        x_gs = (b - nb) * inv_diag
        return jnp.where(colour > 0,
                         (1.0 - omega) * x + omega * x_gs, x) * m

    first, second = (black, red) if reverse else (red, black)

    def sweep(_, x):
        x = halfsweep(x, first)
        return halfsweep(x, second)

    x = jax.lax.fori_loop(0, k, sweep, x)
    out_ref[:] = x[wy:wy + by, :]
    if residual:
        # r = b - A x on the interior rows, from the same VMEM block:
        # after k sweeps x is cone-valid on rows [2k, rows-2k), and the
        # 5-point apply needs one more row, so wy >= 2k+1 is required
        # (make_level_sweep sizes the halo).  Band-edge rows use the
        # sweep-lagged halo values — the same block-lag approximation
        # as the smoothing itself, fine INSIDE a cycle (preconditioner
        # quality), not for an outer convergence residual.
        Ax = (Hu * ops.sxp(x) + ops.sxm(Hu) * ops.sxm(x)
              - (Hu + ops.sxm(Hu)) * x) * rdx2 \
           + (Hv * ops.syp(x) + ops.sym(Hv) * ops.sym(x)
              - (Hv + ops.sym(Hv)) * x) * rdy2
        if lam != 0.0:
            Ax = Ax - lam * x
        r = (b - Ax * m) * m
        r_ref[:] = r[wy:wy + by, :]


def make_level_sweep(Hu, Hv, mask, dx: float, dy: float, *,
                     lam: float = 0.0, k: int = 1, omega: float = 1.0,
                     reverse: bool = False,
                     residual: bool = False,
                     by: Optional[int] = None,
                     interpret: bool = False,
                     vmem_limit_bytes: int = 100 * 1024 * 1024):
    """sweep(x, b) -> x: k temporally-blocked red-black GS/SOR sweeps
    (black-red colour order when `reverse` — the multigrid post-smooth
    direction) in ONE HBM pass on an arbitrary periodic (ny, nx) level.

    residual=True: sweep(x, b) -> (x, b - A x) — the post-sweep
    residual comes out of the SAME band pass (the multigrid pre-smooth
    + residual + restrict chain then needs no separate ~6-op XLA
    matvec over the level; r4 VERDICT item 1b).

    Takes raw level fields rather than Grid/Config so the multigrid
    hierarchy (solvers/multigrid.py) can instantiate one forward + one
    reversed smoother per Pallas-smoothed level; make_rb_solver wraps
    it for the model grid."""
    ny, nx = mask.shape
    dt = mask.dtype
    by = by or max(8, min(256, ny // 2 // 8 * 8))
    if ny % by:
        raise ValueError(f"by={by} must divide ny={ny}")
    # one full sweep (red then black, black reading updated red) widens
    # the dependence cone by 2 cells -> k sweeps need a 2k halo (+1 for
    # the in-band residual's 5-point apply)
    wy = ((2 * k + (1 if residual else 0) + 7) // 8) * 8
    if by < wy or by + wy > ny:
        raise ValueError(f"band {by} incompatible with halo {wy}")

    rows = by + 2 * wy
    bufs = [pltpu.VMEM((rows, nx), dt) for _ in range(5)]

    kernel = functools.partial(_rb_kernel, ny=ny, nx=nx, dx=dx, dy=dy,
                               by=by, wy=wy, k=k,
                               lam=lam, omega=omega, reverse=reverse,
                               residual=residual)
    out_spec = pl.BlockSpec((by, nx), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((ny, nx), dt)
    call = pl.pallas_call(
        kernel,
        grid=(ny // by,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=(out_spec, out_spec) if residual else out_spec,
        out_shape=(out_shape, out_shape) if residual else out_shape,
        scratch_shapes=bufs + [pltpu.SemaphoreType.DMA((5, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )

    def sweep_k(x, b):
        return call(x, b, Hu, Hv, mask)

    return sweep_k


def make_apply_kernel(Hu, Hv, mask, dx: float, dy: float, *,
                      lam: float = 0.0, mode: str = "residual",
                      by: Optional[int] = None,
                      interpret: bool = False,
                      vmem_limit_bytes: int = 100 * 1024 * 1024):
    """Single-HBM-pass operator application on a periodic (ny, nx)
    level: mode='residual' -> r(x, b) = b - A x (the EXACT outer
    residual of the standalone MG iteration); mode='matvec' ->
    q(x) = A x (the CG matvec at grids beyond the VMEM-solver tier).
    The op-by-op XLA apply costs ~6 full passes (measured 0.876 ms at
    2048^2 vs ~0.3 ms for one band pass)."""
    ny, nx = mask.shape
    dt = mask.dtype
    rdx2, rdy2 = 1.0 / dx ** 2, 1.0 / dy ** 2
    matvec = mode == "matvec"

    def kernel(x_ref, b_ref, Hu_ref, Hv_ref, m_ref, out_ref,
               *scratch, by: int, wy: int):
        i = pl.program_id(0)
        nbands = pl.num_programs(0)
        rows = by + 2 * wy
        sems = scratch[-1]
        bufs = scratch[:-1]
        ins = (x_ref, b_ref, Hu_ref, Hv_ref, m_ref)

        def dma_band(kk, ref, buf):
            def seg(ref_rows, buf_rows, sem):
                cp = pltpu.make_async_copy(ref.at[ref_rows, :],
                                           buf.at[buf_rows, :], sem)
                cp.start()
                return cp

            def al(off):
                return pl.multiple_of(off, 8)

            @pl.when(jnp.logical_and(i > 0, i < nbands - 1))
            def _():
                seg(pl.ds(al(i * by - wy), rows), pl.ds(0, rows),
                    sems.at[kk, 0]).wait()

            @pl.when(i == 0)
            def _():
                c1 = seg(pl.ds(al(ny - wy), wy), pl.ds(0, wy),
                         sems.at[kk, 0])
                c2 = seg(pl.ds(0, by + wy), pl.ds(wy, by + wy),
                         sems.at[kk, 1])
                c1.wait()
                c2.wait()

            @pl.when(jnp.logical_and(i == nbands - 1, nbands > 1))
            def _():
                c1 = seg(pl.ds(al(i * by - wy), by + wy),
                         pl.ds(0, by + wy), sems.at[kk, 0])
                c2 = seg(pl.ds(0, wy), pl.ds(by + wy, wy),
                         sems.at[kk, 1])
                c1.wait()
                c2.wait()

        for kk, (r_, bf) in enumerate(zip(ins, bufs)):
            dma_band(kk, r_, bf)

        x, b, Hu_, Hv_, m = [bf[:] for bf in bufs]
        Ax = (Hu_ * ops.sxp(x) + ops.sxm(Hu_) * ops.sxm(x)
              - (Hu_ + ops.sxm(Hu_)) * x) * rdx2 \
           + (Hv_ * ops.syp(x) + ops.sym(Hv_) * ops.sym(x)
              - (Hv_ + ops.sym(Hv_)) * x) * rdy2
        if lam != 0.0:
            Ax = Ax - lam * x
        out = Ax * m if matvec else (b - Ax * m) * m
        out_ref[:] = out[wy:wy + by, :]

    wy = 8
    by = by or max(8, min(256, ny // 2 // 8 * 8))
    if ny % by or by < wy or by + wy > ny:
        raise ValueError(f"band {by} incompatible with ({ny}, {wy})")
    rows = by + 2 * wy
    bufs = [pltpu.VMEM((rows, nx), dt) for _ in range(5)]
    call = pl.pallas_call(
        functools.partial(kernel, by=by, wy=wy),
        grid=(ny // by,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec((by, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny, nx), dt),
        scratch_shapes=bufs + [pltpu.SemaphoreType.DMA((5, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )

    if matvec:
        zeros = jnp.zeros_like(mask)

        def apply(x):
            return call(x, zeros, Hu, Hv, mask)
    else:
        def apply(x, b):
            return call(x, b, Hu, Hv, mask)

    return apply


def make_rb_solver(grid: Grid, cfg: Config, lam: float = 0.0,
                   k: int = 8, by: Optional[int] = None,
                   omega: Optional[float] = None,
                   interpret: bool = False,
                   vmem_limit_bytes: int = 100 * 1024 * 1024):
    """Returns sweep_k(x, b) -> x performing k red-black sweeps in one
    HBM pass (temporally blocked, band-lagged across boundaries).
    """
    omega = cfg.sor_omega if omega is None else omega
    Hu, Hv = elliptic.face_depths(grid)
    sweep = make_level_sweep(
        Hu, Hv, grid.mask, cfg.dx, cfg.dy, lam=lam, k=k, omega=omega,
        by=by, interpret=interpret, vmem_limit_bytes=vmem_limit_bytes)
    return jax.jit(sweep)


def make_pallas_rb_solve(grid: Grid, cfg: Config, lam: float = 0.0,
                         k: int = 8, tol: Optional[float] = None,
                         max_passes: int = 200,
                         interpret: bool = False):
    """Returns jit-composable solve(b, x0=None) -> x: blocked-sweep
    passes inside a lax.while_loop until ||r|| <= tol ||b|| (the
    residual check costs one laplacian per k sweeps)."""
    tol = cfg.solver_tol if tol is None else tol
    tol = max(tol, 30.0 * float(jnp.finfo(cfg.npdtype).eps))
    sweep_k = make_rb_solver(grid, cfg, lam=lam, k=k,
                             interpret=interpret)
    Hu, Hv = elliptic.face_depths(grid)

    def solve(b, x0=None):
        b = b * grid.mask
        x = jnp.zeros_like(b) if x0 is None else x0 * grid.mask
        b2 = jnp.sum(b * b)
        threshold = (tol * tol) * jnp.maximum(b2,
                                              jnp.finfo(b.dtype).tiny)

        def cond(carry):
            x, p = carry
            r = (b - elliptic.laplacian_H(x, Hu, Hv, grid, cfg,
                                          lam=lam)) * grid.mask
            return jnp.logical_and(p < max_passes,
                                   jnp.sum(r * r) > threshold)

        def body(carry):
            x, p = carry
            return sweep_k(x, b), p + 1

        x, _ = jax.lax.while_loop(cond, body,
                                  (x, jnp.zeros((), jnp.int32)))
        return x

    return solve


def solve_pallas(b, grid: Grid, cfg: Config, lam: float = 0.0,
                 x0=None, k: int = 8, tol: Optional[float] = None,
                 max_passes: int = 200, interpret: bool = False):
    """One-shot convenience wrapper over make_pallas_rb_solve."""
    solve = make_pallas_rb_solve(grid, cfg, lam=lam, k=k, tol=tol,
                                 max_passes=max_passes,
                                 interpret=interpret)
    return solve(b, x0=x0)
