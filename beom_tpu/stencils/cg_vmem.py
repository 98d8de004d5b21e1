"""Whole-domain-in-VMEM fused elliptic solve (SURVEY.md §3 C14/C23,
§4.3 hot inner loop; r4 VERDICT item 1 — the projection schemes ran
30-50x below fb because the solve inner loop was op-by-op XLA).

At moderate grids (<= ~1024^2 f32) the COMPLETE solver state — b, x
and the CG work vectors r, u, w, p, s, the operator coefficients, and
(for the rigid-lid pure-Neumann solve) the entire multigrid hierarchy
— fits in VMEM.  The whole preconditioned solve-to-convergence then
runs as ONE Pallas kernel launch: the XLA tier's ~15 dispatches per CG
iteration (why the r4 implicit_fs Pallas tier was only 1.11x its XLA
tier) collapse into a single Mosaic program with zero dispatch
overhead and zero HBM traffic per iteration.

The kernel body CALLS solvers/elliptic.cg_solve — the identical
single-reduction Chronopoulos-Gear CG (+ nullspace deflation for
lam = 0) that runs on the XLA tier and under shard_map — with
jnp.sum dots (exact: the "domain" is the whole grid, lax.while_loop
lowers in Mosaic) and either the in-kernel Jacobi preconditioner or
the in-kernel multigrid cycle (solvers/multigrid._vcycle with the
banded-matmul transfers of stencils/mg_pallas.py, plain — exactly
symmetric — half-sweep smoothing at every level).  Single source of
truth: there is no second CG implementation to drift.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid
from beom_tpu.solvers.elliptic import CGResult

_HI = jax.lax.Precision.HIGHEST


def vmem_bytes_estimate(ny: int, nx: int, precond: str,
                        itemsize: int = 4) -> int:
    """Peak-VMEM estimate for the fused solve: level-0 operands + CG
    while-loop carries (double-buffered across trips) + live
    temporaries.  Calibrated against Mosaic's scoped-vmem accounting:
    the jacobi kernel at 1024^2 f32 measured 108.3 MiB = ~27
    grid-sized values; the in-kernel MG hierarchy adds
    ~sum(1/4^k) * ~12 values of the coarser levels."""
    units = 27.0
    if precond == "mg":
        units += 12.0 / 3.0
    return int(units * ny * nx * itemsize)


def _stats_rows(iters, resnorm, dtype):
    row = jnp.ones((1, 128), dtype)
    return jnp.concatenate([iters.astype(dtype) * row, resnorm * row], 0)


def _cg_kernel(b_ref, x0_ref, *refs, cfg: Config, lam: float,
               nlev: int, dxys: tuple, precond_kind: str,
               nu: int, nu_coarse: int, gamma, tol, maxiter):
    from beom_tpu.solvers import elliptic
    from beom_tpu.solvers import multigrid as mg

    hu = refs[0:nlev]
    hv = refs[nlev:2 * nlev]
    ms = refs[2 * nlev:3 * nlev]
    ry = refs[3 * nlev:4 * nlev - 1]
    rx = refs[4 * nlev - 1:5 * nlev - 2]
    x_out, stats_out = refs[-2], refs[-1]

    levels = [mg._make_level(hu[j][:], hv[j][:], ms[j][:],
                             dxys[j][0], dxys[j][1], lam)
              for j in range(nlev)]
    lv0 = levels[0]

    def matvec(p):
        return mg._apply_A(lv0, p, lam)

    if precond_kind == "mg":
        def restrict_mm(a, k):
            t = jnp.matmul(a, rx[k][:].T, precision=_HI)
            return jnp.matmul(ry[k][:], t, precision=_HI)

        def prolong_mm(a, k):
            t = jnp.matmul(a, rx[k][:], precision=_HI)
            return 4.0 * jnp.matmul(ry[k][:].T, t, precision=_HI)

        def precond(r):
            return mg._vcycle(levels, 0, r * lv0.mask, lam, nu,
                              nu_coarse, demean=False, gamma=gamma,
                              transfers=(restrict_mm, prolong_mm))
    else:
        def precond(r):
            return lv0.inv_diag * r

    # a minimal Grid: cg_solve touches only .mask when matvec/inv_diag/
    # precond are supplied (solvers/elliptic.py)
    m = lv0.mask
    grid_t = Grid(H=m, mask=m, mask_u=m, mask_v=m, mask_q=m, f_q=m)
    res = elliptic.cg_solve(b_ref[:], grid_t, cfg, x0=x0_ref[:],
                            lam=lam, matvec=matvec, precond=precond,
                            tol=tol, maxiter=maxiter)
    x_out[:] = res.x
    stats_out[:] = _stats_rows(res.iters, res.resnorm, m.dtype)


def make_vmem_cg_solve(grid: Grid, cfg: Config, lam: float = 0.0,
                       precond: Optional[str] = None,
                       nu: int = 2, nu_coarse: int = 24,
                       min_size: int = 16,
                       tol: Optional[float] = None,
                       maxiter: Optional[int] = None,
                       interpret: bool = False,
                       vmem_limit_bytes: int = 116 * 1024 * 1024):
    """solve(b, x0=None) -> CGResult, the whole preconditioned CG in
    one kernel launch.  precond: 'jacobi' | 'mg' (default: the
    cfg.precond='auto' rule — mg for the pure-Neumann lam = 0 solve,
    jacobi for Helmholtz).  Raises ValueError when the solver state
    cannot fit VMEM (callers fall back to the composed XLA-loop tier).
    """
    from beom_tpu.solvers import multigrid as mg
    from beom_tpu.stencils.mg_pallas import restrict_matrix

    if precond is None:
        precond = cfg.precond
    if precond == "auto":
        precond = "mg" if lam == 0.0 else "jacobi"
    if precond == "ssor":     # ssor-precond is not offered in-kernel
        precond = "jacobi"
    ny, nx = grid.mask.shape
    dt = grid.mask.dtype
    est = vmem_bytes_estimate(ny, nx, precond, jnp.dtype(dt).itemsize)
    if est > vmem_limit_bytes:
        raise ValueError(
            f"fused VMEM solve needs ~{est / 2**20:.0f} MiB at "
            f"({ny}, {nx}); exceeds {vmem_limit_bytes / 2**20:.0f} MiB")

    if precond == "mg":
        levels = mg.build_levels(grid, cfg, lam, min_size=min_size)
        gamma = mg._pallas_gamma_schedule(levels, 2)
    else:
        levels = mg.build_levels(grid, cfg, lam, min_size=max(ny, nx))
        gamma = 1
    nlev = len(levels)
    dxys = tuple((1.0 / lv.rdx2 ** 0.5, 1.0 / lv.rdy2 ** 0.5)
                 for lv in levels)
    hu = [lv.Hu for lv in levels]
    hv = [lv.Hv for lv in levels]
    msk = [lv.mask for lv in levels]
    ry = [jnp.asarray(restrict_matrix(lv.mask.shape[0], dt))
          for lv in levels[:-1]]
    rx = [jnp.asarray(restrict_matrix(lv.mask.shape[1], dt))
          for lv in levels[:-1]]

    kernel = functools.partial(
        _cg_kernel, cfg=cfg, lam=lam, nlev=nlev, dxys=dxys,
        precond_kind=precond, nu=nu, nu_coarse=nu_coarse, gamma=gamma,
        tol=tol, maxiter=maxiter)
    out_shape = (jax.ShapeDtypeStruct((ny, nx), dt),
                 jax.ShapeDtypeStruct((2, 128), dt))
    call = pl.pallas_call(
        kernel, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret)

    def solve(b, x0=None) -> CGResult:
        x0 = jnp.zeros_like(b) if x0 is None else x0
        x, stats = call(b, x0, *hu, *hv, *msk, *ry, *rx)
        return CGResult(x=x, iters=stats[0, 0].astype(jnp.int32),
                        resnorm=stats[1, 0])

    return solve
