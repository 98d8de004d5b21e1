"""Iterative elliptic solvers for the rigid-lid / implicit-free-surface
pressure (SURVEY.md §1.3, components C14 + C22).

The operator is the masked variable-coefficient Laplacian at cell centres

    A p = div( H_face * grad p )        [+ lam * p  (Helmholtz mode)]

with H averaged to the open faces (mask_u / mask_v), so A is symmetric
negative semi-definite on the wet subspace; closed walls are natural
(zero-flux) boundaries because masked faces drop out of the divergence.

Two solvers, selectable by cfg.solver (SURVEY.md §4.3):

  * `cg_solve` — conjugate gradients via `lax.while_loop`; the two dot
    products per iteration are computed by a pluggable `dot` callback so
    the identical code runs single-chip (jnp.sum) and under `shard_map`
    (local sum + lax.psum over the mesh axes — see parallel/halo.py).
  * `redblack_solve` — checkerboard SOR sweeps; needs only neighbour
    halos per sweep, no global reductions, so it is the preferred
    variant at large mesh scale (SURVEY.md §8 "hard parts" #2).

Both are pure jnp on (ny, nx) fields, jit/scan/shard_map friendly.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid


def face_depths(grid: Grid):
    """H averaged to open u/v faces: (Hu, Hv), zero across walls."""
    Hu = grid.mask_u * ops.a_xp(grid.H)
    Hv = grid.mask_v * ops.a_yp(grid.H)
    return Hu, Hv


def laplacian_H(p, Hu, Hv, grid: Grid, cfg: Config, lam=0.0):
    """A p = div(H grad p) - lam p at wet centres (ny, nx)."""
    gx = Hu * ops.d_xp(p, cfg.dx)       # at u faces
    gy = Hv * ops.d_yp(p, cfg.dy)       # at v faces
    out = (ops.d_xm(gx, cfg.dx) + ops.d_ym(gy, cfg.dy))
    if lam != 0.0:
        out = out - lam * p
    return out * grid.mask


def _local_dot(a, b):
    return jnp.sum(a * b)


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array      # () int32
    resnorm: jax.Array    # () final |r|^2


def jacobi_diag(grid: Grid, cfg: Config, lam=0.0):
    """Diagonal of A and its safe inverse (Jacobi preconditioner).

    diag(A) = -(Hu + Hu_west)/dx^2 - (Hv + Hv_south)/dy^2 - lam; land /
    isolated cells (diag = 0) get preconditioner 1.

    NOTE (distributed): the sxm/sym shifts reach one cell west/south, so
    under shard_map this must be evaluated on a >=1-halo-padded grid and
    cropped — see parallel/dist.py.
    """
    Hu, Hv = face_depths(grid)
    diag = -((Hu + ops.sxm(Hu)) / cfg.dx ** 2
             + (Hv + ops.sym(Hv)) / cfg.dy ** 2) - lam
    inv_diag = jnp.where(jnp.abs(diag) > 0,
                         1.0 / jnp.where(diag == 0, 1.0, diag), 1.0)
    return diag, inv_diag


def cg_solve(b, grid: Grid, cfg: Config, x0=None, lam=0.0,
             dot: Callable = _local_dot, tol: Optional[float] = None,
             maxiter: Optional[int] = None,
             matvec: Optional[Callable] = None,
             inv_diag=None) -> CGResult:
    """Conjugate gradients on A x = b with A = div(H grad) - lam.

    Jacobi (diagonal) preconditioned; convergence: |r|^2 <= tol^2 |b|^2.

    lam == 0 is the pure-Neumann (rigid-lid) problem: A is singular with
    the wet-constant nullspace.  The preconditioned residual is
    re-projected off that nullspace every iteration — without this,
    roundoff lets a constant component leak into the search direction
    and alpha = rz / dot(p, A p) eventually divides by ~0 (observed as
    a NaN blow-up after ~60 steps of the rigid-lid gyre).

    Distributed use (parallel/dist.py): pass `dot` = psum-wrapped global
    sum, `matvec` = halo-exchanged A, and `inv_diag` computed on the
    padded grid — the solver code itself is topology-agnostic.
    """
    tol = cfg.solver_tol if tol is None else tol
    # f32 cannot reach f64-grade tolerances; clamp to ~30 eps so CG
    # stops at stagnation instead of burning maxiter and diverging
    tol = max(tol, 30.0 * float(jnp.finfo(b.dtype).eps))
    maxiter = cfg.solver_maxiter if maxiter is None else maxiter

    if inv_diag is None:
        _, inv_diag = jacobi_diag(grid, cfg, lam)

    if matvec is None:
        Hu, Hv = face_depths(grid)
        A = functools.partial(laplacian_H, Hu=Hu, Hv=Hv, grid=grid,
                              cfg=cfg, lam=lam)
    else:
        A = matvec
    if lam == 0.0:
        nwet = dot(grid.mask, grid.mask)

        def deflate(v):
            return (v - grid.mask * (dot(v, grid.mask) / nwet)) * grid.mask
    else:
        def deflate(v):
            return v

    b = deflate(b * grid.mask)
    x = jnp.zeros_like(b) if x0 is None else x0 * grid.mask

    r = deflate(b - A(x))
    z = deflate(inv_diag * r)
    p = z
    rz = dot(r, z)
    b2 = dot(b, b)
    threshold = (tol * tol) * jnp.maximum(b2, jnp.finfo(b.dtype).tiny)
    eps = jnp.finfo(b.dtype).tiny

    def cond(carry):
        x, r, z, p, rz, k = carry
        return jnp.logical_and(k < maxiter, dot(r, r) > threshold)

    def body(carry):
        x, r, z, p, rz, k = carry
        q = A(p)
        pq = dot(p, q)
        alpha = rz / jnp.where(jnp.abs(pq) > eps, pq,
                               jnp.where(pq < 0, -eps, eps))
        x = x + alpha * p
        r = deflate(r - alpha * q)
        z = deflate(inv_diag * r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) > eps, rz, eps)
        p = z + beta * p
        return x, r, z, p, rz_new, k + 1

    x, r, z, p, rz, k = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, jnp.zeros((), jnp.int32)))
    return CGResult(x=x * grid.mask, iters=k, resnorm=dot(r, r))


def _checkerboard(shape, dtype):
    i = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    return (((i + j) % 2) == 0).astype(dtype)


def redblack_solve(b, grid: Grid, cfg: Config, x0=None, lam=0.0,
                   sweeps: Optional[int] = None, omega: Optional[float] = None
                   ) -> jax.Array:
    """Red-black SOR on A x = b — halo-only communication per sweep.

    x_c <- (1-w) x_c + w * (sum_faces H x_nb / d^2 - b) / (-diag)
    updated on the red checkerboard then the black one per sweep.
    """
    omega = cfg.sor_omega if omega is None else omega
    sweeps = cfg.solver_maxiter if sweeps is None else sweeps
    Hu, Hv = face_depths(grid)
    rdx2, rdy2 = 1.0 / cfg.dx ** 2, 1.0 / cfg.dy ** 2

    diag = -((Hu + ops.sxm(Hu)) * rdx2 + (Hv + ops.sym(Hv)) * rdy2) - lam
    inv_diag = jnp.where(diag != 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)

    b = b * grid.mask
    x = jnp.zeros_like(b) if x0 is None else x0 * grid.mask
    red = _checkerboard(b.shape, b.dtype) * grid.mask
    black = (1.0 - _checkerboard(b.shape, b.dtype)) * grid.mask

    def halfsweep(x, colour):
        # off-diagonal part: sum of neighbour contributions
        nb = (Hu * ops.sxp(x) + ops.sxm(Hu) * ops.sxm(x)) * rdx2 \
           + (Hv * ops.syp(x) + ops.sym(Hv) * ops.sym(x)) * rdy2
        x_gs = (b - nb) * inv_diag
        x_new = (1.0 - omega) * x + omega * x_gs
        return jnp.where(colour > 0, x_new, x) * grid.mask

    def sweep(k, x):
        x = halfsweep(x, red)
        x = halfsweep(x, black)
        return x

    return jax.lax.fori_loop(0, sweeps, sweep, x)
