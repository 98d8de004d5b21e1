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


def _local_dots(pairs):
    """Batched dot products -> stacked () array.  The distributed path
    substitutes one lax.psum of the stacked partial sums, so the CG
    iteration costs exactly ONE allreduce (SURVEY.md §8 hard part 2)."""
    return jnp.stack([jnp.sum(a * b) for a, b in pairs])


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


def make_ssor_precond(grid: Grid, cfg: Config, lam=0.0,
                      sweeps: Optional[int] = None,
                      pad1: Optional[Callable] = None,
                      crop1: Optional[Callable] = None,
                      red=None):
    """Symmetric Gauss-Seidel (red-black ordered) preconditioner
    z = M^{-1} r: `sweeps` forward (red, black) + backward (black, red)
    passes from x = 0, omega = 1 so M is symmetric positive (CG-safe).

    pad1/crop1 (default identity = single-chip periodic rolls) are the
    distributed 1-halo exchange hooks; `red` overrides the checkerboard
    (the distributed path needs the *global* colouring).
    """
    sweeps = cfg.precond_sweeps if sweeps is None else sweeps
    Hu, Hv = face_depths(grid)
    rdx2, rdy2 = 1.0 / cfg.dx ** 2, 1.0 / cfg.dy ** 2
    diag = -((Hu + ops.sxm(Hu)) * rdx2 + (Hv + ops.sym(Hv)) * rdy2) - lam
    inv_diag = jnp.where(diag != 0,
                         1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
    Hu_w = ops.sxm(Hu)
    Hv_s = ops.sym(Hv)

    if pad1 is None:
        def pad1(a):
            return a

        def crop1(a):
            return a
        mask = grid.mask
    else:
        # statics arrive 1-halo padded (parallel/dist.py); crop the
        # pointwise factors to the local block
        Hu_l, Hv_l = crop1(Hu), crop1(Hv)
        Hu_w, Hv_s = crop1(Hu_w), crop1(Hv_s)
        inv_diag = crop1(inv_diag)
        mask = crop1(grid.mask)
        Hu, Hv = Hu_l, Hv_l
    if red is None:
        red = _checkerboard((cfg.ny, cfg.nx), inv_diag.dtype) * mask
    black = (1.0 - red) * mask

    def halfsweep(x, b, colour):
        xp = pad1(x)
        nb = (Hu * crop1(ops.sxp(xp)) + Hu_w * crop1(ops.sxm(xp))) * rdx2 \
           + (Hv * crop1(ops.syp(xp)) + Hv_s * crop1(ops.sym(xp))) * rdy2
        x_gs = (b - nb) * inv_diag
        return jnp.where(colour > 0, x_gs, x) * mask

    def apply(r):
        b = r * mask
        x = jnp.zeros_like(b)
        for _ in range(sweeps):
            x = halfsweep(x, b, red)     # forward GS
            x = halfsweep(x, b, black)
            x = halfsweep(x, b, black)   # backward GS -> symmetric M
            x = halfsweep(x, b, red)
        return x

    return apply


def cg_solve(b, grid: Grid, cfg: Config, x0=None, lam=0.0,
             dot: Callable = _local_dot, tol: Optional[float] = None,
             maxiter: Optional[int] = None,
             matvec: Optional[Callable] = None,
             inv_diag=None,
             dots: Optional[Callable] = None,
             precond: Optional[Callable] = None) -> CGResult:
    """Preconditioned conjugate gradients on A x = b, A = div(H grad) - lam,
    in the single-reduction Chronopoulos-Gear form: the two CG dot
    products, the convergence norm AND the nullspace-deflation means are
    all evaluated in ONE batched reduction per iteration (`dots`), so
    the distributed solve costs exactly one allreduce per iteration
    (SURVEY.md §8 hard part 2; tests/dist/test_single_reduction.py pins
    the HLO).  Convergence: |r|^2 <= tol^2 |b|^2.

    lam == 0 is the pure-Neumann (rigid-lid) problem: A is singular with
    the wet-constant nullspace.  Both the scalar products and the
    carried vectors are re-projected off that nullspace every iteration
    using means from the same fused reduction — without this, roundoff
    lets a constant component leak into the search direction and the
    alpha denominator eventually hits ~0 (observed as a NaN blow-up
    after ~60 steps of the rigid-lid gyre in round 1).

    precond: z = M^{-1} r callback (make_ssor_precond, or the default
    Jacobi inv_diag multiply).  Must be symmetric positive definite
    w.r.t. the wet subspace.

    Distributed use (parallel/dist.py): pass `dots` = single-psum batched
    sum, `matvec` = halo-exchanged A, `precond` with exchange hooks, and
    `inv_diag` computed on the padded grid — the solver code itself is
    topology-agnostic.
    """
    tol = cfg.solver_tol if tol is None else tol
    # f32 cannot reach f64-grade tolerances; clamp to ~30 eps so CG
    # stops at stagnation instead of burning maxiter and diverging
    tol = max(tol, 30.0 * float(jnp.finfo(b.dtype).eps))
    maxiter = cfg.solver_maxiter if maxiter is None else maxiter

    if dots is None:
        if dot is not _local_dot:
            def dots(pairs, _dot=dot):
                return jnp.stack([_dot(a, c) for a, c in pairs])
        else:
            dots = _local_dots

    if precond is None:
        if inv_diag is None:
            _, inv_diag = jacobi_diag(grid, cfg, lam)
        prec_inv_diag = inv_diag

        def precond(r):
            return prec_inv_diag * r

    if matvec is None:
        Hu, Hv = face_depths(grid)
        A = functools.partial(laplacian_H, Hu=Hu, Hv=Hv, grid=grid,
                              cfg=cfg, lam=lam)
    else:
        A = matvec

    mask = grid.mask
    eps = jnp.finfo(b.dtype).tiny
    deflating = lam == 0.0
    if deflating:
        nwet = jnp.maximum(dot(mask, mask), 1.0)

        def fused(r, u, w):
            """(gamma, delta, rr) of the DEFLATED vectors + deflated
            (r, u): one batched reduction covers the CG scalars and the
            nullspace means."""
            d = dots([(r, u), (w, u), (r, r),
                      (r, mask), (u, mask), (w, mask)])
            ru, wu, rr, rm, um, wm = (d[i] for i in range(6))
            gamma = ru - rm * um / nwet
            delta = wu - wm * um / nwet
            rr_d = rr - rm * rm / nwet
            r = (r - (rm / nwet) * mask) * mask
            u = (u - (um / nwet) * mask) * mask
            return gamma, delta, rr_d, r, u
    else:
        def fused(r, u, w):
            d = dots([(r, u), (w, u), (r, r)])
            return d[0], d[1], d[2], r * mask, u * mask

    def deflate0(v):
        if not deflating:
            return v * mask
        return (v - mask * (dot(v, mask) / nwet)) * mask

    b = deflate0(b * mask)
    x = jnp.zeros_like(b) if x0 is None else deflate0(x0)

    b2 = dot(b, b)
    threshold = (tol * tol) * jnp.maximum(b2, eps)

    def safe_div(num, den):
        mag = jnp.maximum(jnp.abs(den), eps)
        return num / jnp.where(den < 0, -mag, mag)

    r = (b - A(x)) * mask
    u = precond(r) * mask
    w = A(u)
    gamma, delta, rr, r, u = fused(r, u, w)
    alpha0 = safe_div(gamma, delta)

    zeros = jnp.zeros_like(b)
    carry0 = (x, r, u, w, zeros, zeros, alpha0,
              jnp.zeros_like(alpha0), gamma, rr,
              jnp.zeros((), jnp.int32))

    def cond(c):
        rr = c[-2]
        k = c[-1]
        return jnp.logical_and(k < maxiter, rr > threshold)

    def body(c):
        x, r, u, w, p, s, alpha, beta, gamma, rr, k = c
        p = u + beta * p
        s = w + beta * s
        x = x + alpha * p
        r = r - alpha * s
        u = precond(r) * mask
        w = A(u)
        gamma_n, delta, rr, r, u = fused(r, u, w)
        beta_n = safe_div(gamma_n, gamma)
        alpha_n = safe_div(
            gamma_n, delta - beta_n * safe_div(gamma_n, alpha))
        return (x, r, u, w, p, s, alpha_n, beta_n, gamma_n, rr, k + 1)

    out = jax.lax.while_loop(cond, body, carry0)
    x, rr, k = out[0], out[-2], out[-1]
    return CGResult(x=x * mask, iters=k, resnorm=rr)


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
