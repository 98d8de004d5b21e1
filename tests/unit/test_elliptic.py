"""Elliptic solver unit tests (SURVEY.md §5.1, components C14/C22).

The masked operator A = div(H grad) - lam is materialized as a dense
matrix by applying `laplacian_H` to basis vectors; CG and red-black
solutions are checked against a direct numpy least-squares solve
(least-squares because pure-Neumann A is singular on its constant
nullspace).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from beom_tpu.core.config import Config
from beom_tpu.core.grid import make_grid
from beom_tpu.solvers import elliptic


def _setup(nx=16, ny=12, irregular=True):
    cfg = Config(nx=nx, ny=ny, dx=1e3, dy=1e3, solver_tol=1e-12,
                 solver_maxiter=2000, dtype="float64")
    H = np.full((ny, nx), 100.0)
    if irregular:
        H += 50.0 * np.sin(np.arange(nx) / 3.0)[None, :]
        H[3:6, 3:7] = 0.0      # an island
    grid = make_grid(cfg, H)
    return cfg, grid


def _dense_A(grid, cfg, lam=0.0):
    Hu, Hv = elliptic.face_depths(grid)
    ny, nx = cfg.ny, cfg.nx
    n = ny * nx
    A = np.zeros((n, n))
    for k in range(n):
        e = np.zeros(n)
        e[k] = 1.0
        col = elliptic.laplacian_H(jnp.asarray(e.reshape(ny, nx)),
                                   Hu, Hv, grid, cfg, lam=lam)
        A[:, k] = np.asarray(col).ravel()
    return A


def _rhs(grid, cfg, compatible=True):
    rng = np.random.default_rng(3)
    b = rng.normal(size=(cfg.ny, cfg.nx)) * np.asarray(grid.mask)
    if compatible:   # project out the constant nullspace component
        m = np.asarray(grid.mask)
        b -= m * (b.sum() / m.sum())
    return b


def test_cg_matches_direct():
    cfg, grid = _setup()
    b = _rhs(grid, cfg)
    res = elliptic.cg_solve(jnp.asarray(b), grid, cfg)
    A = _dense_A(grid, cfg)
    x_direct, *_ = np.linalg.lstsq(A, b.ravel(), rcond=None)
    x_direct = x_direct.reshape(cfg.ny, cfg.nx) * np.asarray(grid.mask)
    # compare up to the constant nullspace offset on wet cells
    m = np.asarray(grid.mask)
    x = np.asarray(res.x)
    off = ((x - x_direct) * m).sum() / m.sum()
    np.testing.assert_allclose(x * m, (x_direct + off) * m, atol=1e-7)
    assert int(res.iters) < cfg.solver_maxiter


def test_cg_residual_small():
    cfg, grid = _setup()
    b = jnp.asarray(_rhs(grid, cfg))
    res = elliptic.cg_solve(b, grid, cfg)
    Hu, Hv = elliptic.face_depths(grid)
    r = b - elliptic.laplacian_H(res.x, Hu, Hv, grid, cfg)
    rel = float(jnp.linalg.norm(r * grid.mask) / jnp.linalg.norm(b))
    assert rel < 1e-10


def test_helmholtz_nonsingular():
    """lam > 0 removes the nullspace; solution is unique and exact."""
    cfg, grid = _setup()
    lam = 1e-4
    b = jnp.asarray(_rhs(grid, cfg, compatible=False))
    res = elliptic.cg_solve(b, grid, cfg, lam=lam)
    A = _dense_A(grid, cfg, lam=lam)
    m = np.asarray(grid.mask)
    # restrict to wet rows/cols (land rows of A are zero)
    wet = m.ravel() > 0
    x_direct = np.zeros(cfg.ny * cfg.nx)
    x_direct[wet] = np.linalg.solve(A[np.ix_(wet, wet)],
                                    np.asarray(b).ravel()[wet])
    np.testing.assert_allclose(np.asarray(res.x).ravel()[wet],
                               x_direct[wet], rtol=1e-6, atol=1e-9)


def test_redblack_converges_to_cg():
    cfg, grid = _setup()
    lam = 1e-4   # nonsingular so both converge to the same point
    b = jnp.asarray(_rhs(grid, cfg, compatible=False))
    x_cg = elliptic.cg_solve(b, grid, cfg, lam=lam).x
    x_rb = elliptic.redblack_solve(b, grid, cfg, lam=lam, sweeps=4000,
                                   omega=1.7)
    np.testing.assert_allclose(np.asarray(x_rb), np.asarray(x_cg),
                               atol=1e-6)


def test_solvers_respect_mask():
    cfg, grid = _setup()
    b = jnp.asarray(_rhs(grid, cfg))
    x = elliptic.cg_solve(b, grid, cfg).x
    land = 1.0 - np.asarray(grid.mask)
    np.testing.assert_allclose(np.asarray(x) * land, 0.0, atol=0)


def test_ssor_precond_same_solution_fewer_iters():
    """SSOR-preconditioned CG converges to the Jacobi-CG answer in
    (strictly) fewer iterations (r1 VERDICT item 3)."""
    cfg, grid = _setup()
    b = jnp.asarray(_rhs(grid, cfg))
    r_jac = elliptic.cg_solve(b, grid, cfg)
    pre = elliptic.make_ssor_precond(grid, cfg)
    r_ssor = elliptic.cg_solve(b, grid, cfg, precond=pre)
    m = np.asarray(grid.mask)
    off = ((np.asarray(r_ssor.x) - np.asarray(r_jac.x)) * m).sum() / m.sum()
    np.testing.assert_allclose(np.asarray(r_ssor.x) * m,
                               (np.asarray(r_jac.x) + off) * m, atol=1e-7)
    assert int(r_ssor.iters) < int(r_jac.iters), \
        f"ssor {int(r_ssor.iters)} vs jacobi {int(r_jac.iters)}"


def test_ssor_precond_helmholtz():
    cfg, grid = _setup()
    lam = 1e-4
    b = jnp.asarray(_rhs(grid, cfg, compatible=False))
    pre = elliptic.make_ssor_precond(grid, cfg, lam=lam)
    res = elliptic.cg_solve(b, grid, cfg, lam=lam, precond=pre)
    A = _dense_A(grid, cfg, lam=lam)
    x_direct = np.linalg.lstsq(A, np.asarray(b).ravel(), rcond=None)[0]
    x_direct = x_direct.reshape(cfg.ny, cfg.nx) * np.asarray(grid.mask)
    np.testing.assert_allclose(np.asarray(res.x), x_direct, atol=1e-8)


def test_warm_start_cuts_iterations():
    """x0 near the solution must converge in far fewer iterations than
    x0 = 0 (the mechanism behind the State.phi carry)."""
    cfg, grid = _setup()
    b = jnp.asarray(_rhs(grid, cfg))
    cold = elliptic.cg_solve(b, grid, cfg)
    # restart from the converged answer: CG must recognize it at once
    warm = elliptic.cg_solve(b, grid, cfg, x0=cold.x)
    assert int(warm.iters) <= 3, \
        f"warm {int(warm.iters)} vs cold {int(cold.iters)}"
    # and a nearby start (the step-to-step phi drift regime) costs
    # measurably less than the full budget
    rng = np.random.default_rng(7)
    x0 = np.asarray(cold.x) + 1e-8 * rng.normal(size=(cfg.ny, cfg.nx))
    near = elliptic.cg_solve(b, grid, cfg, x0=jnp.asarray(x0))
    assert int(near.iters) < int(cold.iters) * 0.75, \
        f"near {int(near.iters)} vs cold {int(cold.iters)}"
