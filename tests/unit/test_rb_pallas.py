"""Temporally-blocked red-black Pallas solver (interpret mode):
solves to the same answer as CG on the nonsingular Helmholtz problem
and drives the residual down on the singular Neumann one.
"""

import numpy as np
import jax.numpy as jnp

from beom_tpu.core.config import Config
from beom_tpu.core.grid import make_grid
from beom_tpu.solvers import elliptic
from beom_tpu.stencils.redblack_pallas import solve_pallas


def _setup(nx=128, ny=64):
    cfg = Config(nx=nx, ny=ny, dx=1e3, dy=1e3, solver_tol=1e-10,
                 solver_maxiter=4000, sor_omega=1.7, dtype="float64")
    H = np.full((ny, nx), 100.0)
    H += 40.0 * np.sin(np.arange(nx) / 5.0)[None, :]
    grid = make_grid(cfg, H)
    rng = np.random.default_rng(7)
    b = rng.normal(size=(ny, nx)) * np.asarray(grid.mask)
    return cfg, grid, b


def test_blocked_rb_matches_cg_helmholtz():
    cfg, grid, b = _setup()
    lam = 1e-4
    x_cg = elliptic.cg_solve(jnp.asarray(b), grid, cfg, lam=lam).x
    x_rb = solve_pallas(jnp.asarray(b), grid, cfg, lam=lam, k=4,
                        interpret=True, max_passes=3000)
    np.testing.assert_allclose(np.asarray(x_rb), np.asarray(x_cg),
                               atol=1e-6)


def test_blocked_rb_neumann_residual():
    cfg, grid, b = _setup()
    m = np.asarray(grid.mask)
    b = b - m * (b.sum() / m.sum())        # compatible RHS
    x = solve_pallas(jnp.asarray(b), grid, cfg, k=4, tol=1e-8,
                     interpret=True, max_passes=3000)
    Hu, Hv = elliptic.face_depths(grid)
    r = (jnp.asarray(b) - elliptic.laplacian_H(x, Hu, Hv, grid, cfg)) \
        * grid.mask
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(jnp.asarray(b)))
    assert rel < 1e-7


def test_level_sweep_residual_fused():
    """make_level_sweep(residual=True) must return the same x as the
    plain sweep plus the residual b - A x; interior rows are exact,
    band-edge rows carry the documented sweep lag (compare on the
    whole grid with a single full-height band so no lag exists)."""
    from beom_tpu.stencils.redblack_pallas import make_level_sweep

    cfg, grid, b = _setup(nx=128, ny=64)
    Hu, Hv = elliptic.face_depths(grid)
    kw = dict(lam=0.0, k=2, omega=1.0, by=32, interpret=True)
    sweep = make_level_sweep(Hu, Hv, grid.mask, cfg.dx, cfg.dy, **kw)
    sweep_r = make_level_sweep(Hu, Hv, grid.mask, cfg.dx, cfg.dy,
                               residual=True, **kw)
    x0 = jnp.zeros_like(jnp.asarray(b))
    x1 = sweep(x0, jnp.asarray(b))
    x2, r = sweep_r(x0, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1),
                               rtol=0, atol=1e-13)
    # exact residual of the returned iterate, away from band edges
    r_exact = np.asarray((jnp.asarray(b) - elliptic.laplacian_H(
        x2, Hu, Hv, grid, cfg)) * grid.mask)
    d = np.abs(np.asarray(r) - r_exact)
    interior = np.ones_like(d, bool)
    for j0 in range(0, 64, 32):            # band boundaries at 0, 32
        interior[max(j0 - 5, 0):j0 + 5, :] = False
    assert d[interior].max() < 1e-10 * max(np.abs(r_exact).max(), 1.0)


def test_apply_kernel_matches_laplacian():
    from beom_tpu.stencils.redblack_pallas import make_apply_kernel

    cfg, grid, b = _setup(nx=128, ny=64)
    Hu, Hv = elliptic.face_depths(grid)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 128))) * grid.mask
    for lam in (0.0, 1e-4):
        mv = make_apply_kernel(Hu, Hv, grid.mask, cfg.dx, cfg.dy,
                               lam=lam, mode="matvec", by=16,
                               interpret=True)
        ref = elliptic.laplacian_H(x, Hu, Hv, grid, cfg, lam=lam)
        np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(ref),
                                   rtol=0, atol=1e-12)
        rk = make_apply_kernel(Hu, Hv, grid.mask, cfg.dx, cfg.dy,
                               lam=lam, mode="residual", by=16,
                               interpret=True)
        ref_r = (jnp.asarray(b) - ref) * grid.mask
        np.testing.assert_allclose(np.asarray(rk(x, jnp.asarray(b))),
                                   np.asarray(ref_r), rtol=0,
                                   atol=1e-12)
