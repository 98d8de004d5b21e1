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
