"""Multigrid unit tests (solvers/multigrid.py; r3 ADVICE items).

Covers the pieces no other suite exercised directly: make_mg_precond
symmetry (CG validity), W- vs V-cycle solution equivalence, the CG
iteration-count payoff, and the cfg.solver='mg' dispatch.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from beom_tpu.cases import make_case
from beom_tpu.solvers import elliptic
from beom_tpu.solvers.multigrid import (make_mg_precond, make_mg_solver,
                                        mg_solve)

# x64 + 8-virtual-device CPU setup happens in tests/conftest.py


@pytest.fixture(scope="module")
def problem():
    cfg, grid, forcing, state = make_case("rigid_lid", nx=64, ny=64,
                                          dtype="float64")
    cfg = dataclasses.replace(cfg, solver_tol=1e-11,
                              solver_maxiter=200)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.normal(size=(64, 64))) * grid.mask
    b = (b - grid.mask * (jnp.sum(b) / jnp.sum(grid.mask))) * grid.mask
    return cfg, grid, b


def _relres(x, b, grid, cfg, lam=0.0):
    Hu, Hv = elliptic.face_depths(grid)
    r = (b - elliptic.laplacian_H(x, Hu, Hv, grid, cfg, lam=lam)) \
        * grid.mask
    return float(jnp.linalg.norm(r) / jnp.linalg.norm(b))


def test_mg_solver_converges_v_and_w(problem):
    """gamma=1 (V) and gamma=2 (W) converge to the same solution of the
    singular Neumann problem (same wet-mean gauge)."""
    cfg, grid, b = problem
    xs = {}
    for gamma in (1, 2):
        solve = make_mg_solver(grid, cfg, gamma=gamma)
        x = solve(b)
        assert _relres(x, b, grid, cfg) < 1e-9, f"gamma={gamma}"
        nwet = jnp.sum(grid.mask)
        xs[gamma] = x - grid.mask * (jnp.sum(x) / nwet)
    assert float(jnp.max(jnp.abs(xs[1] - xs[2]))) < 1e-8 * float(
        jnp.max(jnp.abs(xs[2])) + 1.0)


def test_mg_precond_symmetric(problem):
    """The XLA-smoothed W-cycle preconditioner must be symmetric on the
    wet subspace: z1^T r2 == z2^T r1 (CG validity; ADVICE r3)."""
    cfg, grid, b = problem
    M = make_mg_precond(grid, cfg)
    rng = np.random.default_rng(3)
    r1 = jnp.asarray(rng.normal(size=b.shape)) * grid.mask
    r2 = jnp.asarray(rng.normal(size=b.shape)) * grid.mask
    z1, z2 = M(r1), M(r2)
    a = float(jnp.sum(z1 * r2))
    c = float(jnp.sum(z2 * r1))
    assert abs(a - c) < 1e-10 * max(abs(a), abs(c))


def test_mg_precond_cuts_cg_iterations(problem):
    """MG-preconditioned CG needs far fewer iterations than Jacobi."""
    cfg, grid, b = problem
    res_j = elliptic.cg_solve(b, grid, cfg)
    res_m = elliptic.cg_solve(b, grid, cfg,
                              precond=make_mg_precond(grid, cfg))
    assert int(res_m.iters) < int(res_j.iters) / 3
    assert int(res_m.iters) <= 25


def test_mg_solver_helmholtz(problem):
    """lam > 0 (implicit-FS Helmholtz mode): nonsingular, no deflation."""
    cfg, grid, b = problem
    lam = 1.0 / (cfg.g * cfg.dt * cfg.dt)
    solve = make_mg_solver(grid, cfg, lam=lam)
    x = solve(b)
    assert _relres(x, b, grid, cfg, lam=lam) < 1e-9


def test_mg_solve_matches_cg(problem):
    """mg_solve and CG agree on the (gauge-fixed) solution."""
    cfg, grid, b = problem
    x_mg = mg_solve(b, grid, cfg)
    x_cg = elliptic.cg_solve(b, grid, cfg,
                             precond=make_mg_precond(grid, cfg)).x
    nwet = jnp.sum(grid.mask)
    x_mg = x_mg - grid.mask * (jnp.sum(x_mg) / nwet)
    x_cg = x_cg - grid.mask * (jnp.sum(x_cg) / nwet)
    scale = float(jnp.max(jnp.abs(x_cg)) + 1.0)
    assert float(jnp.max(jnp.abs(x_mg - x_cg))) < 1e-7 * scale


def test_solver_mg_step_dispatch():
    """cfg.solver='mg' drives a full rigid-lid step (projection._solve
    dispatch) and conserves the column to solver tolerance."""
    cfg, grid, forcing, state = make_case(
        "rigid_lid", nx=32, ny=32, dtype="float64", solver="mg")
    from beom_tpu.stepping import get_step
    step = get_step(cfg)
    s = state
    for _ in range(3):
        s = step(s, grid, forcing, cfg)
    col = (jnp.sum(s.h, axis=0) - grid.H) * grid.mask
    assert np.isfinite(np.asarray(s.h)).all()
    assert float(jnp.max(jnp.abs(col))) < 1e-6


def test_config_rejects_unknown_solver():
    with pytest.raises(ValueError):
        make_case("rigid_lid", nx=32, ny=32, solver="bogus")


def test_mg_pallas_tier_matches_xla(problem):
    """r4 ADVICE: the Pallas MG tier (matmul transfers + fused
    coarse-stack kernel via the interpreter) must produce the same
    solve as smoother='xla'.  At 64^2 the whole hierarchy is below
    coarse_size, so this exercises make_coarse_stack_call end-to-end
    (banded-matmul R/P, in-kernel recursion, the gamma schedule)."""
    cfg, grid, b = problem
    xs = {}
    for sm in ("xla", "pallas"):
        solve = make_mg_solver(grid, cfg, smoother=sm, interpret=True)
        x = solve(b)
        assert _relres(x, b, grid, cfg) < 1e-9, sm
        nwet = jnp.sum(grid.mask)
        xs[sm] = x - grid.mask * (jnp.sum(x) / nwet)
    scale = float(jnp.max(jnp.abs(xs["xla"])) + 1.0)
    assert float(jnp.max(jnp.abs(xs["pallas"] - xs["xla"]))) < 1e-8 * scale


def test_mg_pallas_precond_cg(problem):
    """MG-preconditioned CG with the Pallas coarse-stack tier
    (interpret mode) converges like the XLA-smoothed tier."""
    cfg, grid, b = problem
    res_x = elliptic.cg_solve(b, grid, cfg,
                              precond=make_mg_precond(grid, cfg))
    res_p = elliptic.cg_solve(
        b, grid, cfg,
        precond=make_mg_precond(grid, cfg, smoother="pallas",
                                interpret=True))
    # the Pallas tier deliberately runs the cheaper (2,..,1,1) gamma
    # schedule (V at the deepest transitions, _pallas_gamma_schedule),
    # so it trades a few extra CG iterations for much cheaper cycles
    assert int(res_p.iters) <= 2 * int(res_x.iters)
    assert _relres(res_p.x, b, grid, cfg) < 1e-9
