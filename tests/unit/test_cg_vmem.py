"""Fused whole-domain-in-VMEM CG solve (stencils/cg_vmem.py) vs the
XLA-tier solver — interpreter mode on CPU (same trace as TPU minus
Mosaic codegen; the on-hardware check is in the verify flow)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beom_tpu.cases import make_case
from beom_tpu.solvers import elliptic
from beom_tpu.stencils.cg_vmem import make_vmem_cg_solve


def _setup(case="rigid_lid", **kw):
    cfg, grid, forcing, state = make_case(case, **kw)
    # a rough but structured RHS supported on the wet mask
    ny, nx = grid.mask.shape
    y = jnp.linspace(0, 4 * np.pi, ny)[:, None]
    x = jnp.linspace(0, 2 * np.pi, nx)[None, :]
    b = (jnp.sin(y) * jnp.cos(x) + 0.3 * jnp.cos(3 * y)) * grid.mask
    return cfg, grid, b


@pytest.mark.parametrize("lam_kind", ["helmholtz", "neumann"])
def test_vmem_cg_matches_xla(lam_kind):
    cfg, grid, b = _setup(nx=64, ny=64, dtype="float64")
    lam = 0.0 if lam_kind == "neumann" else 1.0 / (cfg.g * cfg.dt ** 2)
    if lam_kind == "neumann":
        nwet = jnp.sum(grid.mask)
        b = (b - grid.mask * jnp.sum(b * grid.mask) / nwet) * grid.mask

    solve = make_vmem_cg_solve(grid, cfg, lam=lam, interpret=True)
    res = solve(b)
    ref = elliptic.cg_solve(b, grid, cfg, lam=lam)

    # both solves satisfy the same relative-residual criterion; compare
    # through the OPERATOR, not the iterates (CG paths differ at ulp)
    Hu, Hv = elliptic.face_depths(grid)
    r = np.asarray((b - elliptic.laplacian_H(res.x, Hu, Hv, grid, cfg,
                                             lam=lam)) * grid.mask)
    bn = float(jnp.sum(b * b)) ** 0.5
    assert np.linalg.norm(r) <= 2 * cfg.solver_tol * bn * 10
    assert int(res.iters) > 0
    assert float(res.resnorm) <= (np.asarray(ref.resnorm) * 100 + 1e-25)
    # and the two solutions agree to solver tolerance
    scale = max(np.abs(np.asarray(ref.x)).max(), 1e-30)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=0, atol=1e-6 * scale)


def test_vmem_cg_warm_start():
    cfg, grid, b = _setup(nx=64, ny=64, dtype="float64")
    lam = 1.0 / (cfg.g * cfg.dt ** 2)
    solve = make_vmem_cg_solve(grid, cfg, lam=lam, interpret=True)
    cold = solve(b)
    warm = solve(b, x0=cold.x)
    assert int(warm.iters) <= max(int(cold.iters) // 4, 1)


def test_vmem_cg_rejects_oversized_grid():
    cfg, grid, b = _setup(nx=64, ny=64)
    with pytest.raises(ValueError, match="VMEM"):
        make_vmem_cg_solve(grid, cfg, lam=0.0,
                           vmem_limit_bytes=64 * 1024)
