"""Fault injection (SURVEY.md §6 failure detection): corrupt one
shard's data mid-run and verify the distributed NaN guard trips, and
that distributed diagnostics agree with the single-device ones.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beom_tpu.cases import make_case
from beom_tpu.diag import diagnostics
from beom_tpu.parallel.diag import make_dist_diagnostics
from beom_tpu.parallel.dist import make_dist_stepper
from beom_tpu.parallel.mesh import make_mesh, shard_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_dist_diagnostics_match_local():
    cfg, grid, forcing, state = make_case("double_gyre", nx=64, ny=64,
                                          dtype="float64")
    from beom_tpu.stepping import run_steps
    out = run_steps(state, grid, forcing, cfg, 30)

    mesh = make_mesh(2, 4)
    ddiag = make_dist_diagnostics(grid, cfg, mesh)
    d = ddiag(shard_state(out, mesh))
    ref = diagnostics(out, grid, cfg)
    for k in ("mass", "max_speed", "cfl", "eta_rms", "finite"):
        np.testing.assert_allclose(float(d[k]), float(ref[k]), rtol=1e-12,
                                   err_msg=k)


def test_corrupted_shard_trips_guard():
    cfg, grid, forcing, state = make_case("double_gyre", nx=64, ny=64,
                                          dtype="float64")
    mesh = make_mesh(2, 4)
    step = make_dist_stepper(grid, forcing, cfg, mesh, n_inner=2)
    s = shard_state(state, mesh)

    # inject a NaN into a single interior cell of one shard's block
    h = np.array(s.h)   # writable copy
    h[0, 40, 50] = np.nan
    s = s.replace(h=jnp.asarray(h))
    s = shard_state(s, mesh)

    out = step(s)
    ddiag = make_dist_diagnostics(grid, cfg, mesh)
    assert float(ddiag(out)["finite"]) == 0.0
