"""1-device vs N-device equivalence (SURVEY.md §5.5 — "the
distributed-stencil race class"): the same run on a 2x4 virtual CPU mesh
must reproduce the single-device trajectory.  Any halo off-by-one,
wrong corner exchange, or insufficient halo width fails these.
"""

import numpy as np
import pytest

import jax

from beom_tpu.cases import make_case
from beom_tpu.parallel.dist import make_dist_stepper, required_halo
from beom_tpu.parallel.mesh import make_mesh, shard_state
from beom_tpu.stepping import run_steps

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

N_STEPS = 24


def _compare(case, mesh_shape=(2, 4), n=N_STEPS, atol=1e-11, **kw):
    cfg, grid, forcing, state = make_case(case, dtype="float64", **kw)
    ref = run_steps(state, grid, forcing, cfg, n)

    mesh = make_mesh(*mesh_shape)
    step = make_dist_stepper(grid, forcing, cfg, mesh, n_inner=n)
    out = step(shard_state(state, mesh))

    np.testing.assert_allclose(np.asarray(out.h), np.asarray(ref.h),
                               rtol=0, atol=atol)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               rtol=0, atol=atol)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                               rtol=0, atol=atol)
    assert np.abs(np.asarray(ref.u)).max() > 0  # the run did something


def test_fb_double_gyre():
    _compare("double_gyre", nx=64, ny=64)


def test_fb_two_layer():
    _compare("two_layer", nx=64, ny=64)


def test_fb_wetdry():
    # wetdry halo (17) needs local blocks >= 17: 96/4 = 24 wide
    _compare("coastal_wetdry", nx=96, ny=64)


def test_fb_shelf_obc_tides():
    _compare("shelf_forced", nx=96, ny=64)


def test_split():
    _compare("double_gyre", nx=64, ny=64, scheme="split", nsub=2)


def test_split_large_nsub():
    # per-substep exchange: halo must NOT grow with nsub
    _compare("double_gyre", nx=64, ny=64, scheme="split", nsub=12)


def test_rigid_lid_distributed_cg():
    # CG iteration counts can differ microscopically through psum order;
    # tolerance covers solver-level (not halo-level) differences
    _compare("rigid_lid", nx=64, ny=64, atol=1e-8)


def test_implicit_fs():
    _compare("double_gyre", nx=64, ny=64, scheme="implicit_fs", atol=1e-8)


def test_rigid_lid_distributed_redblack():
    # red-black: identical sweep count and global checkerboard on both
    # paths -> tight equivalence, no global reductions involved
    _compare("rigid_lid", nx=64, ny=64, atol=1e-10, solver="redblack",
             solver_maxiter=150)


def test_mesh_1xN_and_Nx1():
    # 8-way split of one axis: 128/8 = 16 >= the 14-cell fb halo
    _compare("double_gyre", nx=128, ny=128, mesh_shape=(1, 8), n=10)
    _compare("double_gyre", nx=128, ny=128, mesh_shape=(8, 1), n=10)


def test_halo_bound_documented():
    # >= 4: _dist_continuity_finalize's fixed w2=4 inner pad must fit;
    # the true lower bound is pinned by tests/dist/test_halo_probe.py
    cfg, *_ = make_case("double_gyre", nx=64, ny=64)
    assert required_halo(cfg) >= 4
