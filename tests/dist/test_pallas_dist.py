"""The composed tier (r1 VERDICT item 1): fused Pallas band kernels
running inside shard_map with in-kernel RDMA y-halo exchange must
reproduce the single-device XLA trajectory — the same 1-vs-N
equivalence bar as the XLA distributed path (tests/dist/
test_equivalence.py), via the Pallas TPU interpreter on the 8-virtual-
device CPU mesh.
"""

import numpy as np
import pytest

import jax

from beom_tpu.cases import make_case
from beom_tpu.parallel.dist import make_dist_stepper
from beom_tpu.parallel.mesh import make_mesh, shard_state
from beom_tpu.stepping import run_steps

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _compare(case, mesh_shape, n=6, atol=1e-11, **kw):
    cfg, grid, forcing, state = make_case(case, dtype="float64",
                                          backend="pallas", **kw)
    ref = run_steps(state, grid, forcing, cfg, n)

    mesh = make_mesh(*mesh_shape)
    step = make_dist_stepper(grid, forcing, cfg, mesh, n_inner=n)
    out = step(shard_state(state, mesh))

    for f in "huv":
        np.testing.assert_allclose(np.asarray(getattr(out, f)),
                                   np.asarray(getattr(ref, f)),
                                   rtol=0, atol=atol)
    assert np.abs(np.asarray(ref.u)).max() > 0


def test_fb_y_decomposed():
    # mesh_x == 1: in-kernel x rolls ARE the global wrap (no x pad)
    _compare("double_gyre", (4, 1), nx=64, ny=192)


def test_fb_2d_mesh():
    # mesh_x > 1: ppermute x pad outside, RDMA y halos inside; corners
    # ride the y exchange of the x-padded edge rows
    _compare("double_gyre", (2, 4), nx=128, ny=96)


def test_fb_two_layer_2d_mesh():
    _compare("two_layer", (2, 2), nx=64, ny=96)


def test_fb_wetdry():
    # wy = 24: local block needs >= 2*24 + 8 rows
    _compare("coastal_wetdry", (2, 2), nx=64, ny=192)


def test_fb_shelf_obc_tides():
    _compare("shelf_forced", (2, 2), nx=64, ny=192)


def test_split():
    # nsub=2 -> wy = 24
    _compare("double_gyre", (2, 2), nx=64, ny=192, scheme="split",
             nsub=2)


def test_split_larger_nsub():
    # nsub=8 -> wy = 32: subcycle dependence cone absorbed in-kernel
    _compare("double_gyre", (2, 1), nx=64, ny=256, scheme="split",
             nsub=8)


def test_fb_temporal_blocking_k2():
    """r4 VERDICT item 3: steps_per_pass=2 under the mesh — two model
    steps per band pass with a 16-row RDMA halo must reproduce the
    single-device XLA trajectory exactly (the k-wide cone is covered,
    so no band lag; ICI exchanges per model step are halved)."""
    cfg, grid, forcing, state = make_case(
        "double_gyre", dtype="float64", backend="pallas",
        steps_per_pass=2, nx=64, ny=192)
    ref = run_steps(state, grid, forcing, cfg, 6)

    mesh = make_mesh(2, 2)
    step = make_dist_stepper(grid, forcing, cfg, mesh, n_inner=3)
    out = step(shard_state(state, mesh))

    for f in "huv":
        np.testing.assert_allclose(np.asarray(getattr(out, f)),
                                   np.asarray(getattr(ref, f)),
                                   rtol=0, atol=1e-11)
    assert int(out.n) == 6


def test_rigid_lid_projection_composed():
    """r3 VERDICT item 3: band phases A/B per shard around the
    distributed MG-CG solve (make_dist_pallas_projection_stepper);
    tolerance matches the XLA dist-equivalence bar for the iterative
    solve (solver tol amplifies band-phase ulp diffs)."""
    _compare("rigid_lid", (2, 2), nx=64, ny=192, atol=1e-8)


def test_implicit_fs_projection_composed():
    _compare("double_gyre", (2, 2), nx=64, ny=192,
             scheme="implicit_fs", atol=1e-8)
