"""Pallas RDMA halo exchange (SURVEY.md §3 C21, parallel/rdma_halo.py)
on the 8-virtual-device CPU mesh: the TPU interpreter simulates the
cross-device DMAs, so the same kernel that issues ICI RDMA on hardware
is correctness-tested in plain pytest.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from beom_tpu.cases import make_case
from beom_tpu.parallel import halo
from beom_tpu.parallel.dist import make_dist_stepper
from beom_tpu.parallel.mesh import make_mesh, shard_state
from beom_tpu.parallel.rdma_halo import rdma_pad2d
from beom_tpu.stepping import run_steps

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (8, 1)])
@pytest.mark.parametrize("w", [1, 3])
def test_rdma_pad2d_matches_ppermute(mesh_shape, w):
    mesh = make_mesh(*mesh_shape)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((3, 32, 64)), jnp.float32)

    def both(x):
        return rdma_pad2d(x, w), halo.pad2d(x, w)

    fn = jax.jit(shard_map(
        both, mesh=mesh,
        in_specs=P(None, "y", "x"),
        out_specs=(P(None, "y", "x"), P(None, "y", "x"))))
    got, ref = fn(a)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rdma_pad2d_2d_field():
    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)

    def both(x):
        return rdma_pad2d(x, 2), halo.pad2d(x, 2)

    fn = jax.jit(shard_map(both, mesh=mesh,
                           in_specs=P("y", "x"),
                           out_specs=(P("y", "x"), P("y", "x"))))
    got, ref = fn(a)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fb_step_rdma_halo_equivalence():
    """Full distributed fb run with halo_impl='rdma' reproduces the
    single-device trajectory (the same bar as test_equivalence.py)."""
    cfg, grid, forcing, state = make_case(
        "double_gyre", nx=64, ny=64, dtype="float64",
        halo_impl="rdma")
    n = 12
    ref = run_steps(state, grid, forcing, cfg, n)

    mesh = make_mesh(2, 4)
    step = make_dist_stepper(grid, forcing, cfg, mesh, n_inner=n)
    out = step(shard_state(state, mesh))

    for f in "huv":
        np.testing.assert_allclose(np.asarray(getattr(out, f)),
                                   np.asarray(getattr(ref, f)),
                                   rtol=0, atol=1e-11)
    assert np.abs(np.asarray(ref.u)).max() > 0
