"""C-grid operator algebra unit tests (SURVEY.md §5.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from beom_tpu.core import ops


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_shifts_roundtrip(rng):
    a = jnp.asarray(rng.normal(size=(5, 8, 16)))
    np.testing.assert_array_equal(ops.sxm(ops.sxp(a)), a)
    np.testing.assert_array_equal(ops.sym(ops.syp(a)), a)


def test_shift_directions():
    a = jnp.arange(12.0).reshape(3, 4)
    # sxp(a)[j, i] == a[j, i+1]
    assert ops.sxp(a)[0, 0] == a[0, 1]
    assert ops.syp(a)[0, 0] == a[1, 0]
    assert ops.sxm(a)[0, 1] == a[0, 0]
    assert ops.sym(a)[1, 0] == a[0, 0]


def test_difference_adjointness(rng):
    """sum(a * d_xp(b)) == -sum(d_xm(a) * b) on a periodic domain."""
    a = jnp.asarray(rng.normal(size=(8, 16)))
    b = jnp.asarray(rng.normal(size=(8, 16)))
    dx = 3.7
    lhs = jnp.sum(a * ops.d_xp(b, dx))
    rhs = -jnp.sum(ops.d_xm(a, dx) * b)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    lhs = jnp.sum(a * ops.d_yp(b, dx))
    rhs = -jnp.sum(ops.d_ym(a, dx) * b)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_average_adjointness(rng):
    a = jnp.asarray(rng.normal(size=(8, 16)))
    b = jnp.asarray(rng.normal(size=(8, 16)))
    np.testing.assert_allclose(jnp.sum(a * ops.a_xp(b)),
                               jnp.sum(ops.a_xm(a) * b), rtol=1e-12)


def test_constant_fields(rng):
    c = jnp.full((8, 16), 2.5)
    np.testing.assert_allclose(ops.a_xp(c), c)
    np.testing.assert_allclose(ops.d_xp(c, 1.0), 0.0, atol=1e-14)
    np.testing.assert_allclose(ops.d_ym(c, 1.0), 0.0, atol=1e-14)


def test_linear_gradient_interior():
    """d_xp of a linear-in-x field equals the slope away from the wrap."""
    nx, ny, dx, s = 16, 8, 2.0, 3.0
    x = np.arange(nx) * dx
    a = jnp.asarray(np.broadcast_to(s * x, (ny, nx)))
    g = ops.d_xp(a, dx)
    np.testing.assert_allclose(np.asarray(g)[:, :-1], s, rtol=1e-12)
