"""C-grid operator algebra (SURVEY.md §1.2, layer L1).

All fields are arrays of shape (..., ny, nx); axis -1 is x, axis -2 is y.
Staggering convention (Arakawa C):

    h[j, i]  at cell center   (x_i,      y_j)
    u[j, i]  at east  face    (x_{i+1/2}, y_j)
    v[j, i]  at north face    (x_i,      y_{j+1/2})
    q[j, i]  at corner        (x_{i+1/2}, y_{j+1/2})   (vorticity / PV)

Every operator is a periodic (wrap-around) shift built on `jnp.roll`.
Physical boundaries are imposed *only* through masks: a closed basin is a
wet region surrounded by a ring of land cells, so the periodic wrap never
transports signal across walls.  This single convention is what makes the
distributed path trivial (SURVEY.md §3 C20-C21): a global roll equals a
local roll on a halo-padded shard, so the identical operator code runs in
both the single-chip and the `shard_map` paths.

Naming: `xp` = toward +x by half a cell (result lives half a cell to the
east of its input), `xm` = toward -x, similarly `yp`/`ym`.

    d_xp(h) : center -> u-face   (h[i+1]-h[i])/dx  at i+1/2
    d_xm(u) : u-face -> center   (u[i]-u[i-1])/dx  at i
    a_xp(h) : center -> u-face   average
    a_ym(q) : corner -> u-face   average
etc.  These compose into every stencil in physics/ (C4-C11).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "sxp", "sxm", "syp", "sym",
    "d_xp", "d_xm", "d_yp", "d_ym",
    "a_xp", "a_xm", "a_yp", "a_ym",
]

_X, _Y = -1, -2


def sxp(a):
    """a[..., j, i+1] (periodic)."""
    return jnp.roll(a, -1, _X)


def sxm(a):
    """a[..., j, i-1] (periodic)."""
    return jnp.roll(a, 1, _X)


def syp(a):
    """a[..., j+1, i] (periodic)."""
    return jnp.roll(a, -1, _Y)


def sym(a):
    """a[..., j-1, i] (periodic)."""
    return jnp.roll(a, 1, _Y)


# -- differences -------------------------------------------------------

def d_xp(a, dx):
    """(a[i+1] - a[i]) / dx — result staggered +x/2 from input."""
    return (sxp(a) - a) * (1.0 / dx)


def d_xm(a, dx):
    """(a[i] - a[i-1]) / dx — result staggered -x/2 from input."""
    return (a - sxm(a)) * (1.0 / dx)


def d_yp(a, dy):
    return (syp(a) - a) * (1.0 / dy)


def d_ym(a, dy):
    return (a - sym(a)) * (1.0 / dy)


# -- two-point averages ------------------------------------------------

def a_xp(a):
    """0.5 (a[i] + a[i+1]) — staggered +x/2."""
    return 0.5 * (a + sxp(a))


def a_xm(a):
    """0.5 (a[i-1] + a[i]) — staggered -x/2."""
    return 0.5 * (a + sxm(a))


def a_yp(a):
    return 0.5 * (a + syp(a))


def a_ym(a):
    return 0.5 * (a + sym(a))
