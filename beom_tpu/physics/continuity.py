"""Layer continuity: dh/dt = -div(h u) (SURVEY.md §1.1, component C4),
with the positive-definite wet/dry flux limiter of C11.

Face thickness is the centred two-point average in open water and switches
to first-order upwind where either neighbour is thin — the standard
positivity-preserving choice.  The limiter then rescales each cell's
*outgoing* fluxes so one forward step cannot take h below cfg.h_min;
because only fluxes are scaled, total mass is conserved to round-off
(property test: tests/unit/test_conservation.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid


def mass_fluxes(h, u, v, grid: Grid, cfg: Config):
    """Face mass fluxes (Fx at u points, Fy at v points), per layer.

    Fx[k, j, i] = h_face * u  [m^2/s]; wet/dry limiting applied if enabled.
    """
    hx = ops.a_xp(h)
    hy = ops.a_yp(h)
    if cfg.wetdry:
        thin = 2.0 * cfg.h_dry
        hx_up = jnp.where(u > 0, h, ops.sxp(h))
        hy_up = jnp.where(v > 0, h, ops.syp(h))
        hx = jnp.where(jnp.minimum(h, ops.sxp(h)) < thin, hx_up, hx)
        hy = jnp.where(jnp.minimum(h, ops.syp(h)) < thin, hy_up, hy)
        hx = jnp.maximum(hx, 0.0)
        hy = jnp.maximum(hy, 0.0)
    Fx = grid.mask_u * hx * u
    Fy = grid.mask_v * hy * v

    if cfg.wetdry:
        # outflow rate [m/s of thickness] each cell would lose this step
        out = (jnp.maximum(Fx, 0.0) + jnp.maximum(-ops.sxm(Fx), 0.0)) / cfg.dx \
            + (jnp.maximum(Fy, 0.0) + jnp.maximum(-ops.sym(Fy), 0.0)) / cfg.dy
        avail = jnp.maximum(h - cfg.h_min, 0.0)
        need = out * cfg.dt
        scale = jnp.where(need > avail, avail / jnp.maximum(need, 1e-30), 1.0)
        # each flux is scaled by its donor cell's factor
        Fx = Fx * jnp.where(Fx > 0, scale, ops.sxp(scale))
        Fy = Fy * jnp.where(Fy > 0, scale, ops.syp(scale))
    return Fx, Fy


def continuity_rhs(h, u, v, grid: Grid, cfg: Config):
    """dh/dt = -(dFx/dx + dFy/dy) at centres, per layer (nz, ny, nx)."""
    Fx, Fy = mass_fluxes(h, u, v, grid, cfg)
    return -(ops.d_xm(Fx, cfg.dx) + ops.d_ym(Fy, cfg.dy)) * grid.mask
