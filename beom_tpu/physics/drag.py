"""Bottom / interfacial drag and wind stress (SURVEY.md §1.1, component C9).

Bottom drag acts on the deepest layer:
    du/dt = -(r + c_d |u|) u / h      (linear + quadratic)
and is applied *implicitly* by the stepper — u <- u / (1 + dt c) with
c = (r + c_d |u|)/h — because explicit drag in thinning wet/dry cells is
unconditionally unstable as h -> 0.  This module therefore returns drag
*coefficients* c [1/s] at u/v points; stepping/fb.py does the division.

Wind stress tau/(rho0 h_1) on the top layer and the (weak) interfacial
drag r_int (u_k - u_neighbour)/h_k are ordinary explicit tendencies.
"""

from __future__ import annotations

import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing


def _speed_u(u, v):
    """|u| at u points: sqrt(u^2 + avg(v)^2), v 4-point averaged."""
    v4 = ops.a_xp(ops.a_ym(v))
    return jnp.sqrt(u * u + v4 * v4)


def _speed_v(u, v):
    u4 = ops.a_yp(ops.a_xm(u))
    return jnp.sqrt(v * v + u4 * u4)


def bottom_drag_coeff(h, u, v, grid: Grid, cfg: Config):
    """(cu, cv) [1/s] per layer; nonzero only in the bottom layer."""
    if cfg.r_bot == 0.0 and cfg.cd_bot == 0.0:
        z = jnp.zeros_like(u)
        return z, z
    kb = cfg.nz - 1      # positive index: h[-1] would emit a
    ub, vb = u[kb], v[kb]   # dynamic_slice, which Mosaic can't lower
    hu = jnp.maximum(ops.a_xp(h[kb]), cfg.h_min)
    hv = jnp.maximum(ops.a_yp(h[kb]), cfg.h_min)
    cu_b = (cfg.r_bot + cfg.cd_bot * _speed_u(ub, vb)) / hu
    cv_b = (cfg.r_bot + cfg.cd_bot * _speed_v(ub, vb)) / hv
    # concatenate instead of .at[-1].set: identical result, and it keeps
    # the layer axis free of scatter ops (and of zero-sized operands),
    # neither of which Pallas/Mosaic can lower (stencils/fused_fb.py
    # traces this inside the TPU kernel)
    if cfg.nz == 1:
        return cu_b[None], cv_b[None]
    zs = jnp.zeros((cfg.nz - 1,) + cu_b.shape, cu_b.dtype)
    cu = jnp.concatenate([zs, cu_b[None]], axis=0)
    cv = jnp.concatenate([zs, cv_b[None]], axis=0)
    return cu, cv


def wind(h, grid: Grid, forcing: Forcing, cfg: Config):
    """(du, dv) wind-stress tendency on layer 1 only."""
    z = jnp.zeros_like(h)
    if not cfg.wind:
        return z, z
    hu = jnp.maximum(ops.a_xp(h[0]), cfg.h_min)
    hv = jnp.maximum(ops.a_yp(h[0]), cfg.h_min)
    du0 = grid.mask_u * forcing.taux / (cfg.rho0 * hu)
    dv0 = grid.mask_v * forcing.tauy / (cfg.rho0 * hv)
    if cfg.nz == 1:
        return du0[None], dv0[None]
    zs = jnp.zeros((cfg.nz - 1,) + du0.shape, du0.dtype)
    du = jnp.concatenate([du0[None], zs], axis=0)
    dv = jnp.concatenate([dv0[None], zs], axis=0)
    return du, dv


def interfacial_drag(h, u, v, grid: Grid, cfg: Config):
    """Explicit layer-coupling drag r_int (u_adj - u_k) / h_k."""
    z = jnp.zeros_like(u)
    if cfg.r_int == 0.0 or cfg.nz < 2:
        return z, z
    hu = jnp.maximum(ops.a_xp(h), cfg.h_min)
    hv = jnp.maximum(ops.a_yp(h), cfg.h_min)

    def couple(w, hw):
        # stress from the layer above (k>0) and below (k<nz-1)
        above = jnp.pad(w[:-1] - w[1:], ((1, 0), (0, 0), (0, 0)))
        below = jnp.pad(w[1:] - w[:-1], ((0, 1), (0, 0), (0, 0)))
        return cfg.r_int * (above + below) / hw

    return couple(u, hu), couple(v, hv)
