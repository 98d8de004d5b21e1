"""Open boundaries: tides, Flather radiation, sponge nudging
(SURVEY.md §3 component C10; BASELINE.md config 5).

  * Tidal elevation  eta_ext(t, x, y) = sum_c amp_c(x,y) cos(w_c t - phi_c(x,y))
    with constituent frequencies w_c static in cfg.tides and amplitude /
    phase maps in Forcing.
  * Flather radiation on flagged open faces sets the *barotropic* normal
    velocity to  u_ext + n sqrt(g/H) (eta - eta_ext)  — outgoing surface
    gravity waves leave, the external (tidal) signal enters.  The flag map
    Forcing.obc_u/obc_v stores the outward normal sign (+1 east/north,
    -1 west/south, 0 closed).  Layer velocities are shifted by a common
    barotropic increment so baroclinic shear is untouched.
  * Sponge: Newtonian relaxation of h toward Forcing.h_ext and of u, v
    toward rest at rate Forcing.sponge [1/s] (a map, usually ramping up
    toward the boundary).
"""

from __future__ import annotations

import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing


def eta_ext(t, forcing: Forcing, cfg: Config, dtype):
    """External (tidal) elevation map at time t, (ny, nx)."""
    out = jnp.zeros(forcing.tide_amp.shape[1:], dtype)
    for c, omega in enumerate(cfg.tides):
        out = out + forcing.tide_amp[c] * jnp.cos(
            omega * t - forcing.tide_phase[c])
    return out


def sponge_rhs(h, u, v, forcing: Forcing, cfg: Config):
    """(dh, du, dv) Newtonian nudging tendencies (zeros if disabled)."""
    if not cfg.sponge:
        z = jnp.zeros_like(h)
        return z, z, z
    g = forcing.sponge
    dh = g * (forcing.h_ext - h)
    du = -ops.a_xp(g) * u
    dv = -ops.a_yp(g) * v
    return dh, du, dv


def apply_flather(h, u, v, grid: Grid, forcing: Forcing, cfg: Config, t):
    """Post-step barotropic Flather correction on open faces."""
    if not cfg.obc:
        return u, v
    dtype = h.dtype
    eta = jnp.sum(h, axis=0) - grid.H
    e_ext = eta_ext(t, forcing, cfg, dtype)
    hsum = jnp.maximum(jnp.sum(h, axis=0), cfg.h_min)

    # barotropic (thickness-weighted) velocities at faces
    hu = jnp.maximum(ops.a_xp(h), cfg.h_min)
    hv = jnp.maximum(ops.a_yp(h), cfg.h_min)
    ubar = jnp.sum(hu * u, axis=0) / jnp.sum(hu, axis=0)
    vbar = jnp.sum(hv * v, axis=0) / jnp.sum(hv, axis=0)

    Hu = jnp.maximum(ops.a_xp(hsum), cfg.h_min)
    Hv = jnp.maximum(ops.a_yp(hsum), cfg.h_min)
    cu = jnp.sqrt(cfg.g / Hu)
    cv = jnp.sqrt(cfg.g / Hv)

    # interior eta seen from the face: the wet-side value
    eta_u = ops.a_xp(eta * grid.mask) * 2.0 / jnp.maximum(
        grid.mask + ops.sxp(grid.mask), 1.0)
    eta_v = ops.a_yp(eta * grid.mask) * 2.0 / jnp.maximum(
        grid.mask + ops.syp(grid.mask), 1.0)
    eext_u = ops.a_xp(e_ext)
    eext_v = ops.a_yp(e_ext)

    u_tgt = forcing.obc_u * cu * (eta_u - eext_u)
    v_tgt = forcing.obc_v * cv * (eta_v - eext_v)

    on_u = jnp.abs(forcing.obc_u)
    on_v = jnp.abs(forcing.obc_v)
    u = u + on_u * (u_tgt - ubar)[None]
    v = v + on_v * (v_tgt - vbar)[None]
    return u, v


def apply_clamp(h, grid: Grid, forcing: Forcing, cfg: Config, t):
    """Clamp exterior (obc_h) cells to h_ext, tidal elevation in layer 1."""
    if not cfg.obc:
        return h
    e = eta_ext(t, forcing, cfg, h.dtype)
    tgt = forcing.h_ext.at[0].add(e)
    return jnp.where(forcing.obc_h[None] > 0, tgt, h)
