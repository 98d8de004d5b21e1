"""On-device diagnostics (SURVEY.md §3 C15, §6 metrics/observability).

All scalars are computed with jnp reductions on device so a single
device->host transfer per diagnostic interval moves a handful of floats,
never fields.  Under shard_map the same code runs per-shard; the
distributed wrapper sums with lax.psum (parallel/).

`diagnostics(state, grid, cfg)` returns a dict of () arrays:
  mass      — total water volume  sum h dx dy           [m^3]
  ke        — kinetic energy  0.5 rho0 sum h (u^2+v^2)  [J]
  pe        — available potential energy of the layer interfaces [J]
  max_speed — max |u|, |v|                              [m/s]
  cfl       — max (|u|/dx + |v|/dy) dt                  [-]
  eta_rms   — rms free-surface elevation                [m]
  finite    — 1.0 iff every prognostic value is finite (NaN/Inf guard,
              §6 failure detection)
"""

from __future__ import annotations

import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid
from beom_tpu.core.state import State


def energies(state: State, grid: Grid, cfg: Config):
    """(ke, pe) volume-integrated, per SURVEY.md §5.2 energy budget.

    PE uses the layered form 0.5 rho0 sum_k g'_k z_k^2 with z_k the
    interface elevations (g'_1 = g, z_1 = eta): quadratic in the
    displacement, so it is the *available* PE for small amplitude.
    """
    h, u, v = state.h, state.u, state.v
    dA = cfg.dx * cfg.dy
    ke = 0.5 * cfg.rho0 * jnp.sum(
        h * (ops.a_xm(u * u) + ops.a_ym(v * v))) * dA

    eta = jnp.sum(h, axis=0) - grid.H
    below = jnp.cumsum(h, axis=0) - h
    z_top = (eta[None] - below) * grid.mask
    # reference interface positions for APE: rest-state interfaces
    gp = jnp.asarray(cfg.gprime, h.dtype)[:, None, None]
    pe = 0.5 * cfg.rho0 * jnp.sum(gp * z_top * z_top) * dA
    return ke, pe


def diagnostics(state: State, grid: Grid, cfg: Config):
    h, u, v = state.h, state.u, state.v
    ke, pe = energies(state, grid, cfg)
    eta = (jnp.sum(h, axis=0) - grid.H) * grid.mask
    nwet = jnp.maximum(jnp.sum(grid.mask), 1.0)
    spd = jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v)))
    cfl = jnp.max(jnp.abs(u) / cfg.dx + jnp.abs(v) / cfg.dy) * cfg.dt
    finite = (jnp.isfinite(h).all() & jnp.isfinite(u).all()
              & jnp.isfinite(v).all()).astype(h.dtype)
    return {
        "t": state.t,
        "n": state.n,
        "mass": jnp.sum(h) * cfg.dx * cfg.dy,
        "ke": ke,
        "pe": pe,
        "max_speed": spd,
        "cfl": cfl,
        "eta_rms": jnp.sqrt(jnp.sum(eta * eta) / nwet),
        "finite": finite,
    }
