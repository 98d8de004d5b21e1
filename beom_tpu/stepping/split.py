"""Split barotropic / baroclinic stepping (SURVEY.md §1.3 item 2,
component C13).

The fast external gravity wave (speed sqrt(g H)) is integrated by an
inner forward-backward subcycle on the barotropic variables
(eta, ubar, vbar) with the short step dt_e = dt / nsub, while the slow
baroclinic dynamics advance with the long dt:

  1. slow tendencies G_k = full momentum RHS at time n (PV-form Coriolis,
     internal pressure, viscosity, wind, sponge) with the surface-
     pressure term -g grad(eta) excluded;
  2. depth-mean Gbar (thickness-weighted) and shear part G'_k = G_k - Gbar;
  3. nsub-fold FB subcycle:  eta <- eta - dt_e div(H_face ubar)   then
     ubar <- ubar + dt_e (-g grad eta_new + Gbar)   (lax.scan, static
     length — SURVEY.md §8 hard part 6), accumulating the subcycle-mean
     barotropic velocity <ubar>;
  4. layer velocities recomposed: u_k = (u'_k + dt G'_k) + ubar_final,
     with implicit bottom drag division at the end;
  5. layer continuity advects h with u'_k + <ubar> — the *time-averaged*
     barotropic flow — so the free surface implied by sum h stays
     consistent with the subcycled eta (standard split-explicit
     consistency choice); a final rescale pins sum_k h_k to H + eta
     exactly.

Coriolis acting on the barotropic mode rides in Gbar (evaluated once per
long step): with dt limited by advective speeds, f*dt << 1, so the
subcycle only needs the gravity-wave terms — the classic justification
for split-explicit schemes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing
from beom_tpu.core.state import State
from beom_tpu.physics import continuity, drag
from beom_tpu.stepping import fb


def split_step(state: State, grid: Grid, forcing: Forcing,
               cfg: Config) -> State:
    dt = cfg.dt
    nsub = cfg.nsub
    dte = dt / nsub
    h, u, v = state.h, state.u, state.v

    # --- decompose into barotropic + shear ----------------------------
    hu = ops.a_xp(h) * grid.mask_u          # face thickness per layer
    hv = ops.a_yp(h) * grid.mask_v
    Hu = jnp.maximum(jnp.sum(hu, axis=0), cfg.h_min)
    Hv = jnp.maximum(jnp.sum(hv, axis=0), cfg.h_min)
    ubar = jnp.sum(hu * u, axis=0) / Hu
    vbar = jnp.sum(hv * v, axis=0) / Hv
    up = u - ubar[None]
    vp = v - vbar[None]

    # --- slow tendencies (no surface pressure) ------------------------
    du_c, dv_c = fb._common_tendencies(h, u, v, grid, forcing, cfg,
                                       free_surface=False)
    q, U, V = fb._pv_and_fluxes(h, u, v, grid, cfg)
    du_s = du_c + ops.a_ym(q * ops.a_xp(V))
    dv_s = dv_c - ops.a_xm(q * ops.a_yp(U))

    du_bar = jnp.sum(hu * du_s, axis=0) / Hu
    dv_bar = jnp.sum(hv * dv_s, axis=0) / Hv
    du_p = du_s - du_bar[None]
    dv_p = dv_s - dv_bar[None]

    # --- barotropic FB subcycle ---------------------------------------
    eta0 = (jnp.sum(h, axis=0) - grid.H) * grid.mask

    def sub(carry, _):
        eta, ub, vb, su, sv = carry
        Ue = Hu * ub
        Ve = Hv * vb
        eta1 = (eta - dte * (ops.d_xm(Ue, cfg.dx)
                             + ops.d_ym(Ve, cfg.dy))) * grid.mask
        ub1 = (ub + dte * (-cfg.g * ops.d_xp(eta1, cfg.dx)
                           + du_bar)) * grid.mask_u
        vb1 = (vb + dte * (-cfg.g * ops.d_yp(eta1, cfg.dy)
                           + dv_bar)) * grid.mask_v
        return (eta1, ub1, vb1, su + ub1, sv + vb1), None

    (eta_f, ubar_f, vbar_f, su, sv), _ = jax.lax.scan(
        sub, (eta0, ubar, vbar, jnp.zeros_like(ubar), jnp.zeros_like(vbar)),
        None, length=nsub)
    ubar_avg = su / nsub
    vbar_avg = sv / nsub

    # --- recompose layer velocities, implicit bottom drag -------------
    cu, cv = drag.bottom_drag_coeff(h, u, v, grid, cfg)
    u1 = ((up + dt * du_p + ubar_f[None]) / (1.0 + dt * cu)) * grid.mask_u
    v1 = ((vp + dt * dv_p + vbar_f[None]) / (1.0 + dt * cv)) * grid.mask_v

    # --- layer continuity with time-averaged barotropic flow ----------
    u_adv = (up + ubar_avg[None]) * grid.mask_u
    v_adv = (vp + vbar_avg[None]) * grid.mask_v
    dh = continuity.continuity_rhs(h, u_adv, v_adv, grid, cfg)
    h1 = (h + dt * dh) * grid.mask

    # pin the column to the subcycled free surface (mass-consistency
    # rescale; exact where the column is wet)
    col = jnp.maximum(jnp.sum(h1, axis=0), cfg.h_min)
    target = jnp.maximum(grid.H + eta_f, 0.0) * grid.mask
    h1 = h1 * jnp.where(col > cfg.h_min, target / col, 1.0)[None]

    return fb.finalize(h1, u1, v1, state, grid, forcing, cfg)
