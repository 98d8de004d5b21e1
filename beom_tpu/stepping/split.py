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

Structure: `slow_phase` (stencil radius of one fb momentum evaluation)
and `subcycle_phase` (radius 1 per substep, exchange hooks pluggable)
are split so the distributed stepper can run the slow phase pad-once
and the subcycle with cheap per-substep 2-D halo exchanges
(parallel/dist.py) instead of a 2*nsub-wide halo.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing
from beom_tpu.core.state import State
from beom_tpu.physics import continuity, drag
from beom_tpu.stepping import fb


class SlowPhase(NamedTuple):
    """Everything the subcycle + recompose needs, at time n."""
    up: jax.Array        # (nz, ny, nx) shear velocities
    vp: jax.Array
    du_p: jax.Array      # shear tendencies
    dv_p: jax.Array
    du_bar: jax.Array    # (ny, nx) depth-mean tendencies
    dv_bar: jax.Array
    ubar: jax.Array      # (ny, nx) barotropic velocities
    vbar: jax.Array
    Hu: jax.Array        # (ny, nx) face column depths
    Hv: jax.Array
    eta0: jax.Array      # (ny, nx) free surface
    cu: jax.Array        # (nz, ny, nx) implicit drag coefficients
    cv: jax.Array


def slow_phase(state: State, grid: Grid, forcing: Forcing,
               cfg: Config) -> SlowPhase:
    h, u, v = state.h, state.u, state.v

    hu = ops.a_xp(h) * grid.mask_u          # face thickness per layer
    hv = ops.a_yp(h) * grid.mask_v
    Hu = jnp.maximum(jnp.sum(hu, axis=0), cfg.h_min)
    Hv = jnp.maximum(jnp.sum(hv, axis=0), cfg.h_min)
    ubar = jnp.sum(hu * u, axis=0) / Hu
    vbar = jnp.sum(hv * v, axis=0) / Hv

    du_c, dv_c = fb._common_tendencies(h, u, v, grid, forcing, cfg,
                                       free_surface=False)
    q, U, V = fb._pv_and_fluxes(h, u, v, grid, cfg)
    du_s = du_c + ops.a_ym(q * ops.a_xp(V))
    dv_s = dv_c - ops.a_xm(q * ops.a_yp(U))

    du_bar = jnp.sum(hu * du_s, axis=0) / Hu
    dv_bar = jnp.sum(hv * dv_s, axis=0) / Hv

    cu, cv = drag.bottom_drag_coeff(h, u, v, grid, cfg)
    eta0 = (jnp.sum(h, axis=0) - grid.H) * grid.mask
    return SlowPhase(up=u - ubar[None], vp=v - vbar[None],
                     du_p=du_s - du_bar[None], dv_p=dv_s - dv_bar[None],
                     du_bar=du_bar, dv_bar=dv_bar, ubar=ubar, vbar=vbar,
                     Hu=Hu, Hv=Hv, eta0=eta0, cu=cu, cv=cv)


def subcycle_phase(sp: SlowPhase, grid: Grid, cfg: Config,
                   pad1: Optional[Callable] = None,
                   crop1: Optional[Callable] = None):
    """nsub FB substeps on (eta, ubar, vbar); returns
    (eta_f, ubar_f, vbar_f, ubar_avg, vbar_avg).

    pad1/crop1 (default identity) are the distributed 1-halo exchange
    hooks: each substep's divergence and gradient reach one neighbour
    cell, so one exchange of the three 2-D fields per substep suffices
    regardless of nsub.
    """
    if pad1 is None:
        def pad1(a):
            return a

        def crop1(a):
            return a

    dte = cfg.dt / cfg.nsub

    # fori_loop (not scan): static trip count, tuple carry — this is the
    # one loop shape that also lowers inside the fused Pallas band
    # kernel (stencils/fused_fb.py), so the XLA, shard_map and Pallas
    # tiers share this single subcycle implementation.
    def sub(_, carry):
        eta, ub, vb, su, sv = carry
        Uep = pad1(sp.Hu) * pad1(ub)
        Vep = pad1(sp.Hv) * pad1(vb)
        div = crop1(ops.d_xm(Uep, cfg.dx) + ops.d_ym(Vep, cfg.dy))
        eta1 = (eta - dte * div) * grid.mask
        etap = pad1(eta1)
        ub1 = (ub + dte * (-cfg.g * crop1(ops.d_xp(etap, cfg.dx))
                           + sp.du_bar)) * grid.mask_u
        vb1 = (vb + dte * (-cfg.g * crop1(ops.d_yp(etap, cfg.dy))
                           + sp.dv_bar)) * grid.mask_v
        return (eta1, ub1, vb1, su + ub1, sv + vb1)

    z = jnp.zeros_like(sp.ubar)
    eta_f, ubar_f, vbar_f, su, sv = jax.lax.fori_loop(
        0, cfg.nsub, sub, (sp.eta0, sp.ubar, sp.vbar, z, z))
    return eta_f, ubar_f, vbar_f, su / cfg.nsub, sv / cfg.nsub


def recompose(sp: SlowPhase, eta_f, ubar_f, vbar_f, ubar_avg, vbar_avg,
              h, grid: Grid, cfg: Config):
    """Steps 4-5: layer velocities + continuity + column rescale."""
    dt = cfg.dt
    u1 = ((sp.up + dt * sp.du_p + ubar_f[None])
          / (1.0 + dt * sp.cu)) * grid.mask_u
    v1 = ((sp.vp + dt * sp.dv_p + vbar_f[None])
          / (1.0 + dt * sp.cv)) * grid.mask_v

    u_adv = (sp.up + ubar_avg[None]) * grid.mask_u
    v_adv = (sp.vp + vbar_avg[None]) * grid.mask_v
    dh = continuity.continuity_rhs(h, u_adv, v_adv, grid, cfg)
    h1 = (h + dt * dh) * grid.mask

    # pin the column to the subcycled free surface (mass-consistency
    # rescale; exact where the column is wet)
    col = jnp.maximum(jnp.sum(h1, axis=0), cfg.h_min)
    target = jnp.maximum(grid.H + eta_f, 0.0) * grid.mask
    h1 = h1 * jnp.where(col > cfg.h_min, target / col, 1.0)[None]
    return h1, u1, v1


def split_step(state: State, grid: Grid, forcing: Forcing,
               cfg: Config) -> State:
    sp = slow_phase(state, grid, forcing, cfg)
    eta_f, ubar_f, vbar_f, ub_a, vb_a = subcycle_phase(sp, grid, cfg)
    h1, u1, v1 = recompose(sp, eta_f, ubar_f, vbar_f, ub_a, vb_a,
                           state.h, grid, cfg)
    return fb.finalize(h1, u1, v1, state, grid, forcing, cfg)
