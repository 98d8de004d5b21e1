"""Forward-backward time stepping (SURVEY.md §1.3, component C12).

Order per step (free-surface FB, stable to c dt/dx <~ 1/sqrt(2)):
  1. h^{n+1} = h^n + dt * [ -div(h u)^n + sponge ]           (forward)
  2. Montgomery M(h^{n+1})                                    (backward PG)
  3. momentum with -grad(M + K), viscosity, wind; the Coriolis/PV cross
     terms are themselves forward-backward *alternated*: on even steps u
     is updated first and v sees the new u; on odd steps the reverse —
     the classic FB-Coriolis treatment that removes the weak inertial
     instability of a simultaneous explicit update (C12 "alternating
     sweep order").
  4. bottom drag applied implicitly: u <- u / (1 + dt c) — unconditionally
     stable as wet/dry cells thin out.
  5. wet/dry gating, Flather OBC, exterior clamp.

Everything is pure: step(state) -> state, jit/scan/shard_map friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing
from beom_tpu.core.state import State
from beom_tpu.physics import continuity, drag, momentum, obc, pressure
from beom_tpu.physics import viscosity as visc
from beom_tpu.physics import wetdry


def _pv_and_fluxes(h, u, v, grid: Grid, cfg: Config):
    """PV (or f) at corners + the mass fluxes entering the cross terms."""
    if cfg.adv_scheme == "linear":
        return grid.f_q[None] * jnp.ones_like(h), u, v
    q = momentum.pv_corner(h, u, v, grid, cfg)
    return q, ops.a_xp(h) * u, ops.a_yp(h) * v


def _common_tendencies(h_new, u, v, grid: Grid, forcing: Forcing,
                       cfg: Config, free_surface: bool = True):
    """Momentum tendencies independent of the FB-Coriolis sweep order."""
    M = pressure.montgomery(h_new, grid, cfg, free_surface=free_surface)
    phi = M if cfg.adv_scheme == "linear" else M + momentum.kinetic_energy(u, v)
    du = -ops.d_xp(phi, cfg.dx)
    dv = -ops.d_yp(phi, cfg.dy)

    duv, dvv = visc.viscosity(u, v, grid, cfg)
    duw, dvw = drag.wind(h_new, grid, forcing, cfg)
    dui, dvi = drag.interfacial_drag(h_new, u, v, grid, cfg)
    du = du + duv + duw + dui
    dv = dv + dvv + dvw + dvi
    if cfg.sponge:
        _, dus, dvs = obc.sponge_rhs(h_new, u, v, forcing, cfg)
        du = du + dus
        dv = dv + dvs
    return du, dv


def continuity_update(state: State, grid: Grid, forcing: Forcing,
                      cfg: Config):
    """Step 1 of FB: h^{n+1} from old velocities (+ sponge, OBC clamp)."""
    h, u, v = state.h, state.u, state.v
    dh = continuity.continuity_rhs(h, u, v, grid, cfg)
    if cfg.sponge:
        dhs, _, _ = obc.sponge_rhs(h, u, v, forcing, cfg)
        dh = dh + dhs
    h1 = (h + cfg.dt * dh) * grid.mask
    return obc.apply_clamp(h1, grid, forcing, cfg, state.t + cfg.dt)


def momentum_update(h1, state: State, grid: Grid, forcing: Forcing,
                    cfg: Config, free_surface: bool = True,
                    parity=None):
    """Steps 2-4 of FB: (u1, v1) from new thickness h1.

    Backward pressure M(h1), alternating FB-Coriolis sweeps keyed on the
    step parity, implicit bottom drag.  `free_surface=False` drops the
    g*eta surface-pressure term for the projection steppers
    (stepping/projection.py), which supply it via the elliptic solve.

    parity: None (default) evaluates BOTH sweep orders and selects by
    state.n's parity — NOT lax.cond: XLA:TPU miscompiles the cond's
    branch computations at some shapes (r4, jax 0.9.0: nz=2 at 2048^2
    corrupts every 48th row of u by ~437x while the identical
    expressions compile correctly outside lax.cond; CPU is clean
    either way; probe in bench/hw_check.py).  True/False pins the
    sweep order at trace time (the distributed pad-run-crop tier keys
    it off the known step index).  parity="cond" keeps the runtime
    lax.cond for the Mosaic kernels only: Mosaic lowers it as a real
    scalar branch (measured 6% faster than per-parity kernels, r1
    item 5) and is not affected by the XLA:TPU branch miscompile
    (2-layer fused kernel validated finite at the failing shape).
    """
    u, v = state.u, state.v
    dt = cfg.dt
    du_c, dv_c = _common_tendencies(h1, u, v, grid, forcing, cfg,
                                    free_surface=free_surface)
    q, U, V = _pv_and_fluxes(h1, u, v, grid, cfg)
    cu, cv = drag.bottom_drag_coeff(h1, u, v, grid, cfg)

    def upd_u(uu, vv, VV):
        duq = ops.a_ym(q * ops.a_xp(VV))
        u_n = (uu + dt * (du_c + duq)) / (1.0 + dt * cu)
        return u_n * grid.mask_u

    def upd_v(vv, uu, UU):
        dvq = -ops.a_xm(q * ops.a_yp(UU))
        v_n = (vv + dt * (dv_c + dvq)) / (1.0 + dt * cv)
        return v_n * grid.mask_v

    def u_first(_):
        u1 = upd_u(u, v, V)
        U1 = u1 if cfg.adv_scheme == "linear" else ops.a_xp(h1) * u1
        v1 = upd_v(v, u1, U1)
        return u1, v1

    def v_first(_):
        v1 = upd_v(v, u, U)
        V1 = v1 if cfg.adv_scheme == "linear" else ops.a_yp(h1) * v1
        u1 = upd_u(u, v1, V1)
        return u1, v1

    if parity is None:
        even = state.n % 2 == 0
        u1a, v1a = u_first(None)
        u1b, v1b = v_first(None)
        u1 = jnp.where(even, u1a, u1b)
        v1 = jnp.where(even, v1a, v1b)
    elif parity == "cond":
        u1, v1 = jax.lax.cond(state.n % 2 == 0, u_first, v_first, None)
    else:
        u1, v1 = u_first(None) if parity else v_first(None)
    return u1, v1


def finalize(h1, u1, v1, state: State, grid: Grid, forcing: Forcing,
             cfg: Config) -> State:
    """Step 5 of FB: wet/dry gating + Flather OBC, then repack the State."""
    t1 = state.t + cfg.dt
    if cfg.wetdry:
        wet = wetdry.wet_mask(h1, grid, cfg)
        u1 = wetdry.gate_u(u1, wet, grid)
        v1 = wetdry.gate_v(v1, wet, grid)
    u1, v1 = obc.apply_flather(h1, u1, v1, grid, forcing, cfg, t1)
    return State(h=h1, u=u1, v=v1, t=t1, n=state.n + 1)


def fb_step(state: State, grid: Grid, forcing: Forcing, cfg: Config,
            parity=None) -> State:
    h1 = continuity_update(state, grid, forcing, cfg)
    u1, v1 = momentum_update(h1, state, grid, forcing, cfg, parity=parity)
    return finalize(h1, u1, v1, state, grid, forcing, cfg)


def make_stepper(grid: Grid, forcing: Forcing, cfg: Config):
    """Return a jitted `step(state) -> state` closing over static cfg."""
    def step(state: State) -> State:
        return fb_step(state, grid, forcing, cfg)
    return jax.jit(step)


def run_steps(state: State, grid: Grid, forcing: Forcing, cfg: Config,
              n_steps: int) -> State:
    """Advance n_steps inside a single XLA program (lax.scan over fb_step)."""
    def body(s, _):
        return fb_step(s, grid, forcing, cfg), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state
