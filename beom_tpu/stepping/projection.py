"""Rigid-lid and implicit-free-surface stepping (SURVEY.md §1.3 item 3,
components C14; BASELINE.md config 3).

Both schemes remove the fast external gravity wave from the explicit CFL
limit by an elliptic solve (solvers/elliptic.py), allowing dt set by the
much slower advective / internal-wave speeds:

  * `rigid_lid_step` — pressure-projection. The provisional momentum
    update runs with the surface term dropped from the Montgomery
    potential (physics/pressure.py free_surface=False); the surface
    pressure phi [m^2/s^2] is the Lagrange multiplier enforcing a
    divergence-free barotropic transport:

        div( H_face grad phi ) = div(U*) / dt,    u_k <- u*_k - dt grad phi

    (the same correction in every layer — surface pressure is depth-
    independent). Because the correction uses the same discrete
    divergence as continuity, sum_k h_k stays = H to solver tolerance.

  * `implicit_fs_step` — theta=1 implicit free surface: eliminate
    U^{n+1} = U* - g dt H grad eta^{n+1} into continuity to get the
    Helmholtz problem

        div(H grad eta') - eta'/(g dt^2) = -(eta^n - dt div U*)/(g dt^2)

    solved by the same CG/red-black machinery with lam = 1/(g dt^2);
    then u_k <- u*_k - g dt grad eta', and layer thickness follows from
    per-layer continuity with the corrected velocities.

The solver choice (cfg.solver: 'cg' | 'redblack') and tolerances come
from Config. `dot` is pluggable for the distributed path
(parallel/solvers.py wraps it in lax.psum).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing
from beom_tpu.core.state import State
from beom_tpu.physics import continuity
from beom_tpu.solvers import elliptic
from beom_tpu.solvers.elliptic import _local_dot
from beom_tpu.stepping import fb


def _solve(b, grid: Grid, cfg: Config, lam=0.0, x0=None,
           dot: Optional[Callable] = None):
    if cfg.solver == "redblack":
        return elliptic.redblack_solve(b, grid, cfg, x0=x0, lam=lam)
    if cfg.solver == "mg":
        from beom_tpu.solvers.multigrid import mg_solve
        return mg_solve(b, grid, cfg, lam=lam, x0=x0)
    kw = {} if dot is None else {"dot": dot}
    pre = cfg.precond
    if pre == "auto":   # measured: MG pays off only for pure Neumann
        pre = "mg" if lam == 0.0 else "jacobi"
    if pre == "ssor":
        kw["precond"] = elliptic.make_ssor_precond(grid, cfg, lam=lam)
    elif pre == "mg":
        from beom_tpu.solvers.multigrid import make_mg_precond
        kw["precond"] = make_mg_precond(grid, cfg, lam=lam)
    return elliptic.cg_solve(b, grid, cfg, x0=x0, lam=lam, **kw).x


def warm_x0(state: State, cfg: Config):
    """Warm-start guess for the step's elliptic solve: the SECOND-ORDER
    time extrapolation 2 phi^n - phi^{n-1} when both carries exist
    (error O(dt^2) vs O(dt) for plain phi^n — measured 33 -> ~17 CG
    iters/step on the 512^2 implicit-FS gyre), else phi^n, else None.
    The converged solution is x0-independent to solver tolerance, so
    this changes cost, not trajectories."""
    if not cfg.warm_start or state.phi is None:
        return None
    if state.phi_prev is None:
        return state.phi
    return 2.0 * state.phi - state.phi_prev


def barotropic_transport(h, u, v, grid: Grid):
    """(U, V) = sum_k h_face,k * w_k at u/v faces (mask-gated)."""
    U = jnp.sum(ops.a_xp(h) * u, axis=0) * grid.mask_u
    V = jnp.sum(ops.a_yp(h) * v, axis=0) * grid.mask_v
    return U, V


def rigid_lid_step(state: State, grid: Grid, forcing: Forcing, cfg: Config,
                   dot: Optional[Callable] = None) -> State:
    dt = cfg.dt

    # 1. provisional momentum from *old* h (the column is rigid; the FB
    #    h-first ordering buys nothing without a surface wave to stabilize)
    u_s, v_s = fb.momentum_update(state.h, state, grid, forcing, cfg,
                                  free_surface=False)

    # 2. projection: div(H grad phi) = [div(U*) - (sum h - H)/dt] / dt.
    #    After the correction u <- u* - dt grad(phi) the new transport
    #    satisfies div(U) = +anom/dt, so the following continuity step
    #    REMOVES the accumulated column anomaly (sum h1 - H -> 0):
    #    finite solver tolerance (f32!) then causes a bounded error, not
    #    a random-walk drift.  (Sign check: with +anom the anomaly
    #    doubles every step — an e-folding-per-step instability.)
    U, V = barotropic_transport(state.h, u_s, v_s, grid)
    anom = (jnp.sum(state.h, axis=0) - grid.H) * grid.mask
    # de-mean over wet cells: the Neumann problem needs a zero-sum RHS
    # (a global mass offset is invariant under projection anyway)
    gsum = _local_dot if dot is None else dot
    anom = anom - grid.mask * (gsum(anom, grid.mask)
                               / gsum(grid.mask, grid.mask))
    rhs = ((ops.d_xm(U, cfg.dx) + ops.d_ym(V, cfg.dy)) * grid.mask
           - anom / dt) / dt
    # warm start: phi varies slowly step-to-step; the extrapolated
    # previous solutions (State.phi/phi_prev, stepping.prepare_state)
    # recover most of the convergence budget vs x0 = 0 (r1 item 3)
    phi = _solve(rhs, grid, cfg, dot=dot, x0=warm_x0(state, cfg))

    dphix = grid.mask_u * ops.d_xp(phi, cfg.dx)
    dphiy = grid.mask_v * ops.d_yp(phi, cfg.dy)
    u1 = (u_s - dt * dphix[None]) * grid.mask_u
    v1 = (v_s - dt * dphiy[None]) * grid.mask_v

    # 3. layer continuity with the projected (barotropically
    #    non-divergent) velocities: internal redistribution only
    dh = continuity.continuity_rhs(state.h, u1, v1, grid, cfg)
    h1 = (state.h + dt * dh) * grid.mask

    out = fb.finalize(h1, u1, v1, state, grid, forcing, cfg)
    if state.phi is not None:
        out = out.replace(phi=phi, phi_prev=state.phi)
    return out


def implicit_fs_step(state: State, grid: Grid, forcing: Forcing, cfg: Config,
                     dot: Optional[Callable] = None) -> State:
    dt = cfg.dt
    g = cfg.g
    eta_n = (jnp.sum(state.h, axis=0) - grid.H) * grid.mask

    # 1. provisional momentum: full Montgomery *minus* the surface part
    #    (applied implicitly below)
    u_s, v_s = fb.momentum_update(state.h, state, grid, forcing, cfg,
                                  free_surface=False)

    # 2. Helmholtz solve for eta^{n+1}
    U, V = barotropic_transport(state.h, u_s, v_s, grid)
    divU = (ops.d_xm(U, cfg.dx) + ops.d_ym(V, cfg.dy)) * grid.mask
    lam = 1.0 / (g * dt * dt)
    b = -lam * (eta_n - dt * divU)
    # warm start from the extrapolated carried solves when available
    # (they beat eta^n once the transient is gone), else from eta^n
    x0 = warm_x0(state, cfg)
    eta1 = _solve(b, grid, cfg, lam=lam,
                  x0=eta_n if x0 is None else x0, dot=dot)

    # 3. barotropic correction, same in every layer
    detx = grid.mask_u * ops.d_xp(eta1, cfg.dx)
    dety = grid.mask_v * ops.d_yp(eta1, cfg.dy)
    u1 = (u_s - g * dt * detx[None]) * grid.mask_u
    v1 = (v_s - g * dt * dety[None]) * grid.mask_v

    # 4. per-layer continuity with corrected velocities
    dh = continuity.continuity_rhs(state.h, u1, v1, grid, cfg)
    h1 = (state.h + dt * dh) * grid.mask

    out = fb.finalize(h1, u1, v1, state, grid, forcing, cfg)
    if state.phi is not None:
        out = out.replace(phi=eta1, phi_prev=state.phi)
    return out
