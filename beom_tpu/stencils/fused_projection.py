"""Composed Pallas path for the rigid-lid / implicit-free-surface
schemes (SURVEY.md §3 C23; stepping/projection.py is the XLA spec).

A projection step cannot be one band pass — the elliptic solve couples
the whole domain — but it decomposes exactly into

  phase A (band kernel) : provisional momentum u*,v* with the surface
                          term dropped + barotropic transport
                          divergence — the bandwidth/VPU-heavy part;
  glue    (XLA)         : the solve RHS (a handful of elementwise 2-D
                          ops and, for rigid lid, one global de-mean
                          reduction — jnp.sum, negligible traffic);
  solve                 : cfg.solver='redblack' -> the temporally
                          blocked red-black kernel
                          (stencils/redblack_pallas.py, k sweeps per
                          HBM pass); 'cg' -> solvers/elliptic.cg_solve
                          (XLA while_loop; its dots are latency- not
                          bandwidth-bound);
  phase B (band kernel) : gradient correction + per-layer continuity +
                          finalize (wet/dry gates, Flather) in one
                          fused pass.

Parity vs the XLA projection step: the band phases share every op with
stepping/projection.py, but FMA-contraction differences between fusion
contexts leave ~1-ulp input diffs, and the iterative solve amplifies
any ulp to solver-tolerance-level field diffs — so the two paths agree
to the solver tolerance, not bitwise (tests/unit/test_pallas.py pins
the envelope for both solvers).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing
from beom_tpu.core.state import State
from beom_tpu.physics import continuity
from beom_tpu.solvers import elliptic
from beom_tpu.solvers.elliptic import _local_dot
from beom_tpu.stencils.band import make_band_call
from beom_tpu.stepping import fb
from beom_tpu.stepping.projection import barotropic_transport

_HALO_A = 8           # momentum_update radius <= 5 (halo probe), as in
                      # fused_fb.HALO_Y
_HALO_B = 8           # grad(1) + continuity(<=3) + finalize(<=3)


def make_pallas_projection_stepper(
        grid: Grid, forcing: Forcing, cfg: Config,
        by: Optional[int] = None,
        k_sweeps: int = 8,
        interpret: Optional[bool] = None,
        vmem_limit_bytes: int = 100 * 1024 * 1024):
    """Returns step(state) -> state for scheme='rigid_lid'/'implicit_fs'
    with both band phases (and, for solver='redblack', the elliptic
    solve) running as Pallas TPU kernels."""
    if cfg.scheme not in ("rigid_lid", "implicit_fs"):
        raise ValueError("fused_projection implements the projection "
                         "schemes; fb/split use stencils/fused_fb.py")
    if interpret is None:   # auto: Pallas interpreter off-TPU
        interpret = jax.default_backend() != "tpu"
    rigid = cfg.scheme == "rigid_lid"
    dt = cfg.dt
    lam = 0.0 if rigid else 1.0 / (cfg.g * dt * dt)
    corr = dt if rigid else cfg.g * dt    # velocity-correction factor
    wy_a = _HALO_A
    nz = cfg.nz
    npdt = cfg.npdtype
    huv = dict.fromkeys(("h", "u", "v"), grid.H[None].repeat(nz, 0))

    def body_a(f, grid_t, forcing_t, scal):
        n, t = scal
        state = State(h=f["h"], u=f["u"], v=f["v"], t=t, n=n)
        u_s, v_s = fb.momentum_update(f["h"], state, grid_t, forcing_t,
                                      cfg, free_surface=False,
                                      parity="cond")
        U, V = barotropic_transport(f["h"], u_s, v_s, grid_t)
        div = (ops.d_xm(U, cfg.dx) + ops.d_ym(V, cfg.dy)) * grid_t.mask
        return u_s, v_s, div

    call_a = make_band_call(
        grid, forcing, cfg, body_a, dyn=huv,
        out_leads=((nz,), (nz,), ()),
        wy=wy_a, by=by, interpret=interpret,
        vmem_limit_bytes=vmem_limit_bytes)

    def body_b(f, grid_t, forcing_t, scal):
        n, t = scal
        dpx = grid_t.mask_u * ops.d_xp(f["p"], cfg.dx)
        dpy = grid_t.mask_v * ops.d_yp(f["p"], cfg.dy)
        u1 = (f["u"] - corr * dpx[None]) * grid_t.mask_u
        v1 = (f["v"] - corr * dpy[None]) * grid_t.mask_v
        dh = continuity.continuity_rhs(f["h"], u1, v1, grid_t, cfg)
        h1 = (f["h"] + dt * dh) * grid_t.mask
        out = fb.finalize(h1, u1, v1,
                          State(h=f["h"], u=f["u"], v=f["v"], t=t, n=n),
                          grid_t, forcing_t, cfg)
        return out.h, out.u, out.v

    call_b = make_band_call(
        grid, forcing, cfg, body_b, dyn={**huv, "p": grid.H},
        out_leads=((nz,), (nz,), (nz,)),
        wy=_HALO_B,
        by=by, interpret=interpret,
        vmem_limit_bytes=vmem_limit_bytes)

    if cfg.solver == "redblack":
        from beom_tpu.stencils.redblack_pallas import make_pallas_rb_solve
        # same sweep budget as the XLA path's fixed-maxiter SOR loop:
        # never more total sweeps, usually fewer (residual early-exit)
        solve = make_pallas_rb_solve(
            grid, cfg, lam=lam, k=k_sweeps,
            max_passes=max(1, cfg.solver_maxiter // k_sweeps),
            interpret=interpret)
    elif cfg.solver == "mg":
        from beom_tpu.solvers.multigrid import make_mg_solver
        solve = make_mg_solver(grid, cfg, lam=lam,
                               smoother="pallas" if not interpret
                               else "xla")
    else:
        pre = cfg.precond
        if pre == "auto":
            pre = "mg" if lam == 0.0 else "jacobi"
        fused_solve = None
        if pre in ("jacobi", "mg"):
            # whole-solve-in-one-kernel tier: the complete CG state
            # (and the MG hierarchy) lives in VMEM, so the solve is a
            # single launch (stencils/cg_vmem.py; ~31 us device time
            # for a 5-iteration 512^2 Helmholtz solve vs ~15 XLA
            # dispatches per iteration)
            try:
                from beom_tpu.stencils.cg_vmem import make_vmem_cg_solve
                fused_solve = make_vmem_cg_solve(
                    grid, cfg, lam=lam, precond=pre, interpret=interpret)
            except ValueError:
                fused_solve = None    # solver state exceeds VMEM

        if fused_solve is not None:
            def solve(b, x0=None):
                return fused_solve(b, x0=x0).x
        else:
            kw = {}
            # NOTE (measured, r5): swapping the CG matvec for the
            # single-pass Pallas apply kernel REGRESSED implicit_fs
            # 2048^2 from 300.8e6 to 191.7e6 pts/s — in the while_loop
            # context XLA fuses the matvec with the surrounding axpys,
            # so its marginal cost is below a standalone kernel launch
            # (which also re-streams an unused b operand).  The kernel
            # stays in use where it wins: the standalone MG solver's
            # outer residual (solvers/multigrid.make_mg_solver).
            if pre == "ssor":
                kw["precond"] = elliptic.make_ssor_precond(grid, cfg,
                                                           lam=lam)
            elif pre == "mg":
                from beom_tpu.solvers.multigrid import make_mg_precond
                # Pallas tier: blocked fine-level sweeps + the fused
                # coarse-stack kernel (solvers/multigrid.py) — the XLA
                # cycle is dispatch-latency-bound on TPU
                kw["precond"] = make_mg_precond(
                    grid, cfg, lam=lam,
                    smoother="xla" if interpret else "pallas",
                    interpret=interpret)

            if pre == "mg" and not interpret:
                # r4 ADVICE (medium): the temporally-blocked band-lagged
                # Pallas smoother makes M only approximately symmetric;
                # at an untested grid/mask CG could stall silently.
                # Guard: when the residual says the solve stalled, redo
                # it with the exactly-symmetric XLA-smoothed cycle.
                # (scalar-predicate lax.cond with call-style branches —
                # not the elementwise-fusion shape of the r4 XLA:TPU
                # cond miscompile; bench/hw_check.py probes that class.)
                from beom_tpu.solvers.multigrid import make_mg_precond
                sym = dict(kw)
                sym["precond"] = make_mg_precond(grid, cfg, lam=lam)

                def solve(b, x0=None):
                    res = elliptic.cg_solve(b, grid, cfg, x0=x0,
                                            lam=lam, **kw)
                    eps = jnp.finfo(b.dtype).eps
                    tol_eff = max(cfg.solver_tol, 30.0 * float(eps))
                    b2 = jnp.sum((b * grid.mask) ** 2)
                    thr = tol_eff * tol_eff * jnp.maximum(
                        b2, jnp.finfo(b.dtype).tiny)
                    return jax.lax.cond(
                        res.resnorm > 100.0 * thr,
                        lambda _: elliptic.cg_solve(
                            b, grid, cfg, x0=x0, lam=lam, **sym).x,
                        lambda _: res.x, None)
            else:
                def solve(b, x0=None):
                    return elliptic.cg_solve(b, grid, cfg, x0=x0,
                                             lam=lam, **kw).x

    from beom_tpu.stepping.projection import warm_x0

    @jax.jit
    def step(state: State) -> State:
        scal = jnp.stack([state.n.astype(npdt), state.t.astype(npdt)])
        u_s, v_s, div = call_a(scal, state.h, state.u, state.v)
        warm = warm_x0(state, cfg)

        if rigid:
            # see stepping/projection.rigid_lid_step: the projection
            # also removes the accumulated column anomaly; the Neumann
            # problem needs a zero-sum (de-meaned) RHS
            anom = (jnp.sum(state.h, axis=0) - grid.H) * grid.mask
            anom = anom - grid.mask * (_local_dot(anom, grid.mask)
                                       / _local_dot(grid.mask, grid.mask))
            rhs = (div - anom / dt) / dt
            p = solve(rhs, x0=warm)
        else:
            eta_n = (jnp.sum(state.h, axis=0) - grid.H) * grid.mask
            b = -lam * (eta_n - dt * div)
            p = solve(b, x0=eta_n if warm is None else warm)

        h1, u1, v1 = call_b(scal, state.h, u_s, v_s, p)
        carries = state.phi is not None
        return State(h=h1, u=u1, v=v1, t=state.t + cfg.dt,
                     n=state.n + 1,
                     phi=p if carries else None,
                     phi_prev=state.phi if carries else None)

    return step
