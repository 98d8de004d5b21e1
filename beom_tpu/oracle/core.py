"""f64 NumPy oracle — the executable spec (SURVEY.md §3 component C24).

An *independent* re-derivation of the discretization of SURVEY.md §1:
same staggering and schemes as the JAX core, written separately in plain
NumPy at float64, used as the gold standard for parity tests until real
reference-Fortran fixtures exist (the fixture interface is data-only, so
swapping in Fortran outputs later changes no test code).

Deliberately simple and slow-ish; correctness over speed.
"""

from __future__ import annotations

import numpy as np

from beom_tpu.core.config import Config

F = np.float64


def _xp(a):  # value at [i+1] (periodic)
    return np.roll(a, -1, -1)


def _xm(a):
    return np.roll(a, 1, -1)


def _yp(a):
    return np.roll(a, -1, -2)


def _ym(a):
    return np.roll(a, 1, -2)


class Oracle:
    """Double-precision reference integrator for the layered SW core."""

    def __init__(self, cfg: Config, H, mask=None, taux=None, tauy=None,
                 sponge=None, h_ext=None, obc_u=None, obc_v=None,
                 obc_h=None, tide_amp=None, tide_phase=None):
        self.cfg = cfg
        ny, nx = cfg.ny, cfg.nx
        self.H = np.asarray(H, F)
        if mask is None:
            m = (self.H > 0).astype(F)
            m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = 0.0
        else:
            m = np.asarray(mask, F)
        self.m = m
        self.H = self.H * m
        self.mu = m * _xp(m)
        self.mv = m * _yp(m)
        self.mq = m * _xp(m) * _yp(m) * _xp(_yp(m))
        yq = (np.arange(ny, dtype=F) + 0.5) * cfg.dy
        self.f_q = np.broadcast_to((cfg.f0 + cfg.beta * yq)[:, None],
                                   (ny, nx)).copy()
        self.taux = np.zeros((ny, nx), F) if taux is None else np.asarray(taux, F)
        self.tauy = np.zeros((ny, nx), F) if tauy is None else np.asarray(tauy, F)
        self.sponge = None if sponge is None else np.asarray(sponge, F)
        self.h_ext = None if h_ext is None else np.asarray(h_ext, F)
        self.obc_u = None if obc_u is None else np.asarray(obc_u, F)
        self.obc_v = None if obc_v is None else np.asarray(obc_v, F)
        self.obc_h = None if obc_h is None else np.asarray(obc_h, F)
        self.tide_amp = None if tide_amp is None else np.asarray(tide_amp, F)
        self.tide_phase = (None if tide_phase is None
                           else np.asarray(tide_phase, F))
        self.gp = np.asarray(cfg.gprime, F)
        # match core/ops.py exactly: differences multiply by 1/dx, so the
        # oracle is bit-comparable op-for-op in f64
        self.rdx = 1.0 / cfg.dx
        self.rdy = 1.0 / cfg.dy

    # ---- operators (independent of core/ops.py) -----------------------

    def montgomery(self, h, free_surface=True):
        if free_surface:
            eta = h.sum(0) - self.H
        else:
            eta = np.zeros_like(self.H)   # rigid lid: surface term solved
        M = np.empty_like(h)
        acc = self.gp[0] * eta
        M[0] = acc
        z = eta.copy()
        for k in range(1, self.cfg.nz):
            z = z - h[k - 1]
            acc = acc + self.gp[k] * z
            M[k] = acc
        return M

    def lap_u(self, u):
        c = self.cfg
        gx = (u - _xm(u)) * self.rdx * self.m
        gy = (_yp(u) - u) * self.rdy
        if c.slip == "free":
            gy = gy * self.mq
        return ((_xp(gx) - gx) * self.rdx + (gy - _ym(gy)) * self.rdy) * self.mu

    def lap_v(self, v):
        c = self.cfg
        gy = (v - _ym(v)) * self.rdy * self.m
        gx = (_xp(v) - v) * self.rdx
        if c.slip == "free":
            gx = gx * self.mq
        return ((_yp(gy) - gy) * self.rdy + (gx - _xm(gx)) * self.rdx) * self.mv

    def fluxes(self, h, u, v):
        c = self.cfg
        hx = 0.5 * (h + _xp(h))
        hy = 0.5 * (h + _yp(h))
        if c.wetdry:
            thin = 2.0 * c.h_dry
            hx_up = np.where(u > 0, h, _xp(h))
            hy_up = np.where(v > 0, h, _yp(h))
            hx = np.where(np.minimum(h, _xp(h)) < thin, hx_up, hx)
            hy = np.where(np.minimum(h, _yp(h)) < thin, hy_up, hy)
            hx = np.maximum(hx, 0.0)
            hy = np.maximum(hy, 0.0)
        Fx = self.mu * hx * u
        Fy = self.mv * hy * v
        if c.wetdry:
            out = (np.maximum(Fx, 0) + np.maximum(-_xm(Fx), 0)) / c.dx \
                + (np.maximum(Fy, 0) + np.maximum(-_ym(Fy), 0)) / c.dy
            avail = np.maximum(h - c.h_min, 0.0)
            need = out * c.dt
            scale = np.where(need > avail, avail / np.maximum(need, 1e-30), 1.0)
            Fx = Fx * np.where(Fx > 0, scale, _xp(scale))
            Fy = Fy * np.where(Fy > 0, scale, _yp(scale))
        return Fx, Fy

    # ---- open boundaries (mirror of physics/obc.py) --------------------

    def eta_ext(self, t):
        c = self.cfg
        out = np.zeros_like(self.H)
        if self.tide_amp is not None:
            for ci, omega in enumerate(c.tides):
                out += self.tide_amp[ci] * np.cos(
                    omega * t - self.tide_phase[ci])
        return out

    def clamp(self, h, t):
        if not self.cfg.obc or self.obc_h is None:
            return h
        tgt = self.h_ext.copy()
        tgt[0] += self.eta_ext(t)
        return np.where(self.obc_h[None] > 0, tgt, h)

    def flather(self, h, u, v, t):
        c = self.cfg
        if not c.obc:
            return u, v
        eta = h.sum(0) - self.H
        e_ext = self.eta_ext(t)
        hsum = np.maximum(h.sum(0), c.h_min)
        hu = np.maximum(0.5 * (h + _xp(h)), c.h_min)
        hv = np.maximum(0.5 * (h + _yp(h)), c.h_min)
        ubar = (hu * u).sum(0) / hu.sum(0)
        vbar = (hv * v).sum(0) / hv.sum(0)
        Hu = np.maximum(0.5 * (hsum + _xp(hsum)), c.h_min)
        Hv = np.maximum(0.5 * (hsum + _yp(hsum)), c.h_min)
        cu = np.sqrt(c.g / Hu)
        cv = np.sqrt(c.g / Hv)
        den_u = np.maximum(self.m + _xp(self.m), 1.0)
        den_v = np.maximum(self.m + _yp(self.m), 1.0)
        eta_u = (eta * self.m + _xp(eta * self.m)) / den_u
        eta_v = (eta * self.m + _yp(eta * self.m)) / den_v
        eext_u = 0.5 * (e_ext + _xp(e_ext))
        eext_v = 0.5 * (e_ext + _yp(e_ext))
        ou = np.zeros_like(eta) if self.obc_u is None else self.obc_u
        ov = np.zeros_like(eta) if self.obc_v is None else self.obc_v
        u_tgt = ou * cu * (eta_u - eext_u)
        v_tgt = ov * cv * (eta_v - eext_v)
        u = u + np.abs(ou) * (u_tgt - ubar)[None]
        v = v + np.abs(ov) * (v_tgt - vbar)[None]
        return u, v

    # ---- one FB step ---------------------------------------------------

    def step(self, h, u, v, n, t):
        c = self.cfg
        dt = c.dt

        Fx, Fy = self.fluxes(h, u, v)
        dh = -((Fx - _xm(Fx)) * self.rdx + (Fy - _ym(Fy)) * self.rdy) * self.m
        if self.sponge is not None:
            dh = dh + self.sponge * (self.h_ext - h)
        h1 = (h + dt * dh) * self.m
        h1 = self.clamp(h1, t + dt)

        u1, v1 = self.momentum(h1, u, v, n)
        u1, v1 = self._finalize(h1, u1, v1, t + dt)
        return h1, u1, v1, n + 1, t + dt

    def _finalize(self, h1, u1, v1, t1):
        """Shared step tail: wet/dry velocity gating + Flather OBC."""
        c = self.cfg
        if c.wetdry:
            wet = ((h1 > c.h_dry).astype(F)) * self.m
            for w, mw, sh in ((u1, self.mu, _xp), (v1, self.mv, _yp)):
                wl, wr = wet, sh(wet)
                gated = wl * wr * w + wl * (1 - wr) * np.maximum(w, 0) \
                    + wr * (1 - wl) * np.minimum(w, 0)
                w[:] = mw * gated
        return self.flather(h1, u1, v1, t1)

    # ---- momentum update (shared by FB, split and projection stepping) -

    def _tendencies(self, h1, u, v, free_surface=True):
        """Everything of the momentum RHS except the Coriolis/PV cross
        terms and the implicit-drag division: returns
        (du, dv, q, U, V, cu, cv, linear)."""
        c = self.cfg
        M = self.montgomery(h1, free_surface=free_surface)
        linear = c.adv_scheme == "linear"
        if linear:
            phi = M
            q = np.broadcast_to(self.f_q, h1.shape).copy()
            U, V = u.copy(), v.copy()
        else:
            ke = 0.5 * (0.5 * (u * u + _xm(u * u))
                        + 0.5 * (v * v + _ym(v * v)))
            phi = M + ke
            # backward-consistent: PV and mass fluxes weighted by the
            # *updated* thickness h1, matching the M(h1) pressure step
            zeta = ((_xp(v) - v) * self.rdx - (_yp(u) - u) * self.rdy) * self.mq
            hq = np.maximum(0.25 * (h1 + _xp(h1) + _yp(h1) + _xp(_yp(h1))),
                            c.h_min)
            q = (self.f_q + zeta) / hq
            U = 0.5 * (h1 + _xp(h1)) * u
            V = 0.5 * (h1 + _yp(h1)) * v

        du = -(_xp(phi) - phi) * self.rdx
        dv = -(_yp(phi) - phi) * self.rdy
        if c.nu2 != 0.0:
            du = du + c.nu2 * self.lap_u(u)
            dv = dv + c.nu2 * self.lap_v(v)
        if c.nu4 != 0.0:
            du = du - c.nu4 * self.lap_u(self.lap_u(u))
            dv = dv - c.nu4 * self.lap_v(self.lap_v(v))
        if c.wind:
            hu = np.maximum(0.5 * (h1[0] + _xp(h1[0])), c.h_min)
            hv = np.maximum(0.5 * (h1[0] + _yp(h1[0])), c.h_min)
            du[0] += self.mu * self.taux / (c.rho0 * hu)
            dv[0] += self.mv * self.tauy / (c.rho0 * hv)
        if c.r_int != 0.0 and c.nz > 1:
            hu = np.maximum(0.5 * (h1 + _xp(h1)), c.h_min)
            hv = np.maximum(0.5 * (h1 + _yp(h1)), c.h_min)
            for w, hw, dw in ((u, hu, du), (v, hv, dv)):
                cpl = np.zeros_like(w)
                cpl[1:] += w[:-1] - w[1:]
                cpl[:-1] += w[1:] - w[:-1]
                dw += c.r_int * cpl / hw
        if self.sponge is not None:
            du = du - 0.5 * (self.sponge + _xp(self.sponge)) * u
            dv = dv - 0.5 * (self.sponge + _yp(self.sponge)) * v

        # implicit bottom drag coefficients
        cu = np.zeros_like(u)
        cv = np.zeros_like(v)
        if c.r_bot != 0.0 or c.cd_bot != 0.0:
            hu = np.maximum(0.5 * (h1[-1] + _xp(h1[-1])), c.h_min)
            hv = np.maximum(0.5 * (h1[-1] + _yp(h1[-1])), c.h_min)
            v4 = 0.5 * (v[-1] + _xp(v[-1]))
            v4 = 0.5 * (v4 + _ym(v4))
            u4 = 0.5 * (u[-1] + _yp(u[-1]))
            u4 = 0.5 * (u4 + _xm(u4))
            sp_u = np.sqrt(u[-1] ** 2 + v4 ** 2)
            sp_v = np.sqrt(v[-1] ** 2 + u4 ** 2)
            cu[-1] = (c.r_bot + c.cd_bot * sp_u) / hu
            cv[-1] = (c.r_bot + c.cd_bot * sp_v) / hv
        return du, dv, q, U, V, cu, cv, linear

    def momentum(self, h1, u, v, n, free_surface=True):
        c = self.cfg
        dt = c.dt
        du, dv, q, U, V, cu, cv, linear = self._tendencies(
            h1, u, v, free_surface=free_surface)

        def upd_u(vv, VV):
            if linear:
                cross = 0.5 * (self.f_q * 0.5 * (VV + _xp(VV))
                               + _ym(self.f_q * 0.5 * (VV + _xp(VV))))
            else:
                t_ = q * 0.5 * (VV + _xp(VV))
                cross = 0.5 * (t_ + _ym(t_))
            return (u + dt * (du + cross)) / (1.0 + dt * cu) * self.mu

        def upd_v(uu, UU):
            if linear:
                t_ = self.f_q * 0.5 * (UU + _yp(UU))
            else:
                t_ = q * 0.5 * (UU + _yp(UU))
            cross = -0.5 * (t_ + _xm(t_))
            return (v + dt * (dv + cross)) / (1.0 + dt * cv) * self.mv

        if n % 2 == 0:
            u1 = upd_u(v, V)
            U1 = u1 if linear else 0.5 * (h1 + _xp(h1)) * u1
            v1 = upd_v(u1, U1)
        else:
            v1 = upd_v(u, U)
            V1 = v1 if linear else 0.5 * (h1 + _yp(h1)) * v1
            u1 = upd_u(v1, V1)
        return u1, v1

    # ---- rigid-lid projection stepping (mirror of
    # stepping/projection.py rigid_lid_step) ----------------------------

    def solve_neumann(self, b, tol=1e-13, maxiter=5000, lam=0.0, x0=None):
        """Plain CG on div(H_face grad p) - lam p = b; wet-constant
        deflation in the pure-Neumann (lam=0) case.  Independent of
        solvers/elliptic.py."""
        c = self.cfg
        Hu = self.mu * 0.5 * (self.H + _xp(self.H))
        Hv = self.mv * 0.5 * (self.H + _yp(self.H))

        def A(p):
            gx = Hu * (_xp(p) - p) * self.rdx
            gy = Hv * (_yp(p) - p) * self.rdy
            out = ((gx - _xm(gx)) * self.rdx
                   + (gy - _ym(gy)) * self.rdy)
            if lam != 0.0:
                out = out - lam * p
            return out * self.m

        nwet = self.m.sum()

        if lam == 0.0:
            def deflate(x):
                return (x - self.m * (x * self.m).sum() / nwet) * self.m
        else:
            def deflate(x):
                return x * self.m

        b = deflate(b)
        x = np.zeros_like(b) if x0 is None else deflate(x0.copy())
        r = deflate(b - A(x))
        p = r.copy()
        rr = (r * r).sum()
        b2 = max((b * b).sum(), 1e-300)
        for _ in range(maxiter):
            if rr <= tol * tol * b2:
                break
            q = A(p)
            alpha = rr / (p * q).sum()
            x += alpha * p
            r = deflate(r - alpha * q)
            rr_new = (r * r).sum()
            p = r + (rr_new / rr) * p
            rr = rr_new
        return x

    def step_rigid(self, h, u, v, n, t):
        c = self.cfg
        dt = c.dt
        us, vs = self.momentum(h, u, v, n, free_surface=False)

        U = (0.5 * (h + _xp(h)) * us).sum(0) * self.mu
        V = (0.5 * (h + _yp(h)) * vs).sum(0) * self.mv
        div = ((U - _xm(U)) * self.rdx + (V - _ym(V)) * self.rdy) * self.m
        anom = (h.sum(0) - self.H) * self.m
        anom = anom - self.m * (anom * self.m).sum() / self.m.sum()
        phi = self.solve_neumann((div - anom / dt) / dt)

        u1 = (us - dt * ((_xp(phi) - phi) * self.rdx)[None]) * self.mu
        v1 = (vs - dt * ((_yp(phi) - phi) * self.rdy)[None]) * self.mv

        Fx, Fy = self.fluxes(h, u1, v1)
        dh = -((Fx - _xm(Fx)) * self.rdx
               + (Fy - _ym(Fy)) * self.rdy) * self.m
        h1 = (h + dt * dh) * self.m
        u1, v1 = self._finalize(h1, u1, v1, t + dt)
        return h1, u1, v1, n + 1, t + dt

    # ---- implicit free surface (mirror of SURVEY.md §1.3 item 3 /
    # stepping/projection.implicit_fs_step) ------------------------------

    def step_implicit(self, h, u, v, n, t):
        c = self.cfg
        dt = c.dt
        eta_n = (h.sum(0) - self.H) * self.m
        us, vs = self.momentum(h, u, v, n, free_surface=False)

        U = (0.5 * (h + _xp(h)) * us).sum(0) * self.mu
        V = (0.5 * (h + _yp(h)) * vs).sum(0) * self.mv
        divU = ((U - _xm(U)) * self.rdx + (V - _ym(V)) * self.rdy) * self.m
        lam = 1.0 / (c.g * dt * dt)
        b = -lam * (eta_n - dt * divU)
        eta1 = self.solve_neumann(b, lam=lam, x0=eta_n)

        u1 = (us - c.g * dt * ((_xp(eta1) - eta1) * self.rdx)[None]) * self.mu
        v1 = (vs - c.g * dt * ((_yp(eta1) - eta1) * self.rdy)[None]) * self.mv

        Fx, Fy = self.fluxes(h, u1, v1)
        dh = -((Fx - _xm(Fx)) * self.rdx
               + (Fy - _ym(Fy)) * self.rdy) * self.m
        h1 = (h + dt * dh) * self.m
        u1, v1 = self._finalize(h1, u1, v1, t + dt)
        return h1, u1, v1, n + 1, t + dt

    # ---- split barotropic/baroclinic stepping (SURVEY.md §1.3 item 2;
    # mirror of stepping/split.py) ---------------------------------------

    def step_split(self, h, u, v, n, t):
        c = self.cfg
        dt = c.dt
        dte = dt / c.nsub

        # slow phase: full momentum RHS at time n, surface term excluded
        du_s, dv_s, q, U, V, cu, cv, linear = self._tendencies(
            h, u, v, free_surface=False)
        # PV cross terms at time n (no FB alternation in the slow phase);
        # in linear mode q is already the broadcast f_q and U,V = u,v
        tu = q * 0.5 * (V + _xp(V))
        du_s = du_s + 0.5 * (tu + _ym(tu))
        tv = q * 0.5 * (U + _yp(U))
        dv_s = dv_s - 0.5 * (tv + _xm(tv))

        hu = 0.5 * (h + _xp(h)) * self.mu
        hv = 0.5 * (h + _yp(h)) * self.mv
        Hu = np.maximum(hu.sum(0), c.h_min)
        Hv = np.maximum(hv.sum(0), c.h_min)
        ubar = (hu * u).sum(0) / Hu
        vbar = (hv * v).sum(0) / Hv
        du_bar = (hu * du_s).sum(0) / Hu
        dv_bar = (hv * dv_s).sum(0) / Hv
        up, vp = u - ubar[None], v - vbar[None]
        du_p, dv_p = du_s - du_bar[None], dv_s - dv_bar[None]
        eta = (h.sum(0) - self.H) * self.m

        # barotropic FB subcycle, accumulating the subcycle-mean flow
        ub, vb = ubar.copy(), vbar.copy()
        su = np.zeros_like(ub)
        sv = np.zeros_like(vb)
        for _ in range(c.nsub):
            Ue, Ve = Hu * ub, Hv * vb
            div = (Ue - _xm(Ue)) * self.rdx + (Ve - _ym(Ve)) * self.rdy
            eta = (eta - dte * div) * self.m
            ub = (ub + dte * (-c.g * (_xp(eta) - eta) * self.rdx
                              + du_bar)) * self.mu
            vb = (vb + dte * (-c.g * (_yp(eta) - eta) * self.rdy
                              + dv_bar)) * self.mv
            su += ub
            sv += vb

        # recompose layers; advect h with the time-averaged barotropic flow
        u1 = ((up + dt * du_p + ub[None]) / (1.0 + dt * cu)) * self.mu
        v1 = ((vp + dt * dv_p + vb[None]) / (1.0 + dt * cv)) * self.mv
        u_adv = (up + (su / c.nsub)[None]) * self.mu
        v_adv = (vp + (sv / c.nsub)[None]) * self.mv
        Fx, Fy = self.fluxes(h, u_adv, v_adv)
        dh = -((Fx - _xm(Fx)) * self.rdx
               + (Fy - _ym(Fy)) * self.rdy) * self.m
        h1 = (h + dt * dh) * self.m

        col = np.maximum(h1.sum(0), c.h_min)
        target = np.maximum(self.H + eta, 0.0) * self.m
        h1 = h1 * np.where(col > c.h_min, target / col, 1.0)[None]

        u1, v1 = self._finalize(h1, u1, v1, t + dt)
        return h1, u1, v1, n + 1, t + dt

    def run(self, h, u, v, n_steps, n0=0, t0=0.0):
        step = {"fb": self.step, "split": self.step_split,
                "rigid_lid": self.step_rigid,
                "implicit_fs": self.step_implicit}[self.cfg.scheme]
        h = np.asarray(h, F).copy()
        u = np.asarray(u, F).copy()
        v = np.asarray(v, F).copy()
        n, t = n0, t0
        for _ in range(n_steps):
            h, u, v, n, t = step(h, u, v, n, t)
        return h, u, v
