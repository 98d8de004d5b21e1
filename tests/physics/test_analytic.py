"""Analytic/physics integration tests (SURVEY.md §5.3): the discrete
dynamics must reproduce textbook shallow-water solutions.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from beom_tpu.core.config import Config
from beom_tpu.core.grid import make_grid, make_forcing
from beom_tpu.core.state import init_state
from beom_tpu.stepping import run_steps

G = 9.81


def _channel(nx, ny, H0, dx, f0=0.0, beta=0.0, nz=1, rho=(1027.0,),
             periodic_x=False, **kw):
    """Closed basin (land ring), or a zonally periodic channel."""
    c = float(np.sqrt(G * H0))
    dt = kw.pop("dt", 0.3 * dx / (np.sqrt(2) * c))
    cfg = Config(nx=nx, ny=ny, dx=dx, dy=dx, nz=nz, rho=rho,
                 f0=f0, beta=beta, dt=float(dt), adv_scheme="linear",
                 dtype="float64", **kw)
    if periodic_x:
        mask = np.ones((ny, nx))
        mask[0, :] = mask[-1, :] = 0.0     # walls north+south only
        grid = make_grid(cfg, np.full((ny, nx), H0), mask=mask)
    else:
        grid = make_grid(cfg, np.full((ny, nx), H0))
    forcing = make_forcing(cfg)
    return cfg, grid, forcing


def test_gravity_wave_phase_speed():
    """A small eta bump spreads at c = sqrt(g H) (non-rotating)."""
    nx = ny = 128
    H0, dx = 100.0, 1e3
    cfg, grid, forcing = _channel(nx, ny, H0, dx)
    c = np.sqrt(G * H0)

    x = (np.arange(nx) - nx / 2)[None, :] * dx
    y = (np.arange(ny) - ny / 2)[:, None] * dx
    r = np.sqrt(x * x + y * y)
    eta0 = 0.01 * np.exp(-(r / (5 * dx)) ** 2)
    h0 = (H0 + eta0)[None] * np.asarray(grid.mask)
    state = init_state(cfg, grid, h0=h0)

    # run until the front travels ~1/4 of the basin
    T = 0.25 * nx * dx / c
    n = int(T / cfg.dt)
    out = run_steps(state, grid, forcing, cfg, n)
    eta = np.asarray(out.h[0]) - H0 * np.asarray(grid.mask)

    # wavefront = radius of the |eta| ring *peak* (the leading edge
    # runs ahead of the phase front; the peak tracks c)
    r_front = float(r[np.unravel_index(np.argmax(np.abs(eta)),
                                       eta.shape)])
    expected = c * n * cfg.dt
    assert abs(r_front - expected) / expected < 0.15


def test_geostrophic_state_is_stationary():
    """An exactly geostrophically balanced jet stays put on the f-plane."""
    nx = ny = 64
    H0, dx, f0 = 100.0, 1e3, 1e-4
    cfg, grid, forcing = _channel(nx, ny, H0, dx, f0=f0, periodic_x=True)

    # Build the balance the way the model discretizes it: choose an
    # x-uniform zonal jet u(y), then integrate the discrete v-momentum
    # balance  d_yp(eta) = -(f/g) a_yp(u)  for eta(y).  With v = 0 and
    # x-uniform fields every other tendency vanishes identically.
    y = np.arange(ny)
    yc = ny / 2
    u_prof = 0.2 * np.exp(-((y - yc) / 8.0) ** 2)     # jet at u rows
    eta_prof = np.zeros(ny)
    for j in range(ny - 1):
        eta_prof[j + 1] = eta_prof[j] - (f0 * dx / G) * 0.5 * (
            u_prof[j] + u_prof[j + 1])
    eta_prof -= eta_prof[ny // 2]                      # small amplitude
    eta = np.broadcast_to(eta_prof[:, None], (ny, nx)).copy()
    u = np.broadcast_to(u_prof[:, None], (ny, nx)).copy()
    h0 = (H0 + eta)[None] * np.asarray(grid.mask)
    u0 = (u * np.asarray(grid.mask_u))[None]
    state = init_state(cfg, grid, h0=h0, u0=u0)

    out = run_steps(state, grid, forcing, cfg, 200)
    # velocity change stays a small fraction of the jet amplitude
    du = np.abs(np.asarray(out.u) - np.asarray(state.u)).max()
    assert du < 0.05 * np.abs(u).max()
    # and eta stays near the initial ridge
    deta = np.abs((np.asarray(out.h[0]) - h0[0]) * np.asarray(grid.mask)).max()
    assert deta < 0.05 * 0.05


def test_kelvin_wave_hugs_the_wall():
    """With rotation, a coastal disturbance propagates as a boundary-
    trapped Kelvin wave with the coast on its right (f > 0)."""
    nx, ny = 128, 64
    H0, dx, f0 = 100.0, 1e3, 1e-3   # strong f: deformation radius ~ 10 dx
    cfg, grid, forcing = _channel(nx, ny, H0, dx, f0=f0, periodic_x=True)
    c = np.sqrt(G * H0)
    Ld = c / f0

    # balanced Kelvin packet against the southern wall: eta decays
    # northward on Ld, u = (g/c) eta, v = 0 — translates at +c for f>0
    # (coast on the right of propagation)
    x = (np.arange(nx) - nx / 4)[None, :] * dx
    y = np.arange(ny)[:, None] * dx
    eta0 = 0.01 * np.exp(-(x / (5 * dx)) ** 2) * np.exp(-y / Ld)
    h0 = (H0 + eta0)[None] * np.asarray(grid.mask)
    u0 = (G / c * eta0)[None] * np.asarray(grid.mask_u)
    state = init_state(cfg, grid, h0=h0, u0=u0)

    T = 0.25 * nx * dx / c
    n = int(T / cfg.dt)
    out = run_steps(state, grid, forcing, cfg, n)
    eta = (np.asarray(out.h[0]) - H0) * np.asarray(grid.mask)

    # the along-wall (southern rows) maximum should have moved +x
    # (coast on the right of propagation for f > 0) by ~ c T
    strip = eta[1:5, :].max(axis=0)
    i_peak = int(np.argmax(strip))
    i0 = nx // 4
    moved = (i_peak - i0) * dx
    expected = c * n * cfg.dt
    assert moved > 0.5 * expected
    assert abs(moved - expected) / expected < 0.3


def test_stommel_western_intensification():
    """With beta and linear drag the steady gyre piles up on the WEST."""
    from beom_tpu.cases.double_gyre import make_case
    cfg, grid, forcing, state = make_case(
        nx=64, ny=64, dtype="float64", adv_scheme="linear",
        r_bot=2e-4, nu2=0.0, beta=2e-11)
    # integrate toward steady state (a few damping times)
    out = run_steps(state, grid, forcing, cfg, 4000)
    v = np.asarray(out.v)[0]
    # meridional speed in the western quarter vs eastern quarter
    west = np.abs(v[:, 1:16]).max()
    east = np.abs(v[:, 48:63]).max()
    assert west > 3.0 * east


def _munk_jet_width(nu2, nx=128, n_steps=30000):
    """Distance from the west wall to the first sign change of v past
    the boundary-jet maximum, at mid-latitude (steady Munk gyre)."""
    from beom_tpu.cases.double_gyre import make_case
    cfg, grid, forcing, state = make_case(
        nx=nx, ny=nx, dtype="float64", adv_scheme="linear",
        r_bot=0.0, nu2=nu2, beta=2e-11)
    out = run_steps(state, grid, forcing, cfg, n_steps)
    v = np.asarray(out.v)[0]
    prof = v[nx // 4, :]                 # subtropical-gyre latitude
    i_max = int(np.argmax(np.abs(prof[1:nx // 2]))) + 1
    sgn = np.sign(prof[i_max])
    i = i_max
    while i < nx - 1 and np.sign(prof[i]) == sgn:
        i += 1
    return i * cfg.dx, cfg.dx


def test_munk_layer_width_scaling():
    """Munk viscous boundary layer: width ~ (nu/beta)^{1/3} (SURVEY.md
    §5.3).  8x the viscosity must double the measured jet width."""
    w1, dx = _munk_jet_width(4000.0)
    w2, _ = _munk_jet_width(32000.0)
    # predicted zero crossing of the Munk profile: x = 4*pi/(3*sqrt(3))
    # * delta_M with delta_M = (nu/beta)^{1/3}
    for w, nu in ((w1, 4000.0), (w2, 32000.0)):
        dm = (nu / 2e-11) ** (1.0 / 3.0)
        pred = 4.0 * np.pi / (3.0 * np.sqrt(3.0)) * dm
        assert abs(w - pred) < max(0.45 * pred, 2.0 * dx), \
            f"nu={nu}: width {w / 1e3:.0f} km vs Munk {pred / 1e3:.0f} km"
    assert 1.4 < w2 / w1 < 2.9, f"width ratio {w2 / w1:.2f}, expected ~2"


def test_baroclinic_gravity_wave_speed():
    """2-layer internal wave speed c_i = sqrt(g' h1 h2 / (h1+h2))."""
    nx = ny = 128
    H0, dx = 100.0, 1e3
    rho = (1026.0, 1027.0)
    cfg, grid, forcing = _channel(nx, ny, H0, dx, nz=2, rho=rho)
    gp = G * (rho[1] - rho[0]) / cfg.rho0
    h1, h2 = 30.0, 70.0
    ci = np.sqrt(gp * h1 * h2 / (h1 + h2))

    # interface displacement, rigid-ish surface (opposite-signed h bumps)
    x = (np.arange(nx) - nx / 2)[None, :] * dx
    y = (np.arange(ny) - ny / 2)[:, None] * dx
    r = np.sqrt(x * x + y * y)
    d = 1.0 * np.exp(-(r / (5 * dx)) ** 2)
    h0 = np.zeros((2, ny, nx))
    h0[0] = h1 + d
    h0[1] = h2 - d
    h0 *= np.asarray(grid.mask)
    state = init_state(cfg, grid, h0=h0)

    T = 0.2 * nx * dx / ci
    n = int(T / cfg.dt)
    out = run_steps(state, grid, forcing, cfg, n)
    disp = (np.asarray(out.h[0]) - h1) * np.asarray(grid.mask)

    r_front = float(r[np.unravel_index(np.argmax(np.abs(disp)),
                                       disp.shape)])
    expected = ci * n * cfg.dt
    assert abs(r_front - expected) / expected < 0.2
