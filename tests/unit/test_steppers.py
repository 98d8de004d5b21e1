"""Scheme tests: split barotropic, rigid lid, implicit free surface
(SURVEY.md §5.2 property tests; components C13/C14).
"""

import numpy as np

from beom_tpu.cases.double_gyre import make_case
from beom_tpu.core import ops
from beom_tpu.stepping import run_steps
from beom_tpu.stepping.projection import barotropic_transport


def _total_mass(h):
    return float(np.sum(np.asarray(h)))


def test_split_matches_fb_at_small_dt():
    """nsub=1 split ~ FB: same gravity-wave treatment, O(dt) Coriolis
    splitting difference — fields should agree closely early on."""
    n = 60
    cfg_fb, grid, forcing, state = make_case(nx=32, ny=32, dtype="float64",
                                             adv_scheme="linear")
    out_fb = run_steps(state, grid, forcing, cfg_fb, n)

    cfg_sp, grid2, forcing2, state2 = make_case(nx=32, ny=32,
                                                dtype="float64",
                                                adv_scheme="linear",
                                                scheme="split", nsub=1)
    out_sp = run_steps(state2, grid2, forcing2, cfg_sp, n)

    scale = np.abs(np.asarray(out_fb.u)).max()
    assert scale > 1e-6
    np.testing.assert_allclose(np.asarray(out_sp.u), np.asarray(out_fb.u),
                               atol=0.05 * scale)
    np.testing.assert_allclose(np.asarray(out_sp.h), np.asarray(out_fb.h),
                               rtol=1e-3)


def test_split_stable_beyond_fb_cfl():
    """With nsub=8 the baroclinic dt can exceed the external CFL 4x."""
    cfg, grid, forcing, state = make_case(nx=32, ny=32, dtype="float64",
                                          scheme="split", nsub=8)
    cfg = type(cfg)(**{**cfg.__dict__, "dt": cfg.dt * 4.0})
    out = run_steps(state, grid, forcing, cfg, 200)
    assert np.isfinite(np.asarray(out.u)).all()
    assert np.abs(np.asarray(out.u)).max() < 5.0
    m0, m1 = _total_mass(state.h), _total_mass(out.h)
    assert abs(m1 - m0) / m0 < 1e-6


def test_rigid_lid_keeps_column_fixed():
    cfg, grid, forcing, state = make_case(nx=32, ny=32, dtype="float64",
                                          scheme="rigid_lid")
    # the rigid_lid case dt is already ~10x the external CFL; double it
    # again — the ceiling is now f*dt (explicit Coriolis), not gravity
    cfg = type(cfg)(**{**cfg.__dict__, "dt": cfg.dt * 2.0})
    out = run_steps(state, grid, forcing, cfg, 100)
    assert np.isfinite(np.asarray(out.u)).all()
    col = np.sum(np.asarray(out.h), axis=0)
    H = np.asarray(grid.H)
    np.testing.assert_allclose(col, H, atol=1e-6 * H.max())


def test_rigid_lid_divergence_free_transport():
    cfg, grid, forcing, state = make_case(nx=32, ny=32, dtype="float64",
                                          scheme="rigid_lid")
    out = run_steps(state, grid, forcing, cfg, 50)
    U, V = barotropic_transport(out.h, out.u, out.v, grid)
    div = (ops.d_xm(U, cfg.dx) + ops.d_ym(V, cfg.dy)) * grid.mask
    # relative to a typical transport divergence scale
    scale = float(np.abs(np.asarray(U)).max()) / cfg.dx
    assert scale > 0
    assert float(np.abs(np.asarray(div)).max()) < 1e-6 * max(scale, 1e-12)


def test_implicit_fs_stable_beyond_cfl_and_conserves_mass():
    cfg, grid, forcing, state = make_case(nx=32, ny=32, dtype="float64",
                                          scheme="implicit_fs")
    cfg = type(cfg)(**{**cfg.__dict__, "dt": cfg.dt * 8.0})
    out = run_steps(state, grid, forcing, cfg, 150)
    assert np.isfinite(np.asarray(out.u)).all()
    assert np.abs(np.asarray(out.u)).max() < 5.0
    m0, m1 = _total_mass(state.h), _total_mass(out.h)
    assert abs(m1 - m0) / m0 < 1e-8


def test_implicit_fs_matches_fb_small_dt():
    """At the FB-stable dt the implicit scheme converges to the same
    slow dynamics (gravity-wave phase differs O(dt^2))."""
    n = 60
    cfg_fb, grid, forcing, state = make_case(nx=32, ny=32, dtype="float64",
                                             adv_scheme="linear")
    out_fb = run_steps(state, grid, forcing, cfg_fb, n)
    cfg_im, g2, f2, s2 = make_case(nx=32, ny=32, dtype="float64",
                                   adv_scheme="linear",
                                   scheme="implicit_fs")
    out_im = run_steps(s2, g2, f2, cfg_im, n)
    scale = np.abs(np.asarray(out_fb.u)).max()
    assert scale > 1e-6
    np.testing.assert_allclose(np.asarray(out_im.u), np.asarray(out_fb.u),
                               atol=0.1 * scale)
