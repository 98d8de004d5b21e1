"""Wetting/drying stress tests (SURVEY.md §5.6): dam break onto a dry
slope and a draining basin — h >= 0 always, mass conserved to
round-off, and cells genuinely dry and re-wet.
"""

import numpy as np

from beom_tpu.core.config import Config
from beom_tpu.core.grid import make_grid, make_forcing
from beom_tpu.core.state import init_state
from beom_tpu.physics.wetdry import wet_mask
from beom_tpu.stepping import run_steps


def _setup(H, h0, dt, nu2=0.0, cd=2.5e-3):
    ny, nx = H.shape
    cfg = Config(nx=nx, ny=ny, dx=100.0, dy=100.0, nz=1, rho=(1000.0,),
                 f0=0.0, dt=dt, wetdry=True, h_dry=0.05, h_min=1e-4,
                 nu2=nu2, cd_bot=cd, dtype="float64")
    grid = make_grid(cfg, H)
    forcing = make_forcing(cfg)
    state = init_state(cfg, grid, h0=h0[None] * np.asarray(grid.mask))
    return cfg, grid, forcing, state


def test_dam_break_onto_dry_slope():
    """Water column released onto an initially dry upward slope."""
    ny, nx = 16, 128
    x = np.linspace(0.0, 1.0, nx)[None, :]
    H = np.broadcast_to(5.0 - 4.0 * x, (ny, nx)).copy()   # shoals east
    # dam: left third holds 3 m of water above the bed; right is dry
    h0 = np.where(x < 0.33, 3.0, 1e-4) * np.ones((ny, nx))
    dt = 0.5 * 100.0 / np.sqrt(2 * 9.81 * 8.0)
    cfg, grid, forcing, state = _setup(H, h0, dt)

    m0 = float(np.sum(np.asarray(state.h)))
    out = run_steps(state, grid, forcing, cfg, 800)
    h = np.asarray(out.h)

    assert np.isfinite(h).all()
    assert h.min() >= 0.0
    m1 = float(np.sum(h))
    assert abs(m1 - m0) / m0 < 1e-12
    # the front genuinely advanced: wet cells beyond the dam at the end
    wet_end = np.asarray(wet_mask(out.h, grid, cfg))[0]
    assert wet_end[:, int(0.5 * nx)].max() == 1.0


def test_draining_basin_dries_and_conserves():
    """A perched shelf drains into a deep pool: the thin sheet flows off
    the step (throttled by drag and the positive-definite limiter, so
    drainage is slow but monotone), stays non-negative, and conserves
    mass exactly through the wet/dry transition."""
    ny, nx = 16, 96
    x = np.linspace(0.0, 1.0, nx)[None, :]
    # left half: deep pool (H=10); right half: shelf at H=0.5
    H = np.where(x < 0.5, 10.0, 0.5) * np.ones((ny, nx))
    # start with 0.3 m of water everywhere above local bed
    h0 = np.where(x < 0.5, 5.0, 0.3) * np.ones((ny, nx))
    dt = 0.4 * 100.0 / np.sqrt(2 * 9.81 * 10.0)
    cfg, grid, forcing, state = _setup(H, h0, dt, cd=5e-4)

    m0 = float(np.sum(np.asarray(state.h)))
    shelf_cols = slice(int(0.55 * nx), nx - 1)
    mean0 = float(np.asarray(state.h)[0][:, shelf_cols].mean())
    out = run_steps(state, grid, forcing, cfg, 4000)
    h = np.asarray(out.h)

    assert np.isfinite(h).all()
    assert h.min() >= 0.0
    assert abs(float(np.sum(h)) - m0) / m0 < 1e-12
    # the shelf genuinely drained: mean depth down substantially, and
    # the cells next to the step thinned toward the dry threshold
    mean1 = float(h[0][:, shelf_cols].mean())
    assert mean1 < 0.75 * mean0
    near_step = h[0][1:-1, int(0.52 * nx)]
    assert near_step.max() < 3.0 * cfg.h_dry


def test_rewetting_cycle():
    """Slosh: a tilted surface swings back and wets previously dry
    cells; every intermediate state stays non-negative."""
    from beom_tpu.cases.coastal_wetdry import make_case
    cfg, grid, forcing, state = make_case(nx=64, ny=48, dtype="float64")
    s = state
    m0 = float(np.sum(np.asarray(state.h)))
    dried = rewet = False
    wet0 = np.asarray(wet_mask(state.h, grid, cfg))
    for _ in range(10):
        s = run_steps(s, grid, forcing, cfg, 100)
        h = np.asarray(s.h)
        assert h.min() >= 0.0
        wet = np.asarray(wet_mask(s.h, grid, cfg))
        if ((wet0 - wet) > 0).any():
            dried = True
        if dried and ((wet - wet0) > 0).any():
            rewet = True
    assert abs(float(np.sum(np.asarray(s.h))) - m0) / m0 < 1e-11
    assert dried
