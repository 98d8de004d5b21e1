"""Core-vs-oracle parity on the double gyre (SURVEY.md §5.1/§5.4).

The JAX core run at float64 must track the independently-written NumPy
oracle to round-off over many FB steps — this pins every stencil, the FB
ordering, the alternating Coriolis sweeps, and the implicit drag.
"""

import numpy as np

from beom_tpu.cases.double_gyre import make_case
from beom_tpu.oracle.core import Oracle
from beom_tpu.stepping.fb import run_steps


def _run_pair(n_steps, **case_kw):
    cfg, grid, forcing, state = make_case(nx=32, ny=32, dtype="float64",
                                          **case_kw)
    out = run_steps(state, grid, forcing, cfg, n_steps)

    orc = Oracle(cfg, np.asarray(grid.H), mask=np.asarray(grid.mask),
                 taux=np.asarray(forcing.taux))
    ho, uo, vo = orc.run(np.asarray(state.h), np.asarray(state.u),
                         np.asarray(state.v), n_steps)
    return (np.asarray(out.h), np.asarray(out.u), np.asarray(out.v),
            ho, uo, vo)


def test_double_gyre_matches_oracle():
    h, u, v, ho, uo, vo = _run_pair(200)
    np.testing.assert_allclose(h, ho, rtol=0, atol=1e-7)
    np.testing.assert_allclose(u, uo, rtol=0, atol=1e-10)
    np.testing.assert_allclose(v, vo, rtol=0, atol=1e-10)
    # and the run actually did something
    assert np.abs(np.asarray(u)).max() > 1e-6


def test_double_gyre_linear_scheme_matches_oracle():
    h, u, v, ho, uo, vo = _run_pair(200, adv_scheme="linear")
    np.testing.assert_allclose(h, ho, rtol=0, atol=1e-7)
    np.testing.assert_allclose(u, uo, rtol=0, atol=1e-10)
    np.testing.assert_allclose(v, vo, rtol=0, atol=1e-10)


def test_rest_state_stays_at_rest():
    cfg, grid, forcing, state = make_case(nx=24, ny=24, dtype="float64",
                                          tau0=0.0)
    out = run_steps(state, grid, forcing, cfg, 50)
    np.testing.assert_allclose(np.asarray(out.u), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(out.v), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(out.h), np.asarray(state.h),
                               atol=1e-12)


def test_mass_conservation():
    cfg, grid, forcing, state = make_case(nx=32, ny=32, dtype="float64")
    out = run_steps(state, grid, forcing, cfg, 300)
    m0 = float(np.sum(np.asarray(state.h)))
    m1 = float(np.sum(np.asarray(out.h)))
    assert abs(m1 - m0) / m0 < 1e-12
