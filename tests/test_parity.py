"""North-star parity (SURVEY.md §5.4, BASELINE.md metric 4): every
canonical config run in the JAX core at f64 must allclose-match the
independent NumPy oracle.  This is the stand-in for "field allclose vs
Fortran" until reference fixtures exist; the comparison interface is
data-only (final h, u, v fields), so swapping in Fortran outputs later
changes no test code.

CI runs a few hundred steps on small grids; bench/parity.py runs the
full 10k-step protocol.
"""

import numpy as np
import pytest

from beom_tpu.cases import make_case
from beom_tpu.oracle import oracle_for
from beom_tpu.stepping import run_steps


def _parity(case, n_steps, atol_h, atol_uv, **kw):
    cfg, grid, forcing, state = make_case(case, dtype="float64", **kw)
    out = run_steps(state, grid, forcing, cfg, n_steps)

    orc = oracle_for(cfg, grid, forcing)
    ho, uo, vo = orc.run(np.asarray(state.h), np.asarray(state.u),
                         np.asarray(state.v), n_steps)

    np.testing.assert_allclose(np.asarray(out.h), ho, rtol=0, atol=atol_h)
    np.testing.assert_allclose(np.asarray(out.u), uo, rtol=0, atol=atol_uv)
    np.testing.assert_allclose(np.asarray(out.v), vo, rtol=0, atol=atol_uv)
    assert np.abs(uo).max() > 1e-8    # the run did something


def test_parity_double_gyre():
    _parity("double_gyre", 300, 1e-7, 1e-10, nx=32, ny=32)


def test_parity_two_layer():
    _parity("two_layer", 300, 1e-7, 1e-10, nx=32, ny=32)


def test_parity_rigid_lid():
    # solver-tolerance differences dominate; envelope is looser
    _parity("rigid_lid", 200, 1e-5, 1e-8, nx=32, ny=32,
            solver_tol=1e-13, solver_maxiter=5000)


def test_parity_split():
    # the split scheme now has its own oracle stepper (r1 VERDICT item 4)
    _parity("double_gyre", 300, 1e-7, 1e-10, nx=32, ny=32,
            scheme="split", nsub=4)


def test_parity_split_two_layer():
    _parity("two_layer", 200, 1e-7, 1e-10, nx=32, ny=32,
            scheme="split", nsub=4)


def test_parity_implicit_fs():
    _parity("rigid_lid", 200, 1e-5, 1e-8, nx=32, ny=32,
            scheme="implicit_fs", solver_tol=1e-13, solver_maxiter=5000)


def test_parity_coastal_wetdry():
    _parity("coastal_wetdry", 400, 1e-7, 1e-9, nx=48, ny=32)


def test_parity_shelf_forced():
    _parity("shelf_forced", 300, 1e-7, 1e-9, nx=48, ny=32)
