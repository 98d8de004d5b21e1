"""Fused Pallas step vs the XLA path (SURVEY.md §3 C23).

Runs the kernel in interpreter mode on CPU (bit-for-bit the same trace
as the TPU kernel, minus Mosaic codegen); the real-TPU parity/speed
check lives in bench/stencil.py and the verify flow.
"""

import numpy as np
import pytest

import jax

from beom_tpu.cases import make_case
from beom_tpu.stepping import make_stepper
from beom_tpu.stencils.fused_fb import make_pallas_stepper


def _compare(n_steps=3, nz_case="double_gyre", **kw):
    cfg, grid, forcing, state = make_case(nz_case, **kw)
    step_x = make_stepper(grid, forcing, cfg)
    step_p = make_pallas_stepper(grid, forcing, cfg, by=48, bx=64,
                                 interpret=True)
    sx = sp = state
    for _ in range(n_steps):
        sx = step_x(sx)
        sp = step_p(sp)
    for f in "huv":
        a = np.asarray(getattr(sx, f))
        b = np.asarray(getattr(sp, f))
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12 * max(scale, 1.0))


def test_pallas_fb_parity_1layer():
    _compare(nx=128, ny=96)


def test_pallas_fb_parity_2layer():
    _compare(nz_case="two_layer", nx=128, ny=96)


def test_pallas_fb_parity_wetdry():
    _compare(nz_case="coastal_wetdry", nx=128, ny=96)


def test_pallas_fb_parity_shelf_obc_tides_sponge():
    _compare(nz_case="shelf_forced", nx=128, ny=96, n_steps=4)


def test_pallas_rejects_unsupported_scheme():
    cfg, grid, forcing, state = make_case("rigid_lid", nx=64, ny=64)
    with pytest.raises(ValueError, match="scheme"):
        make_pallas_stepper(grid, forcing, cfg)
