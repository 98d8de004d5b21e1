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


def _compare(n_steps=3, nz_case="double_gyre", by=48, atol_scale=1e-12,
             **kw):
    cfg, grid, forcing, state = make_case(nz_case, **kw)
    step_x = make_stepper(grid, forcing, cfg)
    step_p = make_pallas_stepper(grid, forcing, cfg, by=by, bx=64,
                                 interpret=True)
    sx = sp = state
    for _ in range(n_steps):
        sx = step_x(sx)
        sp = step_p(sp)
    for f in "huv":
        a = np.asarray(getattr(sx, f))
        b = np.asarray(getattr(sp, f))
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(b, a, rtol=0,
                                   atol=atol_scale * max(scale, 1.0))


def test_pallas_fb_parity_1layer():
    _compare(nx=128, ny=96)


def test_pallas_fb_parity_2layer():
    _compare(nz_case="two_layer", nx=128, ny=96)


def test_pallas_fb_parity_wetdry():
    # ~2-ulp envelope: the XLA tier evaluates BOTH FB sweep orders and
    # selects (the r4 lax.cond miscompile workaround, fb.momentum_update)
    # while the kernel keeps the in-Mosaic cond — the different fusion
    # context leaves ulp-level diffs the wet/dry gates do not amplify
    _compare(nz_case="coastal_wetdry", nx=128, ny=96, atol_scale=1e-11)


def test_pallas_fb_parity_shelf_obc_tides_sponge():
    _compare(nz_case="shelf_forced", nx=128, ny=96, n_steps=4)


def test_pallas_split_parity():
    # split in-kernel: subcycle fori_loop + 2*nsub-wider halo (wy=32
    # for nsub=6; rows = by + 2*wy must fit in ny -> by=32 on ny=160)
    _compare(nx=128, ny=160, scheme="split", nsub=6, by=32)


def test_pallas_split_parity_2layer():
    _compare(nz_case="two_layer", nx=128, ny=160, scheme="split",
             nsub=4, by=32)


def test_pallas_rejects_unsupported_scheme():
    cfg, grid, forcing, state = make_case("rigid_lid", nx=64, ny=64)
    with pytest.raises(ValueError, match="scheme"):
        make_pallas_stepper(grid, forcing, cfg)


def _compare_projection(case="rigid_lid", n_steps=3, atol_ulp=1e-12,
                        **kw):
    from beom_tpu.stencils.fused_projection import (
        make_pallas_projection_stepper)

    cfg, grid, forcing, state = make_case(case, **kw)
    step_x = make_stepper(grid, forcing, cfg)
    step_p = make_pallas_projection_stepper(grid, forcing, cfg, by=48,
                                            interpret=True)
    sx = sp = state
    for _ in range(n_steps):
        sx = step_x(sx)
        sp = step_p(sp)
    for f in "huv":
        a = np.asarray(getattr(sx, f))
        b = np.asarray(getattr(sp, f))
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(b, a, rtol=0,
                                   atol=atol_ulp * max(scale, 1.0))


def test_pallas_rigid_lid_cg():
    # the band phases share every op with the XLA projection step, but
    # FMA-contraction differences between fusion contexts leave ~1-ulp
    # input diffs, and CG amplifies any ulp to solver-tolerance-level
    # field diffs -> compare at that envelope, not bitwise
    _compare_projection("rigid_lid", nx=128, ny=96, solver="cg",
                        atol_ulp=1e-5)


def test_pallas_implicit_fs_cg():
    _compare_projection("rigid_lid", nx=128, ny=96, solver="cg",
                        scheme="implicit_fs", atol_ulp=1e-5)


def test_pallas_rigid_lid_redblack_tolerance():
    # blocked-RB sweeps differ from strict SOR -> agreement at the
    # solver-tolerance level, amplified over n_steps
    _compare_projection("rigid_lid", nx=128, ny=96, solver="redblack",
                        atol_ulp=1e-4)


def test_tiled_band_fallback_matches_fb():
    """x-tiled (by, bx) fallback (stencils/band.make_tiled_band_call,
    SURVEY.md §4.4): forced via wx=8 tiles on a small grid, must
    reproduce the XLA fb step exactly like the full-width plan."""
    import jax.numpy as jnp

    from beom_tpu.core.state import State
    from beom_tpu.stencils.band import make_tiled_band_call
    from beom_tpu.stepping import fb as fb_mod, run_steps

    cfg, grid, forcing, state = make_case("double_gyre", nx=64, ny=64,
                                          dtype="float64")

    def body(f, grid_t, forcing_t, scal):
        n, t = scal
        out = fb_mod.fb_step(State(h=f["h"], u=f["u"], v=f["v"],
                                   t=t, n=n), grid_t, forcing_t, cfg)
        return out.h, out.u, out.v

    nz = cfg.nz
    call = make_tiled_band_call(
        grid, forcing, cfg, body,
        dyn=dict.fromkeys(("h", "u", "v"), grid.H[None].repeat(nz, 0)),
        out_leads=((nz,), (nz,), (nz,)),
        wy=8, by=16, bx=16, wx=8, interpret=True)

    s = state
    for _ in range(3):
        scal = jnp.stack([s.n.astype(cfg.npdtype),
                          s.t.astype(cfg.npdtype)])
        h1, u1, v1 = call(scal, s.h, s.u, s.v)
        s = State(h=h1, u=u1, v=v1, t=s.t + cfg.dt, n=s.n + 1)

    ref = run_steps(state, grid, forcing, cfg, 3)
    np.testing.assert_allclose(np.asarray(s.h), np.asarray(ref.h),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)


def test_steps_per_pass_product_path():
    """Config.steps_per_pass (r4 VERDICT item 2): temporal blocking
    routed through the PRODUCT entry points — make_stepper and the
    run.py driver — not just the kernel factory."""
    import dataclasses

    from beom_tpu import run as run_mod
    from beom_tpu.stepping import run_steps

    cfg, grid, forcing, state = make_case(
        "double_gyre", nx=64, ny=64, dtype="float64",
        backend="pallas", steps_per_pass=2)
    step2 = make_stepper(grid, forcing, cfg)
    s = step2(step2(state))          # 4 steps in 2 passes
    cfg1 = dataclasses.replace(cfg, backend="xla", steps_per_pass=1)
    ref = run_steps(state, grid, forcing, cfg1, 4)
    np.testing.assert_allclose(np.asarray(s.h), np.asarray(ref.h),
                               rtol=0, atol=1e-12)
    assert int(s.n) == 4

    # driver: 5 steps = 2 blocked passes + a 1-step remainder tail
    out = run_mod.run(cfg, grid, forcing, state, 5)
    ref5 = run_steps(state, grid, forcing, cfg1, 5)
    assert int(out.n) == 5
    np.testing.assert_allclose(np.asarray(out.h), np.asarray(ref5.h),
                               rtol=0, atol=1e-12)


def test_steps_per_pass_validation():
    from beom_tpu.core.config import Config

    with pytest.raises(ValueError, match="temporal blocking"):
        Config(steps_per_pass=2)                     # xla backend
    with pytest.raises(ValueError, match="temporal blocking"):
        Config(steps_per_pass=2, backend="pallas", scheme="rigid_lid")
    with pytest.raises(ValueError, match="halo"):
        Config(steps_per_pass=8, backend="pallas", ny=64, nx=64)
    with pytest.raises(ValueError, match="single-chip"):
        Config(solver="mg", mesh_x=2, nx=128)        # r4 ADVICE
    Config(steps_per_pass=4, backend="pallas")       # valid


def test_two_step_temporal_blocking_fb():
    """steps_per_pass=2 (temporal blocking, r3 VERDICT item 5): one
    band pass advancing two fb steps must match two XLA steps —
    exactly, since the 16-row halo covers twice the <=5-row cone."""
    from beom_tpu.stepping import run_steps

    cfg, grid, forcing, state = make_case("double_gyre", nx=64, ny=64,
                                          dtype="float64")
    step2 = make_pallas_stepper(grid, forcing, cfg, interpret=True,
                                steps_per_pass=2)
    s = step2(step2(state))          # 4 steps in 2 passes
    ref = run_steps(state, grid, forcing, cfg, 4)
    np.testing.assert_allclose(np.asarray(s.h), np.asarray(ref.h),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)
    assert int(s.n) == 4
