"""Dependence-cone probe (r1 VERDICT item 10): measure the one-step
stencil radius of every scheme/config empirically and assert the
derived halo widths (parallel/dist.required_halo, the fused kernels'
HALO_Y) cover it with margin.  A comb of large point perturbations —
large, so threshold terms (upwind switches, wet/dry gates) flip — is
applied to a spun-up state; the radius is the max Chebyshev distance
of any changed output cell to its nearest perturbation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from beom_tpu.cases import make_case
from beom_tpu.parallel.dist import required_halo
from beom_tpu.stencils.fused_fb import _halo_y
from beom_tpu.stepping import get_step, run_steps


def comb_radius(case, spacing=24, amp=0.05, n=96, **kw):
    cfg, grid, forcing, state = make_case(case, nx=n, ny=n,
                                          dtype="float64", **kw)
    s0 = run_steps(state, grid, forcing, cfg, 20)   # activate the flow
    step = get_step(cfg)
    o0 = step(s0, grid, forcing, cfg)
    pts = [(j, i) for j in range(4, n, spacing)
           for i in range(4, n, spacing)]
    rmax = 0
    for field in "huv":
        pert = np.array(getattr(s0, field))
        scale = max(np.abs(pert).max(), 1.0)
        for (j, i) in pts:
            pert[:, j, i] += amp * scale
        s1 = s0.replace(**{field: jnp.asarray(pert)})
        o1 = step(s1, grid, forcing, cfg)
        for f in "huv":
            d = np.abs(np.array(getattr(o1, f))
                       - np.array(getattr(o0, f))).max(axis=0)
            for y, x in zip(*np.nonzero(d > 0)):
                r = min(max(abs(y - j), abs(x - i)) for (j, i) in pts)
                rmax = max(rmax, r)
    return rmax, cfg


CASES = [
    ("double_gyre", {}),
    ("two_layer", {}),
    ("coastal_wetdry", {}),
    ("shelf_forced", {}),
    ("double_gyre", {"nu4": 1e9, "nu2": 0.0}),
    ("double_gyre", {"scheme": "split", "nsub": 4}),
    ("double_gyre", {"scheme": "split", "nsub": 8}),
]


@pytest.mark.parametrize("case,kw", CASES,
                         ids=[f"{c}-{'-'.join(map(str, k.values()))}"
                              if k else c for c, k in CASES])
def test_halo_covers_measured_cone(case, kw):
    r, cfg = comb_radius(case, **kw)
    if cfg.scheme == "split":
        # the dist split stepper exchanges per substep: its halo only
        # needs the slow-phase radius (r minus the subcycle's growth)
        assert required_halo(cfg) >= r - 2 * cfg.nsub + 1, \
            f"slow-phase halo too small for measured cone {r}"
    else:
        assert required_halo(cfg) > r, \
            f"required_halo {required_halo(cfg)} <= measured cone {r}"
    # the fused band kernels absorb the whole step (split: subcycle
    # included) in their y halo
    assert _halo_y(cfg) > r, \
        f"fused halo {_halo_y(cfg)} <= measured cone {r}"
