"""Headline benchmark (driver contract): prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: grid-points/s/chip on the BASELINE.md config-1 stencil — the
1-layer double-gyre forward-backward step, f32, chunked lax.scan on the
attached TPU.  `vs_baseline` is the fraction of the HBM-bandwidth
roofline bound (BASELINE.json `published` is empty — the reference has
no published numbers — so speed-of-light is the honest denominator;
see SURVEY.md §7 and BASELINE.md).

Extra per-config numbers go to stderr (the driver reads stdout's last
line only).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

# v5e HBM bandwidth [bytes/s] (public spec); roofline bytes/point/step
HBM_BW = 819e9


def bench_stencil(nx=2048, ny=2048, n_steps=200, warmup=2,
                  backend="pallas"):
    from beom_tpu.cases import make_case
    from beom_tpu.stepping import make_stepper
    import dataclasses

    cfg, grid, forcing, state = make_case("double_gyre", nx=nx, ny=ny)
    cfg = dataclasses.replace(cfg, backend=backend)
    step = make_stepper(grid, forcing, cfg)

    @jax.jit
    def chunk(s):
        def body(s, _):
            return step(s), None
        s, _ = jax.lax.scan(body, s, None, length=n_steps)
        return s

    s = chunk(state)                      # compile + warm
    jax.block_until_ready(s.h)
    for _ in range(warmup - 1):
        s = chunk(s)
        jax.block_until_ready(s.h)
    t0 = time.perf_counter()
    s = chunk(s)
    jax.block_until_ready(s.h)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(s.h)).all(), "bench run went non-finite"
    return nx * ny * n_steps / dt


def roofline_bound(bytes_per_point=72.0):
    """f32 1-layer FB step, perfect VMEM stencil reuse: streams
    h,u,v (3 reads + 3 writes) + H,f,mask,mask_u,mask_v,taux,mask_q
    ~ 18 f32 accesses/point/step => ~72 B."""
    return HBM_BW / bytes_per_point


def main():
    try:
        value = bench_stencil(backend="pallas")
        metric = "grid_points_per_s_per_chip_double_gyre_fb_pallas"
    except Exception as e:                 # pallas tier is best-effort
        print(f"pallas backend failed ({type(e).__name__}: {e}); "
              "falling back to xla", file=sys.stderr)
        value = bench_stencil(backend="xla")
        metric = "grid_points_per_s_per_chip_double_gyre_fb_xla"
    bound = roofline_bound()
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(value / bound, 4),
    }))


if __name__ == "__main__":
    main()
