"""Headline benchmark (driver contract): prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: effective grid-points/s/chip on the BASELINE.md config-1
stencil — the 1-layer double-gyre forward-backward step, f32, chunked
lax.scan on the attached TPU, fused Pallas band kernel with 4-step
temporal blocking (4 model steps per HBM pass; exact-parity vs the
1-step path is pinned by tests/unit/test_pallas.py and the on-hardware
probe in the verify flow).

`vs_baseline` is the fraction of the HBM speed-of-light bound for the
UNBLOCKED step (BASELINE.json `published` is empty — the reference has
no published numbers — so speed-of-light is the honest denominator):
41.75 B/pt/step of minimum traffic at 819 GB/s -> 19.6e9 pt/s.
Temporal blocking cuts the per-step traffic k-fold, so values may
legitimately approach or exceed 1.0; BASELINE.md holds the full
accounting (empirical DMA roof, compute ceiling, per-tier rows).

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
                  backend="pallas", steps_per_pass=1):
    from beom_tpu.cases import make_case
    from beom_tpu.stepping import make_stepper
    import dataclasses

    cfg, grid, forcing, state = make_case("double_gyre", nx=nx, ny=ny)
    cfg = dataclasses.replace(cfg, backend=backend)
    if steps_per_pass > 1:
        from beom_tpu.stencils.fused_fb import make_pallas_stepper
        step = make_pallas_stepper(grid, forcing, cfg,
                                   steps_per_pass=steps_per_pass)
    else:
        step = make_stepper(grid, forcing, cfg)
    n_calls = max(n_steps // steps_per_pass, 1)

    @jax.jit
    def chunk(s):
        def body(s, _):
            return step(s), None
        s, _ = jax.lax.scan(body, s, None, length=n_calls)
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
    return nx * ny * n_calls * steps_per_pass / dt


def roofline_bound(bytes_per_point=41.75):
    """Minimum HBM traffic of one UNBLOCKED fused fb step (f32,
    1 layer, by=256/wy=8 band plan): reads h,u,v,H,mask,taux,tauy at
    (by+2wy)/by = 1.0625 halo redundancy + writes h,u,v
    = 10.44 words = 41.75 B/pt (bench/roofline.py holds the general
    accounting; BASELINE.md the measured DMA/compute decomposition)."""
    return HBM_BW / bytes_per_point


def main():
    attempts = (("pallas_tb4", dict(backend="pallas", steps_per_pass=4)),
                ("pallas", dict(backend="pallas")),
                ("xla", dict(backend="xla")))
    value, metric = None, None
    for name, kw in attempts:
        try:
            value = bench_stencil(**kw)
            metric = f"grid_points_per_s_per_chip_double_gyre_fb_{name}"
            break
        except Exception as e:            # each tier is best-effort
            print(f"{name} failed ({type(e).__name__}: {e}); "
                  "falling back", file=sys.stderr)
    bound = roofline_bound()
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(value / bound, 4),
    }))


if __name__ == "__main__":
    main()
