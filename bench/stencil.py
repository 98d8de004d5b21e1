"""Per-config stencil throughput (BASELINE.md metric 1-2).

Prints one JSON line per run: grid-points/s/chip for a chunked
lax.scan of the config's step on the attached device, for both the
op-by-op XLA path and (where supported) the fused Pallas kernel.

    python bench/stencil.py [case] [nx] [ny] [steps]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # runnable as python bench/<x>.py

import json
import sys
import time

import jax
import numpy as np


def measure(step, state, n_steps: int, inner: int = 100):
    """Time `n_steps` of jitted `step` advancing `inner` per call."""
    from beom_tpu.core.state import State

    @jax.jit
    def chunk(s):
        def body(s, _):
            return step(s), None
        s, _ = jax.lax.scan(body, s, None, length=inner)
        return s

    s = chunk(state)                         # compile + warm
    jax.block_until_ready(s.h)
    t0 = time.perf_counter()
    done = 0
    while done < n_steps:
        s = chunk(s)
        done += inner
    jax.block_until_ready(s.h)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(s.h)).all()
    return done / dt


def bench_case(case="double_gyre", nx=2048, ny=2048, n_steps=300, **kw):
    import dataclasses

    from beom_tpu.cases import make_case
    from beom_tpu.stepping import make_stepper, prepare_state

    out = []
    cfg, grid, forcing, state = make_case(case, nx=nx, ny=ny, **kw)
    # projection schemes: attach the warm-start carry BEFORE the scan —
    # without it the solves run cold every step (r4 fix: the old bench
    # silently dropped the carry and measured cold-start solves)
    state = prepare_state(state, cfg)
    for backend in ("xla", "pallas"):
        c = dataclasses.replace(cfg, backend=backend)
        try:
            step = make_stepper(grid, forcing, c)
            sps = measure(step, state, n_steps)
            out.append({"case": case, "backend": backend, "nx": nx,
                        "ny": ny, "points_per_s": round(nx * ny * sps, 1),
                        "steps_per_s": round(sps, 2)})
        except Exception as e:        # pallas tier is best-effort
            if backend == "xla":
                raise
            out.append({"case": case, "backend": backend,
                        "error": f"{type(e).__name__}: {e}"})
    return out


def bench_fb_large(nx=8192, ny=8192, n_steps=50, inner=25):
    """Single-chip capability row for very large grids: statics ride as
    explicit jit arguments (closure-captured constants of ~2 GB exceed
    the sandbox's remote-compile request limit) and the band machinery
    picks a narrow band or the x-tiled fallback as VMEM dictates."""
    import jax.numpy as jnp

    from beom_tpu.cases import make_case
    from beom_tpu.core.state import State
    from beom_tpu.stencils.band import make_band_call, static_fields
    from beom_tpu.stepping import fb as fb_mod

    cfg, grid, forcing, state = make_case("double_gyre", nx=nx, ny=ny)

    def body(f, grid_t, forcing_t, scal):
        n, t = scal
        out = fb_mod.fb_step(State(h=f["h"], u=f["u"], v=f["v"],
                                   t=t, n=n), grid_t, forcing_t, cfg,
                             parity="cond")
        return out.h, out.u, out.v

    nz = cfg.nz
    call = make_band_call(
        grid, forcing, cfg, body,
        dyn=dict.fromkeys(("h", "u", "v"), grid.H[None].repeat(nz, 0)),
        out_leads=((nz,), (nz,), (nz,)), wy=8)
    stats = tuple(static_fields(grid, forcing, cfg).values())
    dt = cfg.npdtype

    @jax.jit
    def chunk(s, stats):
        def bd(s, _):
            scal = jnp.stack([s.n.astype(dt), s.t.astype(dt)])
            h1, u1, v1 = call(scal, s.h, s.u, s.v, statics=stats)
            return State(h=h1, u=u1, v=v1, t=s.t + cfg.dt,
                         n=s.n + 1), None
        s, _ = jax.lax.scan(bd, s, None, length=inner)
        return s

    s = chunk(state, stats)
    jax.block_until_ready(s.h)
    t0 = time.perf_counter()
    done = 0
    while done < n_steps:
        s = chunk(s, stats)
        done += inner
    jax.block_until_ready(s.h)
    dt_w = time.perf_counter() - t0
    assert np.isfinite(np.asarray(s.h)).all()
    return {"case": "double_gyre", "backend": "pallas", "nx": nx,
            "ny": ny, "points_per_s": round(nx * ny * done / dt_w, 1),
            "steps_per_s": round(done / dt_w, 2)}


def main(argv):
    case = argv[1] if len(argv) > 1 else "double_gyre"
    nx = int(argv[2]) if len(argv) > 2 else 2048
    ny = int(argv[3]) if len(argv) > 3 else nx
    n = int(argv[4]) if len(argv) > 4 else 300
    for row in bench_case(case, nx=nx, ny=ny, n_steps=n):
        print(json.dumps(row))


if __name__ == "__main__":
    main(sys.argv)
