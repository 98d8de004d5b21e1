"""Hardware smoke/perf probe for the Pallas steppers (all schemes).

Runs on the attached TPU: parity vs the XLA path after a few steps,
then steady-state throughput of both paths.  Used by the verify flow;
bench.py remains the driver-facing single-JSON-line entry.

Usage: python bench/hw_check.py [scheme] [nx] [nsteps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(step, s, n=30):
    s = step(s)
    jax.block_until_ready(s.h)
    t0 = time.perf_counter()
    for _ in range(n):
        s = step(s)
    jax.block_until_ready(s.h)
    return (time.perf_counter() - t0) / n


def main(scheme="split", nx=2048, n_par=3, n_time=30):
    from beom_tpu.cases import make_case
    from beom_tpu.stepping import make_stepper
    import dataclasses

    kw = {}
    case = "double_gyre"
    scheme, _, solver = scheme.partition(":")   # e.g. rigid_lid:redblack
    if scheme in ("rigid_lid", "implicit_fs"):
        case = "rigid_lid"
        if scheme == "implicit_fs":
            kw["scheme"] = "implicit_fs"
        if solver:
            kw["solver"] = solver
    elif scheme == "split":
        kw.update(scheme="split", nsub=12)

    cfg, grid, forcing, state = make_case(case, nx=nx, ny=nx, **kw)
    print(f"[{time.strftime('%H:%M:%S')}] case built", flush=True)
    step_x = make_stepper(grid, forcing, cfg)
    step_p = make_stepper(grid, forcing,
                          dataclasses.replace(cfg, backend="pallas"))

    sx = sp = state
    for _ in range(n_par):
        sx = step_x(sx)
        sp = step_p(sp)
    jax.block_until_ready((sx.h, sp.h))
    print(f"[{time.strftime('%H:%M:%S')}] both compiled + {n_par} steps",
          flush=True)
    worst = 0.0
    for f in "huv":
        a = np.asarray(getattr(sx, f))
        b = np.asarray(getattr(sp, f))
        scale = max(np.abs(a).max(), 1e-30)
        rel = float(np.abs(a - b).max() / max(scale, 1.0))
        worst = max(worst, rel)
        print(f"  {f}: bitwise={np.array_equal(a, b)} "
              f"maxrel={rel:.2e}", flush=True)

    tp = timeit(step_p, sp, n_time)
    tx = timeit(step_x, sx, n_time)
    pts = cfg.nx * cfg.ny
    print(f"scheme={scheme} nx={nx}: pallas {pts/tp/1e9:.2f} Gpt/s | "
          f"xla {pts/tx/1e9:.2f} Gpt/s | speedup {tx/tp:.2f}x | "
          f"worst rel diff {worst:.2e}", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "split",
         int(a[1]) if len(a) > 1 else 2048,
         n_time=int(a[2]) if len(a) > 2 else 30)


def check_cond_miscompile(nx=2048, n=10):
    """Regression probe for the XLA:TPU lax.cond branch miscompile
    found in r4: nz=2 at 2048^2 corrupted every 48th row of u by ~437x
    inside the cond (clean when the same expressions compile outside a
    branch — fb.momentum_update now evaluates both sweep orders and
    selects).  Run on the real TPU; CPU never reproduced it.

        python -c "import bench.hw_check as h; h.check_cond_miscompile()"
    """
    from beom_tpu.cases import make_case
    from beom_tpu.stepping import run_steps

    cfg, grid, forcing, state = make_case("two_layer", nx=nx, ny=nx)
    out = jax.jit(lambda s: run_steps(s, grid, forcing, cfg, n))(state)
    u = np.asarray(out.u)
    assert np.isfinite(u).all(), "two_layer blew up (cond miscompile?)"
    # spurious rows show up 2-3 orders above the wind-only spin-up
    assert np.abs(u).max() < 1e-4, \
        f"umax {np.abs(u).max():.2e}: corrupted rows are back"
    print(f"cond-miscompile probe OK: umax {np.abs(u).max():.3e}")
