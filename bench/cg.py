"""Elliptic-solver throughput (BASELINE.md metric 3): CG iterations/s
and red-black sweeps/s on the rigid-lid operator.

    python bench/cg.py [nx] [ny] [iters]
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
import jax.numpy as jnp
import numpy as np


def main(argv):
    nx = int(argv[1]) if len(argv) > 1 else 2048
    ny = int(argv[2]) if len(argv) > 2 else nx
    iters = int(argv[3]) if len(argv) > 3 else 200

    from beom_tpu.cases import make_case
    from beom_tpu.solvers import elliptic

    cfg, grid, forcing, state = make_case(
        "rigid_lid", nx=nx, ny=ny, solver_maxiter=iters, solver_tol=0.0)

    rng = np.random.default_rng(0)
    b = rng.normal(size=(ny, nx)).astype(cfg.npdtype)
    b -= b.mean()
    b = jnp.asarray(b) * grid.mask

    # --- CG: fixed iteration count (tol=0 -> runs to maxiter) ---------
    solve = jax.jit(lambda b: elliptic.cg_solve(b, grid, cfg))
    r = solve(b)
    jax.block_until_ready(r.x)
    t0 = time.perf_counter()
    r = solve(b)
    jax.block_until_ready(r.x)
    dt = time.perf_counter() - t0
    print(json.dumps({"solver": "cg", "nx": nx, "ny": ny,
                      "iters_per_s": round(int(r.iters) / dt, 2),
                      "point_iters_per_s": round(nx * ny * int(r.iters) / dt, 1)}))

    # --- red-black: fixed sweeps --------------------------------------
    rb = jax.jit(lambda b: elliptic.redblack_solve(b, grid, cfg,
                                                   sweeps=iters))
    x = rb(b)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = rb(b)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    print(json.dumps({"solver": "redblack", "nx": nx, "ny": ny,
                      "sweeps_per_s": round(iters / dt, 2),
                      "point_sweeps_per_s": round(nx * ny * iters / dt, 1)}))

    # --- temporally-blocked Pallas red-black (k sweeps / HBM pass) ----
    try:
        from beom_tpu.stencils.redblack_pallas import make_rb_solver
        k = 16
        skk = make_rb_solver(grid, cfg, k=k)
        x = skk(jnp.zeros_like(b), b)
        jax.block_until_ready(x)
        reps = max(iters // k, 1)
        t0 = time.perf_counter()
        for _ in range(reps):
            x = skk(x, b)
        jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "solver": "redblack_pallas_blocked", "k": k,
            "nx": nx, "ny": ny,
            "sweeps_per_s": round(reps * k / dt, 2),
            "point_sweeps_per_s": round(nx * ny * reps * k / dt, 1)}))
    except Exception as e:
        print(json.dumps({"solver": "redblack_pallas_blocked",
                          "error": f"{type(e).__name__}: {e}"}))

    # --- time-to-solution: Jacobi-CG vs MG-CG at a fixed tolerance ----
    import dataclasses
    cfg_tol = dataclasses.replace(cfg, solver_tol=1e-6,
                                  solver_maxiter=4000)
    from beom_tpu.solvers.multigrid import make_mg_precond
    for name, kw in (("cg_jacobi", {}),
                     ("cg_mg", {"precond": make_mg_precond(grid, cfg_tol)})):
        solve = jax.jit(lambda b, kw=kw: elliptic.cg_solve(
            b, grid, cfg_tol, **kw))
        r = solve(b)
        jax.block_until_ready(r.x)
        t0 = time.perf_counter()
        r = solve(b)
        jax.block_until_ready(r.x)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "solver": name, "nx": nx, "ny": ny, "tol": 1e-6,
            "iters": int(r.iters), "seconds": round(dt, 4),
            "resnorm_rel": float(np.sqrt(r.resnorm
                                         / float(jnp.sum(b * b))))}))

    # --- Pallas-tier standalone multigrid (solver='mg'), amortized ----
    # in a scan chunk: this sandbox's TPU tunnel re-marshals closure
    # constants per jit call (~1.6 ms), which would otherwise dominate
    from beom_tpu.solvers.multigrid import make_mg_solver
    for sm in ("xla", "pallas"):
        try:
            solve = make_mg_solver(grid, cfg_tol, smoother=sm)

            @jax.jit
            def chunk(b):
                def body(c, _):
                    return solve(c) + 1e-12 * c, None
                c, _ = jax.lax.scan(body, b, None, length=10)
                return c
            x = chunk(b)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            x = chunk(b)
            jax.block_until_ready(x)
            dt = (time.perf_counter() - t0) / 10
            Hu2, Hv2 = elliptic.face_depths(grid)
            bb = (b - grid.mask * (jnp.sum(b * grid.mask)
                                   / jnp.sum(grid.mask))) * grid.mask
            xs = solve(b)
            r = (bb - elliptic.laplacian_H(xs, Hu2, Hv2, grid,
                                           cfg_tol)) * grid.mask
            print(json.dumps({
                "solver": f"mg_{sm}", "nx": nx, "ny": ny,
                "seconds": round(dt, 5),
                "resnorm_rel": float(jnp.linalg.norm(r)
                                     / jnp.linalg.norm(bb))}))
        except Exception as e:
            print(json.dumps({"solver": f"mg_{sm}",
                              "error": f"{type(e).__name__}: {e}"}))


if __name__ == "__main__":
    main(sys.argv)
