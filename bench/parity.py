"""Full parity protocol (BASELINE.md metric 4): run each canonical
config for N steps (default 10k) in the f64 NumPy oracle and in the
framework (f32 on TPU by default, or f64), and report the field error
envelope on h, u, v.

    python bench/parity.py [case|all] [n_steps] [nx] [dtype]

Prints one JSON line per case: max-abs and rms errors, plus the f64
machine envelope measured by also running the core at f64 (sizing the
f32 drift against op-order noise, SURVEY.md §8 hard part 4).
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # runnable as python bench/<x>.py

import json
import sys

import numpy as np


def run_one(case, n_steps=10000, nx=64, dtype="float32"):
    from beom_tpu.cases import make_case
    from beom_tpu.oracle import oracle_for
    from beom_tpu.stepping import run_steps
    import jax

    kw = dict(nx=nx, ny=nx)
    # scheme variants of the canonical geometries: all four time-stepping
    # schemes get the full protocol (r1 VERDICT item 4)
    variants = {"split_gyre": ("double_gyre", dict(scheme="split", nsub=8)),
                "implicit_fs": ("rigid_lid", dict(scheme="implicit_fs"))}
    geom, extra = variants.get(case, (case, {}))
    kw.update(extra)
    if geom in ("shelf_forced", "coastal_wetdry"):
        kw["ny"] = max(nx * 2 // 3, 16)
    cfg, grid, forcing, state = make_case(geom, dtype=dtype, **kw)

    out = jax.jit(lambda s: run_steps(s, grid, forcing, cfg, n_steps))(state)
    h = np.asarray(out.h, np.float64)
    u = np.asarray(out.u, np.float64)
    v = np.asarray(out.v, np.float64)

    orc = oracle_for(cfg, grid, forcing)
    ho, uo, vo = orc.run(np.asarray(state.h), np.asarray(state.u),
                         np.asarray(state.v), n_steps)

    def err(a, b):
        d = np.abs(a - b)
        return {"max": float(d.max()),
                "rms": float(np.sqrt((d * d).mean())),
                "scale": float(np.abs(b).max())}

    return {"case": case, "n_steps": n_steps, "nx": kw["nx"],
            "ny": kw["ny"], "dtype": dtype,
            "h": err(h, ho), "u": err(u, uo), "v": err(v, vo)}


def run_one_dist(case, n_steps=1000, nx=64, dtype="float32",
                 mesh_shape=(2, 2), backend="pallas"):
    """Parity leg for the DISTRIBUTED steppers on the virtual CPU mesh
    (r3 VERDICT item 10): the composed Pallas tier (backend='pallas',
    dist-band kernels via the TPU interpreter) or the XLA shard_map
    tier, vs the same f64 NumPy oracle.  Interpreter emulation costs
    ~0.1 s/step, so the composed-tier leg uses a reduced step count;
    the 10k-step single-chip rows live in PARITY_r02.json."""
    import jax
    from beom_tpu.cases import make_case
    from beom_tpu.oracle import oracle_for
    from beom_tpu.parallel.dist import make_dist_stepper
    from beom_tpu.parallel.mesh import make_mesh, shard_state
    from beom_tpu.stepping import prepare_state

    my, mx = mesh_shape
    # split's in-kernel subcycle needs a 16-row halo (nsub=2), so its
    # local blocks must hold 2*16+8 = 40 rows
    rows = 48 if case == "split_gyre" else 24
    kw = dict(nx=nx, ny=max(nx, rows * my), dtype=dtype,
              backend=backend, mesh_y=my, mesh_x=mx)
    variants = {"split_gyre": ("double_gyre",
                               dict(scheme="split", nsub=2)),
                "implicit_fs": ("rigid_lid",
                                dict(scheme="implicit_fs"))}
    geom, extra = variants.get(case, (case, {}))
    kw.update(extra)
    cfg, grid, forcing, state = make_case(geom, **kw)

    mesh = make_mesh(my, mx)
    inner = 50
    step = make_dist_stepper(grid, forcing, cfg, mesh, n_inner=inner)
    s = shard_state(prepare_state(state, cfg), mesh)
    done = 0
    while done < n_steps:
        s = step(s)
        done += inner
    jax.block_until_ready(s.h)
    h = np.asarray(s.h, np.float64)
    u = np.asarray(s.u, np.float64)
    v = np.asarray(s.v, np.float64)

    orc = oracle_for(cfg, grid, forcing)
    ho, uo, vo = orc.run(np.asarray(state.h), np.asarray(state.u),
                         np.asarray(state.v), done)

    def err(a, b):
        d = np.abs(a - b)
        return {"max": float(d.max()),
                "rms": float(np.sqrt((d * d).mean())),
                "scale": float(np.abs(b).max())}

    return {"case": case, "tier": f"dist-{backend}",
            "mesh": list(mesh_shape), "n_steps": done,
            "nx": kw["nx"], "ny": kw["ny"], "dtype": dtype,
            "h": err(h, ho), "u": err(u, uo), "v": err(v, vo)}


def main(argv):
    case = argv[1] if len(argv) > 1 else "all"
    n = int(argv[2]) if len(argv) > 2 else 10000
    nx = int(argv[3]) if len(argv) > 3 else 64
    dtype = argv[4] if len(argv) > 4 else "float32"
    platform = argv[5] if len(argv) > 5 else None

    import jax
    if case == "dist":
        # distributed legs need the 8-virtual-device CPU mesh
        jax.config.update("jax_num_cpu_devices", 8)
        jax.config.update("jax_platforms", "cpu")
        if dtype == "float64":
            jax.config.update("jax_enable_x64", True)
        # the projection/split legs pay interpret-mode emulation for
        # the band phases (plus the XLA dist solve per step for the
        # projection schemes) — quarter count (r4 VERDICT item 3: all
        # four schemes get a dist-parity artifact, not just two)
        for c, backend, n_c in (("double_gyre", "pallas", n),
                                ("split_gyre", "pallas", max(n // 4, 100)),
                                ("rigid_lid", "pallas", max(n // 4, 100)),
                                ("implicit_fs", "pallas",
                                 max(n // 4, 100)),
                                ("double_gyre", "xla", n)):
            print(json.dumps(run_one_dist(c, n_c, nx, dtype,
                                          backend=backend)),
                  flush=True)
        return
    if platform:   # e.g. 'cpu': run the core off-TPU (f64 control)
        jax.config.update("jax_platforms", platform)
    if dtype == "float64":
        # without this the device arrays silently downcast to f32 and
        # the "f64 control" measures nothing
        jax.config.update("jax_enable_x64", True)
    cases = ([case] if case != "all" else
             ["double_gyre", "two_layer", "rigid_lid", "coastal_wetdry",
              "shelf_forced", "split_gyre", "implicit_fs"])
    for c in cases:
        print(json.dumps(run_one(c, n, nx, dtype)), flush=True)


if __name__ == "__main__":
    main(sys.argv)
