"""Weak-scaling measurement (BASELINE.md metric 5, north-star >=80%).

Fixes the per-device block at (block, block) and grows the global grid
with the mesh; reports grid-points/s and parallel efficiency vs the
1-device run.  On the sandbox's single chip this runs on N virtual CPU
devices (methodology check, not a hardware number); on a pod slice it
measures the ICI halo-exchange overhead directly.

    python bench/scaling.py [block] [steps]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # runnable as python bench/<x>.py

import json
import sys
import time

import numpy as np


def main(argv):
    block = int(argv[1]) if len(argv) > 1 else 256
    n_steps = int(argv[2]) if len(argv) > 2 else 50

    import jax
    # Configure the 8-virtual-CPU mesh BEFORE any backend is touched:
    # probing jax.devices() first would initialize (and block on) the
    # single-tenant TPU even though this methodology run never uses it.
    try:
        jax.config.update("jax_num_cpu_devices", 8)
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass   # backends already up (e.g. a real pod slice): use them
    ndev = len(jax.devices())
    if jax.devices()[0].platform == "cpu" and block > 64:
        # virtual devices share host cores: a big per-device block makes
        # the slowest shard miss XLA:CPU's 40 s collective-permute
        # rendezvous deadline (observed SIGABRT at block=128, mesh 2x4).
        # The virtual run validates mechanics only, so clamp.
        print(json.dumps({"note": f"block {block} -> 64 on virtual CPU "
                          "devices (rendezvous deadline)"}), file=sys.stderr)
        block = 64

    from beom_tpu.cases import make_case
    from beom_tpu.parallel.dist import make_dist_stepper
    from beom_tpu.parallel.mesh import make_mesh, shard_state
    from beom_tpu.stepping import get_step

    def run(mesh_shape):
        my, mx = mesh_shape
        cfg, grid, forcing, state = make_case(
            "double_gyre", nx=block * mx, ny=block * my)
        if my * mx == 1:
            step = get_step(cfg)
            import functools
            stepper = jax.jit(lambda s: step(s, grid, forcing, cfg))
            s = state
        else:
            mesh = make_mesh(my, mx)
            stepper = make_dist_stepper(grid, forcing, cfg, mesh,
                                        n_inner=1)
            s = shard_state(state, mesh)
        s2 = stepper(s)
        jax.block_until_ready(s2.h)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            s2 = stepper(s2)
        jax.block_until_ready(s2.h)
        dt = time.perf_counter() - t0
        pts = block * block * my * mx * n_steps
        return pts / dt

    shapes = [(1, 1)]
    if ndev >= 2:
        shapes.append((1, 2))
    if ndev >= 4:
        shapes.append((2, 2))
    if ndev >= 8:
        shapes.append((2, 4))

    base = None
    for shape in shapes:
        pps = run(shape)
        n = shape[0] * shape[1]
        if base is None:
            base = pps
        eff = pps / (base * n)
        print(json.dumps({"mesh": list(shape), "devices": n,
                          "points_per_s": round(pps, 1),
                          "weak_scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main(sys.argv)
