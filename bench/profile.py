"""Profiling harness (SURVEY.md §6 tracing/profiling): capture a
Perfetto/XPlane trace of N steps for kernel-level HBM/FLOP analysis.

    python bench/profile.py [case] [nx] [steps] [outdir] [backend]

Open the written trace directory with TensorBoard's profile plugin or
upload the .perfetto-trace to ui.perfetto.dev.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # runnable as python bench/<x>.py

import sys

import jax


def main(argv):
    case = argv[1] if len(argv) > 1 else "double_gyre"
    nx = int(argv[2]) if len(argv) > 2 else 1024
    n = int(argv[3]) if len(argv) > 3 else 50
    outdir = argv[4] if len(argv) > 4 else "/tmp/beom_trace"
    backend = argv[5] if len(argv) > 5 else "xla"

    import dataclasses
    from beom_tpu.cases import make_case
    from beom_tpu.stepping import make_stepper

    cfg, grid, forcing, state = make_case(case, nx=nx, ny=nx)
    cfg = dataclasses.replace(cfg, backend=backend)
    step = make_stepper(grid, forcing, cfg)

    @jax.jit
    def chunk(s):
        def body(s, _):
            return step(s), None
        s, _ = jax.lax.scan(body, s, None, length=n)
        return s

    s = chunk(state)                 # compile outside the trace
    jax.block_until_ready(s.h)
    with jax.profiler.trace(outdir):
        s = chunk(s)
        jax.block_until_ready(s.h)
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main(sys.argv)
