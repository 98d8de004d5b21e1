"""Experiment driver (SURVEY.md §3 C17, §4.2 call stack).

    cli/main -> load config -> build case -> chunked time loop:
        state = jit(lax.scan(step))(state)       # one XLA program/chunk
        diagnostics -> JSONL; NaN/CFL guard; snapshots at cadence

The hot loop is a single compiled scan per chunk (device-resident); the
host only sees a handful of diagnostic scalars per chunk plus any
snapshot fields at cfg.snap_every.  On instability (non-finite state)
the run aborts, keeping last_good.npz for restart (§6 failure
detection / checkpoint-resume).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Optional

import jax

from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing
from beom_tpu.core.state import State
from beom_tpu.diag import diagnostics
from beom_tpu.io import snapshots
from beom_tpu.stepping import get_step


class InstabilityError(RuntimeError):
    pass


def run(cfg: Config, grid: Grid, forcing: Forcing, state: State,
        n_steps: int, run_dir: Optional[str] = None,
        log=sys.stdout, chunk: Optional[int] = None) -> State:
    """Advance `n_steps`, chunked for I/O; returns the final state.

    chunk defaults to the diagnostics/snapshot cadence (or 100).
    """
    cadences = [c for c in (cfg.diag_every, cfg.snap_every) if c > 0]
    if chunk is None:
        chunk = min(cadences) if cadences else 100
    chunk = max(1, min(chunk, n_steps))

    # resume BEFORE sharding so a mesh>1 run feeds properly-placed
    # shards into the jitted shard_map program (r1 VERDICT weak #4)
    if run_dir:
        os.makedirs(run_dir, exist_ok=True)
        if resume := snapshots.latest_snapshot(run_dir):
            state = snapshots.load_state(resume)
            print(f"# resumed from {resume} at step {int(state.n)}",
                  file=log)

    from beom_tpu.stepping import prepare_state
    state = prepare_state(state, cfg)   # warm-start carry for projection

    dist = cfg.mesh_x * cfg.mesh_y > 1
    if dist:
        import dataclasses

        from beom_tpu.parallel.dist import make_dist_stepper
        from beom_tpu.parallel.mesh import make_mesh, shard_state
        mesh = make_mesh(cfg.mesh_y, cfg.mesh_x)
        state = shard_state(state, mesh)

        def make_advance(k):
            # k model steps = k//spp temporally-blocked passes + a
            # 1-step tail (spp == 1 for all but the pallas fb/split tier)
            n_pass, rem = divmod(k, cfg.steps_per_pass)
            stepk = make_dist_stepper(grid, forcing, cfg, mesh,
                                      n_inner=n_pass) if n_pass else None
            step1 = make_dist_stepper(
                grid, forcing,
                dataclasses.replace(cfg, steps_per_pass=1), mesh,
                n_inner=rem) if rem else None

            def advance(s):
                if stepk is not None:
                    s = stepk(s)
                if step1 is not None:
                    s = step1(s)
                return s
            return advance
    elif cfg.backend == "pallas":
        import dataclasses

        from beom_tpu.stepping import make_stepper
        spp = cfg.steps_per_pass
        pstep = make_stepper(grid, forcing, cfg)  # advances spp steps
        pstep1 = pstep if spp == 1 else make_stepper(
            grid, forcing, dataclasses.replace(cfg, steps_per_pass=1))

        def make_advance(k):
            # k model steps = k//spp temporally-blocked passes + a
            # 1-step tail for any remainder (k < spp or k % spp != 0)
            n_pass, rem = divmod(k, spp)

            @jax.jit
            def advance(s):
                def body(step_fn, s, length):
                    def b(s, _):
                        return step_fn(s), None
                    s, _ = jax.lax.scan(b, s, None, length=length)
                    return s
                s = body(pstep, s, n_pass)
                if rem:
                    s = body(pstep1, s, rem)
                return s
            return advance
    else:
        step = get_step(cfg)

        def make_advance(k):
            @jax.jit
            def advance(s):
                def body(s, _):
                    return step(s, grid, forcing, cfg), None
                s, _ = jax.lax.scan(body, s, None, length=k)
                return s
            return advance

    advances = {chunk: make_advance(chunk)}
    done = 0
    while done < n_steps:
        k = min(chunk, n_steps - done)   # final partial chunk re-jits once
        if k not in advances:
            advances[k] = make_advance(k)
        state = advances[k](state)
        done += k
        d = {k: float(v) for k, v in
             diagnostics(state, grid, cfg).items()}
        if cfg.diag_every > 0:
            print(json.dumps({"kind": "diag", **d}), file=log, flush=True)
        if d["finite"] != 1.0:
            raise InstabilityError(
                f"non-finite state at step {int(d['n'])}"
                + (f"; restart from {run_dir}/last_good.npz" if run_dir
                   else ""))
        if run_dir and cfg.snap_every > 0 and \
                int(state.n) % cfg.snap_every < chunk:
            snapshots.write_snapshot(run_dir, state)
    if run_dir:
        snapshots.write_snapshot(run_dir, state)
    return state


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        prog="beom-tpu", description="TPU-native layered shallow-water run")
    p.add_argument("case", help="canonical case name or a config .toml")
    p.add_argument("-n", "--steps", type=int, default=1000)
    p.add_argument("-o", "--out", default=None, help="run directory")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="Config override (repeatable)")
    args = p.parse_args(argv)

    from beom_tpu.io import config as ioconfig
    if args.case.endswith(".toml"):
        cfg, grid, forcing, state = ioconfig.load_toml_case(
            args.case, args.set)
    else:
        from beom_tpu.cases import make_case
        # overrides feed the factory itself so grid-shaping keys (nx,
        # ny, ...) stay consistent with the built arrays
        cfg, grid, forcing, state = make_case(
            args.case, **ioconfig.parse_overrides(args.set))
    run(cfg, grid, forcing, state, args.steps, run_dir=args.out)


if __name__ == "__main__":
    main()
