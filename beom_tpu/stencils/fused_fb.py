"""Fused forward-backward / split step as a single Pallas TPU kernel
(SURVEY.md §3 C23, §4.4 — the native performance tier).

One HBM pass per step, on the full-width band plan of stencils/band.py.
The band runs the *identical* physics of stepping/fb.py / split.py (the
same trick as the distributed path: a periodic roll on a y-padded band
equals the global roll for all interior rows).  Single source of truth
— physics fixes propagate to the XLA path, the shard_map path and this
kernel alike; parity is pinned by tests/unit/test_pallas.py (interpret
mode) and the on-hardware bitwise check in the verify flow.

Schemes:
  * 'fb'    — one fb_step per band pass (halo 16/24 rows).
  * 'split' — full split_step in-kernel: the barotropic subcycle is a
    fori_loop inside the band, absorbed by a 2*nsub-wider y halo (the
    in-kernel analogue of parallel/dist._dist_split_step's per-substep
    exchange).
  * rigid-lid / implicit-FS need a global elliptic solve per step —
    see stencils/fused_projection.py for their composed Pallas path.

Traffic per point per step (f32, nz=1, by=256, wy=8):
  read (h,u,v,H,mask,taux,tauy) * (1 + 2*8/256) + write (h,u,v)
  = 7 * 1.0625 + 3 = 10.44 words = 41.75 B -> spec bound 19.6 G pt/s
  on v5e.  Measured r4 (single-tenant): the same DMA pattern with a
  passthrough body reaches 9.68 G pt/s (the EMPIRICAL DMA roof — ~49 %
  of paper HBM BW on these band-sized transfers), the full kernel
  7.31 G pt/s (75 % of that roof, partial DMA/compute overlap), and
  steps_per_pass=4 temporal blocking 9.05 G pt/s effective (traffic
  /4, compute +25 % -> the compute ceiling ~11 G pt/s becomes the
  limiter).  Full decomposition in BASELINE.md.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid, Forcing
from beom_tpu.core.state import State
from beom_tpu.stencils.band import make_band_call
from beom_tpu.stepping import fb as fb_mod

# Stencil radius of one fb_step is <= 7 with every term enabled
# (parallel/dist.required_halo, validated by the dependence-cone probe
# in tests/dist/test_halo_probe.py); rounded up to a multiple of 8
# (f32 sublane tiling).  The kernel is VPU-bound, so halo rows cost
# compute 1:1 — r1 shipped 16/24-row halos (12-37% redundant compute)
# before the probe showed the true cone is <= 3-7.
HALO_Y = 8


def _halo_y(cfg: Config, steps_per_pass: int = 1) -> int:
    if cfg.scheme == "split":
        # the barotropic subcycle grows the dependence cone by <= 2
        # rows per substep on top of the slow-phase/fb radius
        per_step = -(-(HALO_Y + 2 * cfg.nsub) // 8) * 8
    else:
        per_step = HALO_Y
    # temporal blocking: k steps per HBM pass widen the cone k-fold
    return -(-(per_step * steps_per_pass) // 8) * 8


def make_pallas_stepper(grid: Grid, forcing: Forcing, cfg: Config,
                        by: Optional[int] = None,
                        bx: Optional[int] = None,   # unused (full width)
                        interpret: Optional[bool] = None,
                        steps_per_pass: int = 1,
                        vmem_limit_bytes: int = 100 * 1024 * 1024):
    """Returns step(state) -> state running the fused band kernel.

    All five canonical configs are supported: sponge/OBC/tide fields
    are streamed as extra kernel operands only when the config enables
    them.  Schemes: 'fb' and 'split' run fully in-kernel; rigid-lid /
    implicit-FS raise (use stencils/fused_projection.py).  f is
    beta-plane (affine), derived in-kernel.

    steps_per_pass > 1 = TEMPORAL BLOCKING: the band advances k model
    steps per HBM pass with a k-fold-wider y halo (the probe-validated
    dependence cone is <= 5 rows/step), cutting HBM traffic per step
    ~k-fold; one step() call then advances k steps.  Pays off only
    while the kernel has DMA headroom — measure, don't assume.
    """
    if cfg.scheme not in ("fb", "split"):
        raise ValueError(
            "fused_fb implements scheme='fb'/'split'; projection "
            "schemes use stencils/fused_projection.py")
    if interpret is None:   # auto: Pallas interpreter off-TPU, so the
        interpret = jax.default_backend() != "tpu"  # product path tests on CPU
    # NOTE (r1 VERDICT item 5, measured): compiling one kernel per
    # FB-Coriolis parity and branching at the XLA level was tried and
    # benched 6% SLOWER than the in-kernel lax.cond (4.10 vs
    # 4.37 G pt/s at 2048^2) — Mosaic lowers the scalar-predicate cond
    # as a real branch, so there is no both-branches work to save.
    if cfg.scheme == "split":
        from beom_tpu.stepping.split import split_step as step_fn
    else:
        def step_fn(s, g, f_, c):
            # parity="cond": Mosaic's scalar branch, unaffected by the
            # XLA:TPU cond miscompile (see fb.momentum_update)
            return fb_mod.fb_step(s, g, f_, c, parity="cond")

    if steps_per_pass < 1:
        raise ValueError("steps_per_pass must be >= 1")

    def body(f, grid_t, forcing_t, scal):
        n, t = scal
        out = State(h=f["h"], u=f["u"], v=f["v"], t=t, n=n)
        for _ in range(steps_per_pass):
            out = step_fn(out, grid_t, forcing_t, cfg)
        return out.h, out.u, out.v

    nz = cfg.nz
    call = make_band_call(
        grid, forcing, cfg, body,
        dyn=dict.fromkeys(("h", "u", "v"), grid.H[None].repeat(nz, 0)),
        out_leads=((nz,), (nz,), (nz,)),
        wy=_halo_y(cfg, steps_per_pass), by=by, interpret=interpret,
        vmem_limit_bytes=vmem_limit_bytes,
        # split carries ~2x the live VMEM temporaries (SlowPhase +
        # subcycle carry) — halve the default band to stay in VMEM
        band_target=128 if cfg.scheme == "split" else 256)

    dt = cfg.npdtype

    @jax.jit
    def step(state: State) -> State:
        scal = jnp.stack([state.n.astype(dt), state.t.astype(dt)])
        h1, u1, v1 = call(scal, state.h, state.u, state.v)
        return State(h=h1, u=u1, v=v1,
                     t=state.t + steps_per_pass * cfg.dt,
                     n=state.n + steps_per_pass)

    return step
