"""Time-stepping schemes (SURVEY.md §1.3, components C12-C14).

`get_step(cfg)` dispatches cfg.scheme to the step function; all schemes
share the signature step(state, grid, forcing, cfg) -> state and are
pure/jittable.
"""

from __future__ import annotations

import jax

from beom_tpu.core.config import Config


def prepare_state(state, cfg: Config):
    """Attach the warm-start carry (State.phi) for projection schemes.

    Must run before any scan/shard_map over a projection step so the
    carry pytree structure is fixed (phi=None and phi=array are
    different treedefs).  No-op for fb/split or when already attached.
    """
    if (cfg.scheme in ("rigid_lid", "implicit_fs") and cfg.warm_start
            and state.phi is None):
        import jax.numpy as jnp
        z = jnp.zeros(state.h.shape[1:], state.h.dtype)
        return state.replace(phi=z, phi_prev=z)
    return state


def get_step(cfg: Config):
    if cfg.scheme == "fb":
        from beom_tpu.stepping.fb import fb_step
        return fb_step
    if cfg.scheme == "split":
        from beom_tpu.stepping.split import split_step
        return split_step
    if cfg.scheme == "rigid_lid":
        from beom_tpu.stepping.projection import rigid_lid_step
        return rigid_lid_step
    if cfg.scheme == "implicit_fs":
        from beom_tpu.stepping.projection import implicit_fs_step
        return implicit_fs_step
    raise ValueError(f"unknown scheme {cfg.scheme!r}")


def make_stepper(grid, forcing, cfg: Config):
    """Jitted step(state) -> state for cfg.scheme, closing over statics.

    cfg.backend='pallas' routes through the fused TPU stencil kernels:
    fb/split via stencils/fused_fb.py (cfg.steps_per_pass model steps
    per band pass — one step() call advances steps_per_pass steps),
    rigid-lid/implicit-FS via stencils/fused_projection.py (band
    phases around the elliptic solve).  backend='xla' is the op-by-op
    reference path.
    """
    if cfg.backend == "pallas":
        if cfg.scheme in ("rigid_lid", "implicit_fs"):
            from beom_tpu.stencils.fused_projection import (
                make_pallas_projection_stepper)
            return make_pallas_projection_stepper(grid, forcing, cfg)
        from beom_tpu.stencils.fused_fb import make_pallas_stepper
        return make_pallas_stepper(grid, forcing, cfg,
                                   steps_per_pass=cfg.steps_per_pass)
    step = get_step(cfg)

    def stepper(state):
        return step(state, grid, forcing, cfg)

    return jax.jit(stepper)


def run_steps(state, grid, forcing, cfg: Config, n_steps: int):
    """Advance n_steps of cfg.scheme inside one XLA program (lax.scan)."""
    step = get_step(cfg)
    state = prepare_state(state, cfg)

    def body(s, _):
        return step(s, grid, forcing, cfg), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state
