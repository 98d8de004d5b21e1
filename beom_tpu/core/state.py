"""Prognostic model state (SURVEY.md §3 C3) — a pure pytree.

The reference keeps h, u, v as Fortran module arrays mutated in place; here
`State` is an immutable dataclass pytree threaded through pure step
functions (`step : State -> State`), which is what lets `jax.jit`,
`lax.scan` and `shard_map` own the whole time loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    h: jax.Array   # (nz, ny, nx) layer thickness [m]
    u: jax.Array   # (nz, ny, nx) x-velocity at u points [m/s]
    v: jax.Array   # (nz, ny, nx) y-velocity at v points [m/s]
    t: jax.Array   # () model time [s]
    n: jax.Array   # () step counter, int32
    # (ny, nx) previous elliptic solution (surface pressure phi /
    # eta^{n+1}) carried as the next solve's warm start — None for the
    # explicit schemes (None = empty pytree subtree, so fb/split
    # trajectories keep their 5-leaf structure).  Populated by
    # stepping.prepare_state before any projection-scheme scan.
    phi: object = None
    # the solution one step earlier: the steppers warm-start from the
    # SECOND-ORDER extrapolation x0 = 2 phi - phi_prev (phi varies
    # smoothly in time, so the extrapolated guess has O(dt^2) error vs
    # O(dt) for x0 = phi — measured 33 -> ~17 CG iters/step on the
    # 512^2 implicit-FS gyre).  None whenever phi is None.
    phi_prev: object = None

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)


def init_state(cfg: Config, grid: Grid, h0=None, u0=None, v0=None) -> State:
    """Rest state with layers splitting the local water column.

    Default initial thicknesses divide H(x, y) evenly across nz layers (a
    case normally overrides `h0` with its stratification); land cells get
    zero thickness.
    """
    dt = cfg.npdtype
    shape = (cfg.nz, cfg.ny, cfg.nx)
    if h0 is None:
        H = np.asarray(grid.H, dt)
        h0 = np.broadcast_to(H / cfg.nz, shape)
    h = jnp.asarray(np.asarray(h0, dt)) * grid.mask
    if u0 is None:
        u = jnp.zeros(shape, dt)
    else:
        u = jnp.asarray(np.asarray(u0, dt)) * grid.mask_u
    if v0 is None:
        v = jnp.zeros(shape, dt)
    else:
        v = jnp.asarray(np.asarray(v0, dt)) * grid.mask_v
    return State(h=h, u=u, v=v,
                 t=jnp.zeros((), dt), n=jnp.zeros((), jnp.int32))


def eta(state: State, grid: Grid) -> jax.Array:
    """Free-surface elevation η = Σ_k h_k − H (SURVEY.md §1.1)."""
    return jnp.sum(state.h, axis=0) - grid.H
