"""Distributed diagnostics: the diag/ scalars computed per-shard and
reduced over the ('y', 'x') mesh with psum/pmax (SURVEY.md §6
metrics/observability).

`dist_diagnostics(mesh)` returns a jitted function state -> dict of ()
host scalars; the reductions compile to ICI collectives, so one call
moves a handful of floats off device regardless of mesh size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid
from beom_tpu.core.state import State
from beom_tpu.parallel.mesh import SPEC2, SPEC3, spec_for, shard_pytree


def make_dist_diagnostics(grid: Grid, cfg: Config, mesh):
    axes = ("y", "x")

    def local(state: State, H, mask):
        h, u, v = state.h, state.u, state.v
        dA = cfg.dx * cfg.dy
        # the face->centre averages reach one cell west/south: exchange
        # a 1-halo so the distributed KE matches the single-device scalar
        # exactly (a local wrap would differ O(1/block) at shard edges)
        from beom_tpu.parallel import halo
        uu = halo.crop2d(ops.a_xm(halo.pad2d(u * u, 1)), 1)
        vv = halo.crop2d(ops.a_ym(halo.pad2d(v * v, 1)), 1)
        ke = 0.5 * cfg.rho0 * lax.psum(jnp.sum(h * (uu + vv)) * dA, axes)
        eta = (jnp.sum(h, axis=0) - H) * mask
        mass = lax.psum(jnp.sum(h) * dA, axes)
        nwet = lax.psum(jnp.sum(mask), axes)
        spd = lax.pmax(jnp.maximum(jnp.max(jnp.abs(u)),
                                   jnp.max(jnp.abs(v))), axes)
        cfl = lax.pmax(jnp.max(jnp.abs(u) / cfg.dx
                               + jnp.abs(v) / cfg.dy) * cfg.dt, axes)
        eta2 = lax.psum(jnp.sum(eta * eta), axes)
        finite = lax.pmin(
            (jnp.isfinite(h).all() & jnp.isfinite(u).all()
             & jnp.isfinite(v).all()).astype(h.dtype), axes)
        return {"t": state.t, "n": state.n, "mass": mass, "ke": ke,
                "max_speed": spd, "cfl": cfl,
                "eta_rms": jnp.sqrt(eta2 / jnp.maximum(nwet, 1.0)),
                "finite": finite}

    carries_phi = (cfg.scheme in ("rigid_lid", "implicit_fs")
                   and cfg.warm_start)
    state_specs = State(h=SPEC3, u=SPEC3, v=SPEC3, t=P(), n=P(),
                        phi=SPEC2 if carries_phi else None,
                        phi_prev=SPEC2 if carries_phi else None)
    out_specs = {k: P() for k in ("t", "n", "mass", "ke", "max_speed",
                                  "cfl", "eta_rms", "finite")}
    fn = shard_map(local, mesh=mesh,
                   in_specs=(state_specs, SPEC2, SPEC2),
                   out_specs=out_specs)
    H = jax.device_put(grid.H,
                       jax.sharding.NamedSharding(mesh, SPEC2))
    mask = jax.device_put(grid.mask,
                          jax.sharding.NamedSharding(mesh, SPEC2))

    @jax.jit
    def diag(state: State):
        return fn(state, H, mask)

    return diag
