"""Montgomery potential (SURVEY.md §1.1, component C7).

For layers k = 1..N (index 0..nz-1 here), interface elevations
    z_1 = eta = sum_k h_k - H            (free surface)
    z_l = eta - sum_{m<l} h_m            (top interface of layer l)
and the Montgomery potential accumulates reduced-gravity contributions
downward:
    M_1 = g eta
    M_k = M_{k-1} + g'_k z_k ,   g'_k = g (rho_k - rho_{k-1}) / rho0 .

This is the "interfacial pressure gradient" coupling of the 2-layer
configuration (BASELINE.md config 2).  Pure cumulative sums along the
(small, local) layer axis — layers are deliberately never sharded
(SURVEY.md §3 parallelism checklist).
"""

from __future__ import annotations

import jax.numpy as jnp

from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid


def montgomery(h: jnp.ndarray, grid: Grid, cfg: Config,
               free_surface: bool = True) -> jnp.ndarray:
    """M (nz, ny, nx) at cell centers from thickness h (nz, ny, nx).

    `free_surface=False` is the rigid-lid mode (stepping/projection.py):
    the g*eta surface contribution is dropped — that role is played by the
    solved surface-pressure Lagrange multiplier — while the internal
    (reduced-gravity) interface terms are kept, evaluated with eta = 0.
    """
    if free_surface:
        eta = jnp.sum(h, axis=0) - grid.H
    else:
        eta = jnp.zeros(h.shape[1:], h.dtype)
    # Explicit python loop over the (small, static) layer axis instead
    # of jnp.cumsum: identical XLA graph for nz<=5 and it keeps the
    # whole function Pallas/Mosaic-lowerable (stencils/fused_fb.py
    # traces this code inside the TPU kernel).
    # (rigid lid: z_top[0] = eta = 0, so the k=0 surface term vanishes
    # identically and only the internal interface terms survive.)
    gp = cfg.gprime
    z = eta
    acc = gp[0] * z
    M = [acc]
    for k in range(1, cfg.nz):
        z = z - h[k - 1]
        acc = acc + gp[k] * z
        M.append(acc)
    return jnp.stack(M, axis=0)
