"""Laplacian and biharmonic lateral viscosity (SURVEY.md §1.1, C8).

Mask-aware stress form:  lap(u) = d/dx(du/dx at centres) + d/dy(du/dy at
corners).  Wall condition (cfg.slip):
  * 'free' — cross-wall shear (the corner gradient) is zeroed via mask_q /
    mask at the gradient points: no stress exerted by the wall.
  * 'no'   — land velocities are zero and *included* in the shear stencil,
    so the wall drags the fluid (u_wall = 0 ghost).
Normal gradients into land centres are always zeroed (no flow through
walls is already enforced by mask_u/mask_v).

Biharmonic is two nested Laplacians with sign -nu4 (stencil radius 2;
the halo width bookkeeping lives in parallel/halo.py).
"""

from __future__ import annotations

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid


def lap_u(u, grid: Grid, cfg: Config):
    """Masked Laplacian of a u-point field (per layer)."""
    gx = ops.d_xm(u, cfg.dx) * grid.mask        # at centres
    gy = ops.d_yp(u, cfg.dy)                    # at corners
    if cfg.slip == "free":
        gy = gy * grid.mask_q
    return (ops.d_xp(gx, cfg.dx) + ops.d_ym(gy, cfg.dy)) * grid.mask_u


def lap_v(v, grid: Grid, cfg: Config):
    gy = ops.d_ym(v, cfg.dy) * grid.mask        # at centres
    gx = ops.d_xp(v, cfg.dx)                    # at corners
    if cfg.slip == "free":
        gx = gx * grid.mask_q
    return (ops.d_yp(gy, cfg.dy) + ops.d_xm(gx, cfg.dx)) * grid.mask_v


def viscosity(u, v, grid: Grid, cfg: Config):
    """(du, dv) from nu2 * lap - nu4 * lap(lap)."""
    du = 0.0
    dv = 0.0
    if cfg.nu2 != 0.0:
        du = du + cfg.nu2 * lap_u(u, grid, cfg)
        dv = dv + cfg.nu2 * lap_v(v, grid, cfg)
    if cfg.nu4 != 0.0:
        du = du - cfg.nu4 * lap_u(lap_u(u, grid, cfg), grid, cfg)
        dv = dv - cfg.nu4 * lap_v(lap_v(v, grid, cfg), grid, cfg)
    return du, dv
