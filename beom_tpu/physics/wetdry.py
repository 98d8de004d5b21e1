"""Wetting & drying masks (SURVEY.md §1.4, component C11).

A layer cell is *wet* when its thickness exceeds `cfg.h_dry`; land cells
(grid.mask == 0) are never wet.  Everything is branchless `jnp.where`
algebra so it lives happily inside jit / scan / Pallas.

Three mask products are used by the dynamics:
  * wet (nz, ny, nx)      — cell-centre wetness per layer
  * one-sided face gates  — a velocity face between wet and dry cells only
    admits flow *from* the wet side; flow that would drain a dry cell is
    zeroed.  Re-wetting needs no special case: with eta = sum h - H, a dry
    cell's Montgomery potential sits at its ground elevation, so the
    pressure gradient drives water in exactly when the neighbouring
    surface exceeds the dry cell's bottom (SURVEY.md §1.4).
  * flux limiter (in continuity.py) — scales outgoing mass fluxes so h
    never falls below cfg.h_min; mass-conserving because it rescales
    fluxes, not thicknesses.
"""

from __future__ import annotations

import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid


def wet_mask(h: jnp.ndarray, grid: Grid, cfg: Config) -> jnp.ndarray:
    """Per-layer wetness (nz, ny, nx) in {0.0, 1.0}."""
    return jnp.where(h > cfg.h_dry, 1.0, 0.0).astype(h.dtype) * grid.mask


def gate_u(u: jnp.ndarray, wet: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """One-sided gating of u at wet/dry faces (identity if all wet)."""
    wl, wr = wet, ops.sxp(wet)
    both = wl * wr
    only_l = wl * (1.0 - wr)   # water to the west: only eastward flow
    only_r = wr * (1.0 - wl)   # water to the east: only westward flow
    gated = both * u + only_l * jnp.maximum(u, 0.0) + only_r * jnp.minimum(u, 0.0)
    return grid.mask_u * gated


def gate_v(v: jnp.ndarray, wet: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    wl, wr = wet, ops.syp(wet)
    both = wl * wr
    only_l = wl * (1.0 - wr)
    only_r = wr * (1.0 - wl)
    gated = both * v + only_l * jnp.maximum(v, 0.0) + only_r * jnp.minimum(v, 0.0)
    return grid.mask_v * gated
