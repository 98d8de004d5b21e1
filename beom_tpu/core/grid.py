"""Grid & mask pytrees (SURVEY.md §3 C2) and forcing fields (C9/C10).

`Grid` holds every *array-valued* piece of static run geometry: bathymetry,
the land/sea mask and its staggered derivatives, and the Coriolis field at
vorticity points.  Scalars (dx, f0, ...) stay in `Config` so jit treats
them as compile-time constants.

Mask convention (see core/ops.py): all operators are periodic; a closed
basin is a wet region surrounded by at least one ring of land cells
(mask == 0).  Faces are open iff both adjacent centers are wet; corners
(vorticity points) are "interior" iff all four surrounding centers are wet
— the free-slip condition zeroes vorticity / cross-wall shear at the other
corners (SURVEY.md §3 C8).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from beom_tpu.core.config import Config
from beom_tpu.core import ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    H: jax.Array        # (ny, nx) bottom depth [m], > 0 in ocean
    mask: jax.Array     # (ny, nx) 1.0 wet / 0.0 land, at centers
    mask_u: jax.Array   # (ny, nx) 1.0 where east  face (i+1/2, j) is open
    mask_v: jax.Array   # (ny, nx) 1.0 where north face (i, j+1/2) is open
    mask_q: jax.Array   # (ny, nx) 1.0 where corner has 4 wet neighbours
    f_q: jax.Array      # (ny, nx) Coriolis parameter at corners [1/s]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Forcing:
    """Array-valued forcing (C9/C10). Zeros disable each term."""
    taux: jax.Array        # (ny, nx) wind stress [N/m^2] at u points
    tauy: jax.Array        # (ny, nx) at v points
    sponge: jax.Array      # (ny, nx) nudging rate [1/s] at centers
    h_ext: jax.Array       # (nz, ny, nx) sponge/OBC target thickness
    obc_u: jax.Array       # (ny, nx) outward-normal sign (+-1) on open u faces
    obc_v: jax.Array       # (ny, nx) outward-normal sign (+-1) on open v faces
    obc_h: jax.Array       # (ny, nx) 1.0 on exterior cells clamped to h_ext
    tide_amp: jax.Array    # (nc, ny, nx) per-constituent elevation amp [m]
    tide_phase: jax.Array  # (nc, ny, nx) per-constituent phase [rad]


def make_grid(cfg: Config, H, mask=None) -> Grid:
    """Build a Grid from bathymetry `H` (ny, nx) and an optional wet mask.

    If `mask` is None it is inferred as H > 0.  A ring of land is always
    imposed on the outermost cells unless the case explicitly passes a mask
    that opens them (periodic channels do).
    """
    dt = cfg.npdtype
    H = np.asarray(H, dt)
    if mask is None:
        mask = (H > 0).astype(dt)
        mask[0, :] = 0
        mask[-1, :] = 0
        mask[:, 0] = 0
        mask[:, -1] = 0
    mask = np.asarray(mask, dt)

    H = jnp.asarray(H * mask)
    mask = jnp.asarray(mask)
    mask_u = mask * ops.sxp(mask)
    mask_v = mask * ops.syp(mask)
    mask_q = mask * ops.sxp(mask) * ops.syp(mask) * ops.sxp(ops.syp(mask))

    # beta-plane: f at corners (x_{i+1/2}, y_{j+1/2}); y measured from the
    # southern edge of the interior domain.
    j = np.arange(cfg.ny, dtype=dt)
    y_q = (j + 0.5) * cfg.dy
    f_q = jnp.asarray(
        np.broadcast_to((cfg.f0 + cfg.beta * y_q)[:, None],
                        (cfg.ny, cfg.nx)).astype(dt))
    return Grid(H=H, mask=mask, mask_u=mask_u, mask_v=mask_v,
                mask_q=mask_q, f_q=f_q)


def make_forcing(cfg: Config, taux=None, tauy=None, sponge=None, h_ext=None,
                 obc_u=None, obc_v=None, obc_h=None, tide_amp=None,
                 tide_phase=None) -> Forcing:
    dt = cfg.npdtype
    z2 = np.zeros((cfg.ny, cfg.nx), dt)
    z3 = np.zeros((cfg.nz, cfg.ny, cfg.nx), dt)
    nc = max(len(cfg.tides), 1)
    zc = np.zeros((nc, cfg.ny, cfg.nx), dt)

    def arr(x, z):
        return jnp.asarray(z if x is None else np.asarray(x, dt))

    return Forcing(
        taux=arr(taux, z2), tauy=arr(tauy, z2), sponge=arr(sponge, z2),
        h_ext=arr(h_ext, z3), obc_u=arr(obc_u, z2), obc_v=arr(obc_v, z2),
        obc_h=arr(obc_h, z2),
        tide_amp=arr(tide_amp, zc), tide_phase=arr(tide_phase, zc),
    )
