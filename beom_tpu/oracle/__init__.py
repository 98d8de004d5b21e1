"""f64 NumPy oracle (SURVEY.md C24) — the executable spec."""

import numpy as np

from beom_tpu.oracle.core import Oracle


def oracle_for(cfg, grid, forcing) -> Oracle:
    """Build the oracle from the same case data the JAX core runs with."""
    a = np.asarray
    return Oracle(
        cfg, a(grid.H), mask=a(grid.mask),
        taux=a(forcing.taux), tauy=a(forcing.tauy),
        sponge=a(forcing.sponge) if cfg.sponge else None,
        h_ext=a(forcing.h_ext) if (cfg.sponge or cfg.obc) else None,
        obc_u=a(forcing.obc_u), obc_v=a(forcing.obc_v),
        obc_h=a(forcing.obc_h), tide_amp=a(forcing.tide_amp),
        tide_phase=a(forcing.tide_phase))