import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from beom_tpu.cases import make_case
from beom_tpu.oracle import oracle_for

cfg, grid, forcing, state = make_case("two_layer", nx=2048, ny=2048)
orc = oracle_for(cfg, grid, forcing)
h = np.asarray(state.h, np.float64)
u = np.asarray(state.u, np.float64)
v = np.asarray(state.v, np.float64)
n, t = 0, 0.0
for k in range(15):
    h, u, v, n, t = orc.step(h, u, v, n, t)
    print(k + 1, "max|u|", float(np.abs(u).max()),
          "max|eta|", float(np.abs(h.sum(0) - np.asarray(grid.H, np.float64)).max()),
          flush=True)
    if not np.isfinite(u).all():
        print("ORACLE NaN at step", k + 1)
        break
