import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from beom_tpu.cases import make_case
from beom_tpu.stepping import get_step

cfg, grid, forcing, state = make_case("two_layer", nx=2048, ny=2048)
step = get_step(cfg)
fn = jax.jit(lambda s: step(s, grid, forcing, cfg))
s = state
for n in range(1, 16):
    s = fn(s)
    u = np.asarray(s.u); h = np.asarray(s.h)
    fin = np.isfinite(u).all()
    print(n, "max|u|", float(np.abs(u[np.isfinite(u)]).max()),
          "max|eta|", float(np.abs((h.sum(0)-np.asarray(grid.H))[np.isfinite(h.sum(0))]).max()),
          "finite", bool(fin), flush=True)
    if not fin:
        bad = np.nonzero(~np.isfinite(u))
        print("first bad:", bad[0][:3], bad[1][:3], bad[2][:3])
        break
