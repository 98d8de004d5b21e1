import sys, jax, numpy as np
from beom_tpu.cases import make_case
from beom_tpu.stepping import run_steps

def probe(tag, **kw):
    cfg, grid, forcing, state = make_case("two_layer", nx=2048, ny=2048, **kw)
    s = jax.jit(lambda s: run_steps(s, grid, forcing, cfg, 40))(state)
    u = np.asarray(s.u)
    print(tag, "finite" if np.isfinite(u).all() else "NAN",
          "max|u|", float(np.abs(u[np.isfinite(u)]).max() if np.isfinite(u).any() else -1), flush=True)

probe("baseline           ")
probe("linear advection   ", adv_scheme="linear")
probe("f0=0 beta=0        ", f0=0.0, beta=0.0)
probe("no wind            ", wind=False)
probe("half dt            ", dt=1.74)
probe("float64            ", dtype="float64")
