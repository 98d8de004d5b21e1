import jax, numpy as np
from beom_tpu.cases import make_case
from beom_tpu.stepping import get_step

def probe(nx, ny, nsteps=12):
    cfg, grid, forcing, state = make_case("two_layer", nx=nx, ny=ny)
    step = get_step(cfg)
    fn = jax.jit(lambda s: step(s, grid, forcing, cfg))
    s = state
    vals = []
    for n in range(nsteps):
        s = fn(s)
        u = np.asarray(s.u)
        vals.append(float(np.abs(u[np.isfinite(u)]).max()))
    print(f"({ny},{nx}): step1 {vals[0]:.3e} step4 {vals[3]:.3e} "
          f"step12 {vals[-1]:.3e}", flush=True)

probe(1024, 1024)
probe(2048, 1024)
probe(1024, 2048)
probe(2048, 2048)
probe(2048, 2048)  # repeat for determinism check
