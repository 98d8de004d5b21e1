import jax, numpy as np
from beom_tpu.cases import make_case
from beom_tpu.stepping import get_step
from beom_tpu.oracle import oracle_for

cfg, grid, forcing, state = make_case("two_layer", nx=2048, ny=2048)
step = get_step(cfg)
fn = jax.jit(lambda s: step(s, grid, forcing, cfg))
s = fn(state)
h1, u1, v1 = np.asarray(s.h), np.asarray(s.u), np.asarray(s.v)
print("step1 TPU  max|u|", np.abs(u1).max(), "max|v|", np.abs(v1).max(),
      "max|eta|", np.abs(h1.sum(0)-np.asarray(grid.H)).max(), flush=True)

orc = oracle_for(cfg, grid, forcing)
ho, uo, vo, n, t = orc.step(np.asarray(state.h, np.float64),
                            np.asarray(state.u, np.float64),
                            np.asarray(state.v, np.float64), 0, 0.0)
print("step1 ORC  max|u|", np.abs(uo).max(), "max|v|", np.abs(vo).max(), flush=True)
du = np.abs(u1 - uo)
print("step1 diff max", du.max(), "at", np.unravel_index(du.argmax(), du.shape), flush=True)
# where is TPU u largest?
print("TPU u argmax", np.unravel_index(np.abs(u1).argmax(), u1.shape), flush=True)
