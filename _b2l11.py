import jax, jax.numpy as jnp, numpy as np
from beom_tpu.cases import make_case
from beom_tpu.physics import continuity, pressure, viscosity, drag
from beom_tpu.core import ops
from beom_tpu.stepping import fb as fb_mod

cfg, grid, forcing, state = make_case("two_layer", nx=2048, ny=2048)
h, u, v = state.h, state.u, state.v

def mx(name, x):
    x = np.asarray(x)
    print(f"{name}: max|.| {np.abs(x).max():.3e}", flush=True)

dh = jax.jit(lambda h, u, v: continuity.continuity_rhs(h, u, v, grid, cfg))(h, u, v)
mx("dh (should be 0)", dh)
h1 = jax.jit(lambda s: fb_mod.continuity_update(s, grid, forcing, cfg))(state)
mx("h1 - h (should be 0)", np.asarray(h1) - np.asarray(h))
M = jax.jit(lambda h: pressure.montgomery(h, grid, cfg))(h)
gx = jax.jit(lambda M: ops.d_xp(M, cfg.dx) * grid.mask_u)(M)
mx("grad M (should be 0)", gx)
uv = jax.jit(lambda h1, s: fb_mod.momentum_update(h1, s, grid, forcing, cfg))(h, state)
mx("u1 (wind only ~2.7e-6)", uv[0])
