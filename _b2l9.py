import jax, jax.numpy as jnp, numpy as np
from beom_tpu.cases import make_case
from beom_tpu.stepping import get_step
from beom_tpu.physics import momentum
from beom_tpu.core import ops

def probe(tag, patch=None, unpatch=None):
    if patch: patch()
    try:
        cfg, grid, forcing, state = make_case("two_layer", nx=2048, ny=2048)
        step = get_step(cfg)
        fn = jax.jit(lambda s: step(s, grid, forcing, cfg))
        s = state
        bad = False
        for n in range(1, 13):
            s = fn(s)
        u = np.asarray(s.u)
        fin = bool(np.isfinite(u).all())
        mx = float(np.abs(u[np.isfinite(u)]).max())
        print(f"{tag}: finite={fin} max|u|={mx:.3e}", flush=True)
    finally:
        if unpatch: unpatch()

orig_ke = momentum.kinetic_energy
orig_pv = momentum.pv_corner

probe("full nonlinear     ")
probe("KE off             ",
      lambda: setattr(momentum, "kinetic_energy", lambda u, v: jnp.zeros_like(u)),
      lambda: setattr(momentum, "kinetic_energy", orig_ke))

def pv_no_zeta(h, u, v, grid, cfg):
    h_q = jnp.maximum(ops.a_xp(ops.a_yp(h)), cfg.h_min)
    return (grid.f_q + 0.0 * u) / h_q
probe("zeta off           ",
      lambda: setattr(momentum, "pv_corner", pv_no_zeta),
      lambda: setattr(momentum, "pv_corner", orig_pv))

def pv_const_h(h, u, v, grid, cfg):
    zeta = (ops.d_xp(v, cfg.dx) - ops.d_yp(u, cfg.dy)) * grid.mask_q
    return (grid.f_q + zeta) / 500.0
probe("hq const           ",
      lambda: setattr(momentum, "pv_corner", pv_const_h),
      lambda: setattr(momentum, "pv_corner", orig_pv))
