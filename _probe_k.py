import time, json
import numpy as np, jax, jax.numpy as jnp
from beom_tpu.cases import make_case
from beom_tpu.stencils.fused_fb import make_pallas_stepper

N = 2048
cfg, grid, forcing, state = make_case("double_gyre", nx=N, ny=N)

def meas(k, n_calls=50, iters=3):
    step = make_pallas_stepper(grid, forcing, cfg, steps_per_pass=k)
    @jax.jit
    def chunk(s):
        def body(s, _):
            return step(s), None
        s, _ = jax.lax.scan(body, s, None, length=n_calls)
        return s
    s = chunk(state); jax.block_until_ready(s.h)
    t0 = time.perf_counter()
    for _ in range(iters): s = chunk(s)
    jax.block_until_ready(s.h)
    dt = (time.perf_counter()-t0)/iters
    assert np.isfinite(np.asarray(s.h)).all()
    return N*N*n_calls*k/dt

for k in (4, 6, 8):
    try:
        print(f"k={k}: {meas(k)/1e9:.2f}e9 pt/s", flush=True)
    except Exception as e:
        print(f"k={k}: {type(e).__name__}: {e}", flush=True)

# warm-start CG iteration count per rigid-lid step
import dataclasses
from beom_tpu.solvers import elliptic
from beom_tpu.solvers.multigrid import make_mg_precond
from beom_tpu.stepping import make_stepper, prepare_state
for NN in (512,):
    cfgr, gr, fr, st = make_case("rigid_lid", nx=NN, ny=NN)
    # run 50 steps to spin up, then instrument one solve
    step = make_stepper(gr, fr, dataclasses.replace(cfgr, backend="pallas"))
    s = prepare_state(st, cfgr)
    @jax.jit
    def chunk(s):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, s, None, length=50)
        return c
    s = chunk(s); jax.block_until_ready(s.h)
    # rebuild the rhs as the stepper would and count CG iterations
    from beom_tpu.stepping import fb as fb_mod
    from beom_tpu.stepping.projection import barotropic_transport
    from beom_tpu.core import ops
    u_s, v_s = fb_mod.momentum_update(s.h, s, gr, fr, cfgr, free_surface=False)
    U, V = barotropic_transport(s.h, u_s, v_s, gr)
    anom = (jnp.sum(s.h, axis=0) - gr.H) * gr.mask
    anom = anom - gr.mask * (jnp.sum(anom*gr.mask) / jnp.sum(gr.mask))
    rhs = ((ops.d_xm(U, cfgr.dx) + ops.d_ym(V, cfgr.dy)) * gr.mask
           - anom / cfgr.dt) / cfgr.dt
    M = make_mg_precond(gr, cfgr, smoother="pallas")
    for x0, name in ((None, "cold"), (s.phi, "warm")):
        r = elliptic.cg_solve(rhs, gr, cfgr, x0=x0, precond=M)
        print(f"N={NN} {name}: CG iters {int(r.iters)}", flush=True)
