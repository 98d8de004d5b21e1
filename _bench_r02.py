import time, json, dataclasses, jax, numpy as np, jax.numpy as jnp
from beom_tpu.cases import make_case
from beom_tpu.stepping import make_stepper, run_steps, prepare_state

out = open("/tmp/bench_r02.jsonl", "a")
def rec(**kw):
    print(json.dumps(kw), file=out, flush=True)
    print(json.dumps(kw), flush=True)

def bench_stepper(cfg, grid, forcing, state, n=200):
    step = make_stepper(grid, forcing, cfg)
    state = prepare_state(state, cfg)
    @jax.jit
    def chunk(s):
        def b(s,_): return step(s), None
        s,_ = jax.lax.scan(b, s, None, length=n)
        return s
    s = chunk(state); jax.block_until_ready(s.h)
    t0=time.perf_counter(); s=chunk(s); jax.block_until_ready(s.h)
    el=time.perf_counter()-t0
    assert np.isfinite(np.asarray(s.h)).all()
    return cfg.nx*cfg.ny*n/el

# 1. fb fused, wy=8, 2048^2
for backend in ("pallas", "xla"):
    c,g,f,s = make_case("double_gyre", nx=2048, ny=2048, backend=backend)
    rec(kind="fb_2048", backend=backend, gpts=bench_stepper(c,g,f,s)/1e9)

# 2. two-layer fused, 2048^2
for backend in ("pallas", "xla"):
    c,g,f,s = make_case("two_layer", nx=2048, ny=2048, backend=backend)
    rec(kind="two_layer_2048", backend=backend, gpts=bench_stepper(c,g,f,s)/1e9)

# 3. split fused (nsub=8)
c,g,f,s = make_case("double_gyre", nx=2048, ny=2048, scheme="split", nsub=8, backend="pallas")
rec(kind="split_2048_nsub8", backend="pallas", gpts=bench_stepper(c,g,f,s, n=100)/1e9)

# 4. projection schemes at 2048^2 (MG+warm vs jacobi), n small (solves expensive)
for scheme in ("rigid_lid", "implicit_fs"):
    for pre in ("auto", "jacobi"):
        try:
            c,g,f,s = make_case("rigid_lid", nx=2048, ny=2048, scheme=scheme, precond=pre)
            rec(kind="proj_2048", scheme=scheme, precond=pre,
                gpts=bench_stepper(c,g,f,s, n=20)/1e9)
        except Exception as e:
            rec(kind="proj_2048", scheme=scheme, precond=pre,
                error=f"{type(e).__name__}: {e}"[:200])
print("SWEEP DONE", flush=True)
