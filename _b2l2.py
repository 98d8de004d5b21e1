import time, json, jax, numpy as np
from beom_tpu.cases import make_case
from beom_tpu.stepping import make_stepper, prepare_state

out = open("/tmp/bench_r02.jsonl", "a")
def rec(**kw):
    print(json.dumps(kw), file=out, flush=True)
    print(json.dumps(kw), flush=True)

def bench(cfg, grid, forcing, state, n=100, by=None):
    if by is not None:
        from beom_tpu.stencils.fused_fb import make_pallas_stepper
        step = make_pallas_stepper(grid, forcing, cfg, by=by)
    else:
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

c,g,f,s = make_case("two_layer", nx=2048, ny=2048, backend="xla")
rec(kind="two_layer_2048", backend="xla", gpts=bench(c,g,f,s)/1e9)
c,g,f,s = make_case("double_gyre", nx=2048, ny=2048, scheme="split", nsub=8, backend="pallas")
rec(kind="split_2048_nsub8", backend="pallas", gpts=bench(c,g,f,s)/1e9)
for scheme in ("rigid_lid", "implicit_fs"):
    for pre in ("auto", "jacobi"):
        try:
            c,g,f,s = make_case("rigid_lid", nx=2048, ny=2048, scheme=scheme, precond=pre)
            rec(kind="proj_2048", scheme=scheme, precond=pre, gpts=bench(c,g,f,s,n=20)/1e9)
        except Exception as e:
            rec(kind="proj_2048", scheme=scheme, precond=pre, error=str(e)[:150])
print("DONE2", flush=True)
