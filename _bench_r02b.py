import time, json, jax, numpy as np
from beom_tpu.cases import make_case
from beom_tpu.stepping import make_stepper, prepare_state

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

def run(kind, n=200, **ckw):
    try:
        c,g,f,s = make_case(ckw.pop("case"), **ckw)
        rec(kind=kind, **{k:v for k,v in ckw.items() if k in ("backend","scheme","precond")},
            gpts=bench_stepper(c,g,f,s,n=n)/1e9)
    except Exception as e:
        rec(kind=kind, error=f"{type(e).__name__}: {e}"[:200])

run("two_layer_2048", case="two_layer", nx=2048, ny=2048, backend="pallas")
run("two_layer_2048", case="two_layer", nx=2048, ny=2048, backend="xla")
run("split_2048_nsub8", case="double_gyre", nx=2048, ny=2048, scheme="split", nsub=8, backend="pallas", n=100)
for scheme in ("rigid_lid", "implicit_fs"):
    for pre in ("auto", "jacobi"):
        run("proj_2048", case="rigid_lid", nx=2048, ny=2048, scheme=scheme, precond=pre, n=20)
print("SWEEP DONE", flush=True)
