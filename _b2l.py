import sys, time, json, jax, numpy as np
from beom_tpu.cases import make_case
from beom_tpu.stencils.fused_fb import make_pallas_stepper
from beom_tpu.core.state import State

nx = int(sys.argv[1]); by = int(sys.argv[2]) if len(sys.argv) > 2 else None
vm = int(sys.argv[3]) * 2**20 if len(sys.argv) > 3 else 100 * 2**20
cfg, grid, forcing, state = make_case("two_layer", nx=nx, ny=nx)
t0 = time.time()
step = make_pallas_stepper(grid, forcing, cfg, by=by, vmem_limit_bytes=vm)
s = step(state); jax.block_until_ready(s.h)
print(f"compiled+ran in {time.time()-t0:.0f}s", flush=True)
n = 100
@jax.jit
def chunk(s):
    def b(s,_): return step(s), None
    s,_ = jax.lax.scan(b, s, None, length=n)
    return s
s = chunk(s); jax.block_until_ready(s.h)
t0=time.perf_counter(); s=chunk(s); jax.block_until_ready(s.h)
el=time.perf_counter()-t0
assert np.isfinite(np.asarray(s.h)).all()
print(json.dumps({"kind":"two_layer","nx":nx,"by":by,"gpts":nx*nx*n/el/1e9}), flush=True)
