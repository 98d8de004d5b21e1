import jax, numpy as np
from beom_tpu.cases import make_case
from beom_tpu.stepping import get_step
cfg, grid, forcing, state = make_case("two_layer", nx=2048, ny=2048)
step = get_step(cfg)
s = state
fn = jax.jit(lambda s: step(s, grid, forcing, cfg))
for n in range(1, 26):
    s = fn(s)
    h = np.asarray(s.h); u = np.asarray(s.u); v = np.asarray(s.v)
    bad = ~np.isfinite(h)
    if bad.any() or not np.isfinite(u).all():
        print("step", n, "nan h:", bad.sum(), "nan u:", (~np.isfinite(u)).sum())
        ks, ys, xs = np.nonzero(bad | ~np.isfinite(np.asarray(s.u)))
        print("first bad cells:", list(zip(ks[:5], ys[:5], xs[:5])))
        break
    m = np.abs(u).max()
    print(n, "max|u|", float(m), "max|eta|", float(np.abs(h.sum(0)-np.asarray(grid.H)).max()), flush=True)
