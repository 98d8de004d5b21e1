import jax, numpy as np, json
from beom_tpu.cases import make_case
from beom_tpu.diag import diagnostics
from beom_tpu.stepping import run_steps
cfg, grid, forcing, state = make_case("two_layer", nx=2048, ny=2048)
print("dt", cfg.dt, "nu2", cfg.nu2, "dx", cfg.dx, "rho", cfg.rho, "h_min", cfg.h_min)
s = state
fn = jax.jit(lambda s: run_steps(s, grid, forcing, cfg, 25))
for k in range(8):
    s = fn(s)
    d = {k2: float(v) for k2, v in diagnostics(s, grid, cfg).items()}
    print(json.dumps({"n": int(d["n"]), "finite": d["finite"], "spd": d["max_speed"], "ke": d["ke"]}), flush=True)
    if d["finite"] != 1.0: break
hmin = float(np.asarray(s.h).min())
print("h min:", hmin)
