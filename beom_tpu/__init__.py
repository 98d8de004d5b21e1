"""beom_tpu — a TPU-native layered shallow-water ocean framework.

A from-scratch JAX/Pallas re-design of the capabilities of the reference
Fortran model beom ("Back of Envelope Ocean Model", zhazorken/beom):
an Arakawa C-grid finite-difference dynamical core (continuity + momentum
with Coriolis, vector-invariant nonlinear advection, Montgomery-potential
pressure gradients, Laplacian/biharmonic viscosity, bottom drag),
forward-backward and split-barotropic time stepping, an iterative elliptic
solver (CG / red-black SOR) for the rigid-lid / implicit free-surface
pressure, and wetting-and-drying masking — distributed over TPU meshes via
2-D domain decomposition with `shard_map` halo exchange.

Design blueprint: SURVEY.md (the reference mount was empty during the
survey; capability set is fixed by BASELINE.json's north star).

Layout (SURVEY.md §2 layer map):
  core/      L0-L1: Config, Grid, State pytrees; C-grid operator algebra
  physics/   L2: continuity, momentum (PV/KE form), pressure, viscosity,
                 drag, forcing, OBC/tides/sponge, wet-dry
  stepping/  L3: forward-backward and split-barotropic steppers
  solvers/   L3: CG + red-black elliptic solvers (single & distributed)
  parallel/  L4: Mesh, 2-D domain decomposition, halo exchange
  io/        L6: config load/save, snapshots, restart
  cases/     L7: the five canonical configurations
  diag/      L8: energy/mass budgets, CFL & NaN guards
  oracle/    f64 NumPy executable spec (validation gold until Fortran
             fixtures exist)
  stencils/  Pallas TPU kernels (native performance tier)
"""

__version__ = "0.1.0"

from beom_tpu.core.config import Config, default_config  # noqa: F401
from beom_tpu.core.grid import Grid, make_grid  # noqa: F401
from beom_tpu.core.state import State, init_state  # noqa: F401
