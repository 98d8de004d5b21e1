"""Static run configuration (SURVEY.md §6 "Config/flag system", component C1).

The reference model reads a namelist-style text parameter file at startup
(SURVEY.md §3 C1).  Here the equivalent is a frozen, fully-hashable
dataclass: every field is a Python scalar / string / tuple, so a `Config`
can be closed over by `jax.jit` (or passed as a static argument) without
retriggering traces.  Arrays (bathymetry, masks, forcing fields) never live
here — they belong to `Grid` / `Forcing` pytrees (core/grid.py).

TOML loading / CLI overrides live in io/config.py; the five canonical
configurations of BASELINE.md are built in cases/*.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # --- grid (C2) ---
    nx: int = 128                 # interior cells in x (cell centers)
    ny: int = 128                 # interior cells in y
    dx: float = 10e3              # [m] uniform spacing (idealized basins)
    dy: float = 10e3              # [m]
    nz: int = 1                   # number of layers, surface -> bottom

    # --- stratification ---
    # layer densities [kg/m^3], surface -> bottom; len == nz
    rho: Tuple[float, ...] = (1027.0,)
    rho0: float = 1027.0          # Boussinesq reference density
    g: float = 9.81               # [m/s^2]

    # --- rotation ---
    f0: float = 1.0e-4            # [1/s] Coriolis at domain center / south
    beta: float = 0.0             # [1/(m s)] df/dy

    # --- time stepping (C12/C13/C14) ---
    dt: float = 300.0             # [s] (baroclinic) step
    scheme: str = "fb"            # 'fb' | 'split' | 'rigid_lid' | 'implicit_fs'
    nsub: int = 8                 # barotropic subcycles per step ('split')

    # --- elliptic solver (C14/C22) ---
    solver: str = "cg"            # 'cg' | 'redblack' | 'mg' (standalone
                                  # multigrid cycles, solvers/multigrid)
    solver_tol: float = 1.0e-10   # relative residual tolerance
    solver_maxiter: int = 500
    sor_omega: float = 1.7        # red-black SOR relaxation factor
    precond: str = "auto"         # CG preconditioner: 'auto' | 'jacobi'
                                  # | 'ssor' | 'mg' (geometric V-cycle);
                                  # auto = mg for the pure-Neumann
                                  # rigid-lid solve, jacobi for the
                                  # (well-conditioned) Helmholtz solve
    precond_sweeps: int = 1       # symmetric red-black sweeps per apply
    warm_start: bool = True       # carry phi across steps as CG x0

    # --- physics coefficients (C5-C9) ---
    adv_scheme: str = "sadourny_energy"   # 'sadourny_energy' | 'linear'
    nu2: float = 0.0              # [m^2/s]  Laplacian viscosity
    nu4: float = 0.0              # [m^4/s]  biharmonic viscosity
    slip: str = "free"            # 'free' | 'no' — lateral wall condition
    r_bot: float = 0.0            # [m/s]  linear bottom drag
    cd_bot: float = 0.0           # [-]    quadratic bottom drag
    r_int: float = 0.0            # [m/s]  interfacial (layer-to-layer) drag

    # --- wetting / drying (C11) ---
    wetdry: bool = False
    h_dry: float = 0.05           # [m] a layer cell thinner than this is dry
    h_min: float = 1.0e-3         # [m] floor thickness the limiter protects

    # --- forcing (C9/C10) ---
    wind: bool = False            # apply (taux, tauy) from Forcing to layer 1
    # tidal constituent frequencies omega_c [rad/s]; per-constituent
    # amplitude/phase *maps* live in Forcing.tide_amp / Forcing.tide_phase
    tides: Tuple[float, ...] = ()

    # --- open boundaries / sponge (C10) ---
    obc: bool = False             # enable Flather/radiation open boundaries
    sponge: bool = False          # enable sponge nudging (rates in Forcing)

    # --- numerics ---
    dtype: str = "float32"        # compute dtype on device ('float64' oracle)
    backend: str = "xla"          # 'xla' | 'pallas' (fused stencil kernel)
    steps_per_pass: int = 1       # TEMPORAL BLOCKING (pallas fb/split):
                                  # model steps advanced per HBM pass;
                                  # k>1 cuts per-step HBM traffic ~k-fold
                                  # at the cost of a k-fold-wider y halo
                                  # (stencils/fused_fb.py).  One step()
                                  # call then advances k steps.

    # --- distribution (C20) ---
    mesh_x: int = 1               # device mesh extent along x
    mesh_y: int = 1               # device mesh extent along y
    halo: int = 2                 # halo width per exchange (>= stencil radius)
    halo_impl: str = "ppermute"   # 'ppermute' (XLA) | 'rdma' (Pallas, C21)

    # --- io / diagnostics cadence (C15/C16) ---
    diag_every: int = 0           # steps between diagnostics (0 = off)
    snap_every: int = 0           # steps between snapshots (0 = off)

    def __post_init__(self):
        if len(self.rho) != self.nz:
            raise ValueError(
                f"len(rho)={len(self.rho)} must equal nz={self.nz}")
        if any(b - a < 0 for a, b in zip(self.rho, self.rho[1:])):
            raise ValueError("rho must be non-decreasing surface -> bottom "
                             "(statically stable stratification)")
        if self.scheme not in ("fb", "split", "rigid_lid", "implicit_fs"):
            raise ValueError(f"unknown scheme {self.scheme!r}")
        if self.slip not in ("free", "no"):
            raise ValueError(f"unknown slip {self.slip!r}")
        if self.nx % self.mesh_x or self.ny % self.mesh_y:
            raise ValueError("nx/ny must divide evenly over the device mesh")
        if self.halo_impl not in ("ppermute", "rdma"):
            raise ValueError(f"unknown halo_impl {self.halo_impl!r}")
        if self.solver not in ("cg", "redblack", "mg"):
            raise ValueError(f"unknown solver {self.solver!r}")
        if self.solver == "mg" and self.mesh_x * self.mesh_y > 1:
            # reject at config time, not trace time (r4 ADVICE): the
            # standalone-MG iteration is single-chip only
            raise ValueError(
                "solver='mg' (standalone multigrid cycles) is "
                "single-chip; under a mesh use solver='cg' with "
                "precond='mg' (distributed MG-preconditioned CG, one "
                "psum/iteration)")
        if self.precond not in ("auto", "jacobi", "ssor", "mg"):
            raise ValueError(f"unknown precond {self.precond!r}")
        if self.steps_per_pass < 1:
            raise ValueError("steps_per_pass must be >= 1")
        if self.steps_per_pass > 1:
            # temporal blocking lives in the fused band kernels: k model
            # steps per HBM pass with a k-fold-wider halo.  The XLA tier
            # has no pass structure to block, and the projection schemes
            # need a global elliptic solve every step.
            if self.backend != "pallas" or self.scheme not in ("fb",
                                                               "split"):
                raise ValueError(
                    "steps_per_pass > 1 (temporal blocking) requires "
                    "backend='pallas' and scheme='fb'|'split'")
            per = 8 if self.scheme == "fb" else \
                -(-(8 + 2 * self.nsub) // 8) * 8
            wy = -(-(per * self.steps_per_pass) // 8) * 8
            ny_l = self.ny // self.mesh_y
            if 2 * wy + 8 > ny_l:
                raise ValueError(
                    f"steps_per_pass={self.steps_per_pass} needs a "
                    f"{wy}-row halo twice over, but the local block has "
                    f"only {ny_l} rows; lower steps_per_pass or use a "
                    "taller grid")
            if self.mesh_y * self.mesh_x > 1 and self.steps_per_pass > 2:
                raise ValueError(
                    "distributed temporal blocking supports "
                    "steps_per_pass <= 2 (stencils/dist_band.py)")

    # -- derived, all static Python values ------------------------------

    @property
    def gprime(self) -> Tuple[float, ...]:
        """Reduced gravities (g, g'_2, ..., g'_nz): g'_k = g (rho_k - rho_{k-1})/rho0.

        Index 0 holds full g (the free-surface contribution to the
        Montgomery potential, SURVEY.md §1.1).
        """
        gp = [self.g]
        for k in range(1, self.nz):
            gp.append(self.g * (self.rho[k] - self.rho[k - 1]) / self.rho0)
        return tuple(gp)

    @property
    def npdtype(self):
        import numpy as np
        return np.dtype(self.dtype)


def default_config(**kw) -> Config:
    return Config(**kw)
