"""Fused coarse-stack multigrid kernel (SURVEY.md §3 C23 + C14).

The multigrid cycle's cost on TPU is NOT flops or bandwidth below
~256^2 — it is kernel-dispatch latency: a W-cycle visits level k 2^k
times and every visit is a dozen tiny XLA kernels, measured at
3-5 ms/cycle at 512^2 (hundreds of launches doing microseconds of
work).  But every level at or below 256^2 fits in VMEM outright, so
the ENTIRE remaining hierarchy — smoothing, residuals, transfers,
recursion, the coarsest-level sweep loop — can run as ONE Pallas
kernel per visit: `make_coarse_stack_call(levels)` returns call(b)->x
performing the full recursive gamma-cycle on `levels` in a single
launch.

Two Mosaic-specific choices:
  * transfers are MATMULS against banded transfer matrices (R, and
    P = 2 R^T per axis) on the MXU: the roll/reshape full-weighting
    stencil of solvers/multigrid.py uses strided-slice gathers that
    Mosaic does not lower; a (n/2, n) banded matrix applied at
    Precision.HIGHEST is mathematically identical (same weights) and
    costs nothing at these sizes;
  * only (Hu, Hv, mask) are streamed per level — Hu_w/Hv_s/inv_diag/
    checkerboards/nwet are derived in-kernel (single-chip periodic
    rolls), keeping the operand list at 3 arrays/level.

The kernel body *reuses* solvers/multigrid._vcycle via its transfers
hook — single source of truth for the cycle structure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def restrict_matrix(n: int, dtype=np.float32) -> np.ndarray:
    """(n/2, n) full-weighting restriction along one periodic axis:
    r[j] = 0.375 (g[2j] + g[2j+1]) + 0.125 (g[2j-1] + g[2j+2]) — the
    same weights as multigrid._restrict_1d; prolongation is 2 R^T."""
    R = np.zeros((n // 2, n), dtype)
    j = np.arange(n // 2)
    R[j, 2 * j] = 0.375
    R[j, (2 * j + 1) % n] = 0.375
    R[j, (2 * j - 1) % n] = 0.125
    R[j, (2 * j + 2) % n] = 0.125
    return R


def _coarse_kernel(b_ref, *refs, nlev: int, dxys: tuple, lam: float,
                   nu: int, nu_coarse: int, gamma: int, demean: bool):
    from beom_tpu.solvers import multigrid as mg

    hu = refs[0:nlev]
    hv = refs[nlev:2 * nlev]
    ms = refs[2 * nlev:3 * nlev]
    ry = refs[3 * nlev:4 * nlev - 1]
    rx = refs[4 * nlev - 1:5 * nlev - 2]
    out_ref = refs[-1]

    levels = [mg._make_level(hu[j][:], hv[j][:], ms[j][:],
                             dxys[j][0], dxys[j][1], lam)
              for j in range(nlev)]

    def restrict_mm(a, k):
        t = jnp.matmul(a, rx[k][:].T, precision=_HI)
        return jnp.matmul(ry[k][:], t, precision=_HI)

    def prolong_mm(a, k):
        t = jnp.matmul(a, rx[k][:], precision=_HI)
        return 4.0 * jnp.matmul(ry[k][:].T, t, precision=_HI)

    x = mg._vcycle(levels, 0, b_ref[:], lam, nu, nu_coarse,
                   gamma=gamma, demean=demean,
                   transfers=(restrict_mm, prolong_mm))
    out_ref[:] = x


def make_coarse_stack_call(levels, lam: float, nu: int = 2,
                           nu_coarse: int = 24, gamma: int = 2,
                           demean: bool = True,
                           interpret: bool = False):
    """call(b) -> x: one full recursive gamma-cycle on `levels`
    (a tail of a multigrid.build_levels hierarchy, every level VMEM-
    resident) in a single Pallas launch.  x is the cycle's correction
    from x0 = 0, exactly as multigrid._vcycle computes it."""
    nlev = len(levels)
    dt = levels[0].mask.dtype
    dxys = tuple((1.0 / lv.rdx2 ** 0.5, 1.0 / lv.rdy2 ** 0.5)
                 for lv in levels)
    hu = [lv.Hu for lv in levels]
    hv = [lv.Hv for lv in levels]
    ms = [lv.mask for lv in levels]
    ry = [jnp.asarray(restrict_matrix(lv.mask.shape[0], dt))
          for lv in levels[:-1]]
    rx = [jnp.asarray(restrict_matrix(lv.mask.shape[1], dt))
          for lv in levels[:-1]]

    kernel = functools.partial(_coarse_kernel, nlev=nlev, dxys=dxys,
                               lam=lam, nu=nu, nu_coarse=nu_coarse,
                               gamma=gamma, demean=demean)
    ny0, nx0 = levels[0].mask.shape
    # scoped-VMEM budget: ~25 level-0-sized live values covers the
    # whole in-kernel hierarchy (measured 20.4 MiB at a 512^2 stack);
    # the 16 MiB Mosaic default only fits stacks <= 256^2
    vmem = max(32 * 2 ** 20, 25 * ny0 * nx0 * jnp.dtype(dt).itemsize)
    out_shape = jax.ShapeDtypeStruct((ny0, nx0), dt)
    call = pl.pallas_call(kernel, out_shape=out_shape,
                          compiler_params=pltpu.CompilerParams(
                              vmem_limit_bytes=vmem),
                          interpret=interpret)

    def apply(b):
        return call(b, *hu, *hv, *ms, *ry, *rx)

    return apply
