"""Geometric multigrid for the masked variable-coefficient Poisson /
Helmholtz operator A p = div(H_face grad p) - lam p (SURVEY.md §3 C14;
r1 VERDICT item 3 "add one real preconditioner").

Jacobi- or SSOR-preconditioned CG needs O(N) iterations on an N x N
grid (measured: 500 iterations at 512^2 reduce the residual ~10x), so
the projection schemes were solver-bound.  A geometric V-cycle makes
the iteration count O(1) in grid size — the textbook answer for
rigid-lid pressure, and the TPU-friendly one: every level is dense
(8,128)-tileable work, transfers are reshapes, and the whole cycle
jits into one XLA program with static shapes per level.

Components:
  * level hierarchy by 2x cell-centred coarsening while ny, nx stay
    even and >= `min_size`; levels are defined by FV face-coarsened
    transmissibilities (walls stay walls exactly at every level — see
    _coarsen_faces for why cell-mask coarsening diverges) with any-wet
    cell masks;
  * smoother: red-black Gauss-Seidel half-sweeps (omega = 1), `nu` pre-
    and post-sweeps, post in reverse colour order so the cycle is a
    symmetric operator (valid CG preconditioner).  On TPU the fine
    levels can instead run the temporally-blocked Pallas sweep kernel
    (stencils/redblack_pallas.make_level_sweep): the nu pre- (or post-)
    sweeps collapse into ONE HBM pass instead of 2*nu, at the cost of
    k-sweep halo lag across band boundaries (judged by the outer
    residual, exactly as in the blocked-RB solver);
  * transfers: cell-centred bilinear prolongation and its
    full-weighting adjoint (piecewise-constant transfers diverge — see
    _prolong2);
  * coarsest level: `nu_coarse` red-black sweeps.

`make_mg_precond(grid, cfg, lam)` -> one cycle (gamma = 2, a W-cycle,
by default — see _vcycle for the measurement) per application, for
cg_solve(precond=...); `make_mg_solver`/`mg_solve` iterate cycles
standalone with a residual stopping test (cfg.solver = 'mg');
`make_dist_mg_precond` is the DISTRIBUTED variant: face coarsening is
block-local (local dims stay even), so every level lives on the same
('y','x') mesh, smoothing/operator applications exchange a 1-halo and
the transfers a width-2/1 halo via the pad/crop hooks — no cross-shard
coarsening or gather anywhere (coarsening stops at `min_local` cells
per shard side; the coarsest level is smoothed distributed like any
other).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from beom_tpu.core import ops
from beom_tpu.core.config import Config
from beom_tpu.core.grid import Grid


class _Level(NamedTuple):
    nwet: jax.Array      # () number of wet cells
    mask: jax.Array      # (ny, nx) wet mask
    Hu: jax.Array        # face depths at u faces (masked)
    Hv: jax.Array
    Hu_w: jax.Array      # west-face depth at the cell (sxm(Hu))
    Hv_s: jax.Array
    inv_diag: jax.Array  # 1/diag(A), 0 on land
    red: jax.Array       # red checkerboard * mask
    black: jax.Array
    rdx2: float
    rdy2: float


def _coarsen2(a):
    """4-cell block average (ny, nx) -> (ny/2, nx/2) — used for the
    GRID quantities (H, mask) only; residual transfer is _restrict2."""
    ny, nx = a.shape
    return a.reshape(ny // 2, 2, nx // 2, 2).mean(axis=(1, 3))


def _prolong_1d(c, axis):
    """Cell-centred bilinear interpolation along `axis` (n -> 2n):
    fine centres sit 1/4 and 3/4 of the way between coarse centres, so
    f[2j] = 3/4 c[j] + 1/4 c[j-1],  f[2j+1] = 3/4 c[j] + 1/4 c[j+1]
    (periodic wrap; land contributions are masked by the caller)."""
    even = 0.75 * c + 0.25 * jnp.roll(c, 1, axis)
    odd = 0.75 * c + 0.25 * jnp.roll(c, -1, axis)
    st = jnp.stack([even, odd], axis=axis + 1 if axis >= 0
                   else c.ndim + axis + 1)
    shape = list(c.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def _prolong2(a):
    """Cell-centred bilinear prolongation (ny, nx) -> (2ny, 2nx).

    Piecewise-constant injection makes the rediscretized-coarse-operator
    V-cycle DIVERGE (measured: residual x2.3 per cycle at 128^2);
    bilinear transfer order fixes the cell-centred two-grid correction
    (standard MG theory: transfer orders must sum past the operator
    order)."""
    return _prolong_1d(_prolong_1d(a, -2), -1)


def _restrict_1d(g, axis):
    """Adjoint of _prolong_1d scaled to an average (2n -> n):
    r[j] = (3/4 (g[2j] + g[2j+1]) + 1/4 g[2j-1] + 1/4 g[2j+2]) / 2."""
    g = jnp.moveaxis(g, axis, -1)
    even = g[..., 0::2]
    odd = g[..., 1::2]
    r = 0.5 * (0.75 * (even + odd) + 0.25 * jnp.roll(odd, 1, -1)
               + 0.25 * jnp.roll(even, -1, -1))
    return jnp.moveaxis(r, -1, axis)


def _restrict2(a):
    """Full-weighting restriction (2ny, 2nx) -> (ny, nx)."""
    return _restrict_1d(_restrict_1d(a, -2), -1)


def _checkerboard(shape, dtype):
    i = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    return (((i + j) % 2) == 0).astype(dtype)


def _make_level(Hu, Hv, mask, dx, dy, lam, Hu_w=None, Hv_s=None,
                red=None, gsum=jnp.sum) -> _Level:
    """A level is defined by its FACE transmissibilities (Hu at east
    faces, Hv at north faces) — never by cell H: that is what keeps
    walls exactly where the fine grid has them (see build_levels).

    Hu_w/Hv_s (west/south faces at the cell) default to the periodic
    local shift; the distributed path passes exchanged values.  `red`
    overrides the checkerboard (global colouring under a mesh); `gsum`
    is the (psum-wrapped) global sum for nwet."""
    if Hu_w is None:
        Hu_w = ops.sxm(Hu)
    if Hv_s is None:
        Hv_s = ops.sym(Hv)
    rdx2, rdy2 = 1.0 / dx ** 2, 1.0 / dy ** 2
    diag = -((Hu + Hu_w) * rdx2 + (Hv + Hv_s) * rdy2) - lam
    inv_diag = jnp.where(diag != 0,
                         1.0 / jnp.where(diag == 0, 1.0, diag), 0.0) * mask
    if red is None:
        red = _checkerboard(mask.shape, mask.dtype) * mask
    return _Level(nwet=jnp.maximum(gsum(mask), 1.0),
                  mask=mask, Hu=Hu, Hv=Hv, Hu_w=Hu_w, Hv_s=Hv_s,
                  inv_diag=inv_diag, red=red, black=(1.0 - red) * mask,
                  rdx2=float(rdx2), rdy2=float(rdy2))


def _coarsen_faces(Hu, Hv):
    """FV face coarsening: the coarse face between coarse columns I and
    I+1 is crossed by the two fine faces at i = 2I+1, rows 2J, 2J+1 —
    its transmissibility is their average (flux per unit face length).
    A wall (zero fine faces) therefore stays a wall at EVERY level —
    cell-mask coarsening instead *moves* walls by up to one fine cell,
    which made the rediscretized two-grid correction diverge
    (measured: residual x5/cycle on the closed 128^2 basin)."""
    Hu_c = 0.5 * (Hu[0::2, 1::2] + Hu[1::2, 1::2])
    Hv_c = 0.5 * (Hv[1::2, 0::2] + Hv[1::2, 1::2])
    return Hu_c, Hv_c


def build_levels(grid: Grid, cfg: Config, lam: float = 0.0,
                 min_size: int = 16):
    """Level 0 = the model grid; each next level halves (ny, nx)."""
    mask_u = grid.mask * ops.sxp(grid.mask)
    mask_v = grid.mask * ops.syp(grid.mask)
    Hu = mask_u * ops.a_xp(grid.H)
    Hv = mask_v * ops.a_yp(grid.H)
    mask = grid.mask
    dx, dy = cfg.dx, cfg.dy
    levels = [_make_level(Hu, Hv, mask, dx, dy, lam)]
    ny, nx = mask.shape
    while (ny % 2 == 0 and nx % 2 == 0
           and ny // 2 >= min_size and nx // 2 >= min_size):
        Hu, Hv = _coarsen_faces(Hu, Hv)
        # any-wet cell mask: every wet fine cell keeps a wet coarse
        # parent (so prolongation reaches it); isolated cells decouple
        # naturally through their zero faces
        mask = (_coarsen2(mask) > 0).astype(mask.dtype)
        dx, dy = 2.0 * dx, 2.0 * dy
        ny, nx = ny // 2, nx // 2
        levels.append(_make_level(Hu, Hv, mask, dx, dy, lam))
    return levels


def _id_pad(a, w):
    """Single-chip 'exchange': periodic rolls already wrap, so padding
    is the identity (the hooked operators then act on unpadded blocks
    with crop also identity)."""
    return a


def _nbr_shifts(p, pad, crop):
    """(east, west, north, south) neighbour values of p under the
    exchange hooks: local rolls when pad is identity, 1-halo ppermute
    exchange under a mesh."""
    if pad is _id_pad:
        return ops.sxp(p), ops.sxm(p), ops.syp(p), ops.sym(p)
    pp = pad(p, 1)
    return (crop(ops.sxp(pp), 1), crop(ops.sxm(pp), 1),
            crop(ops.syp(pp), 1), crop(ops.sym(pp), 1))


def _apply_A(lv: _Level, p, lam, pad=_id_pad, crop=None, nbr=None):
    """A p.  nbr(lv, p) -> off-diagonal neighbour sum overrides the
    pad/crop exchange (the distributed path passes the HALO-PIPELINED
    form: local rolls + thin-slice edge corrections, so the exchange
    overlaps the full-block gather — parallel/dist._make_mg_nbr)."""
    if nbr is None:
        # the operator written directly with 1/dx^2 factors (identical
        # stencil to solvers/elliptic.laplacian_H)
        e, w, n_, s_ = _nbr_shifts(p, pad, crop)
        out = (lv.Hu * e + lv.Hu_w * w - (lv.Hu + lv.Hu_w) * p) \
            * lv.rdx2 \
            + (lv.Hv * n_ + lv.Hv_s * s_ - (lv.Hv + lv.Hv_s) * p) \
            * lv.rdy2
    else:
        out = nbr(lv, p) - ((lv.Hu + lv.Hu_w) * lv.rdx2
                            + (lv.Hv + lv.Hv_s) * lv.rdy2) * p
    if lam != 0.0:
        out = out - lam * p
    return out * lv.mask


def _halfsweep(lv: _Level, x, b, colour, pad=_id_pad, crop=None,
               nbr=None):
    if nbr is None:
        e, w, n_, s_ = _nbr_shifts(x, pad, crop)
        nb = (lv.Hu * e + lv.Hu_w * w) * lv.rdx2 \
           + (lv.Hv * n_ + lv.Hv_s * s_) * lv.rdy2
    else:
        nb = nbr(lv, x)
    x_gs = (b - nb) * lv.inv_diag
    return jnp.where(colour > 0, x_gs, x) * lv.mask


def _restrict2_h(a, pad=_id_pad, crop=None):
    """Hooked restriction: a width-2 exchange makes the full-weighting
    stencil see the neighbour shards' edge values, then the coarse
    result is cropped back to the local block."""
    if pad is _id_pad:
        return _restrict2(a)
    ap = pad(a, 2)
    return crop(_restrict2(ap), 1)


def _prolong2_h(a, pad=_id_pad, crop=None):
    if pad is _id_pad:
        return _prolong2(a)
    ap = pad(a, 1)
    return crop(_prolong2(ap), 2)


def _vcycle(levels, k, b, lam, nu, nu_coarse, pad=_id_pad, crop=None,
            gsum=jnp.sum, demean=True, gamma=1, smooth=None,
            transfers=None, coarse=None, nbr=None, krylov=0):
    """One cycle on levels[k:], x0 = 0, returns the correction.

    gamma = 1 is a V-cycle; gamma = 2 a W-cycle (the coarse problem is
    solved by two recursive cycle applications, the second on the
    remaining residual).  Measured on the 1024^2 closed basin (f64):
    V(2,2)-preconditioned CG needs 24 iterations and drifts upward with
    grid size (34 at 2048^2) — the cell-centred bilinear-transfer
    coarse correction is only marginally convergent, and making the
    coarsest solve exact (nu_coarse 24 -> 400) changes nothing; W(2,2)
    restores near-grid-independence at ~1.3x the cycle FLOPs (coarse
    levels are 4x smaller per level, so the extra visits are cheap).
    NOTE the 1.3x is FLOPs-only: at scale the coarse levels are
    exchange-latency-bound and gamma = 2 visits level k 2^k times —
    the distributed path can pass gamma = 1 when that dominates.

    smooth: optional per-level list; entry k is None (XLA half-sweeps)
    or a (forward, reverse) pair of blocked-sweep callables
    sweep(x, b) -> x performing the whole nu-sweep smooth in one pass
    (stencils/redblack_pallas.make_level_sweep).

    transfers: optional (restrict(a, k), prolong(a, k)) overriding the
    roll/reshape transfers (level index k = the FINE level of the
    transition) — the in-kernel coarse stack uses matmul transfer
    operators (stencils/mg_pallas.py: strided-slice gathers don't
    lower in Mosaic; banded transfer matrices on the MXU do).

    coarse: optional (j0, call): at level j0 the whole remaining stack
    is delegated to call(b) -> x (one fused Pallas kernel per visit —
    the cycle is otherwise launch-latency-bound in the small levels:
    measured 3-5 ms/cycle at 512^2 from hundreds of tiny dispatches)."""
    lv = levels[k]
    if coarse is not None and k == coarse[0]:
        return coarse[1](b)
    x = jnp.zeros_like(b)
    if k == len(levels) - 1:
        # fori_loop, not a Python loop: nu_coarse sweeps unrolled inside
        # the recursive cycle inside CG's while_loop made the HLO huge
        # (slow compiles) and capped how exact the coarse solve could be.
        # Half forward (red,black) then half reverse-ordered sweeps: the
        # inexact coarse solve is then itself a symmetric operator
        # (SSOR argument), so the WHOLE cycle is exactly symmetric — 24
        # forward sweeps left a ~1e-6 relative asymmetry in z1'r2-z2'r1
        # (caught by tests/unit/test_multigrid.py).
        def fsweep(_, x):
            x = _halfsweep(lv, x, b, lv.red, pad, crop, nbr)
            return _halfsweep(lv, x, b, lv.black, pad, crop, nbr)

        def bsweep(_, x):
            x = _halfsweep(lv, x, b, lv.black, pad, crop, nbr)
            return _halfsweep(lv, x, b, lv.red, pad, crop, nbr)
        nf = nu_coarse // 2
        x = jax.lax.fori_loop(0, nf, fsweep, x)
        return jax.lax.fori_loop(0, nu_coarse - nf, bsweep, x)
    sm = None if smooth is None else smooth[k]
    # pre-smooth (red, black); the blocked Pallas smoother returns the
    # residual from the same band pass (band-edge rows carry the sweep
    # lag — a preconditioner-grade approximation, like the smoothing)
    r = None
    if sm is not None:
        out = sm[0](x, b)
        x, r = out if isinstance(out, tuple) else (out, None)
    else:
        for _ in range(nu):
            x = _halfsweep(lv, x, b, lv.red, pad, crop, nbr)
            x = _halfsweep(lv, x, b, lv.black, pad, crop, nbr)
    # coarse-grid correction on the residual
    if r is None:
        r = (b - _apply_A(lv, x, lam, pad, crop, nbr)) * lv.mask
    lc = levels[k + 1]
    restrict = (lambda a: _restrict2_h(a, pad, crop)) \
        if transfers is None else (lambda a: transfers[0](a, k))
    prolong = (lambda a: _prolong2_h(a, pad, crop)) \
        if transfers is None else (lambda a: transfers[1](a, k))
    bc = restrict(r) * lc.mask
    if lam == 0.0 and demean:
        # the coarse pure-Neumann problem must stay compatible: an
        # incompatible mean makes the smoother drift along the coarse
        # nullspace, which prolongs into NON-constant fine pollution
        # (coarse wet region != fine wet region near walls)
        bc = (bc - lc.mask * (gsum(bc) / lc.nwet)) * lc.mask
    # gamma may be an int (uniform) or a per-level schedule tuple:
    # gamma_k = gamma[min(k, len-1)] recursions from level k to k+1.
    # (2, 2, 1) = W at the two finest transitions (where the marginal
    # cell-centred transfers need the extra coarse accuracy), V below
    # — bounding the 2^k visit explosion that makes deep W-cycles
    # dispatch/latency-bound (r3 ADVICE).
    def subcycle(rhs):
        return _vcycle(levels, k + 1, rhs, lam, nu, nu_coarse, pad,
                       crop, gsum, demean, gamma, smooth, transfers,
                       coarse, nbr, krylov)

    if krylov > 0 and (coarse is None or k + 1 < coarse[0]):
        # K-CYCLE (Notay): the coarse problem is solved by `krylov`
        # flexible-CG iterations preconditioned by the recursive cycle
        # — same sub-cycle count as gamma=2 plus two coarse matvecs.
        # Measured (r5, 2048^2 f64+f32): the plain W-cycle's recursive
        # coarse solves make the cycle non-contractive for ultra-smooth
        # error (first-cycle residual AMPLIFIED ~2x/~4x at 1024^2/
        # 2048^2 — two-grid with the same smoother/transfers contracts
        # at 0.47, so the transfers are marginal-but-sound and the
        # recursion is what compounds the error); Krylov-accelerating
        # each coarse solve restores contraction.  The K-cycle is
        # NONLINEAR, so it is used by the standalone mg solver
        # (Richardson outer loop, make_mg_solver) — NOT as a plain-CG
        # preconditioner.
        eps = jnp.finfo(bc.dtype).tiny

        def sdiv(a, d):
            mag = jnp.maximum(jnp.abs(d), eps)
            return a / jnp.where(d < 0, -mag, mag)

        z = subcycle(bc)
        p, xc, rc = z, jnp.zeros_like(bc), bc
        rz = gsum(rc * z)
        for i in range(krylov):
            q = _apply_A(levels[k + 1], p, lam, pad, crop, nbr)
            alpha = sdiv(rz, gsum(p * q))
            xc = xc + alpha * p
            rc = (rc - alpha * q) * lc.mask
            if i < krylov - 1:
                z = subcycle(rc)
                rz2 = gsum(rc * z)
                p = z + sdiv(rz2, rz) * p
                rz = rz2
    else:
        g_k = gamma if isinstance(gamma, int) else \
            gamma[min(k, len(gamma) - 1)]
        xc = subcycle(bc)
        for _ in range(g_k - 1):
            rc = (bc - _apply_A(levels[k + 1], xc, lam, pad, crop,
                                nbr)) * lc.mask
            xc = xc + subcycle(rc)
    if lam == 0.0 and demean:
        xc = (xc - lc.mask * (gsum(xc) / lc.nwet)) * lc.mask
    x = (x + prolong(xc)) * lv.mask
    # post-smooth in reverse colour order -> symmetric cycle
    if sm is not None:
        x = sm[1](x, b)
    else:
        for _ in range(nu):
            x = _halfsweep(lv, x, b, lv.black, pad, crop, nbr)
            x = _halfsweep(lv, x, b, lv.red, pad, crop, nbr)
    return x


def build_dist_levels(grid_p1: Grid, cfg: Config, lam, pad, crop, gsum,
                      red_fn, min_local: int = 8):
    """Shard-local level hierarchy for the DISTRIBUTED V-cycle (runs
    inside shard_map).  grid_p1: the 1-halo-padded static Grid of the
    local block (parallel/dist.py).  Face coarsening is block-local
    (local dims stay even), so every level remains distributed over the
    same mesh; coarsening stops at `min_local` cells per shard side and
    the coarsest level is smoothed with exchanges like any other.

    pad(a, w)/crop(a, w): the mesh halo exchange; gsum: psum-wrapped
    global sum; red_fn(shape, dtype): the GLOBAL checkerboard on a
    local block of that shape (axis-offset iota)."""
    mask_p = grid_p1.mask
    Hu_p = mask_p * ops.sxp(mask_p) * ops.a_xp(grid_p1.H)
    Hv_p = mask_p * ops.syp(mask_p) * ops.a_yp(grid_p1.H)
    Hu, Hv = crop(Hu_p, 1), crop(Hv_p, 1)
    Hu_w, Hv_s = crop(ops.sxm(Hu_p), 1), crop(ops.sym(Hv_p), 1)
    mask = crop(mask_p, 1)
    dx, dy = cfg.dx, cfg.dy
    levels = [_make_level(Hu, Hv, mask, dx, dy, lam, Hu_w=Hu_w,
                          Hv_s=Hv_s,
                          red=red_fn(mask.shape, mask.dtype) * mask,
                          gsum=gsum)]
    ny_l, nx_l = mask.shape
    while (ny_l % 2 == 0 and nx_l % 2 == 0
           and ny_l // 2 >= min_local and nx_l // 2 >= min_local):
        Hu, Hv = _coarsen_faces(Hu, Hv)
        Hu_w = crop(ops.sxm(pad(Hu, 1)), 1)
        Hv_s = crop(ops.sym(pad(Hv, 1)), 1)
        mask = (_coarsen2(mask) > 0).astype(mask.dtype)
        dx, dy = 2.0 * dx, 2.0 * dy
        ny_l, nx_l = ny_l // 2, nx_l // 2
        levels.append(_make_level(Hu, Hv, mask, dx, dy, lam, Hu_w=Hu_w,
                                  Hv_s=Hv_s,
                                  red=red_fn(mask.shape,
                                             mask.dtype) * mask,
                                  gsum=gsum))
    return levels


def make_dist_mg_precond(grid_p1: Grid, cfg: Config, lam, pad, crop,
                         gsum, red_fn, nu: int = 2, nu_coarse: int = 24,
                         min_local: int = 8, gamma: int = 2, nbr=None):
    """Distributed z = M^{-1} r: the (nu, nu)-cycle (W by default, see
    _vcycle).  With `nbr` (parallel/dist._make_mg_nbr) the half-sweeps
    and operator applications use the HALO-PIPELINED neighbour sum —
    thin-slice edge exchanges with no dependency on the full-block
    gather — instead of a blocking 1-halo pad per sweep; the transfers
    keep the width-2/1 pad/crop exchanges (once per level visit)."""
    levels = build_dist_levels(grid_p1, cfg, lam, pad, crop, gsum,
                               red_fn, min_local=min_local)

    def apply(r):
        # demean=False: CG's own deflation keeps the level-0 problem
        # compatible, the cycle converges identically without the
        # per-level means (measured, 19 iters either way), and dropping
        # them keeps the distributed iteration at ONE psum
        # (tests/dist/test_single_reduction.py)
        return _vcycle(levels, 0, r * levels[0].mask, lam, nu,
                       nu_coarse, pad, crop, gsum, demean=False,
                       gamma=gamma, nbr=nbr)

    return apply


def _make_pallas_smoothers(levels, nu: int, lam: float,
                           min_ny: int = 256, interpret: bool = False,
                           stop: Optional[int] = None):
    """Per-level (forward, reverse) blocked-sweep Pallas kernels for
    levels tall enough to amortize a kernel launch; None entries (small
    levels, the coarsest, and levels >= `stop` — those delegated to the
    fused coarse-stack kernel) fall back to the XLA half-sweeps.  Each
    kernel runs the whole nu-sweep smooth in one HBM pass (vs 2*nu
    passes of XLA half-sweeps); omega = 1 matches _halfsweep."""
    from beom_tpu.stencils.redblack_pallas import make_level_sweep

    stop = len(levels) if stop is None else stop
    out = []
    for j, lv in enumerate(levels):
        ny, nx = lv.mask.shape
        if (j == len(levels) - 1 or j >= stop or ny < min_ny
                or ny % 8):
            out.append(None)
            continue
        kw = dict(lam=lam, k=nu, omega=1.0, interpret=interpret)
        dx = 1.0 / lv.rdx2 ** 0.5
        dy = 1.0 / lv.rdy2 ** 0.5
        # forward (pre-)smooth also emits the post-sweep residual from
        # the same band pass — the cycle's residual+restrict chain then
        # needs no separate XLA matvec over the level (r4 item 1b)
        fwd = make_level_sweep(lv.Hu, lv.Hv, lv.mask, dx, dy,
                               residual=True, **kw)
        bwd = make_level_sweep(lv.Hu, lv.Hv, lv.mask, dx, dy,
                               reverse=True, **kw)
        out.append((fwd, bwd))
    return out


def _pallas_gamma_schedule(levels, gamma):
    """Translate uniform gamma=2 into the per-transition schedule the
    Pallas tier uses: W everywhere except the deepest TWO transitions
    (V there).  Measured: V at any transition above ~64^2 stalls the
    2048^2 solve at relres ~0.5 (the cell-centred bilinear transfers
    need W for grid-independence, r2), while V on the last two
    transitions converges identically and trims the deep visit count.
    Explicit tuples/other ints pass through untouched."""
    nt = len(levels) - 1
    if gamma != 2 or nt <= 0:
        return gamma
    return tuple(2 if k < nt - 2 else 1 for k in range(nt))


def _make_pallas_coarse(levels, lam: float, nu: int, nu_coarse: int,
                        demean: bool, coarse_size: int = 256,
                        gamma=2, interpret: bool = False):
    """(j0, call) delegating levels[j0:] (every level <= coarse_size,
    all VMEM-resident) to ONE fused Pallas kernel per cycle visit
    (stencils/mg_pallas.py) — the cycle is otherwise dispatch-latency-
    bound in the small levels.  None when no level qualifies.

    Even in-kernel the deep visits are not free: ops on tiny arrays
    cost ~0.1-0.15 us of issue latency each regardless of size, so the
    in-kernel cycle defaults to the (2, 2, 1) gamma schedule — W at
    the two finest kernel transitions, V below (measured: uniform W
    with nu_coarse=24 spent ~1 ms/cycle in the 16^2 sweep chains)."""
    from beom_tpu.stencils.mg_pallas import make_coarse_stack_call

    for j0, lv in enumerate(levels):
        ny, nx = lv.mask.shape
        if max(ny, nx) <= coarse_size and ny % 2 == 0 and nx % 2 == 0:
            # the kernel's recursion re-indexes levels from 0: hand it
            # the TAIL of the global per-transition schedule, so the
            # composite cycle sees one consistent schedule
            g_k = gamma[j0:] if isinstance(gamma, tuple) else gamma
            if isinstance(g_k, tuple) and not g_k:
                g_k = 1
            call = make_coarse_stack_call(
                levels[j0:], lam, nu=nu, nu_coarse=nu_coarse,
                gamma=g_k, demean=demean, interpret=interpret)
            return (j0, call)
        if ny % 2 or nx % 2:
            break
    return None


def make_mg_precond(grid: Grid, cfg: Config, lam: float = 0.0,
                    nu: int = 2, nu_coarse: int = 24,
                    min_size: int = 16, gamma: int = 2,
                    smoother: str = "xla", interpret: bool = False,
                    coarse_size: int = 512):
    """z = M^{-1} r as one symmetric (nu, nu)-cycle, for cg_solve.
    gamma = 2 (W-cycle) by default — see _vcycle for the measurement.

    smoother = 'pallas' swaps the fine-level smoothing to the blocked
    Pallas sweeps AND fuses the whole <=256^2 tail of the hierarchy
    into one kernel per visit (TPU only; _make_pallas_coarse).
    Caveat: the band lag across blocked-band boundaries makes M only
    approximately symmetric — fine in practice (CG convergence is the
    observable; tests pin it), but the 'xla' smoother is the
    exactly-symmetric reference."""
    levels = build_levels(grid, cfg, lam, min_size=min_size)
    smooth, coarse = None, None
    if smoother == "pallas":
        gamma = _pallas_gamma_schedule(levels, gamma)
        coarse = _make_pallas_coarse(levels, lam, nu, nu_coarse,
                                     demean=False, gamma=gamma,
                                     coarse_size=coarse_size,
                                     interpret=interpret)
        smooth = _make_pallas_smoothers(
            levels, nu, lam, interpret=interpret,
            stop=coarse[0] if coarse else None)

    def apply(r):
        return _vcycle(levels, 0, r * levels[0].mask, lam, nu,
                       nu_coarse, demean=False, gamma=gamma,
                       smooth=smooth, coarse=coarse)

    return apply


def make_mg_solver(grid: Grid, cfg: Config, lam: float = 0.0,
                   tol: Optional[float] = None,
                   maxiter: Optional[int] = None,
                   nu: int = 2, nu_coarse: int = 24, gamma: int = 2,
                   min_size: int = 16, smoother: str = "xla",
                   interpret: bool = False, coarse_size: int = 512,
                   krylov: int = 2):
    """Standalone multigrid iteration x_{k+1} = x_k + C(b - A x_k),
    with C one (nu, nu) gamma-cycle (gamma = 2, a W-cycle, by default).
    Returns solve(b, x0=None) -> x; used when cfg.solver = 'mg'.

    One operator application per cycle: the residual computed after
    each correction is carried, serving both as the convergence check
    of the new iterate and as the next cycle's input (the old loop
    recomputed it, two applications per cycle).

    smoother = 'pallas': fine levels smooth via the temporally-blocked
    Pallas kernel (one HBM pass per nu-sweep smooth) and the whole
    <=256^2 tail of the hierarchy runs as ONE fused kernel per visit
    (stencils/mg_pallas.py) — the cycle is otherwise dispatch-latency-
    bound (measured 3-5 ms/cycle at 512^2 from hundreds of tiny
    launches, TPU)."""
    levels = build_levels(grid, cfg, lam, min_size=min_size)
    smooth, coarse = None, None
    if smoother == "pallas":
        gamma = _pallas_gamma_schedule(levels, gamma)
        coarse = _make_pallas_coarse(levels, lam, nu, nu_coarse,
                                     demean=True, gamma=gamma,
                                     coarse_size=coarse_size,
                                     interpret=interpret)
        smooth = _make_pallas_smoothers(
            levels, nu, lam, interpret=interpret,
            stop=coarse[0] if coarse else None)
    lv0 = levels[0]
    if smoother == "pallas" and len(levels) > 1 \
            and lv0.mask.shape[0] >= 256:
        # EXACT outer residual as one band pass (vs ~6 XLA passes,
        # 0.876 ms measured at 2048^2) — exact, not sweep-lagged: the
        # carried residual is both the convergence check and the next
        # cycle's input, so the iteration's fixed point must satisfy
        # b - A x = 0 precisely
        from beom_tpu.stencils.redblack_pallas import make_apply_kernel
        resid0 = make_apply_kernel(
            lv0.Hu, lv0.Hv, lv0.mask, 1.0 / lv0.rdx2 ** 0.5,
            1.0 / lv0.rdy2 ** 0.5, lam=lam, mode="residual",
            interpret=interpret)
    else:
        def resid0(x, b):
            return (b - _apply_A(lv0, x, lam)) * lv0.mask
    tol0 = cfg.solver_tol if tol is None else tol
    maxiter = cfg.solver_maxiter if maxiter is None else maxiter

    def solve(b, x0=None):
        tol_ = max(tol0, 30.0 * float(jnp.finfo(b.dtype).eps))
        b = b * lv0.mask
        if lam == 0.0:   # pure Neumann: de-mean the RHS
            nwet = jnp.maximum(jnp.sum(lv0.mask), 1.0)
            b = (b - lv0.mask * (jnp.sum(b) / nwet)) * lv0.mask
        x = jnp.zeros_like(b) if x0 is None else x0 * lv0.mask
        b2 = jnp.sum(b * b)
        threshold = (tol_ * tol_) * jnp.maximum(
            b2, jnp.finfo(b.dtype).tiny)

        # Stopping: tolerance, maxiter, or stagnation with PATIENCE —
        # no new best |r|^2 for 3 consecutive cycles.  The cell-centred
        # bilinear-transfer coarse correction is non-contractive for
        # ultra-smooth error at large grids (measured r5, f64 AND f32:
        # the FIRST cycle amplifies a low-frequency RHS ~2x/~4x at
        # 1024^2/2048^2; two-grid with the same smoother/transfers
        # contracts at 0.47), so the K-cycle (krylov=2) iteration
        # transiently GROWS the residual before converging — a plain
        # "progress vs previous cycle" gate (r4's 0.95, r5's first
        # 0.75) exits on that transient with a garbage iterate.  The
        # BEST iterate seen is carried and returned.
        def cond(c):
            x, r, rr, xb, rrb, since, k = c
            return jnp.logical_and(
                k < maxiter,
                jnp.logical_and(rr > threshold, since < 3))

        def body(c):
            x, r, rr, xb, rrb, since, k = c
            x = (x + _vcycle(levels, 0, r, lam, nu, nu_coarse,
                             gamma=gamma, smooth=smooth,
                             coarse=coarse, krylov=krylov)) * lv0.mask
            r2 = resid0(x, b)
            rr2 = jnp.sum(r2 * r2)
            better = rr2 < 0.75 * rrb     # a new best must be worth
            xb = jnp.where(better, x, xb)  # the cycle it cost
            rrb = jnp.where(better, rr2, rrb)
            since = jnp.where(better, 0, since + 1)
            return x, r2, rr2, xb, rrb, since, k + 1

        r0 = resid0(x, b)
        rr0 = jnp.sum(r0 * r0)
        out = jax.lax.while_loop(
            cond, body, (x, r0, rr0, x, rr0,
                         jnp.zeros((), jnp.int32),
                         jnp.zeros((), jnp.int32)))
        return out[3]                      # best iterate

    return solve


def mg_solve(b, grid: Grid, cfg: Config, lam: float = 0.0, x0=None,
             tol: Optional[float] = None, maxiter: Optional[int] = None,
             nu: int = 2, nu_coarse: int = 24, gamma: int = 2,
             smoother: str = "xla", krylov: int = 2):
    """One-shot convenience wrapper over make_mg_solver (cfg.solver =
    'mg' dispatch, stepping/projection._solve)."""
    return make_mg_solver(grid, cfg, lam=lam, tol=tol, maxiter=maxiter,
                          nu=nu, nu_coarse=nu_coarse, gamma=gamma,
                          smoother=smoother, krylov=krylov)(b, x0=x0)
