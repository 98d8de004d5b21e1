"""Single-reduction distributed CG (SURVEY.md §8 hard part 2; r1
VERDICT item 6): the Chronopoulos-Gear iteration folds both CG dot
products, the convergence norm and the nullspace-deflation means into
ONE batched psum, so the compiled while-loop body must contain exactly
one all-reduce.
"""

import re

import pytest

import jax

from beom_tpu.cases import make_case
from beom_tpu.parallel.mesh import make_mesh, shard_state
from beom_tpu.parallel.dist import make_dist_stepper

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.mark.parametrize("scheme", ["rigid_lid", "implicit_fs"])
def test_one_allreduce_per_cg_iteration(scheme):
    cfg, grid, forcing, state = make_case(
        "rigid_lid", nx=64, ny=64, dtype="float64", scheme=scheme,
        mesh_y=2, mesh_x=2)
    mesh = make_mesh(2, 2)
    step = make_dist_stepper(grid, forcing, cfg, mesh, n_inner=1)
    txt = step.lower(shard_state(state, mesh)).compile().as_text()

    # HLO computations are blank-line-separated blocks; the CG while
    # body is the non-ENTRY block with all-reduces in it
    blocks = [b for b in txt.split("\n\n") if "all-reduce" in b]
    loop_counts = [len(re.findall(r"all-reduce", b)) for b in blocks
                   if not b.lstrip().startswith("ENTRY")]
    assert loop_counts, "no while-body all-reduce found (CG not compiled?)"
    assert max(loop_counts) == 1, \
        f"CG iteration body has {max(loop_counts)} all-reduces, want 1"


@pytest.mark.parametrize("scheme", ["rigid_lid", "implicit_fs"])
def test_matvec_collectives_are_thin_slices(scheme):
    """Halo-pipelined matvec (north-star: 'halo-pipelined matvecs'):
    inside the CG while-body, every collective-permute must carry only
    a 1-wide edge strip — the full-block laplacian then has no data
    dependence on the exchange, so the scheduler can overlap them.
    The old blocking pad2d matvec shipped (nz-free) 2-halo-padded
    blocks through collectives inside the body; this pins the new
    shape discipline (32x1 / 1x32 strips on a 64^2 grid over a 2x2
    mesh; the Jacobi fallback keeps MG out of the body)."""
    cfg, grid, forcing, state = make_case(
        "rigid_lid", nx=64, ny=64, dtype="float64", scheme=scheme,
        mesh_y=2, mesh_x=2, precond="jacobi")
    mesh = make_mesh(2, 2)
    step = make_dist_stepper(grid, forcing, cfg, mesh, n_inner=1)
    txt = step.lower(shard_state(state, mesh)).compile().as_text()

    body_blocks = [b for b in txt.split("\n\n")
                   if "all-reduce" in b
                   and not b.lstrip().startswith("ENTRY")]
    assert body_blocks, "CG while body not found"
    shapes = []
    for b in body_blocks:
        for line in b.splitlines():
            m = re.search(r"collective-permute[^=]*\(", line)
            m2 = re.search(r"f(?:32|64)\[(\d+),(\d+)\]", line)
            if "collective-permute" in line and m2:
                shapes.append((int(m2.group(1)), int(m2.group(2))))
    assert shapes, "no collective-permute in the CG body?"
    for ny_, nx_ in shapes:
        assert min(ny_, nx_) == 1, \
            f"CG-body collective carries a {ny_}x{nx_} block, " \
            "expected thin 1-wide edge strips (pipelined matvec)"
