"""Distributed checkpoint/resume (SURVEY.md §6 checkpoint/resume;
r1 VERDICT weak #4): a snapshot written mid-run on an 8-virtual-device
mesh, resumed through the driver, must reproduce the uninterrupted
trajectory exactly.
"""

import os

import numpy as np
import pytest

import jax

from beom_tpu.cases import make_case
from beom_tpu.io import snapshots
from beom_tpu.run import run

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_dist_resume_matches_uninterrupted(tmp_path):
    cfg, grid, forcing, state = make_case(
        "double_gyre", nx=64, ny=64, dtype="float64",
        mesh_y=2, mesh_x=4, snap_every=8)
    devnull = open(os.devnull, "w")

    full = run(cfg, grid, forcing, state, 16, log=devnull, chunk=8)

    rd = str(tmp_path / "dist_run")
    run(cfg, grid, forcing, state, 8, run_dir=rd, log=devnull, chunk=8)
    assert snapshots.latest_snapshot(rd) is not None
    resumed = run(cfg, grid, forcing, state, 8, run_dir=rd, log=devnull,
                  chunk=8)

    assert int(resumed.n) == int(full.n) == 16
    np.testing.assert_array_equal(np.asarray(resumed.h),
                                  np.asarray(full.h))
    np.testing.assert_array_equal(np.asarray(resumed.u),
                                  np.asarray(full.u))
    np.testing.assert_array_equal(np.asarray(resumed.v),
                                  np.asarray(full.v))
