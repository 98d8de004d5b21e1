"""I/O tests: TOML config, overrides, snapshot/restart round-trips,
reference-style raw binary (SURVEY.md §3 C1/C16, §6 checkpoint/resume).
"""

import os

import numpy as np
import pytest

from beom_tpu.cases.double_gyre import make_case
from beom_tpu.core.config import Config
from beom_tpu.io import config as ioconfig
from beom_tpu.io import snapshots
from beom_tpu.run import run, InstabilityError
from beom_tpu.stepping import run_steps


def test_toml_roundtrip(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text('nx = 64\nny = 32\ndt = 150.0\nscheme = "split"\n'
                 'nsub = 4\nrho = [1026.0, 1027.5]\nnz = 2\n')
    cfg = ioconfig.load_toml(p)
    assert (cfg.nx, cfg.ny, cfg.dt, cfg.scheme, cfg.nsub) == \
        (64, 32, 150.0, "split", 4)
    assert cfg.rho == (1026.0, 1027.5)


def test_toml_unknown_key(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text("bogus = 1\n")
    with pytest.raises(KeyError, match="bogus"):
        ioconfig.load_toml(p)


def test_overrides():
    cfg = Config()
    cfg2 = ioconfig.apply_overrides(cfg, ["nu2=300.0", "wind=True",
                                          "scheme=rigid_lid"])
    assert cfg2.nu2 == 300.0 and cfg2.wind is True
    assert cfg2.scheme == "rigid_lid"
    with pytest.raises(KeyError):
        ioconfig.apply_overrides(cfg, ["nope=1"])
    with pytest.raises(ValueError):
        ioconfig.apply_overrides(cfg, ["just-a-string"])


def test_toml_case_run(tmp_path):
    """A TOML with `case = "<name>"` is a complete runnable experiment
    (VERDICT r1 item 7): geometry keys reach the factory, CLI-style
    overrides fold in before the arrays are built."""
    p = tmp_path / "run.toml"
    p.write_text('case = "double_gyre"\nnx = 32\nny = 32\n'
                 'nu2 = 500.0\ndtype = "float64"\n')
    cfg, grid, forcing, state = ioconfig.load_toml_case(
        p, overrides=["ny=24"])
    assert (cfg.nx, cfg.ny, cfg.nu2) == (32, 24, 500.0)
    assert grid.mask.shape == (24, 32)
    out = run(cfg, grid, forcing, state, 10, log=open(os.devnull, "w"))
    assert int(out.n) == 10
    # the CLI entry accepts the .toml directly
    from beom_tpu.run import main
    main([str(p), "-n", "5", "--set", "nx=16", "--set", "ny=16"])
    # a TOML without a case is not runnable
    q = tmp_path / "bare.toml"
    q.write_text("nx = 16\n")
    with pytest.raises(ValueError, match="case"):
        ioconfig.load_toml_case(q)


def test_snapshot_restart_bit_exact(tmp_path):
    """Resume must reproduce the uninterrupted trajectory exactly
    (same backend, same dtype) — SURVEY.md §6 checkpoint/resume."""
    cfg, grid, forcing, state = make_case(nx=24, ny=24, dtype="float64")
    mid = run_steps(state, grid, forcing, cfg, 30)
    full = run_steps(mid, grid, forcing, cfg, 30)

    p = tmp_path / "snap.npz"
    snapshots.save_state(p, mid)
    resumed = snapshots.load_state(p)
    assert int(resumed.n) == 30
    out = run_steps(resumed, grid, forcing, cfg, 30)
    np.testing.assert_array_equal(np.asarray(out.h), np.asarray(full.h))
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(full.u))


def test_raw_binary_roundtrip(tmp_path):
    cfg, grid, forcing, state = make_case(nx=16, ny=12, dtype="float64")
    out = run_steps(state, grid, forcing, cfg, 5)
    p = tmp_path / "fields.bin"
    snapshots.save_raw(p, out, cfg)
    back = snapshots.load_raw(p, cfg)
    np.testing.assert_array_equal(np.asarray(back.h), np.asarray(out.h))
    # header-free size check: 3 fields x nz*ny*nx x 8 bytes
    assert os.path.getsize(p) == 3 * cfg.nz * cfg.ny * cfg.nx * 8


def test_run_driver_snapshots_and_resume(tmp_path):
    cfg, grid, forcing, state = make_case(nx=24, ny=24, dtype="float64",
                                          snap_every=20, diag_every=20)
    rd = str(tmp_path / "run")
    out1 = run(cfg, grid, forcing, state, 40, run_dir=rd,
               log=open(os.devnull, "w"))
    assert snapshots.latest_snapshot(rd) is not None
    # driver resumes from the latest snapshot automatically
    out2 = run(cfg, grid, forcing, state, 20, run_dir=rd,
               log=open(os.devnull, "w"))
    assert int(out2.n) == int(out1.n) + 20


def test_run_driver_instability_guard():
    cfg, grid, forcing, state = make_case(nx=24, ny=24, dtype="float64")
    import dataclasses
    bad = dataclasses.replace(cfg, dt=cfg.dt * 10.0)   # way past CFL
    with pytest.raises(InstabilityError):
        run(bad, grid, forcing, state, 400, log=open(os.devnull, "w"))
