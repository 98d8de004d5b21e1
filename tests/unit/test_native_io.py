"""Native async snapshot writer (native/snapwriter.cpp via ctypes)."""

import os

import numpy as np
import pytest

from beom_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def test_roundtrip(tmp_path):
    w = native.AsyncWriter()
    arrs = [np.random.default_rng(i).normal(size=(64, 64)).astype("f4")
            for i in range(4)]
    for i, a in enumerate(arrs):
        w.submit(str(tmp_path / f"s{i}.bin"), a)
    w.flush()
    assert w.errors == 0
    for i, a in enumerate(arrs):
        back = np.fromfile(tmp_path / f"s{i}.bin",
                           dtype="f4").reshape(64, 64)
        np.testing.assert_array_equal(back, a)
    w.close()


def test_error_counting(tmp_path):
    w = native.AsyncWriter()
    w.submit(str(tmp_path / "no_such_dir" / "x.bin"),
             np.zeros(4, dtype="f4"))
    w.flush()
    assert w.errors == 1
    w.close()


def test_save_raw_async(tmp_path):
    from beom_tpu.cases.double_gyre import make_case
    from beom_tpu.io import snapshots

    cfg, grid, forcing, state = make_case(nx=16, ny=12, dtype="float64")
    p = tmp_path / "snap.bin"
    with native.AsyncWriter() as w:
        snapshots.save_raw(p, state, cfg, writer=w)
    back = snapshots.load_raw(p, cfg)
    np.testing.assert_array_equal(np.asarray(back.h), np.asarray(state.h))
