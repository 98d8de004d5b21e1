"""Snapshot and restart I/O (SURVEY.md §3 C16, §6 checkpoint/resume).

The reference dumps raw-binary full-state snapshots at a cadence and
restarts by reading one back.  Here:

  * snapshots — compressed .npz per output time (h, u, v, t, n), written
    from host copies fetched once per I/O interval (the only
    device->host field transfer in a run, SURVEY.md §4.2);
  * restart — a snapshot IS a restart file: `load_state` rebuilds the
    State pytree exactly (dtype included), so resume reproduces the
    interrupted trajectory bit-for-bit on the same backend;
  * raw mode — `save_raw` mirrors the reference's headerless
    float binary layout for interop with its Octave/MATLAB scripts.

Directory layout: <run_dir>/snap_<step:09d>.npz, plus last_good.npz
maintained for failure recovery (§6 failure detection).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from beom_tpu.core.config import Config
from beom_tpu.core.state import State


def save_state(path, state: State) -> None:
    extra = {} if state.phi is None else {"phi": np.asarray(state.phi)}
    if state.phi_prev is not None:
        extra["phi_prev"] = np.asarray(state.phi_prev)
    np.savez_compressed(
        path,
        h=np.asarray(state.h), u=np.asarray(state.u), v=np.asarray(state.v),
        t=np.asarray(state.t), n=np.asarray(state.n), **extra)


def load_state(path) -> State:
    with np.load(path) as z:
        phi = jnp.asarray(z["phi"]) if "phi" in z.files else None
        phi_prev = (jnp.asarray(z["phi_prev"])
                    if "phi_prev" in z.files else None)
        return State(h=jnp.asarray(z["h"]), u=jnp.asarray(z["u"]),
                     v=jnp.asarray(z["v"]), t=jnp.asarray(z["t"]),
                     n=jnp.asarray(z["n"]), phi=phi, phi_prev=phi_prev)


def snap_path(run_dir, step: int) -> str:
    return os.path.join(run_dir, f"snap_{step:09d}.npz")


def write_snapshot(run_dir, state: State, last_good: bool = True) -> str:
    """Write snap_<n>.npz (+ refresh last_good.npz) and return its path."""
    os.makedirs(run_dir, exist_ok=True)
    path = snap_path(run_dir, int(state.n))
    save_state(path, state)
    if last_good:
        save_state(os.path.join(run_dir, "last_good.npz"), state)
    return path


def latest_snapshot(run_dir) -> Optional[str]:
    if not os.path.isdir(run_dir):
        return None
    snaps = sorted(f for f in os.listdir(run_dir)
                   if f.startswith("snap_") and f.endswith(".npz"))
    return os.path.join(run_dir, snaps[-1]) if snaps else None


def save_raw(path, state: State, cfg: Config, writer=None) -> None:
    """Reference-style headerless binary: h,u,v concatenated, native
    float32/float64 per cfg.dtype, C order (k, j, i).

    Pass an io.native.AsyncWriter as `writer` to hand the buffer to the
    background C++ writer thread (native/snapwriter.cpp) instead of
    blocking the driver on disk I/O.
    """
    dt = cfg.npdtype
    buf = np.concatenate([np.asarray(a, dt).ravel()
                          for a in (state.h, state.u, state.v)])
    if writer is not None:
        writer.submit(os.fspath(path), buf)
        return
    with open(path, "wb") as f:
        buf.tofile(f)


def load_raw(path, cfg: Config) -> State:
    dt = cfg.npdtype
    shape = (cfg.nz, cfg.ny, cfg.nx)
    count = int(np.prod(shape))
    raw = np.fromfile(path, dtype=dt, count=3 * count)
    if raw.size != 3 * count:
        raise ValueError(f"{path}: expected {3*count} values, got {raw.size}")
    h, u, v = (raw[i * count:(i + 1) * count].reshape(shape)
               for i in range(3))
    return State(h=jnp.asarray(h), u=jnp.asarray(u), v=jnp.asarray(v),
                 t=jnp.zeros((), dt), n=jnp.zeros((), jnp.int32))
