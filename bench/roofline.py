"""Roofline accounting for the fused FB step (SURVEY.md §7).

Computes the speed-of-light grid-points/s/chip from the HBM traffic a
perfectly-fused step must move, and reports measured/bound fractions
for the rows in BENCH output.

    python bench/roofline.py [measured_points_per_s]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # runnable as python bench/<x>.py

import json
import sys

CHIP_SPECS = {
    # name: (HBM GB/s, f32 TFLOP/s-equivalent on VPU)
    "v5e": (819, 197 / 2),     # bf16 197 TFLOPs; f32 VPU-bound anyway
    "v5p": (2765, 459 / 2),
}


def traffic_bytes_per_point(nz=1, itemsize=4, with_pad=True):
    """Minimum HBM bytes per grid point per FB step.

    Kernel pass: read h,u,v (3*nz), write h,u,v (3*nz), read statics
    H, mask, mask_u, mask_v, mask_q, f_q, taux, tauy (8).
    The current implementation also wrap-pads h,u,v in XLA first:
    read 3*nz + write 3*nz more.
    """
    words = 6 * nz + 8
    if with_pad:
        words += 6 * nz
    return words * itemsize


def bound_points_per_s(chip="v5e", nz=1, with_pad=True):
    bw = CHIP_SPECS[chip][0] * 1e9
    return bw / traffic_bytes_per_point(nz=nz, with_pad=with_pad)


def main(argv):
    measured = float(argv[1]) if len(argv) > 1 else None
    for chip in CHIP_SPECS:
        for with_pad in (True, False):
            b = bound_points_per_s(chip, with_pad=with_pad)
            row = {"chip": chip,
                   "pad_in_xla": with_pad,
                   "bytes_per_point": traffic_bytes_per_point(
                       with_pad=with_pad),
                   "bound_points_per_s": round(b, 1)}
            if measured is not None:
                row["measured_fraction"] = round(measured / b, 4)
            print(json.dumps(row))


if __name__ == "__main__":
    main(sys.argv)
