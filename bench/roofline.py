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


def traffic_bytes_per_point(nz=1, itemsize=4, by=256, wy=8,
                            steps_per_pass=1):
    """HBM bytes per grid point per FB step of the fused band kernel.

    One pass: read h,u,v (3*nz) and the streamed statics H, mask,
    taux, tauy (4) at (by + 2*wy)/by halo redundancy (in-kernel wrap
    DMAs — there is NO XLA pad pass; staggered masks and f are
    reconstructed in-kernel, stencils/band.static_fields), write h,u,v
    (3*nz).  steps_per_pass > 1 (temporal blocking) amortizes the
    whole pass over k steps at a k-fold-wider halo.
    """
    halo = (by + 2 * wy * steps_per_pass) / by
    words = ((3 * nz + 4) * halo + 3 * nz) / steps_per_pass
    return words * itemsize


# Empirically achievable DMA rate of the band access pattern on this
# v5e (passthrough-body kernel, 2048^2, r4): 9.68e9 pt/s at 1-step
# traffic = ~49% of paper HBM BW.  Spec bounds below use paper BW;
# multiply by DMA_EFFICIENCY for the achievable figure.
DMA_EFFICIENCY = 0.49


def bound_points_per_s(chip="v5e", nz=1, steps_per_pass=1):
    bw = CHIP_SPECS[chip][0] * 1e9
    return bw / traffic_bytes_per_point(nz=nz,
                                        steps_per_pass=steps_per_pass)


def main(argv):
    measured = float(argv[1]) if len(argv) > 1 else None
    for chip in CHIP_SPECS:
        for k in (1, 2, 4):
            b = bound_points_per_s(chip, steps_per_pass=k)
            row = {"chip": chip,
                   "steps_per_pass": k,
                   "bytes_per_point": round(traffic_bytes_per_point(
                       steps_per_pass=k), 2),
                   "bound_points_per_s": round(b, 1),
                   "achievable_points_per_s": round(b * DMA_EFFICIENCY,
                                                    1)}
            if measured is not None:
                row["measured_fraction"] = round(measured / b, 4)
            print(json.dumps(row))


if __name__ == "__main__":
    main(sys.argv)
