"""Validate the closed-form low-pass design fits across the full
(transition band, attenuation) grid.

Equivalent of other/calcErrorTable.cpp:21-135: for each (tb, atten) design a
filter, measure the realized stop-band attenuation and the -3 dB point, and
print the worst deviations.  The reference documents atten error ~ 0 and
-3 dB point ~ -3.01 dB (other/calcErrorTable.cpp:5-12).

Usage: python tools/calc_error_table.py [--tb-steps 8] [--atten-steps 8]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tb-steps", type=int, default=8)
    ap.add_argument("--atten-steps", type=int, default=8)
    args = ap.parse_args(argv)

    from r8brain_tpu.design.lpfilter import (LP_MAX_ATTEN, LP_MAX_TRANS_BAND,
                                             LP_MIN_ATTEN, LP_MIN_TRANS_BAND,
                                             build_lp_filter)
    from r8brain_tpu.utils.scan import response_mag

    worst_att = 0.0
    worst_3db = 0.0
    rows = []
    for tb in np.geomspace(LP_MIN_TRANS_BAND, LP_MAX_TRANS_BAND,
                           args.tb_steps):
        for att in np.linspace(LP_MIN_ATTEN, LP_MAX_ATTEN,
                               args.atten_steps):
            f = build_lp_filter(0.5, float(tb), float(att), 0, 1.0)
            # the stop-band (|H| <= -atten) starts at norm_freq*pi; measure
            # the realized attenuation from there to Nyquist
            th = np.linspace(0.5 * np.pi * 1.0005, np.pi, 4000)
            sb = np.abs(response_mag(f.kernel, th)).max()
            realized = -20.0 * np.log10(sb + 1e-300)
            err = realized - att
            # the -3.01 dB point sits at norm_freq*(1 - tb/100)*pi
            th_scan = np.linspace(0, 0.5 * np.pi, 8001)
            db = 20 * np.log10(np.abs(response_mag(f.kernel, th_scan))
                               + 1e-300)
            i3 = int(np.searchsorted(db <= -3.01, True))
            th3 = th_scan[min(i3, th_scan.shape[0] - 1)]
            expect3 = 0.5 * np.pi * (1.0 - tb / 100.0)
            dev3 = (th3 - expect3) / (0.5 * np.pi)
            rows.append((tb, att, err, dev3))
            worst_att = max(worst_att, -err if err < 0 else 0.0)
            worst_3db = max(worst_3db, abs(dev3))
    print(f"{'tb%':>7} {'req_att':>8} {'att_err_dB':>11} {'m3db_dev':>9}")
    for tb, att, err, dev3 in rows:
        print(f"{tb:7.2f} {att:8.2f} {err:11.3f} {dev3:9.4f}")
    print(f"\nworst attenuation shortfall: {worst_att:.3f} dB "
          f"(reference realizes +0.40..+4.46 dB above request, "
          f"CDSPFIRFilter.h:583-586)")
    print(f"worst -3 dB point deviation: {worst_3db * 100:.2f} % of cutoff")
    return 0 if worst_att < 1.0 else 1


if __name__ == "__main__":
    sys.exit(main())
