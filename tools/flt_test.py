"""Fractional-interpolator SNR validation (other/flttest.cpp:13-177 analog).

Drives the polynomial-mode fractional-delay bank directly on a sine and
compares each output against the analytically exact value at its read
position (p_n is data-independent, so the ideal output is
sin(2*pi*f*p_n/src) exactly) — measuring the bank's interpolation SNR in
isolation, the quantity flttest sweeps vs FilterFracs.  The reference needs
the R8B_FLTTEST build flag to inject bank parameters
(CDSPFracInterpolator.h:24-27); here bank parameters are plain constructor
arguments.

Usage: python tools/flt_test.py [--attens 110,140,170,200]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--attens", default="110,140,170,200")
    ap.add_argument("--freq", type=float, default=9000.0)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from r8brain_tpu.models.lengths import frac_positions, stage_out_len
    from r8brain_tpu.models.plan import _make_frac
    from r8brain_tpu.ops.stages import FracPolyExec

    src, dst = 88200.0, 96001.0  # poly mode (irrational-equivalent ratio)
    n = 30000
    t = np.arange(n) / src
    x = np.sin(2 * np.pi * args.freq * t)

    print(f"{'atten':>7} {'taps':>5} {'fracs':>6} {'SNR dB':>8}")
    ok = True
    for a in (float(v) for v in args.attens.split(",")):
        spec = _make_frac(src, dst, a, False, 0.0)
        ex = FracPolyExec(spec, jnp.float64)
        y = np.asarray(ex.apply(jnp.asarray(x[None], dtype=jnp.float64)))[0]
        M = y.shape[0]
        s, f = frac_positions(spec, 0, M)
        p = s + f
        ideal = np.sin(2 * np.pi * args.freq * p / src)
        sl = slice(100, M - 100)
        err = y[sl] - ideal[sl]
        snr = 10 * np.log10(np.mean(ideal[sl] ** 2)
                            / (np.mean(err ** 2) + 1e-300))
        print(f"{a:7.1f} {spec.filter_len:5d} {spec.bank.fracs:6d} "
              f"{snr:8.1f}")
        # flttest guidance: achieved SNR tracks the requested atten
        ok = ok and snr > a - 10.0
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
