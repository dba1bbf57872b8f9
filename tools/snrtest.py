"""SNR-vs-attenuation sweep (bench/snrtest.cpp:35-112 equivalent).

For each requested attenuation, white-noise round trips at several random
ratios; achieved SNR must track ReqAtten (the reference documents achieved
~ ReqAtten and advises ReqAtten+9 for a guarantee).  Runs via the oracle or
the production f32 path.

Usage: python tools/snrtest.py [--impl oracle|f32] [--cpu]
       [--step 6] [--ratios 8]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=("oracle", "f32"), default="oracle")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--step", type=float, default=6.0)
    ap.add_argument("--ratios", type=int, default=8)
    ap.add_argument("--n", type=int, default=9000)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from helpers import band_limited_rms_db, lcg_uniform  # noqa: E402

    def convert(src, dst, tb, atten, x, out_len):
        if args.impl == "f32":
            from r8brain_tpu.models.resampler import Resampler

            rs = Resampler(src, dst, tb, atten, 0, dtype="float32")
            return np.asarray(rs.oneshot(x.astype(np.float32)[None],
                                         out_len), np.float64)[0]
        from r8brain_tpu.models.oracle import OracleResampler

        return OracleResampler(src, dst, 2048, tb, atten, 0).oneshot(
            x, out_len)

    rng = np.random.default_rng(5)
    t0 = time.time()
    print(f"{'atten':>7} {'avg SNR':>9} {'min SNR':>9}")
    ok = True
    atten = 49.0
    while atten <= 218.0:
        snrs = []
        for _ in range(args.ratios):
            k = int(rng.integers(21, 641))
            src = 44100.0
            dst = src * k / 20.0
            tb = 0.5 + 4.5 * rng.random()
            x = lcg_uniform(k, args.n)
            mid = convert(src, dst, tb, atten, x,
                          int(np.floor(args.n * dst / src)))
            y = convert(dst, src, tb, atten, mid, args.n)
            snrs.append(-band_limited_rms_db(y, x))
        avg, mn = float(np.mean(snrs)), float(np.min(snrs))
        print(f"{atten:7.1f} {avg:9.1f} {mn:9.1f}")
        # each implementation saturates at its arithmetic/measurement
        # floor: ~200 dB for the f64 oracle round trip, ~135-150 dB for f32
        cap = 130.0 if args.impl == "f32" else 185.0
        floor = min(atten - 15.0, cap)
        ok = ok and mn >= floor
        atten += args.step
    print(f"\n{'PASS' if ok else 'FAIL'} ({time.time()-t0:.0f}s; achieved "
          f"SNR tracks ReqAtten; reference guidance: request +9 dB for a "
          f"guarantee, bench/snrtest.cpp:4-6)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
