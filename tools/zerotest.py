"""Full round-trip zeroing sweep (bench/zerotest.cpp:34-169 equivalent).

Sweeps the reference's 620 integer ratios k/20 for k = 21..640 with
randomized transition band, resampling up then back down and measuring the
band-limited RMS difference against the input (insensitive to
transition-band loss, zerotest.cpp:62-84).  In oracle mode it also
cross-checks the closed-form latency query against streaming emission at
every ratio (zerotest.cpp:115-128); the f32 mode shares the same latency
algebra (models/lengths.py), covered by the pytest suite.

The pytest suite runs a 20-ratio subset (tests/test_quality.py); this tool
is the full acceptance sweep.

--random N replaces the integer-ratio sweep with N randomized
NON-integer ratios (masstest.cpp:111-130's parameter distribution:
ratio 1+44*rand, random direction, random tb) — in f32 mode these land
in the polynomial-interpolator branch the integer sweep never visits.

Usage: python tools/zerotest.py [--quick] [--atten 160] [--n 12000]
                                [--random N] [--impl f32] [--cpu]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="every 10th ratio only")
    ap.add_argument("--atten", type=float, default=160.0)
    ap.add_argument("--n", type=int, default=12000)
    ap.add_argument("--impl", choices=("oracle", "f32"), default="oracle",
                    help="oracle: CPU f64 executor; f32: the TPU execution "
                         "path (fused engines) on the current JAX backend")
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX CPU backend for --impl f32")
    ap.add_argument("--random", type=int, default=0, metavar="N",
                    help="N randomized non-integer ratios instead of the "
                         "620-integer sweep (masstest distribution)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from r8brain_tpu.models.oracle import OracleResampler

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from helpers import band_limited_rms_db, lcg_uniform  # noqa: E402

    rng = np.random.default_rng(1)
    if args.random:
        # always up-then-down: the zeroing methodology compares the band
        # that SURVIVES the round trip, so the first hop must not shrink
        # it (zerotest.cpp:62-84 likewise only upsamples first)
        cases = [(i, 44100.0, 44100.0 * (1.0 + 44.0 * rng.random()))
                 for i in range(args.random)]
    else:
        cases = [(k, 44100.0, 44100.0 * k / 20.0)
                 for k in range(21, 641, 10 if args.quick else 1)]
    worst = -1e30
    worst_k = None
    fails = 0
    t0 = time.time()
    for k, src, dst in cases:
        tb = 0.5 + 4.5 * rng.random()
        x = lcg_uniform(k, args.n)
        if args.impl == "f32":
            from r8brain_tpu.models.resampler import Resampler

            up = Resampler(src, dst, tb, args.atten, 0, dtype="float32")
            dn = Resampler(dst, src, tb, args.atten, 0, dtype="float32")
            mid = np.asarray(up.oneshot(
                x.astype(np.float32)[None],
                int(np.floor(args.n * dst / src))), np.float64)[0]
            y = np.asarray(dn.oneshot(mid.astype(np.float32)[None],
                                      args.n), np.float64)[0]
        else:
            up = OracleResampler(src, dst, 2048, tb, args.atten, 0)
            dn = OracleResampler(dst, src, 2048, tb, args.atten, 0)
            # latency-query consistency
            need = up.get_input_required_for_output(100)
            up.clear()
            got = up.process(x[:need]).shape[0]
            assert got >= 100, (k, need, got)
            up.clear()
            mid = up.oneshot(x, int(np.floor(args.n * dst / src)))
            y = dn.oneshot(mid, args.n)
        d = band_limited_rms_db(y, x)
        if d > worst:
            worst, worst_k = d, k
        if d > -(args.atten - 25.0):
            fails += 1
            print(f"  FAIL k={k} tb={tb:.2f}: {d:.1f} dB")
    dt = time.time() - t0
    n_ratios = len(cases)
    print(f"{n_ratios} ratios in {dt:.0f}s; worst {worst:.1f} dB at "
          f"k={worst_k} (threshold {-(args.atten - 25.0):.0f} dB); "
          f"{fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
