"""On-chip accuracy audit: runs the production f32 engines on the current
JAX backend (the tunneled TPU by default) and reports RMS dB vs the host
f64 oracle — the hardware evidence behind the -141 dB claims (the CPU
test suite sits at XLA:CPU's f32 matmul floor instead, ~-136 dB).

Usage: python tools/chip_accuracy.py [--channels 4] [--seconds 0.5]
       [--configs fast,high,hp_dfft,hp_dfft4,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = {
    # label: (precision, fused, conv_engine, frac_engine)
    "fast": ("fast", "auto", "auto", "auto"),
    "high": ("high", "auto", "auto", "auto"),
    "high_toeplitz": ("high", False, "toeplitz", "auto"),
    "hp_dfft": ("high", False, "fft", "auto"),
    "hp_dfft_pallas": ("high", False, "pallas_fft", "auto"),
    "hp_dfft_pallas4": ("high", False, "pallas_fft4", "auto"),
    "hp_dfft_pallas5": ("high", False, "pallas_fft5", "auto"),
    "fast_pallas_fused": ("fast", True, "pallas", "auto"),
    "high_pallas_fused": ("high", True, "pallas", "auto"),
    # error-free split-operand MXU guarantee engine (ops/ozaki.py)
    "ozaki": ("high", False, "ozaki", "ozaki"),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=0.5)
    ap.add_argument("--src", type=float, default=44100)
    ap.add_argument("--dst", type=float, default=96000)
    ap.add_argument("--atten", type=float, default=180.15)
    ap.add_argument("--tb", type=float, default=2.0)
    ap.add_argument("--phase", type=int, default=0,
                    help="0=linear, 1=minimum phase")
    ap.add_argument("--configs", default="fast,high,hp_dfft_pallas")
    args = ap.parse_args(argv)

    from r8brain_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from r8brain_tpu.models.oracle import OracleResampler
    from r8brain_tpu.models.resampler import Resampler

    print(f"backend: {jax.devices()[0].platform} {jax.devices()[0]}",
          file=sys.stderr)
    n = int(args.src * args.seconds)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((args.channels, n)) * 0.5
    orc = OracleResampler(args.src, args.dst, 4096, args.tb, args.atten,
                          args.phase)
    out_len = int(np.floor(n * args.dst / args.src))
    ref = np.stack([orc.oneshot(c, out_len) for c in x])

    results = {}
    for label in args.configs.split(","):
        precision, fused, conv_engine, frac_engine = CONFIGS[label]
        t0 = time.time()
        try:
            rs = Resampler(args.src, args.dst, args.tb, args.atten,
                           args.phase,
                           dtype=jnp.float32, precision=precision,
                           fused=fused, conv_engine=conv_engine,
                           frac_engine=frac_engine, plan=orc.plan)
            y = np.asarray(rs.oneshot(x.astype(np.float32), out_len),
                           np.float64)
        except Exception as e:  # isolate per-config failures
            results[label] = f"ERROR: {type(e).__name__}"
            print(f"{label:20s} FAILED: {repr(e)[:300]}", file=sys.stderr)
            continue
        # rmscompare convention: skip 50 ms at each end
        # (bench/rmscompare.cpp:72-86); stream start/flush transients are
        # latency-bookkeeping regions, not steady-state accuracy.  Capped
        # at a quarter of the output so short high-rate signals (e.g.
        # 0.05 s of DSD64: 50 ms of edges would swallow ALL 141k samples
        # and the empty mean printed NaN, round-4 acc_to_dsd) still
        # measure their middle half.
        skip = min(int(0.05 * args.dst), out_len // 4)
        d = (y - ref)[:, skip : max(skip + 1, out_len - skip)]
        rms = 10.0 * np.log10(np.mean(d * d) + 1e-300)
        results[label] = round(rms, 1)
        print(f"{label:20s} {rms:8.1f} dB vs f64 oracle "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)
    print(json.dumps({"metric": "chip_accuracy_db", "phase": args.phase,
                      "src": args.src, "dst": args.dst,
                      "atten": args.atten, "tb": args.tb,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
