#!/usr/bin/env python
"""Time-sharding scaling-efficiency model from the production geometry.

For each (shard count, audio duration) this prints the per-device work
inflation of the sharded oneshot path: every time shard processes
H + L_s + R input samples (left halo + useful segment + right halo,
parallel/sharding.py shard_geometry) to emit its M_s outputs, so

    efficiency = L_s / (H + L_s + R)

— the fraction of per-device compute that is useful work.  Halos are
fixed-size functions of the chain's input span (overlap-save history +
HB tap extents + frac window, SURVEY.md §5 long-context carry), so
efficiency -> 1 as the per-shard segment grows: this is the model behind
the README/BASELINE ">= 90% scaling at >= 2 hosts" claim, computable
without multi-host hardware.  Channel sharding needs no halos at all
(efficiency 1.0 by construction; the 10k-channel axis).

The reference has no distributed layer to compare against
(SURVEY.md §2: "parallelism components: none exist"); the analog it
does have is the per-object streaming state whose size sets these halos
(CDSPBlockConvolver.h:384 PrevInput etc.).

Usage:
  python tools/halo_model.py [--src 44100] [--dst 96000]
      [--atten 180.15] [--shards 2,4,8,16,32] [--seconds 1,10,60]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from r8brain_tpu.models.plan import make_plan  # noqa: E402
from r8brain_tpu.parallel.sharding import (  # noqa: E402
    chain_input_span, chain_shift_period, shard_geometry)


def efficiency(plan, period, span, n_t: int, n_in: int) -> dict:
    out_len = int(n_in * plan.dst_rate / plan.src_rate)
    M_s, L_s, H, W, R = shard_geometry(plan, period, span, n_t, out_len,
                                       n_in)
    return {
        "n_t": n_t,
        "M_s": M_s,
        "L_s": L_s,
        "H": H,
        "W": W,
        "R": R,
        "efficiency": L_s / (H + L_s + R),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", type=float, default=44100.0)
    ap.add_argument("--dst", type=float, default=96000.0)
    ap.add_argument("--tb", type=float, default=2.0)
    ap.add_argument("--atten", type=float, default=180.15)
    ap.add_argument("--shards", default="2,4,8,16,32")
    ap.add_argument("--seconds", default="1,10,60")
    args = ap.parse_args(argv)

    plan = make_plan(args.src, args.dst, args.tb, args.atten, 0)
    period = chain_shift_period(plan)
    span = chain_input_span(plan)
    if period is None:
        print("polynomial-mode plan: time sharding unavailable "
              "(channel sharding only, efficiency 1.0)")
        return
    print(f"# {args.src:g} -> {args.dst:g}  atten {args.atten:g}  "
          f"input span {span} (halo H+R below)")
    print(f"{'seconds':>8} {'shards':>7} {'H':>7} {'R':>7} {'L_s':>9} "
          f"{'efficiency':>11}")
    for sec in (float(s) for s in args.seconds.split(",")):
        n_in = int(sec * args.src)
        for n_t in (int(s) for s in args.shards.split(",")):
            e = efficiency(plan, period, span, n_t, n_in)
            print(f"{sec:8g} {n_t:7d} {e['H']:7d} {e['R']:7d} "
                  f"{e['L_s']:9d} {e['efficiency']:10.1%}")


if __name__ == "__main__":
    main()
