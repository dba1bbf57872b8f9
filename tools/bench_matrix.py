"""Per-round chip benchmark matrix -> committed, machine-verifiable JSON.

Runs the BASELINE.md config sweep (serialized — concurrent chip jobs
corrupt timing) and appends one JSON line per config to the output file
(default BENCHMATRIX_r<N>.json at the repo root, N from --round).  Each
line is the tool's own JSON record (bench.py throughput with wall +
exec-only Mrops, or chip_accuracy.py on-chip dB) augmented with the
config env and exit status, so every BASELINE.md table cell traces to a
committed artifact line (VERDICT r2 weak #3 / next #2).

Usage: python tools/bench_matrix.py [--round 3] [--out FILE] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

BENCH_RUNS = [
    # (label, env overrides, timeout seconds)
    ("flagship_fast", {}, 1800),
    ("flagship_high", {"R8B_BENCH_PRECISION": "high"}, 1800),
    ("down_96k_44k_fast", {"R8B_BENCH_SRC": "96000",
                           "R8B_BENCH_DST": "44100"}, 1800),
    ("down_96k_44k_high", {"R8B_BENCH_SRC": "96000",
                           "R8B_BENCH_DST": "44100",
                           "R8B_BENCH_PRECISION": "high"}, 1800),
    ("up_44k_48k_fast", {"R8B_BENCH_SRC": "44100",
                         "R8B_BENCH_DST": "48000"}, 1800),
    ("up_44k_48k_high", {"R8B_BENCH_SRC": "44100",
                         "R8B_BENCH_DST": "48000",
                         "R8B_BENCH_PRECISION": "high"}, 1800),
    ("poly_96001_fast", {"R8B_BENCH_SRC": "44100",
                         "R8B_BENCH_DST": "96001"}, 1800),
    ("poly_96001_high", {"R8B_BENCH_SRC": "44100",
                         "R8B_BENCH_DST": "96001",
                         "R8B_BENCH_PRECISION": "high"}, 1800),
    ("dsd64_to_96k", {"R8B_BENCH_SRC": "2822400", "R8B_BENCH_DST": "96000",
                      "R8B_BENCH_ATTEN": "150", "R8B_BENCH_CHANNELS": "64",
                      "R8B_BENCH_SECONDS": "0.25",
                      "R8B_BENCH_METRIC": "dsd64_to_96k_throughput"}, 2400),
    ("pcm_to_dsd64", {"R8B_BENCH_SRC": "44100", "R8B_BENCH_DST": "2822400",
                      "R8B_BENCH_ATTEN": "150", "R8B_BENCH_CHANNELS": "64",
                      "R8B_BENCH_SECONDS": "0.25",
                      "R8B_BENCH_METRIC": "pcm_to_dsd64_throughput"}, 2400),
    ("hp_dfft5_guarantee", {"R8B_BENCH_PRECISION": "high",
                            "R8B_BENCH_FUSED": "0",
                            "R8B_BENCH_ENGINE": "pallas_fft5",
                            "R8B_BENCH_METRIC": "hp_dfft5_guarantee"}, 2400),
    ("hp_dfft4_guarantee", {"R8B_BENCH_PRECISION": "high",
                            "R8B_BENCH_FUSED": "0",
                            "R8B_BENCH_ENGINE": "pallas_fft4",
                            "R8B_BENCH_METRIC": "hp_dfft4_guarantee"}, 2400),
    ("ozaki_guarantee", {"R8B_BENCH_PRECISION": "high",
                         "R8B_BENCH_FUSED": "0",
                         "R8B_BENCH_ENGINE": "ozaki",
                         "R8B_BENCH_METRIC": "ozaki_guarantee"}, 2400),
    # round 5: the df32 inter-stage carry is default-on for the
    # guarantee config (-152 dB class); this row records the reverted
    # (per-seam-rounding, -142 dB-worst class) speed for comparison
    ("ozaki_guarantee_nocarry", {"R8B_BENCH_PRECISION": "high",
                                 "R8B_BENCH_FUSED": "0",
                                 "R8B_BENCH_ENGINE": "ozaki",
                                 "R8BT_DF_CARRY": "0",
                                 "R8B_BENCH_METRIC":
                                     "ozaki_guarantee_nocarry"}, 2400),
    ("preset_16", {"R8B_BENCH_ATTEN": "136.45"}, 1800),
    ("preset_16IR", {"R8B_BENCH_ATTEN": "109.56"}, 1800),
    ("preset_def", {"R8B_BENCH_ATTEN": "206.91"}, 1800),
    ("fast_10k_channels", {"R8B_BENCH_CHANNELS": "10240",
                           "R8B_BENCH_ITERS": "4",
                           "R8B_BENCH_METRIC": "fast_10k_channels"}, 2400),
]

ACCURACY_RUNS = [
    ("acc_flagship", ["--configs",
                      "fast,high,high_toeplitz,hp_dfft_pallas5,"
                      "hp_dfft_pallas4,ozaki"], 3600),
    ("acc_poly", ["--src", "44100", "--dst", "96001",
                  "--configs", "fast,high,ozaki"], 2400),
    ("acc_dsd", ["--src", "2822400", "--dst", "96000", "--atten", "150",
                 "--seconds", "0.25", "--channels", "2",
                 "--configs", "fast,ozaki"], 3600),
    # minimum-phase chain (dd-designed kernels, round 3+) on chip
    ("acc_minphase", ["--phase", "1",
                      "--configs", "fast,high,ozaki"], 2400),
    # ---- round-4 grid (VERDICT r3 next #4): every README accuracy
    # claim traces to an on-chip dB cell, including the corners where
    # the MXU residual path is backend-dependent ----
    # attenuation sweep on the flagship ratio (presets + the 218 cap)
    ("acc_flag_a109", ["--atten", "109.56",
                       "--configs", "fast,high,ozaki"], 1800),
    ("acc_flag_a136", ["--atten", "136.45",
                       "--configs", "fast,high,ozaki"], 1800),
    ("acc_flag_a218", ["--atten", "218",
                       "--configs", "fast,high,ozaki"], 1800),
    # transition-band extremes (CDSPFIRFilter.h:77-90 limits)
    ("acc_flag_tb05", ["--tb", "0.5",
                       "--configs", "fast,high,ozaki"], 3600),
    ("acc_flag_tb45", ["--tb", "45",
                       "--configs", "fast,high,ozaki"], 2400),
    # downsampling preset corners
    ("acc_down", ["--src", "96000", "--dst", "44100",
                  "--configs", "fast,high,ozaki"], 1800),
    ("acc_down_a218", ["--src", "96000", "--dst", "44100",
                       "--atten", "218",
                       "--configs", "fast,high,ozaki"], 2400),
    # fractional-bank hot path
    ("acc_48k", ["--src", "44100", "--dst", "48000",
                 "--configs", "fast,high,ozaki"], 1800),
    ("acc_48k_a136", ["--src", "44100", "--dst", "48000",
                      "--atten", "136.45",
                      "--configs", "fast,high,ozaki"], 2400),
    # poly corners (the -143.2 dB margin was thin; map atten spread)
    ("acc_poly_a136", ["--src", "44100", "--dst", "96001",
                       "--atten", "136.45",
                       "--configs", "fast,high,ozaki"], 2400),
    ("acc_poly_a218", ["--src", "44100", "--dst", "96001",
                       "--atten", "218",
                       "--configs", "fast,high,ozaki"], 2400),
    # PCM -> DSD64 direction (sacd.cpp workload, up path)
    ("acc_to_dsd", ["--src", "44100", "--dst", "2822400", "--atten", "150",
                    "--seconds", "0.05", "--channels", "2",
                    "--configs", "fast,ozaki"], 3600),
]


def run_one(label, cmd, env, timeout, out_path):
    # record the EFFECTIVE config (row overrides + any ambient R8B*_ vars
    # from the operator's shell) so a polluted environment is visible in
    # the committed artifact instead of silently altering a row
    cfg = {k: v for k, v in sorted(env.items())
           if k.startswith(("R8B_", "R8BT_"))}
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd=str(ROOT), timeout=timeout)
        lines = [ln for ln in r.stdout.strip().splitlines()
                 if ln.startswith("{")]
        try:
            rec = json.loads(lines[-1]) if lines else {}
        except json.JSONDecodeError as e:
            # a truncated/garbled line must not abort the remaining sweep
            rec = {"error": f"bad json: {e}; line={lines[-1][:200]}"}
        rec["rc"] = r.returncode
        if r.returncode and "error" not in rec and not lines:
            rec["error"] = r.stderr[-500:]
    except subprocess.TimeoutExpired:
        rec = {"rc": -1, "error": f"timeout after {timeout}s"}
    rec["label"] = label
    rec["wall_s"] = round(time.time() - t0, 1)
    if cfg:
        rec["env"] = cfg
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"{label:22s} {json.dumps(rec)[:160]}", file=sys.stderr)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="first 2 bench rows only (smoke)")
    args = ap.parse_args(argv)
    # --quick must never truncate the committed round artifact
    default_name = (f"BENCHMATRIX_r{args.round}.json" if not args.quick
                    else "BENCHMATRIX_quick.json")
    out_path = args.out or str(ROOT / default_name)
    with open(out_path, "w") as f:
        f.write(json.dumps({"label": "_meta",
                            "commit": subprocess.run(
                                ["git", "rev-parse", "HEAD"], cwd=str(ROOT),
                                capture_output=True,
                                text=True).stdout.strip(),
                            "time": time.strftime("%Y-%m-%dT%H:%M:%S")})
                + "\n")
    runs = BENCH_RUNS[:2] if args.quick else BENCH_RUNS
    for label, env_extra, to in runs:
        env = os.environ.copy()
        env.update(env_extra)
        run_one(label, [sys.executable, "bench.py"], env, to, out_path)
    if not args.quick:
        for label, extra, to in ACCURACY_RUNS:
            run_one(label,
                    [sys.executable, "tools/chip_accuracy.py"] + extra,
                    os.environ.copy(), to, out_path)
        run_one("stream_throughput",
                [sys.executable, "tools/bench_stream.py"],
                os.environ.copy(), 2400, out_path)
        run_one("stream_latency_curve",
                [sys.executable, "tools/latency_curve.py"],
                os.environ.copy(), 3600, out_path)
        # poly (irrational-ratio) serving artifacts (VERDICT r4 weak #4:
        # the streaming claims must cover the whole ratio space)
        env_poly = os.environ.copy()
        env_poly["R8B_SBENCH_DST"] = "96001"
        run_one("stream_throughput_poly",
                [sys.executable, "tools/bench_stream.py"],
                env_poly, 3600, out_path)
        env_lpoly = os.environ.copy()
        env_lpoly["R8B_LBENCH_DST"] = "96001"
        run_one("stream_latency_curve_poly",
                [sys.executable, "tools/latency_curve.py"],
                env_lpoly, 3600, out_path)
    print(f"matrix written to {out_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
