"""Per-channel RMS-of-difference between two WAV files.

Equivalent of bench/rmscompare.cpp:16-141: aligns lengths, skips 50 ms at
each end (edge transients), prints per-channel RMS difference in dB and the
overall verdict against the 24-bit golden-equality threshold of -141 dB
(bench/README.md:9-11).

Usage: python tools/rmscompare.py a.wav b.wav [--skip-ms 50] [--thresh -141]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("file_a")
    ap.add_argument("file_b")
    ap.add_argument("--skip-ms", type=float, default=50.0)
    ap.add_argument("--thresh", type=float, default=-141.0)
    args = ap.parse_args(argv)

    from r8brain_tpu.io.wavio import read_wav

    a = read_wav(args.file_a)
    b = read_wav(args.file_b)
    if a.rate != b.rate:
        print(f"sample-rate mismatch: {a.rate} vs {b.rate}", file=sys.stderr)
        return 2
    if a.channels != b.channels:
        print(f"channel mismatch: {a.channels} vs {b.channels}",
              file=sys.stderr)
        return 2
    n = min(a.frames, b.frames)
    skip = int(a.rate * args.skip_ms / 1000.0)
    if n - 2 * skip <= 0:
        print("files too short for the edge skip", file=sys.stderr)
        return 2
    sl = slice(skip, n - skip)
    worst = -1e30
    for c in range(a.channels):
        d = a.data[c, sl] - b.data[c, sl]
        rms = 10.0 * np.log10(np.mean(d * d) + 1e-300)
        worst = max(worst, rms)
        print(f"channel {c}: RMS diff {rms:.2f} dB")
    verdict = "EQUAL" if worst <= args.thresh else "DIFFERENT"
    print(f"{verdict} (worst {worst:.2f} dB, threshold {args.thresh:g} dB)")
    return 0 if worst <= args.thresh else 1


if __name__ == "__main__":
    sys.exit(main())
