#!/usr/bin/env python3
"""Generate golden test data by compiling and running the r8brain-free-src
reference (headers at /root/reference) via tools/make_goldens.cpp.

Writes tests/goldens/*.bin plus a manifest (tests/goldens/manifest.json)
describing each config and the comparison tolerance class.  The goldens are
committed so the test-suite runs without the C++ toolchain / reference tree.

Tolerance classes (see tests/test_goldens.py):
  exact      — pure linear-phase integer paths: f64 FFT noise only
  pow2down   — reference decimates by spectral truncation, leaking
               stopband-level alias differences vs exact decimation
  poly       — polynomial-mode interpolator timing-recompute noise
  minphase   — cepstral min-phase transform conditioning between two f64
               FFT implementations (reference itself documents random skew,
               CDSPFIRFilter.h:40-46)
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GOLDEN_DIR = REPO / "tests" / "goldens"
REF = "/root/reference"

# (src, dst, tb, atten, phase, inlen, maxinlen, tol_class, label)
CONFIGS = [
    (44100, 96000, 2.0, 180.15, 0, 8000, 521, "exact", "up_44k_96k"),
    (96000, 44100, 2.0, 180.15, 0, 8000, 700, "exact", "down_96k_44k"),
    (44100, 48000, 2.0, 180.15, 0, 8000, 521, "exact", "up_44k_48k"),
    (48000, 44100, 2.0, 180.15, 0, 8000, 521, "exact", "down_48k_44k"),
    (44100, 88200, 2.0, 180.15, 0, 8000, 521, "exact", "x2_up"),
    (88200, 44100, 2.0, 180.15, 0, 8000, 521, "pow2down", "x2_down"),
    (44100, 33075, 2.0, 180.15, 0, 8000, 521, "pow2down", "r3_4"),
    (44100, 29400, 2.0, 180.15, 0, 8000, 521, "exact", "r2_3"),
    (44100, 66150, 2.0, 180.15, 0, 8000, 521, "pow2down", "r3_2"),
    (44100, 14700, 2.0, 180.15, 0, 8000, 521, "exact", "r1_3"),
    (44100, 176400, 2.0, 180.15, 0, 8000, 521, "exact", "x4_up_hb"),
    (44100, 529200, 2.0, 180.15, 0, 4000, 250, "exact", "x12_up_hb3"),
    (176400, 44100, 2.0, 180.15, 0, 16000, 2000, "pow2down", "x4_down_hb"),
    (2822400, 96000, 2.0, 180.15, 0, 120000, 8000, "exact", "sacd_to_96k"),
    (96000, 2822400, 2.0, 180.15, 0, 2000, 128, "exact", "to_dsd_interm"),
    (44100, 96001, 2.0, 180.15, 0, 8000, 521, "poly", "poly_96001"),
    (20000, 43700, 3.1, 149.3, 0, 8000, 777, "exact", "rand_ratio"),
    (44100, 96000, 2.0, 136.45, 0, 8000, 521, "exact", "preset16"),
    (44100, 96000, 2.0, 109.56, 0, 8000, 521, "exact", "preset16ir"),
    (44100, 96000, 2.0, 206.91, 0, 8000, 521, "exact", "preset_def"),
    (44100, 96000, 3.0, 120.0, 1, 8000, 521, "minphase", "minph_up"),
    (96000, 44100, 3.0, 120.0, 1, 8000, 521, "minphase", "minph_down"),
    (44100, 22050, 3.0, 120.0, 1, 8000, 521, "minphase", "minph_x2dn"),
    (44100, 96000, 0.8, 218.0, 0, 8000, 521, "exact", "max_atten"),
    (44100, 96000, 25.0, 49.0, 0, 8000, 521, "exact", "min_atten"),
]

SEED = 12345


def main():
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    exe = "/tmp/r8b_make_goldens"
    subprocess.run(
        ["g++", "-O2", f"-I{REF}", "-o", exe,
         str(REPO / "tools" / "make_goldens.cpp")],
        check=True,
    )
    manifest = []
    for (src, dst, tb, att, ph, inlen, mil, tol, label) in CONFIGS:
        outlen = int(inlen * dst / src)
        path = GOLDEN_DIR / f"{label}.bin"
        subprocess.run(
            [exe, str(src), str(dst), str(tb), str(att), str(ph),
             str(inlen), str(outlen), str(mil), str(SEED), str(path)],
            check=True,
        )
        manifest.append(dict(
            src=src, dst=dst, tb=tb, atten=att, phase=ph, inlen=inlen,
            outlen=outlen, maxinlen=mil, seed=SEED, tol_class=tol,
            label=label, file=path.name,
        ))
        print("wrote", path.name, outlen, "samples")
    (GOLDEN_DIR / "manifest.json").write_text(json.dumps(manifest, indent=1))
    print("manifest:", len(manifest), "configs")


if __name__ == "__main__":
    main()
