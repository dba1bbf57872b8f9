"""Oracle vs compiled-reference goldens.

The goldens in tests/goldens/ were produced by running the actual
r8brain-free-src CDSPResampler (compiled from the reference headers by
tools/gen_goldens.py).  The CPU oracle must reproduce them within the
tolerance of each config class:

  exact     — only f64 FFT-algorithm noise differs            (< -250 dB)
  pow2down  — the reference decimates pow2 factors by spectral truncation
              (CDSPRealFFT half-length output FFT) instead of exact
              decimation; the difference is the filter's stopband leakage
                                                              (< -190 dB)
  poly      — polynomial-interpolator timing recompute noise  (< -220 dB)
  minphase  — min-phase cepstral transform conditioning between two f64
              FFT implementations (the reference documents random skew,
              CDSPFIRFilter.h:40-46)                          (< -145 dB)

All bounds sit far below the library's own golden-equality threshold of
-141 dB RMS (bench/README.md:9-11).
"""

import numpy as np
import pytest

from r8brain_tpu.models.oracle import OracleResampler

from .helpers import lcg_uniform, load_golden, load_manifest, rms_db

TOL_DB = {
    "exact": -250.0,
    "pow2down": -190.0,
    "poly": -220.0,
    "minphase": -145.0,
}

MANIFEST = load_manifest()


@pytest.mark.parametrize("cfg", MANIFEST, ids=[c["label"] for c in MANIFEST])
def test_oracle_matches_reference(cfg):
    x = lcg_uniform(cfg["seed"], cfg["inlen"])
    rs = OracleResampler(
        float(cfg["src"]), float(cfg["dst"]), cfg["maxinlen"], cfg["tb"],
        cfg["atten"], cfg["phase"],
    )
    lf_ref, _q, ref = load_golden(cfg["file"])
    y = rs.oneshot(x, cfg["outlen"])
    assert rms_db(y - ref) < TOL_DB[cfg["tol_class"]], cfg["label"]
    # min-phase latency comes from the ill-conditioned transform's group
    # delay; allow transform-level noise there.
    lf_tol = 1e-6 if cfg["tol_class"] == "minphase" else 1e-12
    assert abs(rs.latency_frac - lf_ref) < lf_tol


@pytest.mark.parametrize(
    "cfg",
    [c for c in MANIFEST if c["tol_class"] == "exact"][:6],
    ids=[c["label"] for c in MANIFEST if c["tol_class"] == "exact"][:6],
)
def test_oracle_chunking_invariance(cfg):
    """Output content must not depend on process() chunk segmentation
    (the reference's overlap-save streaming guarantees this; so must the
    oracle's)."""
    x = lcg_uniform(cfg["seed"], 4000)
    outlen = int(3000 * cfg["dst"] / cfg["src"])

    rs = OracleResampler(float(cfg["src"]), float(cfg["dst"]), 4000,
                         cfg["tb"], cfg["atten"], cfg["phase"])
    y_big = rs.oneshot(x, outlen)

    rs2 = OracleResampler(float(cfg["src"]), float(cfg["dst"]), 173,
                          cfg["tb"], cfg["atten"], cfg["phase"])
    y_small = rs2.oneshot(x, outlen)
    np.testing.assert_allclose(y_small, y_big, rtol=0, atol=1e-12)
