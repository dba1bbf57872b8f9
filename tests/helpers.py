"""Shared test helpers: deterministic signals and golden-file loading."""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parent / "goldens"

_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407
_LCG_M = (1 << 64) - 1


def lcg_uniform(seed: int, n: int) -> np.ndarray:
    """Deterministic uniform [-1, 1) signal; bit-identical to the LCG in
    tools/make_goldens.cpp."""
    s = (seed * _LCG_A + _LCG_C) & _LCG_M
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        s = (s * _LCG_A + _LCG_C) & _LCG_M
        out[i] = (s >> 11) / 9007199254740992.0 * 2.0 - 1.0
    return out


def load_golden(name: str):
    """Returns (latency_frac, queries[16], out[outlen])."""
    path = GOLDEN_DIR / name
    with open(path, "rb") as f:
        (outlen,) = struct.unpack("<q", f.read(8))
        (lf,) = struct.unpack("<d", f.read(8))
        q = np.frombuffer(f.read(16 * 8), dtype=np.int64)
        out = np.frombuffer(f.read(), dtype=np.float64)
    assert out.shape[0] == outlen
    return lf, q, out


def load_manifest():
    return json.loads((GOLDEN_DIR / "manifest.json").read_text())


def rms_db(diff: np.ndarray) -> float:
    """10*log10(mean(diff^2)) — the convention of bench/rmscompare.cpp:127-138
    and bench/zerotest.cpp (RMS of difference in dB re full scale)."""
    return 10.0 * np.log10(np.mean(np.square(diff)) + 1e-300)


def drum_like(n: int, rate: float = 44100.0, seed: int = 7) -> np.ndarray:
    """Synthesized percussive wideband test signal (the golden WAVs of
    bench/ are stripped from the reference mirror; SURVEY.md §4)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = np.zeros(n)
    # decaying tonal hits
    for f0, t0, dec in ((55.0, 0.01, 18.0), (220.0, 0.12, 25.0),
                        (880.0, 0.22, 40.0), (3520.0, 0.30, 60.0)):
        idx = t >= t0
        x[idx] += np.sin(2 * np.pi * f0 * (t[idx] - t0)) * np.exp(
            -dec * (t[idx] - t0))
    # noise bursts
    env = np.exp(-30.0 * np.mod(t, 0.17))
    x += 0.4 * rng.standard_normal(n) * env
    x /= np.max(np.abs(x)) * 1.05
    return x


def band_limited_rms_db(y: np.ndarray, x: np.ndarray, frac: float = 0.9,
                        skip: int = 1000) -> float:
    """RMS (dB) of (y - x) restricted to ``frac`` of the band, skipping
    ``skip`` samples at each end (rmscompare.cpp:72-86 edge skip +
    zerotest.cpp:62-84 band limiting)."""
    n = min(len(x), len(y)) - 2 * skip
    d = y[skip : skip + n] - x[skip : skip + n]
    D = np.fft.rfft(d * np.hanning(n))
    k = int(frac * len(D))
    num = np.sqrt(np.mean(np.abs(D[:k]) ** 2) / (n / 4))
    return 20 * np.log10(num / np.sqrt(n) + 1e-300)
