"""Quality sweeps mirroring the reference's bench tools (SURVEY.md §4).

* Round-trip zeroing test (bench/zerotest.cpp): resample up by k/20 then
  back down; the difference vs the original must vanish inside the shared
  passband (the comparison is band-limited to 90% of Nyquist, making it
  insensitive to transition-band loss, zerotest.cpp:62-84).
* SNR sweep (bench/snrtest.cpp): white-noise round trips across the
  attenuation range; achieved SNR must track ReqAtten (the reference
  documents achieved ~ ReqAtten, with +9 dB slack advised).
* Latency-query consistency (zerotest.cpp:115-128): the closed-form
  get_input_required_for_output must agree with one-sample-at-a-time
  streaming emission.

The sweeps run on the CPU oracle (already golden-validated against the
compiled reference) — they guard the *planner + filter design* across the
parameter space; TPU-path parity with the oracle is covered per-config in
test_tpu_exec.py.
"""

import numpy as np
import pytest

from r8brain_tpu.models.oracle import OracleResampler

from .helpers import lcg_uniform, rms_db


from .helpers import band_limited_rms_db as _band_limited_rms_diff


RATIOS = [21, 25, 30, 33, 40, 41, 47, 55, 60, 64, 80, 100, 120, 160, 200,
          240, 320, 400, 512, 640]  # k/20, spanning the reference's sweep


@pytest.mark.parametrize("k", RATIOS)
def test_round_trip_zeroing(k):
    src = 44100.0
    dst = src * k / 20.0
    atten = 160.0
    n = 12000
    x = lcg_uniform(k, n)
    up = OracleResampler(src, dst, 2048, 2.0, atten, 0)
    dn = OracleResampler(dst, src, 2048, 2.0, atten, 0)
    mid = up.oneshot(x, int(np.floor(n * dst / src)))
    y = dn.oneshot(mid, n)
    d = _band_limited_rms_diff(y, x)
    assert d < -(atten - 20.0), f"k={k}: {d:.1f} dB"


@pytest.mark.parametrize("atten", [49.0, 73.0, 97.0, 121.0, 145.0, 169.0,
                                   193.0, 218.0])
def test_snr_tracks_atten(atten):
    src, k = 44100.0, 37
    dst = src * k / 20.0
    n = 9000
    x = lcg_uniform(int(atten), n)
    up = OracleResampler(src, dst, 2048, 2.0, atten, 0)
    dn = OracleResampler(dst, src, 2048, 2.0, atten, 0)
    mid = up.oneshot(x, int(np.floor(n * dst / src)))
    y = dn.oneshot(mid, n)
    d = _band_limited_rms_diff(y, x)
    assert d < -(atten - 15.0), f"atten={atten}: {d:.1f} dB"


@pytest.mark.parametrize("cfg", [(44100, 96000), (96000, 44100),
                                 (44100, 48000), (44100, 96001)])
def test_latency_query_consistency(cfg):
    """get_input_required_for_output(n) must be the exact minimal input
    count: feeding one sample fewer yields < n outputs; feeding it yields
    >= n (the iterative validation of CDSPResampler.h:443-464)."""
    src, dst = cfg
    rs = OracleResampler(src, dst, 64, 2.0, 140.0, 0)
    x = lcg_uniform(1, 20000)
    for n_out in (1, 7, 100, 1000):
        need = rs.get_input_required_for_output(n_out)
        rs.clear()
        got = 0
        for i in range(0, need, 64):
            got += rs.process(x[i : min(i + 64, need)]).shape[0]
        assert got >= n_out, (cfg, n_out, need, got)
        rs.clear()
        got = 0
        for i in range(0, need - 1, 64):
            got += rs.process(x[i : min(i + 64, need - 1)]).shape[0]
        assert got < n_out, (cfg, n_out, need, got)


def test_zerotest_random_mode_smoke():
    """Guards tools/zerotest.py --random (the slow tier runs 150+ cases;
    this pins the mode's plumbing and threshold handling in CI)."""
    from tools.zerotest import main

    assert main(["--impl", "f32", "--cpu", "--random", "2",
                 "--atten", "160", "--n", "4000"]) == 0


def test_mass_randomized_ratios():
    """masstest.cpp analog: randomized non-integer ratios and chunk sizes
    through oracle streaming; totals must match the closed-form emission
    algebra and the output must be finite."""
    rng = np.random.default_rng(42)
    from r8brain_tpu.models.lengths import chain_out_len

    for trial in range(12):
        src = 44100.0
        dst = src * (1.0 + 44.0 * rng.random())
        if rng.random() < 0.5:
            src, dst = dst, src
        tb = 0.5 + 4.5 * rng.random()
        rs = OracleResampler(src, dst, 1024, tb, 140.0, 0)
        n = int(rng.integers(2000, 6000))
        x = lcg_uniform(trial, n)
        total = 0
        pos = 0
        while pos < n:
            c = int(rng.integers(1, 1200))
            y = rs.process(x[pos : pos + c])
            assert np.all(np.isfinite(y))
            total += y.shape[0]
            pos += c
        assert total == chain_out_len(rs.plan.stages, n)
