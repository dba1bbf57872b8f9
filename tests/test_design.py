"""Filter-design layer tests.

Mirrors the reference's component-level design validation
(other/calcErrorTable.cpp — attenuation error ~ 0, -3 dB point ~ -3.01;
SURVEY.md §4) plus structural checks on the generators.
"""

import math

import numpy as np
import pytest

from r8brain_tpu.design.fracbank import (build_frac_bank, default_filter_fracs,
                                         frac_win_params)
from r8brain_tpu.design.halfband import get_hb_filter
from r8brain_tpu.design.lpfilter import MIN_PHASE, build_lp_filter
from r8brain_tpu.design.minphase import min_phase_transform
from r8brain_tpu.design.sinc import (generate_band_kernel, generate_frac_kernel,
                                     generate_hilbert_kernel, generate_window)
from r8brain_tpu.design.wholestep import get_whole_stepping
from r8brain_tpu.utils.fir import calc_fir_group_delay
from r8brain_tpu.utils.math import besselI0, bit_occupancy
from r8brain_tpu.utils.scan import find_level_rtol, response_mag


def test_bessel_i0():
    # Abramowitz-Stegun approximation: <~5e-7 relative accuracy vs exact
    # (A&S 9.8.1/9.8.2 error bounds); the point is formula-level parity
    # with the reference, not exactness.
    from scipy.special import i0 as scipy_i0

    for x in (0.0, 0.5, 1.0, 3.0, 3.75, 5.0, 20.0, 125.0):
        assert abs(besselI0(x) - scipy_i0(x)) <= 1e-6 * scipy_i0(x) + 1e-12


def test_bit_occupancy():
    assert bit_occupancy(0) == 1
    assert bit_occupancy(1) == 1
    assert bit_occupancy(2) == 2
    assert bit_occupancy(255) == 8
    assert bit_occupancy(256) == 9
    assert bit_occupancy((1 << 20) - 1) == 20


def test_band_kernel_symmetry_and_dc():
    k, fl2 = generate_band_kernel(50.25, 0.0, 0.4 * np.pi)
    assert k.shape[0] == 2 * fl2 + 1
    np.testing.assert_allclose(k, k[::-1], atol=0)
    # DC gain approx Freq2-band gain 1 (windowed): loose structural check
    assert 0.5 < k.sum() < 1.5


def test_hilbert_kernel_antisymmetry():
    k, fl2 = generate_hilbert_kernel(30.0)
    np.testing.assert_allclose(k, -k[::-1], atol=0)
    assert k[fl2] == 0.0
    # even offsets are zero
    assert np.all(k[fl2 + 2 :: 2] == 0.0)


def test_window_is_symmetric_peak_center():
    w = generate_window(20.0, "blackman")
    np.testing.assert_allclose(w, w[::-1], atol=0)
    assert np.argmax(w) == 20


@pytest.mark.parametrize("fd", [0.0, 0.25, 0.5, 0.75, 1.0])
def test_frac_kernel_delay(fd):
    """generateFrac semantics: FracDelay=0 -> latency fl2 (1-sample delay
    vs fl2-1), FracDelay=1 -> latency fl2-1 (CDSPSincFilterGen.h:52-56)."""
    beta, power, att, fltlen = frac_win_params(180.15, False)
    k, fl2 = generate_frac_kernel(fltlen / 2.0, fd,
                                  params=(beta, power), use_power=True)
    assert k.shape[0] == fltlen
    k = k / k.sum()
    gd = calc_fir_group_delay(k, 0.0)
    expected = fl2 - fd  # continuous delay between the two integer cases
    assert abs(gd - expected) < 2e-3


@pytest.mark.parametrize("tb,atten", [
    (0.7, 60.0), (2.0, 100.0), (2.0, 180.15), (5.0, 140.0),
    (12.0, 90.0), (30.0, 200.0), (45.0, 49.0), (0.5, 218.0),
])
def test_lp_filter_meets_spec(tb, atten):
    """calcErrorTable invariants (other/calcErrorTable.cpp:5-12): actual
    stop-band attenuation is ReqAtten+0.40..+4.46 dB
    (CDSPFIRFilter.h:583-586) and the -3 dB point lands within
    -3.00..-3.05 dB of the spec'd transition band edge
    (CDSPFIRFilter.h:577-582)."""
    nf = 0.5
    f = build_lp_filter(nf, tb, atten, req_gain=1.0)
    th_stop = np.linspace(nf * np.pi * (1 + 1e-4), np.pi, 4000)
    stop_max_db = 20 * np.log10(response_mag(f.kernel, th_stop).max() + 1e-300)
    assert -atten - 8.0 < stop_max_db < -atten + 0.5, stop_max_db

    lvl = 10 ** (-3.0 / 20.0)
    lvl_lo = 10 ** (-3.05 / 20.0)
    th_expect = nf * np.pi * (1.0 - tb / 100.0)
    m = response_mag(f.kernel, np.array([th_expect]))[0]
    assert lvl_lo * 0.995 <= m <= lvl * 1.005, m


def test_min_phase_transform_properties():
    k, _ = generate_band_kernel(60.0, 0.0, 0.4 * np.pi,
                                params=(10.0, 1.8), use_power=True)
    mk, gd = min_phase_transform(k, len_mult=16)
    # Magnitude response preserved where it matters; the transform smooths
    # the deep stop band (documented skew, CDSPFIRFilter.h:40-46), so only
    # compare above -80 dB of peak.
    th = np.linspace(0, np.pi, 512)
    m0 = response_mag(k, th)
    m1 = response_mag(mk, th)
    sel = m0 > m0.max() * 1e-4
    np.testing.assert_allclose(m1[sel], m0[sel], rtol=1e-3)
    # energy front-loaded, group delay small positive
    e = np.cumsum(mk ** 2) / np.sum(mk ** 2)
    assert np.searchsorted(e, 0.9) <= len(k) // 5
    assert 0.0 < gd < 30.0


def test_hb_filter_selection():
    hb = get_hb_filter(180.15, 0, False)
    assert hb.atten >= 180.15
    assert hb.num_taps == 11  # HBKernel_11A, -183.7962 dB
    # half-band property: dense kernel response at pi/2 is ~ 1 (gain 2 / 2)
    h = hb.dense_kernel()
    m = response_mag(h, np.array([0.0, np.pi / 2]))
    np.testing.assert_allclose(m[0], 2.0, rtol=1e-4)
    np.testing.assert_allclose(m[1], 1.0, rtol=1e-9)
    # steep index clamps
    hb7 = get_hb_filter(100.0, 9, False)
    assert hb7.atten >= 100.0


def test_hb_filter_stopband():
    hb = get_hb_filter(180.15, 0, False)
    h = hb.dense_kernel()
    # class A (steepness /4): stop band is [0.75*pi, pi]
    th = np.linspace(0.75 * np.pi, np.pi, 2000)
    stop_db = 20 * np.log10(response_mag(h, th).max() / 2.0)
    assert stop_db < -180.0


def test_frac_bank_whole():
    b = build_frac_bank(160, 1, 2, 180.15, False)
    assert b.table.shape == (160, 24)
    np.testing.assert_allclose(b.table.sum(axis=1), 1.0, atol=1e-12)
    # each row is a fractional delay filter: group delay fl2-1+f/fracs
    for f in (0, 53, 159):
        gd = calc_fir_group_delay(b.table[f], 0.0)
        expected = (b.filter_len // 2 - 1) + f / 160.0
        assert abs(gd - expected) < 1e-3, (f, gd, expected)


def test_frac_bank_poly_matches_rows():
    b = build_frac_bank(64, 3, 8, 109.56, False)
    assert b.mode == "poly2"
    # at x=0 the polynomial equals the row filter; rows have DC gain 1
    np.testing.assert_allclose(b.table[:, :, 0].sum(axis=1), 1.0, atol=1e-12)


def test_default_fracs():
    assert default_filter_fracs(182.1076) == math.ceil(6.4 ** (182.1076 / 50))


def test_whole_stepping():
    assert get_whole_stepping(88200.0, 96000.0) == (147, 160)
    assert get_whole_stepping(96000.0, 44100.0) == (320, 147)
    assert get_whole_stepping(44100.0, 44100.0 * math.pi) is None
    # OutStep > 1500 rejected
    assert get_whole_stepping(44100.0, 44101.0) is None


class TestLdFFT:
    """Extended-precision FFT backing the min-phase transform
    (design/ldfft.py) — correctness vs numpy and the precision claim."""

    def test_matches_numpy_fft(self):
        from r8brain_tpu.design.ldfft import fft_ld

        rng = np.random.default_rng(1)
        for n in (4, 64, 1024):
            x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
            got = np.asarray(fft_ld(x), dtype=np.complex128)
            ref = np.fft.fft(x)
            assert np.abs(got - ref).max() < 1e-13 * np.abs(ref).max()
            back = np.asarray(fft_ld(ref, inverse=True),
                              dtype=np.complex128)
            assert np.abs(back - x).max() < 1e-13

    def test_extended_precision_roundtrip(self):
        # the whole point: roundtrip noise must be far below f64 eps
        from r8brain_tpu.design.ldfft import HAVE_LONGDOUBLE, fft_ld

        if not HAVE_LONGDOUBLE:
            pytest.skip("platform long double is f64")
        rng = np.random.default_rng(2)
        x = rng.standard_normal(4096)
        xr = fft_ld(fft_ld(x), inverse=True)
        assert float(np.abs(xr.real - x).max()) < 1e-17

    def test_rejects_non_pow2(self):
        from r8brain_tpu.design.ldfft import fft_ld

        with pytest.raises(ValueError):
            fft_ld(np.zeros(12))
