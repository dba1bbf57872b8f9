"""Deterministic double-double min-phase transform (design/dd.py,
design/ddfft.py, native/r8bt_dd.cpp).

The dd backend's contract is stronger than the reference's (which
documents random high-atten min-phase skew, CDSPFIRFilter.h:40-46) and
stronger than the round-2 long-double path (x86-only): the transform is
built from IEEE-754 binary64 primitives with no libm in the value path,
so it produces the SAME BITS on every conforming platform — and the
native C++ mirror must reproduce the Python result EXACTLY, tap for tap,
bit for bit.  These tests pin:

  * dd primitive accuracy (log / sincos / sqrt / FFT) against mpmath at
    250-bit precision — each must sit at the df64 noise floor (~1e-28),
    ~1e10x below 80-bit long double;
  * Python <-> native BIT-IDENTITY of the full transform on real
    designed kernels at the deepest supported attenuations;
  * dd <-> ld agreement at the long-double path's own noise level
    (~1e-7 taps at atten 218) — evidence the two independent
    formulations compute the same transform;
  * backend selection plumbing (R8B_MINPHASE_BACKEND).
"""

import ctypes
import math
import os
import shutil

import numpy as np
import pytest

from r8brain_tpu.design import dd
from r8brain_tpu.design.dd import DD
from r8brain_tpu.design.ddfft import CDD, cfft_dd
from r8brain_tpu.design.minphase import _min_phase_dd, min_phase_transform

mp = pytest.importorskip("mpmath")
mp.mp.prec = 250


def _dd_to_mp(a):
    return [mp.mpf(float(h)) + mp.mpf(float(l))
            for h, l in zip(np.atleast_1d(a.hi), np.atleast_1d(a.lo))]


def _kernel(atten):
    from r8brain_tpu.design.lpfilter import build_lp_filter

    lp = build_lp_filter(0.5, 2.0, atten, 0)  # linear phase input
    return np.ascontiguousarray(np.asarray(lp.kernel, dtype=np.float64))


class TestPrimitives:
    def test_log_vs_mpmath(self):
        rng = np.random.default_rng(11)
        xs = np.concatenate([
            rng.uniform(1e-12, 1.0, 40), rng.uniform(1.0, 1e6, 40),
            np.array([np.finfo(np.float64).tiny, 1e-300, 0.5, 1.0, 2.0]),
        ])
        r = dd.log(dd.dd_from(xs))
        err = max(abs(v - mp.log(mp.mpf(float(x))))
                  for v, x in zip(_dd_to_mp(r), xs))
        assert float(err) < 1e-28

    def test_sincos_vs_mpmath(self):
        rng = np.random.default_rng(12)
        th = np.concatenate([rng.uniform(-1e4, 1e4, 80),
                             np.array([0.0, np.pi, -np.pi, 12345.6789])])
        s, c = dd.sincos(dd.dd_from(th))
        es = max(abs(v - mp.sin(mp.mpf(float(x))))
                 for v, x in zip(_dd_to_mp(s), th))
        ec = max(abs(v - mp.cos(mp.mpf(float(x))))
                 for v, x in zip(_dd_to_mp(c), th))
        assert float(es) < 1e-27 and float(ec) < 1e-27

    def test_sqrt_div(self):
        rng = np.random.default_rng(13)
        xs = rng.uniform(1e-10, 1e10, 60)
        r = dd.sqrt(dd.dd_from(xs))
        err = max(abs(v - mp.sqrt(mp.mpf(float(x)))) / mp.sqrt(mp.mpf(float(x)))
                  for v, x in zip(_dd_to_mp(r), xs))
        assert float(err) < 1e-31
        q = dd.div(dd.dd_from(xs), dd.dd_from(xs[::-1].copy()))
        err = max(abs(v - mp.mpf(float(a)) / mp.mpf(float(b))) /
                  (mp.mpf(float(a)) / mp.mpf(float(b)))
                  for v, a, b in zip(_dd_to_mp(q), xs, xs[::-1]))
        assert float(err) < 1e-31
        z = dd.sqrt(dd.dd_from(np.array([0.0, 4.0])))
        assert z.hi[0] == 0.0 and z.hi[1] == 2.0

    def test_fft_vs_mp_dft(self):
        rng = np.random.default_rng(14)
        n = 32
        x = rng.standard_normal(n)
        X = cfft_dd(CDD(dd.dd_from(x), dd.dd_from(np.zeros(n))))
        Xr, Xi = _dd_to_mp(X.re), _dd_to_mp(X.im)
        werr = mp.mpf(0)
        for k in range(n):
            acc = mp.mpc(0)
            for j in range(n):
                acc += mp.mpf(float(x[j])) * mp.e ** (-2j * mp.pi * j * k / n)
            werr = max(werr, abs(acc.real - Xr[k]), abs(acc.imag - Xi[k]))
        assert float(werr) < 1e-28

    def test_fft_roundtrip_exact_to_f64(self):
        rng = np.random.default_rng(15)
        n = 4096
        x = rng.standard_normal(n)
        X = cfft_dd(CDD(dd.dd_from(x), dd.dd_from(np.zeros(n))))
        y = cfft_dd(X, inverse=True)
        assert np.array_equal(dd.to_f64(y.re), x)
        assert float(np.max(np.abs(dd.to_f64(y.im)))) < 1e-28


class TestTransform:
    def test_dd_vs_ld_at_deepest_atten(self):
        """The two independent high-precision formulations agree at the
        LONG-DOUBLE path's own noise level (dd is ~1e10x more accurate,
        so the diff measures ld's error)."""
        k = _kernel(218.0)
        old = os.environ.get("R8B_MINPHASE_BACKEND")
        try:
            os.environ["R8B_MINPHASE_BACKEND"] = "ld"
            out_ld, gd_ld = min_phase_transform(k, 16)
            os.environ["R8B_MINPHASE_BACKEND"] = "dd"
            out_dd, gd_dd = min_phase_transform(k, 16)
        finally:
            if old is None:
                os.environ.pop("R8B_MINPHASE_BACKEND", None)
            else:
                os.environ["R8B_MINPHASE_BACKEND"] = old
        from r8brain_tpu.design.ldfft import HAVE_LONGDOUBLE

        if not HAVE_LONGDOUBLE:
            pytest.skip("no extended-precision long double on this ABI")
        d = np.abs(out_ld - out_dd).max()
        assert d < 1e-6, d                  # measured 1.7e-7
        assert abs(gd_ld - gd_dd) < 1e-5    # measured 9e-7

    def test_f64_backend_reproduces_reference_randomness_scale(self):
        """The f64 comparison backend differs from dd by the documented
        f64 skew scale (measured 1.2e-4 at atten 218) — far above dd/ld
        agreement, confirming the backends are actually distinct."""
        k = _kernel(218.0)
        old = os.environ.get("R8B_MINPHASE_BACKEND")
        try:
            os.environ["R8B_MINPHASE_BACKEND"] = "f64"
            out_f64, _ = min_phase_transform(k, 16)
            os.environ["R8B_MINPHASE_BACKEND"] = "dd"
            out_dd, _ = min_phase_transform(k, 16)
        finally:
            if old is None:
                os.environ.pop("R8B_MINPHASE_BACKEND", None)
            else:
                os.environ["R8B_MINPHASE_BACKEND"] = old
        d = np.abs(out_f64 - out_dd).max()
        assert 1e-9 < d < 1e-2, d

    def test_bad_backend_rejected(self):
        old = os.environ.get("R8B_MINPHASE_BACKEND")
        try:
            os.environ["R8B_MINPHASE_BACKEND"] = "quad"
            with pytest.raises(ValueError):
                min_phase_transform(np.ones(17), 16)
        finally:
            if old is None:
                os.environ.pop("R8B_MINPHASE_BACKEND", None)
            else:
                os.environ["R8B_MINPHASE_BACKEND"] = old


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
class TestNativeMirror:
    @pytest.fixture(scope="class")
    def lib(self):
        from r8brain_tpu.native import build_library, load_library

        build_library()
        lib = load_library()
        lib.r8bt_minphase_dd.restype = ctypes.c_int
        lib.r8bt_minphase_dd.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        return lib

    @pytest.mark.parametrize("atten", [136.45, 180.15, 218.0])
    def test_bit_identity_python_vs_native(self, lib, atten):
        """SAME kernel through both implementations -> SAME BITS.  This
        is the cross-designer reproducibility guarantee the reference
        explicitly does not have (CDSPFIRFilter.h:40-46)."""
        k = _kernel(atten)
        len_bits = max(1, int(math.ceil(math.log2(k.size * 16))))
        n = 1 << len_bits
        py = _min_phase_dd(k, n, n >> 1)
        out = np.empty_like(k)
        rc = lib.r8bt_minphase_dd(
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k.size, 16,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        assert rc == 0
        assert np.array_equal(py, out), (
            f"{int(np.sum(py != out))} of {k.size} taps differ; "
            f"max {np.abs(py - out).max():.3e}")

    def test_invalid_args(self, lib):
        out = np.zeros(4)
        assert lib.r8bt_minphase_dd(None, 4, 16, None) == -1
        k = np.ones(4)
        assert lib.r8bt_minphase_dd(
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), 0, 16,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))) == -1
