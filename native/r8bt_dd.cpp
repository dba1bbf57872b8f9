/* Deterministic double-double cepstral min-phase transform — the native
 * bit-for-bit mirror of r8brain_tpu/design/{dd,ddfft,minphase}.py.
 * See r8bt_dd.h for the contract and the -ffp-contract=off requirement.
 *
 * Primitives: Knuth two_sum + fma-based exact two_prod (equal to the
 * Python side's Dekker split); dd add/mul/div/sqrt follow the QD
 * library's accurate variants (Hida, Li, Bailey 2001) with the exact
 * statement order of design/dd.py — each binary64 rounding happens at
 * the same place in both implementations.  Transcendentals are
 * fixed-length polynomial schemes in dd itself; libm is never used in
 * the value path (frexp/ldexp/nearbyint/sqrt are exact or correctly
 * rounded by IEEE-754 and therefore platform-independent). */

#include "r8bt_dd.h"

#include <cmath>
#include <cstdint>
#include <limits>

namespace r8bt_dd {

struct dd {
    double hi, lo;
};

/* ---- error-free transforms (design/dd.py) ------------------------------ */

static inline dd two_sum(double a, double b) {
    const double s = a + b;
    const double bb = s - a;
    const double err = (a - (s - bb)) + (b - bb);
    return {s, err};
}

static inline dd quick_two_sum(double a, double b) {
    const double s = a + b;
    const double err = b - (s - a);
    return {s, err};
}

static inline dd two_prod(double a, double b) {
    const double p = a * b;
    const double err = std::fma(a, b, -p); /* exact == Dekker split */
    return {p, err};
}

/* ---- dd ring ops (QD accurate variants; statement order mirrored) ------ */

static inline dd dd_add(dd a, dd b) {
    dd s = two_sum(a.hi, b.hi);
    const dd t = two_sum(a.lo, b.lo);
    double s2 = s.lo + t.hi;
    s = quick_two_sum(s.hi, s2);
    s2 = s.lo + t.lo;
    s = quick_two_sum(s.hi, s2);
    return s;
}

static inline dd dd_neg(dd a) { return {-a.hi, -a.lo}; }

static inline dd dd_sub(dd a, dd b) { return dd_add(a, dd_neg(b)); }

static inline dd dd_mul(dd a, dd b) {
    dd p = two_prod(a.hi, b.hi);
    double p2 = p.lo + a.hi * b.lo;
    p2 = p2 + a.lo * b.hi;
    return quick_two_sum(p.hi, p2);
}

static inline dd dd_sqr(dd a) {
    dd p = two_prod(a.hi, a.hi);
    const double p2 = p.lo + (2.0 * a.hi) * a.lo;
    return quick_two_sum(p.hi, p2);
}

static inline dd dd_mul_f64(dd a, double b) {
    dd p = two_prod(a.hi, b);
    const double p2 = p.lo + a.lo * b;
    return quick_two_sum(p.hi, p2);
}

static inline dd dd_mul_pow2(dd a, double s) { return {a.hi * s, a.lo * s}; }

static inline dd dd_div(dd a, dd b) {
    const double q1 = a.hi / b.hi;
    dd r = dd_sub(a, dd_mul_f64(b, q1));
    const double q2 = r.hi / b.hi;
    r = dd_sub(r, dd_mul_f64(b, q2));
    const double q3 = r.hi / b.hi;
    const dd q = quick_two_sum(q1, q2);
    return dd_add(q, {q3, 0.0});
}

static inline dd dd_div_f64(dd a, double b) {
    const double q1 = a.hi / b;
    const dd p = two_prod(q1, b);
    const dd r = dd_sub(a, p);
    const double q2 = (r.hi + r.lo) / b;
    return quick_two_sum(q1, q2);
}

static inline dd dd_sqrt(dd a) {
    if (a.hi == 0.0) return {0.0, 0.0};
    const double x = 1.0 / std::sqrt(a.hi);
    const double ax = a.hi * x;
    const dd e = dd_sub(a, two_prod(ax, ax));
    const double corr = e.hi * (x * 0.5);
    return quick_two_sum(ax, corr);
}

/* ---- constants and fixed tables (built with the same dd op sequence) --- */

static const dd TWO_PI = {6.283185307179586, 2.4492935982947064e-16};
static const dd LN2 = {0.6931471805599453, 2.3190468138462996e-17};
static const dd ONE = {1.0, 0.0};
static const double SQRT_HALF = 0.7071067811865476;

static const int K_LOG = 24;
static const int K_TRIG = 24;

struct Tables {
    dd inv_fact[51];
    dd inv_odd[25];
    Tables() {
        inv_fact[0] = ONE;
        dd f = ONE;
        for (int k = 1; k < 51; ++k) {
            f = dd_mul_f64(f, (double)k);
            inv_fact[k] = dd_div(ONE, f);
        }
        for (int k = 0; k < 25; ++k)
            inv_odd[k] = dd_div(ONE, {(double)(2 * k + 1), 0.0});
    }
};

static const Tables &tables() {
    static const Tables t;
    return t;
}

static inline dd dd_signed(dd c, int j) { return (j % 2 == 0) ? c : dd_neg(c); }

/* ---- fixed-sequence transcendentals ------------------------------------ */

static dd dd_log(dd a) {
    /* a > 0.  a = m * 2^e, m in [sqrt(1/2), sqrt(2)); log m by the
     * atanh odd series (design/dd.py::log). */
    int e32;
    const double m0 = std::frexp(a.hi, &e32);
    double e = (double)e32;
    if (m0 < SQRT_HALF) e = e - 1.0;
    const int ei = -(int)e;
    const dd m = {std::ldexp(a.hi, ei), std::ldexp(a.lo, ei)};
    const dd z = dd_div(dd_sub(m, ONE), dd_add(m, ONE));
    const dd z2 = dd_sqr(z);
    const Tables &T = tables();
    dd acc = T.inv_odd[K_LOG];
    for (int k = K_LOG - 1; k >= 0; --k)
        acc = dd_add(T.inv_odd[k], dd_mul(acc, z2));
    return dd_add(dd_mul_f64(LN2, e), dd_mul_pow2(dd_mul(z, acc), 2.0));
}

static void dd_sincos(dd theta, dd &s_out, dd &c_out) {
    /* One 2*pi reduction (round-to-nearest-even quotient — np.rint /
     * std::nearbyint), then fixed-length Taylor on |r| <= pi + eps. */
    const double k = std::nearbyint(theta.hi / TWO_PI.hi);
    const dd r = dd_sub(theta, dd_mul_f64(TWO_PI, k));
    const dd z = dd_sqr(r);
    const Tables &T = tables();
    dd acc_c = dd_signed(T.inv_fact[2 * K_TRIG], K_TRIG);
    for (int j = K_TRIG - 1; j >= 0; --j)
        acc_c = dd_add(dd_signed(T.inv_fact[2 * j], j), dd_mul(acc_c, z));
    dd acc_s = dd_signed(T.inv_fact[2 * K_TRIG + 1], K_TRIG);
    for (int j = K_TRIG - 1; j >= 0; --j)
        acc_s = dd_add(dd_signed(T.inv_fact[2 * j + 1], j), dd_mul(acc_s, z));
    s_out = dd_mul(r, acc_s);
    c_out = acc_c;
}

/* ---- complex dd FFT (design/ddfft.py) ----------------------------------- */

struct cdd {
    dd re, im;
};

static inline cdd cmul(cdd a, cdd b) {
    /* operand order matters bitwise: a is the accumulating value /
     * butterfly input, b the twiddle (mirrors _cmul's argument order) */
    return {dd_sub(dd_mul(a.re, b.re), dd_mul(a.im, b.im)),
            dd_add(dd_mul(a.re, b.im), dd_mul(a.im, b.re))};
}

static inline cdd csqr(cdd a) {
    return {dd_sub(dd_sqr(a.re), dd_sqr(a.im)),
            dd_mul_pow2(dd_mul(a.re, a.im), 2.0)};
}

static std::vector<cdd> twiddle_table(size_t n, bool inverse) {
    /* w[j] = exp(sign * 2*pi*i * j / n), j < n/2: primitive root by the
     * dd sin/cos of the EXACT power-of-two angle, power-of-two roots by
     * repeated squaring, w^j by binary decomposition of j — identical
     * per-element product chains to design/ddfft.py::_twiddle_table. */
    const size_t half = n / 2;
    const double sign = inverse ? 1.0 : -1.0;
    const dd theta = dd_mul_pow2(TWO_PI, sign / (double)n);
    dd s, c;
    dd_sincos(theta, s, c);
    int bits = 0;
    while (((size_t)1 << (bits + 1)) <= half) ++bits;
    if (half <= 1) bits = 0;
    std::vector<cdd> sq((size_t)(bits > 0 ? bits : 1));
    sq[0] = {c, s};
    for (int b = 1; b < bits; ++b) sq[(size_t)b] = csqr(sq[(size_t)b - 1]);
    std::vector<cdd> w(half, {{1.0, 0.0}, {0.0, 0.0}});
    for (int b = 0; b < bits; ++b)
        for (size_t j = 0; j < half; ++j)
            if ((j >> b) & 1) w[j] = cmul(w[j], sq[(size_t)b]);
    return w;
}

static void cfft_dd(std::vector<cdd> &a, bool inverse) {
    const size_t n = a.size();
    /* bit-reverse permutation (same reordering as _bit_reverse_idx) */
    for (size_t i = 1, j = 0; i < n; ++i) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) std::swap(a[i], a[j]);
    }
    const std::vector<cdd> w = twiddle_table(n, inverse);
    for (size_t m = 1; m < n; m <<= 1) {
        const size_t stride = (n / 2) / m;
        for (size_t i = 0; i < n; i += 2 * m) {
            for (size_t k = 0; k < m; ++k) {
                const cdd u = a[i + k];
                const cdd v = cmul(a[i + k + m], w[k * stride]);
                a[i + k] = {dd_add(u.re, v.re), dd_add(u.im, v.im)};
                a[i + k + m] = {dd_sub(u.re, v.re), dd_sub(u.im, v.im)};
            }
        }
    }
    if (inverse) {
        const double s = 1.0 / (double)n; /* n pow2: exact */
        for (auto &v : a) {
            v.re = dd_mul_pow2(v.re, s);
            v.im = dd_mul_pow2(v.im, s);
        }
    }
}

/* ---- minimum-phase transform (design/minphase.py::_min_phase_dd) ------- */

std::vector<double> minPhaseTransformDD(const std::vector<double> &kernel,
                                        int lenMult) {
    const size_t kernelLen = kernel.size();
    int lenBits = 1;
    while (((size_t)1 << lenBits) < kernelLen * (size_t)lenMult) ++lenBits;
    const size_t n = (size_t)1 << lenBits;
    const size_t n2 = n >> 1;
    const double tiny = std::numeric_limits<double>::min();
    const dd tiny_dd = {tiny, 0.0};

    std::vector<cdd> buf(n, {{0.0, 0.0}, {0.0, 0.0}});
    for (size_t i = 0; i < kernelLen; ++i) buf[i].re = {kernel[i], 0.0};
    cfft_dd(buf, false);

    std::vector<dd> mag(n2 + 1), logmag(n2 + 1);
    for (size_t i = 0; i <= n2; ++i)
        mag[i] = dd_sqrt(dd_add(dd_sqr(buf[i].re), dd_sqr(buf[i].im)));
    const dd dcVal = buf[0].re;
    const dd nyqVal = buf[n2].re;
    for (size_t i = 0; i <= n2; ++i) logmag[i] = dd_log(dd_add(mag[i], tiny_dd));
    const dd dcAbs = (dcVal.hi < 0) ? dd_neg(dcVal) : dcVal;
    const dd nyqAbs = (nyqVal.hi < 0) ? dd_neg(nyqVal) : nyqVal;
    logmag[0] = dd_log(dd_add(dcAbs, tiny_dd));
    logmag[n2] = dd_log(dd_add(nyqAbs, tiny_dd));

    /* cep = irfft(logmag) */
    std::vector<cdd> full(n, {{0.0, 0.0}, {0.0, 0.0}});
    for (size_t i = 0; i <= n2; ++i) full[i].re = logmag[i];
    for (size_t i = 1; i < n2; ++i) full[n - i].re = logmag[i];
    cfft_dd(full, true);

    /* discrete Hilbert window (CDSPRealFFT.h:737-749) on the real part */
    std::vector<cdd> cep(n, {{0.0, 0.0}, {0.0, 0.0}});
    for (size_t i = 1; i < n2; ++i) cep[i].re = full[i].re;
    for (size_t i = n2 + 1; i < n; ++i) cep[i].re = dd_neg(full[i].re);
    cfft_dd(cep, false); /* theta = imag part at bins 0..n2 */

    std::vector<dd> outRe(n2 + 1), outIm(n2 + 1);
    for (size_t i = 0; i <= n2; ++i) {
        dd s, c;
        dd_sincos(cep[i].im, s, c);
        outRe[i] = dd_mul(mag[i], c);
        outIm[i] = dd_mul(mag[i], s);
    }
    outRe[0] = dcVal;
    outIm[0] = {0.0, 0.0};
    outRe[n2] = nyqVal;
    outIm[n2] = {0.0, 0.0};

    std::vector<cdd> outSpec(n, {{0.0, 0.0}, {0.0, 0.0}});
    for (size_t i = 0; i <= n2; ++i) outSpec[i] = {outRe[i], outIm[i]};
    for (size_t i = 1; i < n2; ++i)
        outSpec[n - i] = {outRe[i], dd_neg(outIm[i])};
    cfft_dd(outSpec, true);

    std::vector<double> out(kernelLen);
    for (size_t i = 0; i < kernelLen; ++i)
        out[i] = outSpec[i].re.hi + outSpec[i].re.lo;
    return out;
}

} // namespace r8bt_dd
