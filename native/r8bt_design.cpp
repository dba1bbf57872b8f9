/* r8bt_design.cpp — native (C++) filter designer + pipeline planner.
 *
 * Makes the native engine fully standalone: r8bt_create(src, dst, tb, res)
 * designs the whole stage chain from sample rates alone, exactly like the
 * reference DLL's r8b_create (DLL/r8bsrc.cpp:29-66), with no Python in the
 * loop.  The design math is the same model the Python design layer
 * implements (and validates against the compiled reference):
 *
 *   - closed-form LP filter parameter fits        (CDSPFIRFilter.h:222-448)
 *   - Kaiser windowed-sinc band/frac kernels      (CDSPSincFilterGen.h)
 *   - cepstral minimum-phase transform            (CDSPRealFFT.h:681-785)
 *   - half-band tap table selection               (CDSPHBUpsampler.h:47-552)
 *   - fractional-delay filter banks + spline form (CDSPFracInterpolator.h)
 *   - the five-branch planner decision tree       (CDSPResampler.h:117-394)
 *
 * Baked design data comes from r8bt_tables.inc, generated from the
 * canonical copy in r8brain_tpu/design/_tables.py by
 * tools/gen_native_tables.py.
 *
 * The planner output is serialized to the engine's plan-blob format and
 * instantiated through the public r8bt_create_from_blob entry point, so
 * natively-designed and Python-designed engines share one execution path.
 * r8bt_design_blob exposes the raw blob for byte-level parity tests against
 * the Python designer (tests/test_native_design.py).
 *
 * Everything here runs once at create time; clarity over speed.
 */

#include "r8bt.h"
#include "r8bt_dd.h"

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

#include "r8bt_tables.inc"

const double kPi = 3.14159265358979323846;

/* ---- scalar math (utils/math.py; r8bbase.h:1067-1212) ------------------ */

double besselI0(double x) {
    const double ax = std::fabs(x);
    if (ax < 3.75) {
        double y = x / 3.75;
        y *= y;
        return 1.0 + y * (3.5156229 + y * (3.0899424 + y * (1.2067492 +
            y * (0.2659732 + y * (0.360768e-1 + y * 0.45813e-2)))));
    }
    const double y = 3.75 / ax;
    return std::exp(ax) / std::sqrt(ax) * (0.39894228 + y * (0.1328592e-1 +
        y * (0.225319e-2 + y * (-0.157565e-2 + y * (0.916281e-2 +
        y * (-0.2057706e-1 + y * (0.2635537e-1 + y * (-0.1647633e-1 +
        y * 0.392377e-2))))))));
}

double powA(double v, double p) {
    return std::exp(p * std::log(std::fabs(v) + 1e-300));
}

/* Kaiser window value at (possibly fractional) distance `pos` from the
 * window center; half-length len2 (design/sinc.py window_values). */
double kaiserWin(double pos, double len2, double beta, double power) {
    const double r = pos / len2;
    const double n = 1.0 - r * r;
    double w = (n <= 0.0) ? 0.0 : besselI0(beta * std::sqrt(n));
    w /= besselI0(beta);
    if (power >= 0.0) w = powA(w, power);
    return w;
}

/* ---- FIR analysis (utils/fir.py; r8bbase.h:819-961) --------------------- */

void firResponse(const std::vector<double> &flt, double th,
                 double &re, double &im) {
    re = 0.0;
    im = 0.0;
    for (size_t k = 0; k < flt.size(); ++k) {
        const double ang = th * (double)k;
        re += std::cos(ang) * flt[k];
        im += std::sin(ang) * flt[k];
    }
}

double firGroupDelay(const std::vector<double> &flt, double th) {
    const double thd2 = 1e-9;
    const double th0 = std::max(th - thd2, 0.0);
    const double th1 = std::min(th + thd2, kPi);
    double re, im, ph0, ph1;
    firResponse(flt, th0, re, im);
    ph0 = std::atan2(im, re);
    firResponse(flt, th1, re, im);
    ph1 = std::atan2(im, re);
    if (std::fabs(ph1 - ph0) > kPi) {
        if (ph1 > ph0) ph1 -= 2.0 * kPi;
        else ph1 += 2.0 * kPi;
    }
    return (ph1 - ph0) / (th1 - th0);
}

void normalizeFir(std::vector<double> &p, double dcGain) {
    double s = 0.0;
    for (double v : p) s += v;
    s = dcGain / s;
    for (double &v : p) v *= s;
}

/* ---- plan-time FFT (design only; the streaming engine has its own) ------ */

/* Twiddles are evaluated directly per index (no recurrence) at the
 * template precision.  The cepstral min-phase transform takes log of
 * stop-band magnitudes down to ~1e-11 of peak — only ~100x above the f64
 * FFT noise floor — so in double the log() of those bins is backend-
 * dependent noise that the Hilbert step spreads into every tap: measured
 * between two f64 implementations (96k->44.1k tb=0.5), 2e-3 taps at atten
 * 207 and 8e-3 at 218, with even the DC-group-delay LATENCY estimate
 * randomizing (the compiled C++ reference disagreed by 18 whole samples
 * at atten 218 — its own documented limit, CDSPFIRFilter.h:40-46: "the
 * skew happens purely at random").  minPhaseTransform therefore runs
 * in deterministic double-double by default (r8bt_dd.cpp — BIT-identical
 * to the Python designer's transform on every IEEE-754 platform, pinned
 * in tests/test_minphase_dd.py), with this file's long-double path kept
 * as the R8BT_MINPHASE_BACKEND=ld comparison backend (eps 1.08e-19,
 * ~1000x below the deepest stop band, mirroring design/ldfft.py).
 * Full-design parity is limited by f64 kernel-design libm rounding
 * (~1 ulp window/sinc), not the transform.  Pinned in
 * tests/test_native_design.py. */
template <typename T>
void fftInPlace(std::vector<std::complex<T>> &a, bool inverse) {
    const size_t n = a.size();
    for (size_t i = 1, j = 0; i < n; ++i) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) std::swap(a[i], a[j]);
    }
    /* T-precision pi so long-double twiddles are accurate past f64 */
    const T piT = (T)3.14159265358979323846264338327950288L;
    std::vector<std::complex<T>> tw(n / 2);
    const T sgn = inverse ? (T)2.0 : (T)-2.0;
    for (size_t k = 0; k < n / 2; ++k) {
        const T ang = sgn * piT * (T)k / (T)n;
        tw[k] = std::complex<T>(std::cos(ang), std::sin(ang));
    }
    for (size_t len = 2; len <= n; len <<= 1) {
        const size_t stride = n / len;
        for (size_t i = 0; i < n; i += len) {
            for (size_t k = 0; k < len / 2; ++k) {
                const std::complex<T> u = a[i + k];
                const std::complex<T> v = a[i + k + len / 2]
                                          * tw[k * stride];
                a[i + k] = u + v;
                a[i + k + len / 2] = u - v;
            }
        }
    }
    if (inverse) {
        for (auto &v : a) v /= (T)n;
    }
}

/* ---- windowed-sinc kernels (design/sinc.py; CDSPSincFilterGen.h) -------- */

/* Low-pass kernel, odd length 2*fl2+1, pass band [0, freq2]
 * (generateBand with freq1 = 0). */
std::vector<double> genBandKernel(double len2, double freq2, double beta,
                                  double power, int &fl2Out) {
    const int fl2 = (int)std::floor(len2);
    std::vector<double> half(fl2 + 1);
    half[0] = freq2 / kPi * kaiserWin(0.0, len2, beta, power);
    for (int t = 1; t <= fl2; ++t) {
        half[t] = std::sin(freq2 * t) / (kPi * t) *
                  kaiserWin((double)t, len2, beta, power);
    }
    std::vector<double> kernel(2 * fl2 + 1);
    for (int t = 0; t <= fl2; ++t) {
        kernel[fl2 + t] = half[t];
        kernel[fl2 - t] = half[t];
    }
    fl2Out = fl2;
    return kernel;
}

/* Fractional-delay kernel, even length 2*fl2 (generateFrac). */
std::vector<double> genFracKernel(double len2, double fd, double betaRaw,
                                  double powerRaw) {
    const double beta = std::min(std::max(betaRaw, 1.0), 350.0);
    const double power = std::fabs(powerRaw);
    const int fl2 = (int)std::ceil(len2);
    const int n = 2 * fl2;
    const double f = std::sin(fd * kPi) / kPi;
    std::vector<double> kernel(n), w(n), u(n);
    for (int i = 0; i < n; ++i) {
        const int t = i - fl2;
        u[i] = t + fd;
        w[i] = kaiserWin(u[i], len2, beta, power);
        const double sign = (((t % 2) + 2) % 2 == 0) ? 1.0 : -1.0;
        kernel[i] = sign * f * w[i] / u[i];
    }
    const bool isZeroX = std::fabs(fd - 1.0) < 2.3e-13 ||
                         std::fabs(fd) < 2.3e-13;
    if (isZeroX) {
        const int zidx = (std::fabs(fd - 1.0) < 2.3e-13) ? fl2 - 1 : fl2;
        kernel[zidx] = w[zidx];
    } else {
        kernel[fl2] = f * w[fl2] / fd;
    }
    for (int i = 0; i < n; ++i) {
        if (u[i] < -len2) kernel[i] = 0.0;
    }
    if (u[n - 1] > len2) kernel[n - 1] = 0.0;
    for (int i = 0; i < n; ++i) {
        if (!std::isfinite(kernel[i])) kernel[i] = 0.0;
    }
    return kernel;
}

/* ---- minimum-phase transform (design/minphase.py; CDSPRealFFT.h) -------- */

std::vector<double> minPhaseTransform(const std::vector<double> &kernel,
                                      int lenMult, double &dcGroupDelay) {
    /* Backend selection mirrors design/minphase.py::_backend: the
     * default is the deterministic double-double transform
     * (r8bt_dd.cpp) — bit-identical to the Python dd path on every
     * IEEE-754 platform (pinned in tests/test_minphase_dd.py) and more
     * accurate than 80-bit long double, so min-phase designs never
     * degenerate to the reference's documented f64 randomness
     * (CDSPFIRFilter.h:40-46) on ANY ABI, including those where long
     * double is plain binary64 (MSVC x64, some ARM EABIs).
     * R8BT_MINPHASE_BACKEND in {dd, ld} overrides (the ld path is the
     * round-2 default, kept for comparison tests); when unset, the
     * Python-side R8B_MINPHASE_BACKEND is honored too so one export
     * drives both designers in a comparison run.  Unknown values (incl.
     * Python's f64, which has no native counterpart) warn once on
     * stderr and use dd — never a silent different backend. */
    const char *be = std::getenv("R8BT_MINPHASE_BACKEND");
    if (!be) be = std::getenv("R8B_MINPHASE_BACKEND");
    bool useDD = true;
    if (be && std::strcmp(be, "ld") == 0) {
        useDD = false;
    } else if (be && std::strcmp(be, "dd") != 0 &&
               std::strcmp(be, "auto") != 0) {
        static bool warned = false;
        if (!warned) {
            std::fprintf(stderr,
                         "r8bt: unknown MINPHASE_BACKEND '%s' (native "
                         "supports dd/ld); using dd\n", be);
            warned = true;
        }
    }
    if (useDD) {
        std::vector<double> out =
            r8bt_dd::minPhaseTransformDD(kernel, lenMult);
        dcGroupDelay = firGroupDelay(out, 0.0);
        return out;
    }

    /* Long-double cepstral transform (mirrors design/minphase.py +
     * design/ldfft.py): the f64 version's stop-band log() is noise at
     * high atten and skews the result at random (CDSPFIRFilter.h:40-46);
     * 80-bit extended precision drops the FFT noise ~1000x below the
     * deepest supported stop band, making the design reproducible across
     * the Python and native designers. */
    typedef long double ld;
    const size_t kernelLen = kernel.size();
    int lenBits = 1;
    while (((size_t)1 << lenBits) < kernelLen * (size_t)lenMult) ++lenBits;
    const size_t n = (size_t)1 << lenBits;
    const size_t n2 = n >> 1;
    /* log(0) guard: smallest normal long double (x86 80-bit ~3.36e-4932).
       A 1e-4000L literal truncates to 0 where long double is 64-bit
       (MSVC/ARM), losing the guard; numeric_limits matches the Python
       transform's np.finfo(np.longdouble).tiny on the same ABI. */
    const ld tiny = std::numeric_limits<ld>::min();

    std::vector<std::complex<ld>> buf(n, (ld)0.0);
    for (size_t i = 0; i < kernelLen; ++i) buf[i] = (ld)kernel[i];
    fftInPlace(buf, false);

    std::vector<ld> mag(n2 + 1), logmag(n2 + 1);
    for (size_t i = 0; i <= n2; ++i) mag[i] = std::abs(buf[i]);
    const ld dcVal = buf[0].real();
    const ld nyqVal = buf[n2].real();
    for (size_t i = 0; i <= n2; ++i) logmag[i] = std::log(mag[i] + tiny);
    logmag[0] = std::log(std::fabs(dcVal) + tiny);
    logmag[n2] = std::log(std::fabs(nyqVal) + tiny);

    /* cep = irfft(logmag): even-symmetric real spectrum -> real cepstrum */
    std::vector<std::complex<ld>> spec(n);
    for (size_t i = 0; i <= n2; ++i) spec[i] = logmag[i];
    for (size_t i = 1; i < n2; ++i) spec[n - i] = logmag[i];
    fftInPlace(spec, true);

    /* discrete Hilbert window (CDSPRealFFT.h:737-749) */
    std::vector<std::complex<ld>> cep(n);
    cep[0] = (ld)0.0;
    for (size_t i = 1; i < n2; ++i) cep[i] = spec[i].real();
    cep[n2] = (ld)0.0;
    for (size_t i = n2 + 1; i < n; ++i) cep[i] = -spec[i].real();

    fftInPlace(cep, false); /* theta = imag part at bins 0..n2 */

    std::vector<std::complex<ld>> outSpec(n);
    for (size_t i = 0; i <= n2; ++i) {
        const ld th = cep[i].imag();
        outSpec[i] = mag[i] * std::complex<ld>(std::cos(th), std::sin(th));
    }
    outSpec[0] = dcVal;
    outSpec[n2] = nyqVal;
    for (size_t i = 1; i < n2; ++i) outSpec[n - i] = std::conj(outSpec[i]);
    fftInPlace(outSpec, true);

    std::vector<double> out(kernelLen);
    for (size_t i = 0; i < kernelLen; ++i)
        out[i] = (double)outSpec[i].real();
    dcGroupDelay = firGroupDelay(out, 0.0);
    return out;
}

/* ---- LP filter designer (design/lpfilter.py; CDSPFIRFilter.h) ----------- */

const double kLpMinTransBand = 0.5;
const double kLpMaxTransBand = 45.0;
const double kLpMinAtten = 49.0;
const double kLpMaxAtten = 218.0;

double attenCorrection(double tb, double reqAtten, double atten) {
    if (tb >= 0.25) {
        if (reqAtten >= 117.0) atten -= 1.60;
        else if (reqAtten >= 60.0) atten -= 1.91;
        else atten -= 2.25;
    } else if (tb >= 0.10) {
        if (reqAtten >= 117.0) atten -= 0.69;
        else if (reqAtten >= 60.0) atten -= 0.73;
        else atten -= 1.13;
    } else {
        if (reqAtten >= 117.0) atten -= 0.21;
        else if (reqAtten >= 60.0) atten -= 0.25;
        else atten -= 0.36;
    }

    const int corrCount = 264;
    const double corrMin = 49.0;
    const double corrDiff = 176.25;
    int idx = (int)std::floor((-atten - corrMin) * corrCount / corrDiff
                              + 0.5);
    idx = std::min(corrCount, std::max(0, idx));

    if (tb >= 0.25) atten -= kAttenCorrsTB25[idx] / kAttenCorrScales[0];
    else if (tb >= 0.10) atten -= kAttenCorrsTB10[idx] / kAttenCorrScales[1];
    else atten -= kAttenCorrsTB00[idx] / kAttenCorrScales[2];
    return atten;
}

/* (ReqTransBand%, ReqAtten dB) -> (pwr, hl, fo1) (CDSPFIRFilter.h:222-448;
 * transcribed from the validated Python port, design/lpfilter.py:132-243) */
void lpDesignParams(double transBand, double reqAtten, double &pwrOut,
                    double &hlOut, double &fo1Out) {
    const double tb = transBand * 0.01;
    double atten = -reqAtten;
    atten = attenCorrection(tb, reqAtten, atten);

    const double pwr =
        7.43932822146293e-8 * atten * atten
        + 0.000102747434588003
        * std::cos(0.00785021930010397 * atten)
        * std::cos(0.633854318781239 + 0.103208573657699 * atten)
        - 0.00798132247867036
        - 0.000903555213543865 * atten
        - 0.0969365532127236 * std::exp(0.0779275237937911 * atten)
        - 1.37304948662012e-5 * atten
        * std::cos(0.00785021930010397 * atten);

    double hl, fo1;
    if (pwr <= 0.067665322581) {
        if (tb >= 0.25) {
            hl = 2.6778150875894 / tb + 300.547590563091 * std::atan(
                std::atan(2.68959772209918 * pwr))
                / (5.5099277187035 * tb
                   - tb * std::tanh(std::cos(std::asinh(atten))));
            fo1 = 0.987205355829873 * tb + 1.00011788929851 * std::atan2(
                -0.321432067051302 - 6.19131357321578 * std::sqrt(pwr),
                hl
                + -1.14861472207245 / (hl - 14.1821147585957)
                + std::pow(
                    0.9521145021664,
                    std::pow(std::atan2(1.12018764830637, tb),
                             2.10988901686912 * hl - 20.9691278378345)));
        } else if (tb >= 0.10) {
            hl = (1.56688617018066
                  + 142.064321294568 * pwr
                  + 0.00419441117131136 * std::cos(243.633511747297 * pwr)
                  - 0.022953443903576 * atten
                  - 0.026629568860284 * std::cos(127.715550622571 * pwr))
                 / tb;
            fo1 = 0.982299356642411 * tb + 0.999441744774215 * std::asinh(
                (-0.361783054039583 - 5.80540593623676 * std::sqrt(pwr))
                / hl);
        } else {
            hl = (2.45739657014937
                  + 269.183679500541 * pwr
                  * std::cos(5.73225668178813
                             + std::atan2(
                                 std::cosh(0.988861169868941
                                           - 17.2201556280744 * pwr),
                                 1.08340138240431 * pwr)))
                 / tb;
            fo1 = 2.291956939 * tb
                  + 0.01942450693 * tb * tb * hl
                  - 4.67538973161837 * pwr * tb
                  - 1.668433124 * tb * std::pow(pwr, pwr);
        }
    } else {
        if (tb >= 0.25) {
            hl = (1.50258368698213
                  + 158.556968859477 * std::asinh(pwr)
                  * std::tanh(57.9466246871383 * std::tanh(pwr))
                  - 0.0105440479814834 * atten) / tb;
            fo1 = 0.994024401639321 * tb
                  + (-0.236282717577215
                     - 6.8724924545387 * std::sqrt(std::sin(pwr))) / hl;
        } else if (tb >= 0.10) {
            hl = (1.50277377248945
                  + 158.222625721046 * std::asinh(pwr)
                  * std::tanh(1.02875299001715 + 42.072277322604 * pwr)
                  - 0.0108380943845632 * atten) / tb;
            fo1 = 0.992539376734551 * tb
                  + (-0.251747813037178
                     - 6.74159892452584
                     * std::sqrt(std::tanh(std::tanh(std::tan(pwr))))) / hl;
        } else {
            hl = (1.15990238966306 * pwr
                  - 5.02124037125213 * pwr * pwr
                  - 0.158676856669827 * atten
                  * std::cos(1.1609073390614 * pwr
                             - 6.33932586197475 * pwr * pwr * pwr)) / tb;
            fo1 = 0.867344453126885 * tb
                  + 0.052693817907757 * tb * std::log(pwr)
                  + 0.0895511178735932 * tb
                  * std::atan(59.7538527741309 * pwr)
                  - 0.0745653568081453 * pwr * tb;
        }
    }
    pwrOut = pwr;
    hlOut = hl;
    fo1Out = fo1;
}

struct LpFilter {
    std::vector<double> kernel;
    long latency = 0;
    double latencyFrac = 0.0;
    bool isZeroPhase = true;
};

/* buildLPFilter (CDSPFIRFilter.h:220-537).  phase: 0 linear, 1 minimum. */
bool buildLpFilter(double normFreq, double transBand, double reqAtten,
                   int phase, double reqGain, LpFilter &out) {
    if (!(normFreq > 0.0 && normFreq <= 1.0)) return false;
    if (!(transBand >= kLpMinTransBand && transBand <= kLpMaxTransBand))
        return false;
    if (!(reqAtten >= kLpMinAtten && reqAtten <= kLpMaxAtten)) return false;

    double pwr, hl, fo1;
    lpDesignParams(transBand, reqAtten, pwr, hl, fo1);

    const double len2 = 0.25 * hl / normFreq;
    const double freq2 = kPi * (1.0 - fo1) * normFreq;
    int fl2;
    /* Kaiser beta capped at 125 by the designer (CDSPFIRFilter.h:453). */
    out.kernel = genBandKernel(len2, freq2, 125.0, std::fabs(pwr), fl2);

    if (phase == 0) {
        out.latency = fl2;
        out.latencyFrac = 0.0;
        out.isZeroPhase = true;
    } else {
        double dcgd;
        out.kernel = minPhaseTransform(out.kernel, 16, dcgd);
        out.latency = (long)dcgd;
        out.latencyFrac = dcgd - (double)out.latency;
        out.isZeroPhase = false;
    }
    normalizeFir(out.kernel, reqGain);
    return true;
}

/* ---- half-band table selection (design/halfband.py) --------------------- */

struct HbFilter {
    const double *taps = nullptr;
    int numTaps = 0;
    double atten = 0.0;
};

HbFilter getHbFilter(double reqAtten, int steepIndex, bool isThird) {
    const double *attens = isThird ? kHb3Atten : kHbAtten;
    const int *offs = isThird ? kHb3Off : kHbOff;
    const int *lens = isThird ? kHb3Len : kHbLen;
    const int *clsFirst = isThird ? kHb3ClassFirst : kHbClassFirst;
    const int *clsCount = isThird ? kHb3ClassCount : kHbClassCount;
    const double *taps = isThird ? kHb3Taps : kHbTaps;

    const int cls = std::min(std::max(steepIndex, 0), 6);
    const int first = clsFirst[cls];
    const int count = clsCount[cls];
    int k = 0;
    while (k != count - 1 && attens[first + k] < reqAtten) ++k;

    HbFilter hb;
    hb.taps = taps + offs[first + k];
    hb.numTaps = lens[first + k];
    hb.atten = attens[first + k];
    return hb;
}

/* ---- fractional-delay filter banks (design/fracbank.py) ----------------- */

void fracWinParams(double reqAtten, bool isThird, double &beta,
                   double &power, double &att, int &filterLen) {
    const int count = isThird ? kFracCoeffs3Count : kFracCoeffs2Count;
    const int base = isThird ? kFracCoeffs3Base : kFracCoeffs2Base;
    const double (*rows)[3] = isThird ? kFracCoeffs3 : kFracCoeffs2;
    int i = 0;
    while (i != count - 1 && rows[i][2] < reqAtten) ++i;
    beta = rows[i][0];
    power = rows[i][1];
    att = rows[i][2];
    filterLen = base + i * 2;
}

long defaultFilterFracs(double roundedAtten) {
    return (long)std::ceil(std::pow(6.4, roundedAtten / 50.0));
}

/* One normalized fractional-delay row: FracDelay = (fracs - i) / fracs
 * (CDSPFracInterpolator.h:103-116). */
std::vector<double> fracRow(long i, long fracs, int filterLen, double beta,
                            double power) {
    const double len2 = filterLen / 2.0;
    const double fd = (double)(fracs - i) / (double)fracs;
    std::vector<double> k = genFracKernel(len2, fd, beta, power);
    normalizeFir(k, 1.0);
    return k;
}

/* Whole-stepping bank: table[f][tap], one exact filter per output phase
 * f in [0, fracs). */
std::vector<double> buildFracBankWhole(long fracs, double reqAtten,
                                       bool isThird, int &filterLenOut) {
    double beta, power, att;
    int filterLen;
    fracWinParams(reqAtten, isThird, beta, power, att, filterLen);
    std::vector<double> table((size_t)fracs * filterLen);
    for (long f = 0; f < fracs; ++f) {
        std::vector<double> row = fracRow(f, fracs, filterLen, beta, power);
        std::memcpy(table.data() + (size_t)f * filterLen, row.data(),
                    sizeof(double) * filterLen);
    }
    filterLenOut = filterLen;
    return table;
}

/* 2nd-order spline over 8 points (r8bbase.h:1014-1024). */
void spline2p8(double xm3, double xm2, double xm1, double x0, double x1,
               double x2, double x3, double x4, double &c0, double &c1,
               double &c2) {
    const double s = 1.31578947368421052e-2;
    c0 = x0;
    c1 = (61.0 * (x1 - xm1) + 16.0 * (xm2 - x2) + 3.0 * (x3 - xm3)) * s;
    c2 = (106.0 * (xm1 + x1) + 10.0 * x3 + 6.0 * xm3 - 3.0 * x4
          - 29.0 * (xm2 + x2) - 167.0 * x0) * s;
}

/* Polynomial-mode bank (element_size 3, interp_points 8): rows f in
 * [0, fracs], each tap as (c0, c1, c2) of c0 + c1*x + c2*x^2. */
std::vector<double> buildFracBankPoly2(double reqAtten, bool isThird,
                                       int &filterLenOut, long &fracsOut,
                                       long &rowsOut) {
    double beta, power, att;
    int filterLen;
    fracWinParams(reqAtten, isThird, beta, power, att, filterLen);
    const long fracs = defaultFilterFracs(att);

    /* raw rows i = -3 .. fracs+4 (first_i = -pc2+1 with pc2 = 4) */
    const long firstI = -3;
    const long numRows = fracs + 8;
    std::vector<std::vector<double>> raw((size_t)numRows);
    for (long r = 0; r < numRows; ++r) {
        raw[(size_t)r] = fracRow(firstI + r, fracs, filterLen, beta, power);
    }

    const long nOut = fracs + 1;
    std::vector<double> table((size_t)nOut * filterLen * 3);
    for (long f = 0; f < nOut; ++f) {
        for (int t = 0; t < filterLen; ++t) {
            double c0, c1, c2;
            spline2p8(raw[(size_t)f][t], raw[(size_t)f + 1][t],
                      raw[(size_t)f + 2][t], raw[(size_t)f + 3][t],
                      raw[(size_t)f + 4][t], raw[(size_t)f + 5][t],
                      raw[(size_t)f + 6][t], raw[(size_t)f + 7][t],
                      c0, c1, c2);
            double *dst = table.data()
                          + ((size_t)f * filterLen + t) * 3;
            dst[0] = c0;
            dst[1] = c1;
            dst[2] = c2;
        }
    }
    filterLenOut = filterLen;
    fracsOut = fracs;
    rowsOut = nOut;
    return table;
}

/* ---- whole-number stepping detection (design/wholestep.py) -------------- */

bool findGcd(double l, double s, double &gcd) {
    for (int it = 0; it < 150; ++it) {
        const double r = l - s;
        if (r == 0.0) {
            if (s > 0.0) {
                gcd = s;
                return true;
            }
            return false;
        }
        l = s;
        s = std::fabs(r);
    }
    return false;
}

bool getWholeStepping(double srcRate, double dstRate, long &inStep,
                      long &outStep) {
    double gcd;
    if (!findGcd(srcRate, dstRate, gcd)) return false;
    const double in0 = srcRate / gcd;
    const double out0 = dstRate / gcd;
    inStep = (long)in0;
    outStep = (long)out0;
    if (in0 != (double)inStep || out0 != (double)outStep) return false;
    if (outStep > 1500) return false;
    return true;
}

/* ---- planner (models/plan.py make_plan; CDSPResampler.h:117-394) -------- */

/* Python-style non-negative modulo. */
long pymod(long a, long m) { return ((a % m) + m) % m; }

struct StageSpec {
    int kind; /* 0 conv, 1 hb_up, 2 hb_down, 3 frac_whole, 4 frac_poly */
    /* conv */
    std::vector<double> kernel;
    long up = 1, down = 1, offset = 0;
    /* hb */
    std::vector<double> taps;
    long outLatency = 0;
    /* frac whole */
    long inStep = 0, outStep = 0, w0 = 0, inLatency = 0, filterLen = 0;
    std::vector<double> table;
    /* frac poly */
    double fSrcRate = 0.0, fDstRate = 0.0, initFracPos = 0.0;
    long fracs = 0, rows = 0;
};

struct NativePlan {
    double srcRate, dstRate, latencyFrac = 0.0;
    std::vector<StageSpec> stages;
};

/* Convolver latency algebra (models/plan.py _make_conv;
 * CDSPBlockConvolver.h:62-157). */
void addConv(NativePlan &plan, LpFilter &flt, long up, long down,
             double &lf) {
    double lfv = flt.latencyFrac + lf * (double)up;
    const long l0 = (long)lfv;
    lfv -= (double)l0;
    lfv /= (double)down;
    const long base = l0 + flt.latency;

    long offset = base;
    if (down > 1 && (down & (down - 1)) == 0) {
        const long outOffset = flt.isZeroPhase ? flt.latency : 0;
        const long inLatency = l0 + flt.latency - outOffset;
        const long delta = pymod(-inLatency, down);
        offset = base + pymod(outOffset - delta - base, down);
    }

    StageSpec s;
    s.kind = 0;
    s.kernel = std::move(flt.kernel);
    s.up = up;
    s.down = down;
    s.offset = offset;
    plan.stages.push_back(std::move(s));
    lf = lfv;
}

void addHbUp(NativePlan &plan, double reqAtten, int steepIndex, bool isThird,
             double &lf) {
    const HbFilter hb = getHbFilter(reqAtten, steepIndex, isThird);
    double lfv = lf * 2.0;
    const long lat = (long)lfv;
    StageSpec s;
    s.kind = 1;
    s.taps.assign(hb.taps, hb.taps + hb.numTaps);
    s.outLatency = lat;
    plan.stages.push_back(std::move(s));
    lf = lfv - (double)lat;
}

void addHbDown(NativePlan &plan, double reqAtten, int steepIndex,
               bool isThird, double &lf) {
    const HbFilter hb = getHbFilter(reqAtten, steepIndex, isThird);
    double lfv = lf * 0.5;
    const long lat = (long)lfv;
    StageSpec s;
    s.kind = 2;
    s.taps.assign(hb.taps, hb.taps + hb.numTaps);
    s.outLatency = lat;
    plan.stages.push_back(std::move(s));
    lf = lfv - (double)lat;
}

/* Fractional-interpolator latency algebra (models/plan.py _make_frac;
 * CDSPFracInterpolator.h:707-791). */
void addFrac(NativePlan &plan, double srcRate, double dstRate,
             double reqAtten, bool isThird, double &lf) {
    double initFracPos = lf;
    const long inLatency = (long)initFracPos;
    initFracPos -= (double)inLatency;

    long inStep, outStep;
    if (getWholeStepping(srcRate, dstRate, inStep, outStep)) {
        const double spos = initFracPos * (double)outStep;
        const long w0 = (long)spos;
        StageSpec s;
        s.kind = 3;
        s.inStep = inStep;
        s.outStep = outStep;
        s.w0 = w0;
        s.inLatency = inLatency;
        int filterLen;
        s.table = buildFracBankWhole(outStep, reqAtten, isThird, filterLen);
        s.filterLen = filterLen;
        plan.stages.push_back(std::move(s));
        lf = (spos - (double)w0) / (double)inStep;
        return;
    }

    StageSpec s;
    s.kind = 4;
    s.fSrcRate = srcRate;
    s.fDstRate = dstRate;
    s.initFracPos = initFracPos;
    s.inLatency = inLatency;
    int filterLen;
    s.table = buildFracBankPoly2(reqAtten, isThird, filterLen, s.fracs,
                                 s.rows);
    s.filterLen = filterLen;
    plan.stages.push_back(std::move(s));
    lf = 0.0;
}

const double kLpMaxTransBandClamp = 45.0;

bool makePlan(double srcRate, double dstRate, double transBand, double atten,
              int phase, NativePlan &plan) {
    if (!(srcRate > 0.0) || !(dstRate > 0.0)) return false;
    if (!std::isfinite(srcRate) || !std::isfinite(dstRate)) return false;
    /* Same ratio cap the blob parser enforces (r8bt.cpp parseBlob): an
     * unbounded ratio walks the 2^c loops past long range (UB) before any
     * other validation can fire. */
    if (srcRate / dstRate > 1e9 || dstRate / srcRate > 1e9) return false;
    plan.srcRate = srcRate;
    plan.dstRate = dstRate;
    double lf = 0.0;

    if (srcRate == dstRate) {
        plan.latencyFrac = 0.0;
        return true;
    }

    /* 2. Common single-step ratios (:144-172). */
    static const int common[5][2] = {{1, 2}, {1, 3}, {2, 3}, {3, 2}, {3, 4}};
    for (const auto &nd : common) {
        const int num = nd[0], den = nd[1];
        if (srcRate * num == dstRate * den) {
            LpFilter flt;
            if (!buildLpFilter(1.0 / std::max(num, den), transBand, atten,
                               phase, (double)num, flt))
                return false;
            addConv(plan, flt, num, den, lf);
            plan.latencyFrac = lf;
            return true;
        }
    }

    /* 3. Whole i*2^c upsampling, i in {2, 3} (:174-216). */
    for (int i = 2; i <= 3; ++i) {
        int c = 0;
        bool found = false;
        while (true) {
            const double newSr = srcRate * (double)((long)i << c);
            if (newSr == dstRate) {
                found = true;
                break;
            }
            if (newSr > dstRate) break;
            ++c;
        }
        if (found) {
            LpFilter flt;
            if (!buildLpFilter(1.0 / i, transBand, atten, phase, (double)i,
                               flt))
                return false;
            addConv(plan, flt, i, 1, lf);
            const bool isThird = (i == 3);
            for (int j = 0; j < c; ++j) addHbUp(plan, atten, j, isThird, lf);
            plan.latencyFrac = lf;
            return true;
        }
    }

    if (dstRate * 2.0 > srcRate) {
        /* 4. Upsampling / mild downsampling (:218-333). */
        const double normFreq =
            (dstRate > srcRate) ? 0.5 : 0.5 * dstRate / srcRate;
        LpFilter flt;
        if (!buildLpFilter(normFreq, transBand, atten, phase, 2.0, flt))
            return false;
        addConv(plan, flt, 2, 1, lf);

        const double tbw = 0.0175;
        const double threshRate = srcRate / (1.0 - tbw * transBand);

        int c = 0;
        long div = 1;
        while (true) {
            const long ndiv = div * 2;
            if (dstRate < threshRate * (double)ndiv) break;
            div = ndiv;
            ++c;
        }

        /* The 3*2^k probe re-derives ndiv from the FIRST loop's div each
         * iteration (models/plan.py:372-379); the first loop's break
         * condition guarantees termination at c2 <= 1. */
        int c2 = 0;
        long div2 = 1;
        while (true) {
            const long ndiv = div * (c2 == 0 ? 3 : 2);
            if (dstRate < threshRate * (double)ndiv) break;
            div2 = ndiv;
            ++c2;
        }

        const double srcRate2 = srcRate * 2.0;

        long ws1, ws2;
        if (c == 1 && getWholeStepping(srcRate2, dstRate, ws1, ws2)) c = 0;

        if (c > 0) {
            int num;
            if (c2 > 0 && div2 > div) {
                div = div2;
                c = c2;
                num = 3;
            } else {
                num = 2;
            }

            addFrac(plan, srcRate2 * (double)div, dstRate, atten, false, lf);

            double tb = (1.0 - srcRate * (double)div / dstRate) / tbw;
            tb = std::min(tb, kLpMaxTransBandClamp);

            LpFilter flt2;
            if (!buildLpFilter(1.0 / num, tb, atten, phase, (double)num,
                               flt2))
                return false;
            addConv(plan, flt2, num, 1, lf);

            const bool isThird = (num == 3);
            for (int i = 1; i < c; ++i)
                addHbUp(plan, atten, i - 1, isThird, lf);
        } else {
            addFrac(plan, srcRate2, dstRate, atten, false, lf);
        }
        plan.latencyFrac = lf;
        return true;
    }

    /* 5. Downsampling >= 2x (:335-393). */
    double checkSr = dstRate * 4.0;
    int c = 0;
    double finGain = 1.0;
    while (checkSr <= srcRate) {
        ++c;
        checkSr *= 2.0;
        finGain *= 0.5;
    }

    const long srcSrDiv = 1L << c;
    long downf = 1;
    double normFreq = 0.5;
    bool useInterp = true;
    bool isThird = false;

    for (int df = 2; df <= 3; ++df) {
        if (dstRate * (double)(srcSrDiv * df) == srcRate) {
            downf = df;
            normFreq = 1.0 / df;
            useInterp = false;
            isThird = (df == 3);
            break;
        }
    }

    if (useInterp) {
        downf = 1;
        normFreq = dstRate * (double)srcSrDiv / srcRate;
        isThird = (normFreq * 3.0 <= 1.0);
    }

    for (int i = 0; i < c; ++i) addHbDown(plan, atten, c - 1 - i, isThird, lf);

    LpFilter flt;
    if (!buildLpFilter(normFreq, transBand, atten, phase, finGain, flt))
        return false;
    addConv(plan, flt, 1, downf, lf);

    if (useInterp)
        addFrac(plan, srcRate, dstRate * (double)srcSrDiv, atten, isThird,
                lf);

    plan.latencyFrac = lf;
    return true;
}

/* ---- plan-blob serialization (mirror of native/build_plan_blob) --------- */

struct BlobWriter {
    std::vector<uint8_t> buf;
    template <class T> void put(T v) {
        const uint8_t *p = (const uint8_t *)&v;
        buf.insert(buf.end(), p, p + sizeof(T));
    }
    void putArray(const double *p, size_t n) {
        const uint8_t *b = (const uint8_t *)p;
        buf.insert(buf.end(), b, b + n * sizeof(double));
    }
};

std::vector<uint8_t> serializePlan(const NativePlan &plan) {
    BlobWriter w;
    w.buf.insert(w.buf.end(), {'R', '8', 'B', 'T'});
    w.put<uint32_t>(1);
    w.put<double>(plan.srcRate);
    w.put<double>(plan.dstRate);
    w.put<double>(plan.latencyFrac);
    w.put<uint32_t>((uint32_t)plan.stages.size());
    for (const StageSpec &s : plan.stages) {
        w.put<uint32_t>((uint32_t)s.kind);
        if (s.kind == 0) {
            w.put<int64_t>(s.up);
            w.put<int64_t>(s.down);
            w.put<int64_t>(s.offset);
            w.put<int64_t>((int64_t)s.kernel.size());
            w.putArray(s.kernel.data(), s.kernel.size());
        } else if (s.kind == 1 || s.kind == 2) {
            w.put<int64_t>((int64_t)s.taps.size());
            w.put<int64_t>(s.outLatency);
            w.putArray(s.taps.data(), s.taps.size());
        } else if (s.kind == 3) {
            w.put<int64_t>(s.inStep);
            w.put<int64_t>(s.outStep);
            w.put<int64_t>(s.w0);
            w.put<int64_t>(s.inLatency);
            w.put<int64_t>(s.filterLen);
            w.putArray(s.table.data(), s.table.size());
        } else {
            w.put<double>(s.fSrcRate);
            w.put<double>(s.fDstRate);
            w.put<double>(s.initFracPos);
            w.put<int64_t>(s.inLatency);
            w.put<int64_t>(s.filterLen);
            w.put<int64_t>(s.fracs);
            w.put<int64_t>(s.rows);
            w.putArray(s.table.data(), s.table.size());
        }
    }
    return w.buf;
}

bool designBlob(double srcRate, double dstRate, double transBand,
                double atten, int phase, std::vector<uint8_t> &blob) {
    if (phase != 0 && phase != 1) return false;
    NativePlan plan;
    try {
        if (!makePlan(srcRate, dstRate, transBand, atten, phase, plan))
            return false;
        blob = serializePlan(plan);
    } catch (...) {
        return false;
    }
    return true;
}

} // namespace

extern "C" {

/* Design + create from sample rates alone (reference DLL r8b_create,
 * DLL/r8bsrc.cpp:29-66).  res follows ER8BResamplerRes: 0 = 16-bit
 * (ReqAtten 136.45), 1 = 16-bit IR (109.56), 2 = 24-bit (180.15)
 * (CDSPResampler.h:743-810). */
r8bt_handle r8bt_create(double src_rate, double dst_rate, double trans_band,
                        int res) {
    double atten;
    switch (res) {
        case 0: atten = 136.45; break;
        case 1: atten = 109.56; break;
        case 2: atten = 180.15; break;
        default: return nullptr;
    }
    return r8bt_create_ex(src_rate, dst_rate, trans_band, atten, 0);
}

/* Fully-parameterized create (Resampler(..., atten, phase) equivalent). */
r8bt_handle r8bt_create_ex(double src_rate, double dst_rate,
                           double trans_band, double atten, int phase) {
    std::vector<uint8_t> blob;
    if (!designBlob(src_rate, dst_rate, trans_band, atten, phase, blob))
        return nullptr;
    return r8bt_create_from_blob(blob.data(), blob.size());
}

/* Expose the designed plan blob for parity testing / offline deployment.
 * Returns the blob size in bytes, or -1 on design failure.  If buf is
 * non-NULL and buf_len is large enough, the blob is copied into buf. */
long r8bt_design_blob(double src_rate, double dst_rate, double trans_band,
                      double atten, int phase, void *buf, long buf_len) {
    std::vector<uint8_t> blob;
    if (!designBlob(src_rate, dst_rate, trans_band, atten, phase, blob))
        return -1;
    if (buf && buf_len >= (long)blob.size())
        std::memcpy(buf, blob.data(), blob.size());
    return (long)blob.size();
}

int r8bt_minphase_dd(const double *kernel, long n, int len_mult,
                     double *out) {
    if (!kernel || !out || n <= 0 || len_mult < 2) return -1;
    const std::vector<double> in(kernel, kernel + n);
    const std::vector<double> res = r8bt_dd::minPhaseTransformDD(in, len_mult);
    std::memcpy(out, res.data(), res.size() * sizeof(double));
    return 0;
}

} // extern "C"
