/* r8bt.cpp — native float64 streaming engine for r8brain_tpu plans.
 *
 * Executes the stage chain planned by r8brain_tpu.models.plan from each
 * stage's *content formula* (the same executable specification the CPU
 * oracle implements, models/oracle.py), with streaming emission conditions
 * matching models/lengths.py exactly.  Structure is stage objects holding a
 * trimmed absolute-indexed history — the explicit-carry replacement for the
 * reference's ring buffers (see SURVEY.md §5).
 */

#include "r8bt.h"

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

/* Explicit SIMD kernels (gcc refuses to auto-vectorize the split re/im
 * butterfly loops: "no vectype" on the twiddle loads).  The scalar code
 * below every #if block is the reference semantics; the intrinsic paths
 * compute the same expressions 8 (AVX-512) or 4 (AVX2) lanes at a time.
 * This is the role the reference's hand-SIMD fft4g/pffft backends and
 * R8B_SSE2/R8B_NEON interpolator bodies play (r8bbase.h:107-134). */
#if defined(__AVX512F__)
#include <immintrin.h>
#define R8BT_AVX512 1
#elif defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>
#define R8BT_AVX2 1
#endif

namespace {

struct Reader {
    const uint8_t *p;
    size_t left;
    bool ok = true;

    template <typename T>
    T get() {
        T v{};
        if (left < sizeof(T)) {
            ok = false;
            return v;
        }
        std::memcpy(&v, p, sizeof(T));
        p += sizeof(T);
        left -= sizeof(T);
        return v;
    }

    // A count read from the blob is only trusted if that many doubles can
    // still follow in the remaining bytes: a negative or huge count from a
    // truncated/corrupted blob must fail the parse (NULL return per
    // r8bt.h), not throw length_error/bad_alloc out of extern "C".
    bool validCount(int64_t n) {
        if (n < 0 || (uint64_t)n > left / sizeof(double)) ok = false;
        return ok;
    }

    bool getArray(double *dst, size_t n) {
        if (left < n * sizeof(double)) {
            ok = false;
            return false;
        }
        std::memcpy(dst, p, n * sizeof(double));
        p += n * sizeof(double);
        left -= n * sizeof(double);
        return true;
    }
};

/* History buffer with absolute indexing and left zero-extension. */
class Hist {
  public:
    void clear() {
        buf.clear();
        start = 0;
        off = 0;
    }
    void push(const double *x, long n) { buf.insert(buf.end(), x, x + n); }
    /* sample at absolute index i (zero before stream start) */
    double at(long i) const {
        long j = i - start;
        if (j < 0 || (size_t)j >= buf.size() - (size_t)off) return 0.0;
        return buf[(size_t)(off + j)];
    }
    void trimTo(long keep) {
        /* logical trim only; the front erase (a memmove of the whole
         * kept window on EVERY process call) is deferred until the dead
         * prefix dominates the buffer */
        long drop = (long)buf.size() - off - keep;
        if (drop > 0) {
            off += drop;
            start += drop;
            if (off > (long)buf.size() / 2 && off > 8192) {
                buf.erase(buf.begin(), buf.begin() + off);
                off = 0;
            }
        }
    }
    /* copy [i0, i0+n) into dst, zero-filling outside the kept range */
    void copyRange(long i0, long n, double *dst) const {
        const long sz = (long)buf.size() - off;
        long j0 = i0 - start;                     /* first source index */
        long lead = j0 < 0 ? (-j0 < n ? -j0 : n) : 0;
        long mid0 = j0 + lead;
        long mid = sz - mid0;
        if (mid > n - lead) mid = n - lead;
        if (mid < 0) mid = 0;
        std::memset(dst, 0, (size_t)lead * sizeof(double));
        if (mid > 0)
            std::memcpy(dst + lead, buf.data() + off + mid0,
                        (size_t)mid * sizeof(double));
        std::memset(dst + lead + mid, 0,
                    (size_t)(n - lead - mid) * sizeof(double));
    }
    /* raw pointer to absolute index i0 when [i0, i0+n) is fully kept;
     * nullptr near the stream-start/trim boundaries (callers fall back
     * to the zero-filling at()) */
    const double *raw(long i0, long n) const {
        long j = i0 - start;
        if (j < 0 || (size_t)(j + n) > buf.size() - (size_t)off)
            return nullptr;
        return buf.data() + off + j;
    }

  private:
    std::vector<double> buf;
    long start = 0;
    long off = 0;  /* dead prefix length inside buf */
};

/* Iterative radix-2 complex FFT (split re/im, precomputed bit-reversal and
 * per-stage twiddles).  Standard Cooley-Tukey; kept dependency-free — the
 * TPU compute path uses XLA/Pallas FFTs, this backs only the host
 * deployment engine's overlap-save convolver (the role the reference's
 * bundled fft4g backend plays for its DLL, CDSPRealFFT.h:98-170). */
class CFFT {
  public:
    void init(int N) {
        n = N;
        rev.assign((size_t)n, 0);
        int lg = 0;
        while ((1 << lg) < n) ++lg;
        for (int i = 1; i < n; ++i)
            rev[(size_t)i] = (rev[(size_t)(i >> 1)] >> 1)
                             | ((i & 1) << (lg - 1));
        /* contiguous per-stage twiddles (w^j, j < len/2, for each len):
         * unit-stride loads in the butterfly loop auto-vectorize; the
         * original j*step strided access into one shared table did not */
        stwr.clear();
        stwi.clear();
        for (int len = 8; len <= n; len <<= 1) {
            std::vector<double> tr((size_t)(len / 2)), ti((size_t)(len / 2));
            for (int j = 0; j < len / 2; ++j) {
                double a = -2.0 * 3.14159265358979323846 * j / len;
                tr[(size_t)j] = std::cos(a);
                ti[(size_t)j] = std::sin(a);
            }
            stwr.push_back(std::move(tr));
            stwi.push_back(std::move(ti));
        }
    }
    /* in-place; inv=true computes the UNSCALED inverse (scaling is folded
     * into the kernel spectra by the caller) */
    void run(double *re, double *im, bool inv) const {
        for (int i = 0; i < n; ++i) {
            int j = rev[(size_t)i];
            if (i < j) {
                std::swap(re[i], re[j]);
                std::swap(im[i], im[j]);
            }
        }
        /* len == 2 (w = 1: add/sub over adjacent pairs) and len == 4
         * (w = {1, -i} forward / {1, +i} inverse) — fused into ONE sweep
         * when SIMD is available (both stages are memory-bound). */
#if R8BT_AVX512
        if (n >= 8) {
            const __m512d sg = _mm512_set1_pd(inv ? -1.0 : 1.0);
            const __m512d nsg = _mm512_set1_pd(inv ? 1.0 : -1.0);
            for (int i = 0; i < n; i += 8) {
                __m512d ar = _mm512_loadu_pd(re + i);
                __m512d ai = _mm512_loadu_pd(im + i);
                /* len-2: even lanes u+v, odd lanes u-v (u even, v odd) */
                __m512d br = _mm512_permute_pd(ar, 0x55);
                __m512d bi = _mm512_permute_pd(ai, 0x55);
                __m512d sr = _mm512_add_pd(ar, br);
                __m512d si = _mm512_add_pd(ai, bi);
                sr = _mm512_mask_sub_pd(sr, 0xAA, br, ar);
                si = _mm512_mask_sub_pd(si, 0xAA, bi, ai);
                /* len-4 within each 4-group of (sr, si):
                 *   re' = [r0+r2, r1+sgn*i3, r0-r2, r1-sgn*i3]
                 *   im' = [i0+i2, i1-sgn*r3, i0-i2, i1+sgn*r3] */
                __m512d ur = _mm512_permutex_pd(sr, 0x44);
                __m512d ui = _mm512_permutex_pd(si, 0x44);
                __m512d vr = _mm512_mask_mul_pd(
                    _mm512_permutex_pd(sr, 0xEE), 0xAA,
                    _mm512_permutex_pd(si, 0xFF), sg);
                __m512d vi = _mm512_mask_mul_pd(
                    _mm512_permutex_pd(si, 0xEE), 0xAA,
                    _mm512_permutex_pd(sr, 0xFF), nsg);
                __m512d adr = _mm512_add_pd(ur, vr);
                __m512d adi = _mm512_add_pd(ui, vi);
                __m512d sbr = _mm512_sub_pd(ur, vr);
                __m512d sbi = _mm512_sub_pd(ui, vi);
                _mm512_storeu_pd(re + i, _mm512_mask_blend_pd(0xCC, adr, sbr));
                _mm512_storeu_pd(im + i, _mm512_mask_blend_pd(0xCC, adi, sbi));
            }
        } else
#endif
        {
            if (n >= 2) {
                for (int i = 0; i < n; i += 2) {
                    double ur = re[i], ui = im[i];
                    double vr = re[i + 1], vi = im[i + 1];
                    re[i] = ur + vr;
                    im[i] = ui + vi;
                    re[i + 1] = ur - vr;
                    im[i + 1] = ui - vi;
                }
            }
            if (n >= 4) {
                const double sgn = inv ? -1.0 : 1.0;
                for (int i = 0; i < n; i += 4) {
                    double ur = re[i], ui = im[i];
                    double vr = re[i + 2], vi = im[i + 2];
                    re[i] = ur + vr;
                    im[i] = ui + vi;
                    re[i + 2] = ur - vr;
                    im[i + 2] = ui - vi;
                    ur = re[i + 1];
                    ui = im[i + 1];
                    /* x = v * (-+i): forward (vi, -vr), inverse (-vi, vr) */
                    double xr = sgn * im[i + 3];
                    double xi = -sgn * re[i + 3];
                    re[i + 1] = ur + xr;
                    im[i + 1] = ui + xi;
                    re[i + 3] = ur - xr;
                    im[i + 3] = ui - xi;
                }
            }
        }
        /* remaining stages in radix-2^2 pairs (L, 2L): identical math to
         * two radix-2 passes but ONE sweep over re/im — the butterflies
         * are memory-bound at these lengths, so halving the passes is
         * the win (same trick as fft4g's combined cftmdl levels) */
        const double s2 = inv ? -1.0 : 1.0;
        size_t st = 0;
        int len = 8;
        for (; 2 * len <= n; len <<= 2, st += 2) {
            const int L = len, h = len >> 1;
            const double *tLr = stwr[st].data();
            const double *tLi = stwi[st].data();
            const double *tHr = stwr[st + 1].data();
            const double *tHi = stwi[st + 1].data();
            for (int i = 0; i < n; i += 2 * L) {
                double *ra = re + i, *ia = im + i;
                double *rb = ra + h, *ib = ia + h;
                double *rc = ra + L, *ic = ia + L;
                double *rd = rc + h, *id_ = ic + h;
                int j = 0;
#if R8BT_AVX512
                if (h >= 8) {
                    const __m512d sg = _mm512_set1_pd(s2);
                    const __m512d ng = _mm512_set1_pd(-s2);
                    for (; j + 8 <= h; j += 8) {
                        __m512d wr = _mm512_loadu_pd(tLr + j);
                        __m512d wi =
                            _mm512_mul_pd(sg, _mm512_loadu_pd(tLi + j));
                        __m512d w1r = _mm512_loadu_pd(tHr + j);
                        __m512d w1i =
                            _mm512_mul_pd(sg, _mm512_loadu_pd(tHi + j));
                        /* w2 = w1 * (-+i): (s2*tHi, -s2*tHr) */
                        __m512d w2r = _mm512_loadu_pd(tHi + j);
                        __m512d w2i =
                            _mm512_mul_pd(ng, _mm512_loadu_pd(tHr + j));
                        __m512d ar = _mm512_loadu_pd(ra + j);
                        __m512d ai = _mm512_loadu_pd(ia + j);
                        __m512d br = _mm512_loadu_pd(rb + j);
                        __m512d bi = _mm512_loadu_pd(ib + j);
                        __m512d cr = _mm512_loadu_pd(rc + j);
                        __m512d ci = _mm512_loadu_pd(ic + j);
                        __m512d dr = _mm512_loadu_pd(rd + j);
                        __m512d di = _mm512_loadu_pd(id_ + j);
                        __m512d tbr =
                            _mm512_fmsub_pd(br, wr, _mm512_mul_pd(bi, wi));
                        __m512d tbi =
                            _mm512_fmadd_pd(br, wi, _mm512_mul_pd(bi, wr));
                        __m512d tdr =
                            _mm512_fmsub_pd(dr, wr, _mm512_mul_pd(di, wi));
                        __m512d tdi =
                            _mm512_fmadd_pd(dr, wi, _mm512_mul_pd(di, wr));
                        __m512d a1r = _mm512_add_pd(ar, tbr);
                        __m512d a1i = _mm512_add_pd(ai, tbi);
                        __m512d b1r = _mm512_sub_pd(ar, tbr);
                        __m512d b1i = _mm512_sub_pd(ai, tbi);
                        __m512d c1r = _mm512_add_pd(cr, tdr);
                        __m512d c1i = _mm512_add_pd(ci, tdi);
                        __m512d d1r = _mm512_sub_pd(cr, tdr);
                        __m512d d1i = _mm512_sub_pd(ci, tdi);
                        __m512d pcr =
                            _mm512_fmsub_pd(c1r, w1r, _mm512_mul_pd(c1i, w1i));
                        __m512d pci =
                            _mm512_fmadd_pd(c1r, w1i, _mm512_mul_pd(c1i, w1r));
                        _mm512_storeu_pd(ra + j, _mm512_add_pd(a1r, pcr));
                        _mm512_storeu_pd(ia + j, _mm512_add_pd(a1i, pci));
                        _mm512_storeu_pd(rc + j, _mm512_sub_pd(a1r, pcr));
                        _mm512_storeu_pd(ic + j, _mm512_sub_pd(a1i, pci));
                        __m512d pdr =
                            _mm512_fmsub_pd(d1r, w2r, _mm512_mul_pd(d1i, w2i));
                        __m512d pdi =
                            _mm512_fmadd_pd(d1r, w2i, _mm512_mul_pd(d1i, w2r));
                        _mm512_storeu_pd(rb + j, _mm512_add_pd(b1r, pdr));
                        _mm512_storeu_pd(ib + j, _mm512_add_pd(b1i, pdi));
                        _mm512_storeu_pd(rd + j, _mm512_sub_pd(b1r, pdr));
                        _mm512_storeu_pd(id_ + j, _mm512_sub_pd(b1i, pdi));
                    }
                } else { /* h == 4: one 256-bit iteration */
                    const __m256d sg = _mm256_set1_pd(s2);
                    const __m256d ng = _mm256_set1_pd(-s2);
                    __m256d wr = _mm256_loadu_pd(tLr);
                    __m256d wi = _mm256_mul_pd(sg, _mm256_loadu_pd(tLi));
                    __m256d w1r = _mm256_loadu_pd(tHr);
                    __m256d w1i = _mm256_mul_pd(sg, _mm256_loadu_pd(tHi));
                    __m256d w2r = _mm256_loadu_pd(tHi);
                    __m256d w2i = _mm256_mul_pd(ng, _mm256_loadu_pd(tHr));
                    __m256d ar = _mm256_loadu_pd(ra);
                    __m256d ai = _mm256_loadu_pd(ia);
                    __m256d br = _mm256_loadu_pd(rb);
                    __m256d bi = _mm256_loadu_pd(ib);
                    __m256d cr = _mm256_loadu_pd(rc);
                    __m256d ci = _mm256_loadu_pd(ic);
                    __m256d dr = _mm256_loadu_pd(rd);
                    __m256d di = _mm256_loadu_pd(id_);
                    __m256d tbr =
                        _mm256_fmsub_pd(br, wr, _mm256_mul_pd(bi, wi));
                    __m256d tbi =
                        _mm256_fmadd_pd(br, wi, _mm256_mul_pd(bi, wr));
                    __m256d tdr =
                        _mm256_fmsub_pd(dr, wr, _mm256_mul_pd(di, wi));
                    __m256d tdi =
                        _mm256_fmadd_pd(dr, wi, _mm256_mul_pd(di, wr));
                    __m256d a1r = _mm256_add_pd(ar, tbr);
                    __m256d a1i = _mm256_add_pd(ai, tbi);
                    __m256d b1r = _mm256_sub_pd(ar, tbr);
                    __m256d b1i = _mm256_sub_pd(ai, tbi);
                    __m256d c1r = _mm256_add_pd(cr, tdr);
                    __m256d c1i = _mm256_add_pd(ci, tdi);
                    __m256d d1r = _mm256_sub_pd(cr, tdr);
                    __m256d d1i = _mm256_sub_pd(ci, tdi);
                    __m256d pcr =
                        _mm256_fmsub_pd(c1r, w1r, _mm256_mul_pd(c1i, w1i));
                    __m256d pci =
                        _mm256_fmadd_pd(c1r, w1i, _mm256_mul_pd(c1i, w1r));
                    _mm256_storeu_pd(ra, _mm256_add_pd(a1r, pcr));
                    _mm256_storeu_pd(ia, _mm256_add_pd(a1i, pci));
                    _mm256_storeu_pd(rc, _mm256_sub_pd(a1r, pcr));
                    _mm256_storeu_pd(ic, _mm256_sub_pd(a1i, pci));
                    __m256d pdr =
                        _mm256_fmsub_pd(d1r, w2r, _mm256_mul_pd(d1i, w2i));
                    __m256d pdi =
                        _mm256_fmadd_pd(d1r, w2i, _mm256_mul_pd(d1i, w2r));
                    _mm256_storeu_pd(rb, _mm256_add_pd(b1r, pdr));
                    _mm256_storeu_pd(ib, _mm256_add_pd(b1i, pdi));
                    _mm256_storeu_pd(rd, _mm256_sub_pd(b1r, pdr));
                    _mm256_storeu_pd(id_, _mm256_sub_pd(b1i, pdi));
                    j = h;
                }
#endif
                for (; j < h; ++j) {
                    double wr = tLr[j], wi = s2 * tLi[j];
                    double w1r = tHr[j], w1i = s2 * tHi[j];
                    /* w2 = w1 * (-+i) */
                    double w2r = s2 * w1i, w2i = -s2 * w1r;
                    double ar = ra[j], ai = ia[j];
                    double br = rb[j], bi = ib[j];
                    double cr = rc[j], ci = ic[j];
                    double dr = rd[j], di = id_[j];
                    double tbr = br * wr - bi * wi;
                    double tbi = br * wi + bi * wr;
                    double tdr = dr * wr - di * wi;
                    double tdi = dr * wi + di * wr;
                    double a1r = ar + tbr, a1i = ai + tbi;
                    double b1r = ar - tbr, b1i = ai - tbi;
                    double c1r = cr + tdr, c1i = ci + tdi;
                    double d1r = cr - tdr, d1i = ci - tdi;
                    double pcr = c1r * w1r - c1i * w1i;
                    double pci = c1r * w1i + c1i * w1r;
                    ra[j] = a1r + pcr;
                    ia[j] = a1i + pci;
                    rc[j] = a1r - pcr;
                    ic[j] = a1i - pci;
                    double pdr = d1r * w2r - d1i * w2i;
                    double pdi = d1r * w2i + d1i * w2r;
                    rb[j] = b1r + pdr;
                    ib[j] = b1i + pdi;
                    rd[j] = b1r - pdr;
                    id_[j] = b1i - pdi;
                }
            }
        }
        /* odd leftover stage (log2(n/4) odd): plain radix-2 */
        if (len <= n) {
            const int half = len >> 1;
            const double *twr_ = stwr[st].data();
            const double *twi_ = stwi[st].data();
            for (int i = 0; i < n; i += len) {
                double *r0 = re + i, *i0 = im + i;
                double *r1 = re + i + half, *i1 = im + i + half;
                int j = 0;
#if R8BT_AVX512
                const __m512d sg = _mm512_set1_pd(s2);
                for (; j + 8 <= half; j += 8) {
                    __m512d twr = _mm512_loadu_pd(twr_ + j);
                    __m512d twi =
                        _mm512_mul_pd(sg, _mm512_loadu_pd(twi_ + j));
                    __m512d ur = _mm512_loadu_pd(r0 + j);
                    __m512d ui = _mm512_loadu_pd(i0 + j);
                    __m512d vr = _mm512_loadu_pd(r1 + j);
                    __m512d vi = _mm512_loadu_pd(i1 + j);
                    __m512d xr =
                        _mm512_fmsub_pd(vr, twr, _mm512_mul_pd(vi, twi));
                    __m512d xi =
                        _mm512_fmadd_pd(vr, twi, _mm512_mul_pd(vi, twr));
                    _mm512_storeu_pd(r0 + j, _mm512_add_pd(ur, xr));
                    _mm512_storeu_pd(i0 + j, _mm512_add_pd(ui, xi));
                    _mm512_storeu_pd(r1 + j, _mm512_sub_pd(ur, xr));
                    _mm512_storeu_pd(i1 + j, _mm512_sub_pd(ui, xi));
                }
#endif
                for (; j < half; ++j) {
                    double twr = twr_[j], twi = s2 * twi_[j];
                    double ur = r0[j], ui = i0[j];
                    double vr = r1[j], vi = i1[j];
                    double xr = vr * twr - vi * twi;
                    double xi = vr * twi + vi * twr;
                    r0[j] = ur + xr;
                    i0[j] = ui + xi;
                    r1[j] = ur - xr;
                    i1[j] = ui - xi;
                }
            }
        }
    }
    int n = 0;

  private:
    std::vector<int> rev;
    std::vector<std::vector<double>> stwr, stwi;
};

class Stage {
  public:
    virtual ~Stage() = default;
    virtual void clear() {
        nIn = 0;
        nOut = 0;
        hist.clear();
        skipLeft = inSkipInit();
    }
    virtual long inSkipInit() const { return 0; }
    virtual long availOut() const = 0;   /* outputs computable from nIn */
    virtual long inForOut(long m) const = 0;
    virtual void emit(double *out, long n0, long n1) = 0;
    virtual long keepHist() const = 0;

    long process(const double *x, long n, std::vector<double> &out) {
        if (skipLeft > 0) {
            long d = skipLeft < n ? skipLeft : n;
            x += d;
            n -= d;
            skipLeft -= d;
        }
        if (n > 0) {
            hist.push(x, n);
            nIn += n;
        }
        long avail = availOut();
        long cnt = avail - nOut;
        if (cnt <= 0) return 0;
        out.resize((size_t)cnt);
        emit(out.data(), nOut, avail);
        nOut = avail;
        hist.trimTo(keepHist());
        return cnt;
    }

  protected:
    Hist hist;
    long nIn = 0;
    long nOut = 0;
    long skipLeft = 0;
};

/* y[r] = sum_m k[m] u[r*down+off - m], u = zero-stuffed input
 * (polyphase evaluation; CDSPBlockConvolver content semantics).
 *
 * Execution: per-phase blocked overlap-save FFT convolution on the input
 * grid — the reference DLL's execution model (CDSPBlockConvolver.h:252-354)
 * rather than an O(K)-per-sample loop.  The w stream (full-rate convolver
 * output, t = m*up + ph) is produced block-by-block: one forward FFT of
 * the input window, one spectrum multiply per phase, and one inverse FFT
 * per PAIR of phases (pack w_ph0 + i*w_ph1 — both are real).  Blocks whose
 * input window is complete are cached in a rolling w buffer; the head
 * block (inputs still arriving) is computed transiently.  Tiny kernels
 * keep the direct loop (FFT overhead dominates below ~48 taps/phase). */
class ConvStage : public Stage {
  public:
    long up = 1, down = 1, off = 0, K = 0;
    std::vector<double> k;

    long availOut() const override {
        long t = nIn * up - 1 - off;
        return t >= 0 ? t / down + 1 : 0;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        return ((m - 1) * down + off) / up + 1;
    }
    long keepHist() const override {
        return Kx > 0 ? hop + Kx + 16 : K / up + down + 8;
    }
    void clear() override {
        Stage::clear();
        wc.clear();
        wcT0 = 0;
    }
    void emit(double *out, long n0, long n1) override {
        if (Kx == 0) prepare();
        if (nfft == 0) {  /* small kernel: direct polyphase loop */
            for (long r = n0; r < n1; ++r) {
                long t = r * down + off;
                long phase = (long)(t % up);
                long nhi = t / up;
                double acc = 0.0;
                for (long m = phase, j = 0; m < K; m += up, ++j)
                    acc += k[(size_t)m] * hist.at(nhi - j);
                out[r - n0] = acc;
            }
            return;
        }
        const long t_lo = n0 * down + off;
        const long t_hi = (n1 - 1) * down + off;
        /* drop cached w below t_lo (emission is monotonic) */
        if (!wc.empty() && t_lo > wcT0) {
            long drop = t_lo - wcT0;
            if (drop >= (long)wc.size()) {
                wc.clear();
                wcT0 = t_lo;
            } else {
                wc.erase(wc.begin(), wc.begin() + drop);
                wcT0 = t_lo;
            }
        }
        if (wc.empty()) wcT0 = t_lo;
        /* extend the cache with COMPLETE blocks (all inputs present) */
        long wcEnd = wcT0 + (long)wc.size();
        while (wcEnd <= t_hi) {
            long b = wcEnd / (hop * up);
            if ((b + 1) * hop - 1 >= nIn) break;  /* head block incomplete */
            computeBlock(b);
            long bt0 = b * hop * up;
            long s0 = wcEnd - bt0;  /* skip already-cached prefix */
            wc.insert(wc.end(), blk.begin() + s0, blk.end());
            wcEnd = wcT0 + (long)wc.size();
        }
        /* stream head (inputs still arriving): a head FFT block would be
         * recomputed on every process() call until its window completes,
         * so below ~1/8 block of head outputs the reversed per-phase
         * direct dot is cheaper (unit-stride kernel x unit-stride
         * history) */
        long headB = -1;  /* transient block for the stream head */
        bool headDirect = false;
        if (wcEnd <= t_hi) {
            long headCnt = (t_hi - wcEnd) / down + 1;
            /* breakeven measured on the 24-bit chain (A/B at
             * nfft*{10,25,100}): the direct dot is cache/latency-bound,
             * so the FFT block wins above ~45 head outputs */
            headDirect = headCnt * Kx < (long)nfft * 10;
            if (!headDirect) {
                headB = wcEnd / (hop * up);
                computeBlock(headB);
            }
        }
        for (long r = n0; r < n1; ++r) {
            long t = r * down + off;
            if (t < wcEnd) {
                out[r - n0] = wc[(size_t)(t - wcT0)];
            } else if (headDirect) {
                long ph = t % up, nhi = t / up;
                const double *kr = krev[(size_t)ph].data();
                const double *w = hist.raw(nhi - Kx + 1, Kx);
                double acc = 0.0;
                if (w) {
                    for (long j = 0; j < Kx; ++j) acc += kr[j] * w[j];
                } else {
                    for (long j = 0; j < Kx; ++j)
                        acc += kr[j] * hist.at(nhi - Kx + 1 + j);
                }
                out[r - n0] = acc;
            } else {
                long b = t / (hop * up);
                if (b != headB) {  /* emit range can cross one boundary */
                    computeBlock(b);
                    headB = b;
                }
                out[r - n0] = blk[(size_t)(t - b * hop * up)];
            }
        }
    }

  private:
    void prepare() {
        Kx = (K + up - 1) / up;
        if (Kx < 48) { nfft = 0; return; }  /* direct path */
        int nf = 256;
        while (nf < 4 * (int)Kx) nf <<= 1;
        nfft = nf;
        hop = nfft - Kx + 1;
        fft.init(nf);
        fftHalf.init(nf / 2);
        utwRe.assign((size_t)(nf / 2 + 1), 0.0);
        utwIm.assign((size_t)(nf / 2 + 1), 0.0);
        for (int i = 0; i <= nf / 2; ++i) {
            double a = -2.0 * 3.14159265358979323846 * i / nf;
            utwRe[(size_t)i] = std::cos(a);
            utwIm[(size_t)i] = std::sin(a);
        }
        zre.assign((size_t)(nf / 2), 0.0);
        zim.assign((size_t)(nf / 2), 0.0);
        /* reversed per-phase kernels for the direct head path:
         * w[nhi*up + ph] = sum_j krev[ph][j] * x[nhi - Kx + 1 + j] */
        krev.assign((size_t)up, {});
        for (long ph = 0; ph < up; ++ph) {
            std::vector<double> kr((size_t)Kx, 0.0);
            for (long j = 0; j < Kx; ++j) {
                long m = ph + up * (Kx - 1 - j);
                if (m < K) kr[(size_t)j] = k[(size_t)m];
            }
            krev[(size_t)ph] = std::move(kr);
        }
        spRe.assign((size_t)up, {});
        spIm.assign((size_t)up, {});
        std::vector<double> re((size_t)nf), im((size_t)nf);
        for (long ph = 0; ph < up; ++ph) {
            std::fill(re.begin(), re.end(), 0.0);
            std::fill(im.begin(), im.end(), 0.0);
            for (long j = ph, i = 0; j < K; j += up, ++i)
                re[(size_t)i] = k[(size_t)j] / nf;  /* fold 1/N here */
            fft.run(re.data(), im.data(), false);
            spRe[(size_t)ph] = re;
            spIm[(size_t)ph] = im;
        }
        /* The pair packing computes Z = X*K_ph + i*(X*K_ph1) =
         * X * (K_ph + i*K_ph1): fold the two phase spectra into ONE
         * combined complex spectrum per pair — one complex multiply
         * per bin instead of two plus a combine, and half the spectrum
         * bytes streamed from L2 per block. */
        spCr.assign((size_t)(up / 2), {});
        spCi.assign((size_t)(up / 2), {});
        for (long ph = 0; ph + 1 < up; ph += 2) {
            std::vector<double> cr((size_t)nf), ci((size_t)nf);
            const double *k0r = spRe[(size_t)ph].data();
            const double *k0i = spIm[(size_t)ph].data();
            const double *k1r = spRe[(size_t)(ph + 1)].data();
            const double *k1i = spIm[(size_t)(ph + 1)].data();
            for (int i = 0; i < nf; ++i) {
                cr[(size_t)i] = k0r[i] - k1i[i];
                ci[(size_t)i] = k0i[i] + k1r[i];
            }
            spCr[(size_t)(ph / 2)] = std::move(cr);
            spCi[(size_t)(ph / 2)] = std::move(ci);
        }
        xre.assign((size_t)nf, 0.0);
        xim.assign((size_t)nf, 0.0);
        yre.assign((size_t)nf, 0.0);
        yim.assign((size_t)nf, 0.0);
        blk.assign((size_t)(hop * up), 0.0);
    }

    /* Forward FFT of the real input window via a half-size complex FFT
     * (pack z[m] = x[2m] + i x[2m+1], untwiddle, unfold by conjugate
     * symmetry) — ~45% cheaper than a full-size complex FFT of real
     * data.  Results land in xre/xim as the full N-point spectrum. */
    void realForward() {
        const int h = nfft / 2;
        for (int m = 0; m < h; ++m) {
            zre[(size_t)m] = xre[(size_t)(2 * m)];
            zim[(size_t)m] = xre[(size_t)(2 * m + 1)];
        }
        fftHalf.run(zre.data(), zim.data(), false);
        /* X[k] = E[k] + w^k O[k], E = (Z[k]+conj(Z[h-k]))/2,
         * O = (Z[k]-conj(Z[h-k]))/(2i), w = e^{-2pi i/N} */
        int k = 1;
#if R8BT_AVX512
        {
            const __m512d half_ = _mm512_set1_pd(0.5);
            const __m512i ridx = _mm512_set_epi64(0, 1, 2, 3, 4, 5, 6, 7);
            for (; k + 8 <= h; k += 8) {
                __m512d zr = _mm512_loadu_pd(zre.data() + k);
                __m512d zi = _mm512_loadu_pd(zim.data() + k);
                /* conj(Z[h-k .. h-k-7]) via reversed loads */
                __m512d cr = _mm512_permutexvar_pd(
                    ridx, _mm512_loadu_pd(zre.data() + (h - k - 7)));
                __m512d ci = _mm512_sub_pd(
                    _mm512_setzero_pd(),
                    _mm512_permutexvar_pd(
                        ridx, _mm512_loadu_pd(zim.data() + (h - k - 7))));
                __m512d er = _mm512_mul_pd(half_, _mm512_add_pd(zr, cr));
                __m512d ei = _mm512_mul_pd(half_, _mm512_add_pd(zi, ci));
                __m512d orr = _mm512_mul_pd(half_, _mm512_sub_pd(zi, ci));
                __m512d oi = _mm512_mul_pd(half_, _mm512_sub_pd(cr, zr));
                __m512d twr = _mm512_loadu_pd(utwRe.data() + k);
                __m512d twi = _mm512_loadu_pd(utwIm.data() + k);
                _mm512_storeu_pd(
                    xre.data() + k,
                    _mm512_fmadd_pd(
                        orr, twr,
                        _mm512_fnmadd_pd(oi, twi, er)));
                _mm512_storeu_pd(
                    xim.data() + k,
                    _mm512_fmadd_pd(
                        orr, twi,
                        _mm512_fmadd_pd(oi, twr, ei)));
            }
        }
#endif
        for (; k < h; ++k) {
            int kc = h - k;
            double zr = zre[(size_t)k], zi = zim[(size_t)k];
            double cr = zre[(size_t)kc], ci = -zim[(size_t)kc];
            double er = 0.5 * (zr + cr), ei = 0.5 * (zi + ci);
            double orr = 0.5 * (zi - ci), oi = -0.5 * (zr - cr);
            double twr = utwRe[(size_t)k], twi = utwIm[(size_t)k];
            xre[(size_t)k] = er + orr * twr - oi * twi;
            xim[(size_t)k] = ei + orr * twi + oi * twr;
        }
        xre[0] = zre[0] + zim[0];
        xim[0] = 0.0;
        xre[(size_t)h] = zre[0] - zim[0];  /* Nyquist */
        xim[(size_t)h] = 0.0;
        /* upper half is implied by conjugate symmetry; the spectrum
         * multiply reads it via X[nf-k] = conj(X[k]) (second loop in
         * computeBlock) instead of materializing the mirror */
    }

    /* fill blk[] with w[t] for t in [b*hop*up, (b*hop+hop)*up) */
    void computeBlock(long b) {
        const int nf = nfft;
        hist.copyRange(b * hop - (Kx - 1), nf, xre.data());
        realForward();
        for (long ph = 0; ph < up; ph += 2) {
            const bool pair = ph + 1 < up;
            /* pair: one combined complex spectrum (see prepare);
             * unpaired trailing phase (odd up): the single spectrum */
            const double *kr = pair ? spCr[(size_t)(ph / 2)].data()
                                    : spRe[(size_t)ph].data();
            const double *ki = pair ? spCi[(size_t)(ph / 2)].data()
                                    : spIm[(size_t)ph].data();
            const int hf = nf / 2;
            int i = 0;
#if R8BT_AVX512
            for (; i + 8 <= hf + 1; i += 8) {
                __m512d xr = _mm512_loadu_pd(xre.data() + i);
                __m512d xi = _mm512_loadu_pd(xim.data() + i);
                __m512d cr = _mm512_loadu_pd(kr + i);
                __m512d ci = _mm512_loadu_pd(ki + i);
                _mm512_storeu_pd(
                    yre.data() + i,
                    _mm512_fmsub_pd(xr, cr, _mm512_mul_pd(xi, ci)));
                _mm512_storeu_pd(
                    yim.data() + i,
                    _mm512_fmadd_pd(xr, ci, _mm512_mul_pd(xi, cr)));
            }
#endif
            for (; i <= hf; ++i) {
                double xr = xre[(size_t)i], xi = xim[(size_t)i];
                yre[(size_t)i] = xr * kr[i] - xi * ki[i];
                yim[(size_t)i] = xr * ki[i] + xi * kr[i];
            }
            i = hf + 1;
#if R8BT_AVX512
            {
                const __m512i ridx = _mm512_set_epi64(0, 1, 2, 3, 4, 5, 6, 7);
                for (; i + 8 <= nf; i += 8) {
                    /* X[i] = conj(X[nf-i]): reversed loads of the lower
                     * half */
                    __m512d xr = _mm512_permutexvar_pd(
                        ridx, _mm512_loadu_pd(xre.data() + (nf - i - 7)));
                    __m512d xi = _mm512_sub_pd(
                        _mm512_setzero_pd(),
                        _mm512_permutexvar_pd(
                            ridx,
                            _mm512_loadu_pd(xim.data() + (nf - i - 7))));
                    __m512d cr = _mm512_loadu_pd(kr + i);
                    __m512d ci = _mm512_loadu_pd(ki + i);
                    _mm512_storeu_pd(
                        yre.data() + i,
                        _mm512_fmsub_pd(xr, cr, _mm512_mul_pd(xi, ci)));
                    _mm512_storeu_pd(
                        yim.data() + i,
                        _mm512_fmadd_pd(xr, ci, _mm512_mul_pd(xi, cr)));
                }
            }
#endif
            for (; i < nf; ++i) {  /* X[i] = conj(X[nf-i]) */
                double xr = xre[(size_t)(nf - i)];
                double xi = -xim[(size_t)(nf - i)];
                yre[(size_t)i] = xr * kr[i] - xi * ki[i];
                yim[(size_t)i] = xr * ki[i] + xi * kr[i];
            }
            fft.run(yre.data(), yim.data(), true);
            long m = 0;
#if R8BT_AVX512
            if (up == 2 && pair && ph == 0) {
                /* full interleave [w0 w1 w0 w1 ...] of the two phase
                 * streams in one pass (the scalar loop is a stride-2
                 * scatter gcc leaves scalar) */
                const __m512i ilo = _mm512_set_epi64(11, 3, 10, 2, 9, 1, 8, 0);
                const __m512i ihi =
                    _mm512_set_epi64(15, 7, 14, 6, 13, 5, 12, 4);
                for (; m + 8 <= hop; m += 8) {
                    long j = m + Kx - 1;
                    __m512d a = _mm512_loadu_pd(yre.data() + j);
                    __m512d b = _mm512_loadu_pd(yim.data() + j);
                    _mm512_storeu_pd(blk.data() + 2 * m,
                                     _mm512_permutex2var_pd(a, ilo, b));
                    _mm512_storeu_pd(blk.data() + 2 * m + 8,
                                     _mm512_permutex2var_pd(a, ihi, b));
                }
            }
#endif
            for (; m < hop; ++m) {
                long j = m + Kx - 1;
                blk[(size_t)(m * up + ph)] = yre[(size_t)j];
                if (pair) blk[(size_t)(m * up + ph + 1)] = yim[(size_t)j];
            }
        }
    }

    long Kx = 0;
    int nfft = 0;
    long hop = 0;
    CFFT fft, fftHalf;
    std::vector<std::vector<double>> spRe, spIm, spCr, spCi, krev;
    std::vector<double> xre, xim, yre, yim, blk;
    std::vector<double> zre, zim, utwRe, utwIm;
    std::vector<double> wc;  /* cached w stream, absolute t = wcT0.. */
    long wcT0 = 0;
};

/* y[2n] = x[n]; y[2n+1] = sum taps[i]*(x[n+1+i]+x[n-i]); drop outLat. */
class HBUpStage : public Stage {
  public:
    long nt = 0, outLat = 0;
    std::vector<double> taps;

    long availOut() const override {
        long v = 2 * (nIn - nt) - outLat;
        return v > 0 ? v : 0;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        return (m + outLat + 1) / 2 + nt;
    }
    long keepHist() const override { return 2 * nt + 8; }
    void emit(double *out, long n0, long n1) override {
        for (long s = n0 + outLat; s < n1 + outLat; ++s) {
            long n = s / 2;
            double v;
            if ((s & 1) == 0) {
                v = hist.at(n);
            } else {
                v = 0.0;
                for (long i = 0; i < nt; ++i)
                    v += taps[(size_t)i] *
                         (hist.at(n + 1 + i) + hist.at(n - i));
            }
            out[s - outLat - n0] = v;
        }
    }
};

/* y[n] = x[2n] + sum taps[i]*(x[2n+1+2i]+x[2n-1-2i]); drop outLat. */
class HBDownStage : public Stage {
  public:
    long nt = 0, outLat = 0;
    std::vector<double> taps;

    long availOut() const override {
        long d = nIn - 2 * nt;
        if (d < 0) return 0;  /* C++ '/' truncates toward zero; the
                                 emission algebra (models/lengths.py) uses
                                 floor division */
        long v = d / 2 + 1 - outLat;
        return v > 0 ? v : 0;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        return 2 * (m + outLat - 1) + 2 * nt;
    }
    long keepHist() const override { return 4 * nt + 8; }
    void emit(double *out, long n0, long n1) override {
        for (long n = n0 + outLat; n < n1 + outLat; ++n) {
            double v = hist.at(2 * n);
            for (long i = 0; i < nt; ++i)
                v += taps[(size_t)i] *
                     (hist.at(2 * n + 1 + 2 * i) + hist.at(2 * n - 1 - 2 * i));
            out[n - outLat - n0] = v;
        }
    }
};

/* Whole-stepping fractional interpolator (CDSPFracInterpolator whole mode). */
class FracWholeStage : public Stage {
  public:
    long inStep = 0, outStep = 0, w0 = 0, inLat = 0, fl = 0;
    std::vector<double> table; /* [outStep][fl] */

    long inSkipInit() const override { return inLat; }
    long fl2() const { return fl / 2; }
    long availOut() const override {
        long lim = nIn - fl2() - 1;
        if (lim < 0) return 0;
        return ((lim + 1) * outStep - 1 - w0) / inStep + 1;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        long g = w0 + (m - 1) * inStep;
        return inLat + g / outStep + fl2() + 1;
    }
    long keepHist() const override {
        return fl + inStep / outStep + 16;
    }
    void emit(double *out, long n0, long n1) override {
        long fll = fl2() - 1;
        /* incremental phase stepping (no div/mod per output) + fixed-
         * length tap dots the compiler can unroll/vectorize — the same
         * two optimizations as the reference's whole-stepping fast path
         * (convolve0<FL> templates + PosIncr stepping,
         * CDSPFracInterpolator.h:991-1060) */
        long g0 = w0 + n0 * inStep;
        long s = g0 / outStep;
        long f = g0 % outStep;
        const long sInc = inStep / outStep, fInc = inStep % outStep;
#if R8BT_AVX512
        /* Four outputs in flight: 4 independent FMA accumulator chains
         * hide the 4-cycle FMA latency the single-output reduction loop
         * is bound by; the tail vector of non-multiple-of-8 tap counts
         * is a masked load (fault-suppressed on the masked-out lanes). */
        const int nv = (int)(fl >> 3);
        const unsigned rem = (unsigned)(fl & 7);
        const __mmask8 tmask =
            rem ? (__mmask8)((1u << rem) - 1) : (__mmask8)0;
        const double *fp[4], *wp[4];
        double *op[4];
        int nb = 0;
        auto flush = [&]() {
            if (nb == 4) {
                __m512d a0 = _mm512_setzero_pd(), a1 = a0, a2 = a0, a3 = a0;
                for (int v = 0; v < nv; ++v) {
                    const long o = (long)v * 8;
                    a0 = _mm512_fmadd_pd(_mm512_loadu_pd(fp[0] + o),
                                         _mm512_loadu_pd(wp[0] + o), a0);
                    a1 = _mm512_fmadd_pd(_mm512_loadu_pd(fp[1] + o),
                                         _mm512_loadu_pd(wp[1] + o), a1);
                    a2 = _mm512_fmadd_pd(_mm512_loadu_pd(fp[2] + o),
                                         _mm512_loadu_pd(wp[2] + o), a2);
                    a3 = _mm512_fmadd_pd(_mm512_loadu_pd(fp[3] + o),
                                         _mm512_loadu_pd(wp[3] + o), a3);
                }
                if (tmask) {
                    const long o = (long)nv * 8;
                    a0 = _mm512_fmadd_pd(
                        _mm512_maskz_loadu_pd(tmask, fp[0] + o),
                        _mm512_maskz_loadu_pd(tmask, wp[0] + o), a0);
                    a1 = _mm512_fmadd_pd(
                        _mm512_maskz_loadu_pd(tmask, fp[1] + o),
                        _mm512_maskz_loadu_pd(tmask, wp[1] + o), a1);
                    a2 = _mm512_fmadd_pd(
                        _mm512_maskz_loadu_pd(tmask, fp[2] + o),
                        _mm512_maskz_loadu_pd(tmask, wp[2] + o), a2);
                    a3 = _mm512_fmadd_pd(
                        _mm512_maskz_loadu_pd(tmask, fp[3] + o),
                        _mm512_maskz_loadu_pd(tmask, wp[3] + o), a3);
                }
                *op[0] = _mm512_reduce_add_pd(a0);
                *op[1] = _mm512_reduce_add_pd(a1);
                *op[2] = _mm512_reduce_add_pd(a2);
                *op[3] = _mm512_reduce_add_pd(a3);
            } else {
                for (int q = 0; q < nb; ++q) {
                    __m512d a = _mm512_setzero_pd();
                    for (int v = 0; v < nv; ++v)
                        a = _mm512_fmadd_pd(
                            _mm512_loadu_pd(fp[q] + (long)v * 8),
                            _mm512_loadu_pd(wp[q] + (long)v * 8), a);
                    if (tmask) {
                        const long o = (long)nv * 8;
                        a = _mm512_fmadd_pd(
                            _mm512_maskz_loadu_pd(tmask, fp[q] + o),
                            _mm512_maskz_loadu_pd(tmask, wp[q] + o), a);
                    }
                    *op[q] = _mm512_reduce_add_pd(a);
                }
            }
            nb = 0;
        };
        for (long n = n0; n < n1; ++n) {
            const double *flt = &table[(size_t)(f * fl)];
            const double *w = hist.raw(s - fll, fl);
            if (w) {
                fp[nb] = flt;
                wp[nb] = w;
                op[nb] = out + (n - n0);
                if (++nb == 4) flush();
            } else {  /* stream-start boundary: zero-extended history */
                double acc = 0.0;
                for (long i = 0; i < fl; ++i)
                    acc += flt[i] * hist.at(s - fll + i);
                out[n - n0] = acc;
            }
            s += sInc;
            f += fInc;
            if (f >= outStep) {
                f -= outStep;
                ++s;
            }
        }
        flush();
#else
        for (long n = n0; n < n1; ++n) {
            const double *flt = &table[(size_t)(f * fl)];
            const double *w = hist.raw(s - fll, fl);
            double acc = 0.0;
            if (w) {
                switch (fl) {
                  case 14: acc = dotf<14>(flt, w); break;
                  case 18: acc = dotf<18>(flt, w); break;
                  case 20: acc = dotf<20>(flt, w); break;
                  case 24: acc = dotf<24>(flt, w); break;
                  case 28: acc = dotf<28>(flt, w); break;
                  case 30: acc = dotf<30>(flt, w); break;
                  default:
                    for (long i = 0; i < fl; ++i) acc += flt[i] * w[i];
                }
            } else {
                for (long i = 0; i < fl; ++i)
                    acc += flt[i] * hist.at(s - fll + i);
            }
            out[n - n0] = acc;
            s += sInc;
            f += fInc;
            if (f >= outStep) {
                f -= outStep;
                ++s;
            }
        }
#endif
    }

  private:
    template <int FL>
    static double dotf(const double *flt, const double *w) {
        double acc = 0.0;
        for (int i = 0; i < FL; ++i) acc += flt[i] * w[i];
        return acc;
    }
};

/* Polynomial-mode fractional interpolator: resettable-counter timing
 * (CDSPFracInterpolator.h:907-919), spline filter evaluation. */
class FracPolyStage : public Stage {
  public:
    double srcRate = 0, dstRate = 0, initFracPos = 0;
    long inLat = 0, fl = 0, fracs = 0, rows = 0;
    std::vector<double> table; /* [rows][fl][3] */

    long inSkipInit() const override { return inLat; }
    long fl2() const { return fl / 2; }
    double posOf(long n) const {
        if (n == 0) return initFracPos;
        double shift = initFracPos * dstRate / srcRate;
        return ((double)n + shift) * (srcRate / dstRate);
    }
    long availOut() const override {
        long lim = nIn - fl2() - 1;
        if (lim < 0) return 0;
        double r = srcRate / dstRate;
        double shift = initFracPos * dstRate / srcRate;
        long n = (long)std::floor(((double)lim + 1.0) / r - shift);
        while ((long)std::floor(posOf(n)) > lim) --n;
        while ((long)std::floor(posOf(n + 1)) <= lim) ++n;
        return n + 1 > 0 ? n + 1 : 0;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        long s = (long)std::floor(posOf(m - 1));
        return inLat + s + fl2() + 1;
    }
    long keepHist() const override {
        return fl + (long)std::ceil(srcRate / dstRate) + 16;
    }
    void emit(double *out, long n0, long n1) override {
        long fll = fl2() - 1;
        for (long n = n0; n < n1; ++n) {
            double p = posOf(n);
            long s = (long)std::floor(p);
            double fr = (p - (double)s) * (double)fracs;
            long fi = (long)std::floor(fr);
            double t = fr - (double)fi;
            const double *row = &table[(size_t)(fi * fl * 3)];
            double acc = 0.0;
            for (long i = 0; i < fl; ++i) {
                const double *c = row + i * 3;
                acc += (c[0] + (c[1] + c[2] * t) * t) * hist.at(s - fll + i);
            }
            out[n - n0] = acc;
        }
    }
};

struct Engine {
    double srcRate = 0, dstRate = 0, latencyFrac = 0;
    std::vector<Stage *> stages;
    std::vector<double> bufA, bufB;

    ~Engine() {
        for (auto *s : stages) delete s;
    }
    void clear() {
        for (auto *s : stages) s->clear();
    }
    long process(const double *in, long n, double **out) {
        bufA.assign(in, in + n);
        std::vector<double> *cur = &bufA, *nxt = &bufB;
        for (auto *s : stages) {
            long m = s->process(cur->data(), (long)cur->size(), *nxt);
            nxt->resize((size_t)m);
            std::swap(cur, nxt);
        }
        *out = cur->data();
        return (long)cur->size();
    }
    long inForOut(long m) const {
        for (auto it = stages.rbegin(); it != stages.rend(); ++it)
            m = (*it)->inForOut(m);
        return m;
    }
};

Engine *parseBlob(const void *blob, size_t len) {
    Reader rd{(const uint8_t *)blob, len};
    char magic[4];
    for (int i = 0; i < 4; ++i) magic[i] = (char)rd.get<uint8_t>();
    if (!rd.ok || std::memcmp(magic, "R8BT", 4) != 0) return nullptr;
    uint32_t ver = rd.get<uint32_t>();
    if (ver != 1) return nullptr;
    Engine *e = new Engine();
    e->srcRate = rd.get<double>();
    e->dstRate = rd.get<double>();
    e->latencyFrac = rd.get<double>();
    uint32_t ns = rd.get<uint32_t>();
    for (uint32_t i = 0; i < ns && rd.ok; ++i) {
        uint32_t kind = rd.get<uint32_t>();
        if (kind == 0) {
            auto *s = new ConvStage();
            s->up = rd.get<int64_t>();
            s->down = rd.get<int64_t>();
            s->off = rd.get<int64_t>();
            s->K = rd.get<int64_t>();
            if (s->up <= 0 || s->down <= 0 || !rd.validCount(s->K)) {
                delete s;
                rd.ok = false;
                break;
            }
            s->k.resize((size_t)s->K);
            rd.getArray(s->k.data(), (size_t)s->K);
            e->stages.push_back(s);
        } else if (kind == 1 || kind == 2) {
            long nt = rd.get<int64_t>();
            long lat = rd.get<int64_t>();
            if (lat < 0 || !rd.validCount(nt)) {
                rd.ok = false;
                break;
            }
            if (kind == 1) {
                auto *s = new HBUpStage();
                s->nt = nt;
                s->outLat = lat;
                s->taps.resize((size_t)nt);
                rd.getArray(s->taps.data(), (size_t)nt);
                e->stages.push_back(s);
            } else {
                auto *s = new HBDownStage();
                s->nt = nt;
                s->outLat = lat;
                s->taps.resize((size_t)nt);
                rd.getArray(s->taps.data(), (size_t)nt);
                e->stages.push_back(s);
            }
        } else if (kind == 3) {
            auto *s = new FracWholeStage();
            s->inStep = rd.get<int64_t>();
            s->outStep = rd.get<int64_t>();
            s->w0 = rd.get<int64_t>();
            s->inLat = rd.get<int64_t>();
            s->fl = rd.get<int64_t>();
            if (s->inStep <= 0 || s->outStep <= 0 || s->inLat < 0 ||
                s->fl <= 0 || s->outStep > (1 << 20) || s->fl > (1 << 20) ||
                !rd.validCount(s->outStep * s->fl)) {
                delete s;
                rd.ok = false;
                break;
            }
            s->table.resize((size_t)(s->outStep * s->fl));
            rd.getArray(s->table.data(), s->table.size());
            e->stages.push_back(s);
        } else if (kind == 4) {
            auto *s = new FracPolyStage();
            s->srcRate = rd.get<double>();
            s->dstRate = rd.get<double>();
            s->initFracPos = rd.get<double>();
            s->inLat = rd.get<int64_t>();
            s->fl = rd.get<int64_t>();
            s->fracs = rd.get<int64_t>();
            s->rows = rd.get<int64_t>();
            if (s->inLat < 0 || s->fl <= 0 || s->fracs <= 0 ||
                s->rows <= 0 || s->rows > (1 << 20) || s->fl > (1 << 20) ||
                !rd.validCount(s->rows * s->fl * 3)) {
                delete s;
                rd.ok = false;
                break;
            }
            s->table.resize((size_t)(s->rows * s->fl * 3));
            rd.getArray(s->table.data(), s->table.size());
            e->stages.push_back(s);
        } else {
            rd.ok = false;
        }
    }
    if (!rd.ok) {
        delete e;
        return nullptr;
    }
    e->clear();
    return e;
}

} // namespace

extern "C" {

r8bt_handle r8bt_create_from_blob(const void *blob, size_t len) {
    if (!blob) return nullptr;
    try {
        return (r8bt_handle)parseBlob(blob, len);
    } catch (...) {  // keep the NULL-on-parse-failure ABI contract
        return nullptr;
    }
}

void r8bt_delete(r8bt_handle h) { delete (Engine *)h; }

void r8bt_clear(r8bt_handle h) { ((Engine *)h)->clear(); }

long r8bt_process(r8bt_handle h, const double *in, long in_len,
                  double **out) {
    if (!h || in_len < 0) return -1;
    return ((Engine *)h)->process(in, in_len, out);
}

long r8bt_in_required_for_out(r8bt_handle h, long out_count) {
    if (!h) return -1;
    return ((Engine *)h)->inForOut(out_count);
}

double r8bt_latency_frac(r8bt_handle h) {
    return h ? ((Engine *)h)->latencyFrac : 0.0;
}

const char *r8bt_version(void) { return "r8bt-1.0"; }

} // extern "C"
