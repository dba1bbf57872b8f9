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
 * compute the same expressions 8 (AVX-512) or 4 (AVX2+FMA) lanes at a
 * time.  This is the role the reference's hand-SIMD fft4g/pffft backends
 * and R8B_SSE2/R8B_NEON interpolator bodies play (r8bbase.h:107-134). */
#if defined(__AVX512F__)
#include <immintrin.h>
#define R8BT_AVX512 1
#elif defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>
#define R8BT_AVX2 1
#elif defined(__aarch64__) && defined(__ARM_NEON)
/* 2-lane f64 NEON variants of the hot loops (the role of the reference's
 * R8B_NEON bodies, CDSPHBUpsampler.inc:298, fft/simd/pf_neon_double.h).
 * COMPILE-UNVERIFIED: this build environment has no ARM toolchain and no
 * network to fetch one (zig cc unavailable), so these guards are only
 * ever compiled out on the x86 CI host; review + the mirrored scalar
 * fallbacks are the correctness story until an aarch64 build exists. */
#include <arm_neon.h>
#define R8BT_NEON 1
#endif

namespace {

#if R8BT_AVX2
/* 4-lane f64 helpers (the AVX-512 blocks use masked loads / cross-lane
 * permutes / reduce intrinsics with no direct 256-bit forms) */
static const int64_t r8bt_masktbl[4][4] = {
    {0, 0, 0, 0}, {-1, 0, 0, 0}, {-1, -1, 0, 0}, {-1, -1, -1, 0}};
static inline __m256i r8bt_tailmask4(unsigned rem) {
    return _mm256_loadu_si256((const __m256i *)r8bt_masktbl[rem]);
}
static inline double r8bt_hadd4(__m256d a) {
    __m128d lo = _mm256_castpd256_pd128(a);
    __m128d hi = _mm256_extractf128_pd(a, 1);
    lo = _mm_add_pd(lo, hi);
    return _mm_cvtsd_f64(_mm_add_sd(lo, _mm_unpackhi_pd(lo, lo)));
}
/* [sum a0, sum a1, sum a2, sum a3] */
static inline __m256d r8bt_hsum4x4(__m256d a0, __m256d a1, __m256d a2,
                                   __m256d a3) {
    __m256d t01 = _mm256_add_pd(_mm256_unpacklo_pd(a0, a1),
                                _mm256_unpackhi_pd(a0, a1));
    __m256d t23 = _mm256_add_pd(_mm256_unpacklo_pd(a2, a3),
                                _mm256_unpackhi_pd(a2, a3));
    return _mm256_add_pd(_mm256_permute2f128_pd(t01, t23, 0x20),
                         _mm256_permute2f128_pd(t01, t23, 0x31));
}
/* in-place 4x4 f64 transpose of rows r[0..3] */
static inline void r8bt_tr4(__m256d r[4]) {
    __m256d t0 = _mm256_unpacklo_pd(r[0], r[1]);
    __m256d t1 = _mm256_unpackhi_pd(r[0], r[1]);
    __m256d t2 = _mm256_unpacklo_pd(r[2], r[3]);
    __m256d t3 = _mm256_unpackhi_pd(r[2], r[3]);
    r[0] = _mm256_permute2f128_pd(t0, t2, 0x20);
    r[1] = _mm256_permute2f128_pd(t1, t3, 0x20);
    r[2] = _mm256_permute2f128_pd(t0, t2, 0x31);
    r[3] = _mm256_permute2f128_pd(t1, t3, 0x31);
}
/* even/odd lanes of the 8 doubles [a | b] */
static inline __m256d r8bt_even(__m256d a, __m256d b) {
    return _mm256_unpacklo_pd(_mm256_permute2f128_pd(a, b, 0x20),
                              _mm256_permute2f128_pd(a, b, 0x31));
}
static inline __m256d r8bt_odd(__m256d a, __m256d b) {
    return _mm256_unpackhi_pd(_mm256_permute2f128_pd(a, b, 0x20),
                              _mm256_permute2f128_pd(a, b, 0x31));
}
/* interleave [e0 o0 e1 o1] / [e2 o2 e3 o3] */
static inline __m256d r8bt_ilo(__m256d ev, __m256d od) {
    return _mm256_permute2f128_pd(_mm256_unpacklo_pd(ev, od),
                                  _mm256_unpackhi_pd(ev, od), 0x20);
}
static inline __m256d r8bt_ihi(__m256d ev, __m256d od) {
    return _mm256_permute2f128_pd(_mm256_unpacklo_pd(ev, od),
                                  _mm256_unpackhi_pd(ev, od), 0x31);
}
static inline __m256d r8bt_rev4(__m256d v) {
    return _mm256_permute4x64_pd(v, 0x1B);
}
#endif

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

/* Stockham autosort complex FFT (split re/im, natural order in/out,
 * unscaled inverse).  Radix-8 first stage (s=1: vectorized over
 * butterflies with an 8x8 transpose store), radix-8/4/2 later stages
 * vectorized over the contiguous stride-s inner dimension; the stage
 * count is forced even so the src/dst ping-pong ends in the caller's
 * arrays.  No bit-reversal pass and all stores sequential -- measured
 * 1.6-1.9x over the prior in-place radix-2^2 kernel at the engine's
 * hot sizes (512 forward / 1024 inverse).  Dependency-free: this backs
 * only the host deployment engine's overlap-save convolver (the role
 * the reference's bundled fft4g backend plays for its DLL,
 * CDSPRealFFT.h:98-170); the TPU compute path uses XLA/Pallas FFTs. */
class CFFT {
  public:
    void init(int N) {
        n = N;
        stages.clear();
        int L = 0;
        while ((1 << L) < n) ++L;
        /* radix plan: descending lg list summing to L, even count when
         * possible (split one 8 into 4*2) so the result lands in the
         * caller's arrays without a final copy */
        std::vector<int> rad;
        int c8 = L / 3, rem = L - 3 * c8;   /* rem in {0,1,2} */
        int c4 = rem == 2, c2 = rem == 1;
        if (((c8 + c4 + c2) & 1) && c8 > 0) {
            --c8;                            /* split one 8 into 4*2:   */
            ++c4;                            /* stage count turns even, */
            ++c2;                            /* result lands in-place   */
        }
        rad.insert(rad.end(), (size_t)c8, 3);
        rad.insert(rad.end(), (size_t)c4, 2);
        rad.insert(rad.end(), (size_t)c2, 1);
        int ncur = n, s = 1;
        for (int lg : rad) {
            Stage st;
            st.lg = lg;
            st.s = s;
            int R = 1 << lg, m = ncur / R;
            st.m = m;
            for (int j = 1; j < R; ++j) {
                std::vector<double> tr((size_t)m), ti((size_t)m);
                for (int p = 0; p < m; ++p) {
                    double a = -2.0 * M_PI * (double)j * p / ncur;
                    tr[(size_t)p] = std::cos(a);
                    ti[(size_t)p] = std::sin(a);
                }
                st.twr.push_back(std::move(tr));
                st.twi.push_back(std::move(ti));
            }
            stages.push_back(std::move(st));
            ncur = m;
            s *= R;
        }
        wr.assign((size_t)n, 0.0);
        wi.assign((size_t)n, 0.0);
    }

    void run(double *re, double *im, bool inv) {
        const double sg = inv ? -1.0 : 1.0; /* conj twiddles on inverse */
        double *ar = re, *ai = im;
        double *br = wr.data(), *bi = wi.data();
        for (const Stage &st : stages) {
            switch (st.lg) {
                case 3: stage8(st, ar, ai, br, bi, sg); break;
                case 2: stage4(st, ar, ai, br, bi, sg); break;
                default: stage2(st, ar, ai, br, bi, sg); break;
            }
            std::swap(ar, br);
            std::swap(ai, bi);
        }
        if (ar != re) {
            std::memcpy(re, ar, (size_t)n * sizeof(double));
            std::memcpy(im, ai, (size_t)n * sizeof(double));
        }
    }
    int n = 0;

  private:
    struct Stage {
        int lg, s, m;
        std::vector<std::vector<double>> twr, twi;
    };

#if R8BT_AVX512
    /* 8x8 f64 transpose (rows r[i] -> columns) */
    static inline void tr8(__m512d r[8]) {
        __m512d t[8];
        t[0] = _mm512_unpacklo_pd(r[0], r[1]);
        t[1] = _mm512_unpackhi_pd(r[0], r[1]);
        t[2] = _mm512_unpacklo_pd(r[2], r[3]);
        t[3] = _mm512_unpackhi_pd(r[2], r[3]);
        t[4] = _mm512_unpacklo_pd(r[4], r[5]);
        t[5] = _mm512_unpackhi_pd(r[4], r[5]);
        t[6] = _mm512_unpacklo_pd(r[6], r[7]);
        t[7] = _mm512_unpackhi_pd(r[6], r[7]);
        __m512d u0 = _mm512_shuffle_f64x2(t[0], t[2], 0x88);
        __m512d u1 = _mm512_shuffle_f64x2(t[4], t[6], 0x88);
        __m512d v0 = _mm512_shuffle_f64x2(t[1], t[3], 0x88);
        __m512d v1 = _mm512_shuffle_f64x2(t[5], t[7], 0x88);
        __m512d w0 = _mm512_shuffle_f64x2(t[0], t[2], 0xDD);
        __m512d w1 = _mm512_shuffle_f64x2(t[4], t[6], 0xDD);
        __m512d x0 = _mm512_shuffle_f64x2(t[1], t[3], 0xDD);
        __m512d x1 = _mm512_shuffle_f64x2(t[5], t[7], 0xDD);
        r[0] = _mm512_shuffle_f64x2(u0, u1, 0x88);
        r[1] = _mm512_shuffle_f64x2(v0, v1, 0x88);
        r[2] = _mm512_shuffle_f64x2(w0, w1, 0x88);
        r[3] = _mm512_shuffle_f64x2(x0, x1, 0x88);
        r[4] = _mm512_shuffle_f64x2(u0, u1, 0xDD);
        r[5] = _mm512_shuffle_f64x2(v0, v1, 0xDD);
        r[6] = _mm512_shuffle_f64x2(w0, w1, 0xDD);
        r[7] = _mm512_shuffle_f64x2(x0, x1, 0xDD);
    }

    /* radix-8 butterfly on 8 complex vectors (in place), forward
     * twiddle-free part: v[r] -> B[r] in OUTPUT index order j */
    static inline void bfly8(__m512d vr[8], __m512d vi[8], __m512d sgv,
                             __m512d nsgv) {
        const __m512d Cv = _mm512_set1_pd(0.70710678118654752440);
        __m512d cr[4], ci[4], dr[4], di[4];
        for (int r = 0; r < 4; ++r) {
            cr[r] = _mm512_add_pd(vr[r], vr[r + 4]);
            ci[r] = _mm512_add_pd(vi[r], vi[r + 4]);
            dr[r] = _mm512_sub_pd(vr[r], vr[r + 4]);
            di[r] = _mm512_sub_pd(vi[r], vi[r + 4]);
        }
        /* d1 *= C*(1-sg i); d2 *= -sg i; d3 *= C*(-1-sg i) */
        {
            __m512d x = dr[1], y = di[1];
            dr[1] = _mm512_mul_pd(Cv, _mm512_fmadd_pd(sgv, y, x));
            di[1] = _mm512_mul_pd(Cv, _mm512_fnmadd_pd(sgv, x, y));
            x = dr[2];
            y = di[2];
            dr[2] = _mm512_mul_pd(sgv, y);
            di[2] = _mm512_mul_pd(nsgv, x);
            x = dr[3];
            y = di[3];
            dr[3] = _mm512_mul_pd(Cv, _mm512_fmsub_pd(sgv, y, x));
            di[3] = _mm512_mul_pd(Cv, _mm512_fnmadd_pd(sgv, x,
                                                       _mm512_sub_pd(
                                                           _mm512_setzero_pd(),
                                                           y)));
        }
        /* radix-4 of c -> B0,B2,B4,B6 ; radix-4 of d -> B1,B3,B5,B7 */
        __m512d t0r = _mm512_add_pd(cr[0], cr[2]);
        __m512d t0i = _mm512_add_pd(ci[0], ci[2]);
        __m512d t1r = _mm512_sub_pd(cr[0], cr[2]);
        __m512d t1i = _mm512_sub_pd(ci[0], ci[2]);
        __m512d t2r = _mm512_add_pd(cr[1], cr[3]);
        __m512d t2i = _mm512_add_pd(ci[1], ci[3]);
        __m512d sdr = _mm512_sub_pd(cr[1], cr[3]);
        __m512d sdi = _mm512_sub_pd(ci[1], ci[3]);
        __m512d t3r = _mm512_mul_pd(sgv, sdi);
        __m512d t3i = _mm512_mul_pd(nsgv, sdr);
        vr[0] = _mm512_add_pd(t0r, t2r);
        vi[0] = _mm512_add_pd(t0i, t2i);
        vr[2] = _mm512_add_pd(t1r, t3r);
        vi[2] = _mm512_add_pd(t1i, t3i);
        vr[4] = _mm512_sub_pd(t0r, t2r);
        vi[4] = _mm512_sub_pd(t0i, t2i);
        vr[6] = _mm512_sub_pd(t1r, t3r);
        vi[6] = _mm512_sub_pd(t1i, t3i);
        t0r = _mm512_add_pd(dr[0], dr[2]);
        t0i = _mm512_add_pd(di[0], di[2]);
        t1r = _mm512_sub_pd(dr[0], dr[2]);
        t1i = _mm512_sub_pd(di[0], di[2]);
        t2r = _mm512_add_pd(dr[1], dr[3]);
        t2i = _mm512_add_pd(di[1], di[3]);
        sdr = _mm512_sub_pd(dr[1], dr[3]);
        sdi = _mm512_sub_pd(di[1], di[3]);
        t3r = _mm512_mul_pd(sgv, sdi);
        t3i = _mm512_mul_pd(nsgv, sdr);
        vr[1] = _mm512_add_pd(t0r, t2r);
        vi[1] = _mm512_add_pd(t0i, t2i);
        vr[3] = _mm512_add_pd(t1r, t3r);
        vi[3] = _mm512_add_pd(t1i, t3i);
        vr[5] = _mm512_sub_pd(t0r, t2r);
        vi[5] = _mm512_sub_pd(t0i, t2i);
        vr[7] = _mm512_sub_pd(t1r, t3r);
        vi[7] = _mm512_sub_pd(t1i, t3i);
    }
#elif R8BT_AVX2
    /* radix-8 butterfly on 8 complex 4-lane vectors (in place), forward
     * twiddle-free part: v[r] -> B[r] in OUTPUT index order j */
    static inline void bfly8(__m256d vr[8], __m256d vi[8], __m256d sgv,
                             __m256d nsgv) {
        const __m256d Cv = _mm256_set1_pd(0.70710678118654752440);
        __m256d cr[4], ci[4], dr[4], di[4];
        for (int r = 0; r < 4; ++r) {
            cr[r] = _mm256_add_pd(vr[r], vr[r + 4]);
            ci[r] = _mm256_add_pd(vi[r], vi[r + 4]);
            dr[r] = _mm256_sub_pd(vr[r], vr[r + 4]);
            di[r] = _mm256_sub_pd(vi[r], vi[r + 4]);
        }
        /* d1 *= C*(1-sg i); d2 *= -sg i; d3 *= C*(-1-sg i) */
        {
            __m256d x = dr[1], y = di[1];
            dr[1] = _mm256_mul_pd(Cv, _mm256_fmadd_pd(sgv, y, x));
            di[1] = _mm256_mul_pd(Cv, _mm256_fnmadd_pd(sgv, x, y));
            x = dr[2];
            y = di[2];
            dr[2] = _mm256_mul_pd(sgv, y);
            di[2] = _mm256_mul_pd(nsgv, x);
            x = dr[3];
            y = di[3];
            dr[3] = _mm256_mul_pd(Cv, _mm256_fmsub_pd(sgv, y, x));
            di[3] = _mm256_mul_pd(
                Cv, _mm256_fnmadd_pd(sgv, x,
                                     _mm256_sub_pd(_mm256_setzero_pd(), y)));
        }
        /* radix-4 of c -> B0,B2,B4,B6 ; radix-4 of d -> B1,B3,B5,B7 */
        __m256d t0r = _mm256_add_pd(cr[0], cr[2]);
        __m256d t0i = _mm256_add_pd(ci[0], ci[2]);
        __m256d t1r = _mm256_sub_pd(cr[0], cr[2]);
        __m256d t1i = _mm256_sub_pd(ci[0], ci[2]);
        __m256d t2r = _mm256_add_pd(cr[1], cr[3]);
        __m256d t2i = _mm256_add_pd(ci[1], ci[3]);
        __m256d sdr = _mm256_sub_pd(cr[1], cr[3]);
        __m256d sdi = _mm256_sub_pd(ci[1], ci[3]);
        __m256d t3r = _mm256_mul_pd(sgv, sdi);
        __m256d t3i = _mm256_mul_pd(nsgv, sdr);
        vr[0] = _mm256_add_pd(t0r, t2r);
        vi[0] = _mm256_add_pd(t0i, t2i);
        vr[2] = _mm256_add_pd(t1r, t3r);
        vi[2] = _mm256_add_pd(t1i, t3i);
        vr[4] = _mm256_sub_pd(t0r, t2r);
        vi[4] = _mm256_sub_pd(t0i, t2i);
        vr[6] = _mm256_sub_pd(t1r, t3r);
        vi[6] = _mm256_sub_pd(t1i, t3i);
        t0r = _mm256_add_pd(dr[0], dr[2]);
        t0i = _mm256_add_pd(di[0], di[2]);
        t1r = _mm256_sub_pd(dr[0], dr[2]);
        t1i = _mm256_sub_pd(di[0], di[2]);
        t2r = _mm256_add_pd(dr[1], dr[3]);
        t2i = _mm256_add_pd(di[1], di[3]);
        sdr = _mm256_sub_pd(dr[1], dr[3]);
        sdi = _mm256_sub_pd(di[1], di[3]);
        t3r = _mm256_mul_pd(sgv, sdi);
        t3i = _mm256_mul_pd(nsgv, sdr);
        vr[1] = _mm256_add_pd(t0r, t2r);
        vi[1] = _mm256_add_pd(t0i, t2i);
        vr[3] = _mm256_add_pd(t1r, t3r);
        vi[3] = _mm256_add_pd(t1i, t3i);
        vr[5] = _mm256_sub_pd(t0r, t2r);
        vi[5] = _mm256_sub_pd(t0i, t2i);
        vr[7] = _mm256_sub_pd(t1r, t3r);
        vi[7] = _mm256_sub_pd(t1i, t3i);
    }
#endif

    static void stage2(const Stage &st, const double *xr, const double *xi,
                       double *yr, double *yi, double sg) {
        const int m = st.m, s = st.s;
        const double *tr = st.twr[0].data(), *ti = st.twi[0].data();
        for (int p = 0; p < m; ++p) {
            const double wr_ = tr[p], wi_ = sg * ti[p];
            const double *arp = xr + (size_t)s * p;
            const double *aip = xi + (size_t)s * p;
            const double *brp = arp + (size_t)s * m;
            const double *bip = aip + (size_t)s * m;
            double *y0r = yr + (size_t)s * 2 * p;
            double *y0i = yi + (size_t)s * 2 * p;
            double *y1r = y0r + s;
            double *y1i = y0i + s;
            int q = 0;
#if R8BT_AVX512
            {
                const __m512d wrv = _mm512_set1_pd(wr_);
                const __m512d wiv = _mm512_set1_pd(wi_);
                for (; q + 8 <= s; q += 8) {
                    __m512d ar_ = _mm512_loadu_pd(arp + q);
                    __m512d ai_ = _mm512_loadu_pd(aip + q);
                    __m512d br_ = _mm512_loadu_pd(brp + q);
                    __m512d bi_ = _mm512_loadu_pd(bip + q);
                    _mm512_storeu_pd(y0r + q, _mm512_add_pd(ar_, br_));
                    _mm512_storeu_pd(y0i + q, _mm512_add_pd(ai_, bi_));
                    __m512d dr = _mm512_sub_pd(ar_, br_);
                    __m512d di = _mm512_sub_pd(ai_, bi_);
                    _mm512_storeu_pd(
                        y1r + q,
                        _mm512_fmsub_pd(dr, wrv, _mm512_mul_pd(di, wiv)));
                    _mm512_storeu_pd(
                        y1i + q,
                        _mm512_fmadd_pd(dr, wiv, _mm512_mul_pd(di, wrv)));
                }
            }
#elif R8BT_AVX2
            {
                const __m256d wrv = _mm256_set1_pd(wr_);
                const __m256d wiv = _mm256_set1_pd(wi_);
                for (; q + 4 <= s; q += 4) {
                    __m256d ar_ = _mm256_loadu_pd(arp + q);
                    __m256d ai_ = _mm256_loadu_pd(aip + q);
                    __m256d br_ = _mm256_loadu_pd(brp + q);
                    __m256d bi_ = _mm256_loadu_pd(bip + q);
                    _mm256_storeu_pd(y0r + q, _mm256_add_pd(ar_, br_));
                    _mm256_storeu_pd(y0i + q, _mm256_add_pd(ai_, bi_));
                    __m256d dr = _mm256_sub_pd(ar_, br_);
                    __m256d di = _mm256_sub_pd(ai_, bi_);
                    _mm256_storeu_pd(
                        y1r + q,
                        _mm256_fmsub_pd(dr, wrv, _mm256_mul_pd(di, wiv)));
                    _mm256_storeu_pd(
                        y1i + q,
                        _mm256_fmadd_pd(dr, wiv, _mm256_mul_pd(di, wrv)));
                }
            }
#endif
            for (; q < s; ++q) {
                double ar_ = arp[q], ai_ = aip[q];
                double br_ = brp[q], bi_ = bip[q];
                y0r[q] = ar_ + br_;
                y0i[q] = ai_ + bi_;
                double dr = ar_ - br_, di = ai_ - bi_;
                y1r[q] = dr * wr_ - di * wi_;
                y1i[q] = dr * wi_ + di * wr_;
            }
        }
    }

    static void stage4(const Stage &st, const double *xr, const double *xi,
                       double *yr, double *yi, double sg) {
        const int m = st.m, s = st.s;
        const double *t1r_ = st.twr[0].data(), *t1i_ = st.twi[0].data();
        const double *t2r_ = st.twr[1].data(), *t2i_ = st.twi[1].data();
        const double *t3r_ = st.twr[2].data(), *t3i_ = st.twi[2].data();
        for (int p = 0; p < m; ++p) {
            const double w1r = t1r_[p], w1i = sg * t1i_[p];
            const double w2r = t2r_[p], w2i = sg * t2i_[p];
            const double w3r = t3r_[p], w3i = sg * t3i_[p];
            const double *a_r = xr + (size_t)s * p;
            const double *a_i = xi + (size_t)s * p;
            const double *b_r = a_r + (size_t)s * m;
            const double *b_i = a_i + (size_t)s * m;
            const double *c_r = b_r + (size_t)s * m;
            const double *c_i = b_i + (size_t)s * m;
            const double *d_r = c_r + (size_t)s * m;
            const double *d_i = c_i + (size_t)s * m;
            double *o0r = yr + (size_t)s * 4 * p;
            double *o0i = yi + (size_t)s * 4 * p;
            double *o1r = o0r + s, *o1i = o0i + s;
            double *o2r = o1r + s, *o2i = o1i + s;
            double *o3r = o2r + s, *o3i = o2i + s;
            int q = 0;
#if R8BT_AVX512
            {
                const __m512d sgv = _mm512_set1_pd(sg);
                const __m512d nsgv = _mm512_set1_pd(-sg);
                const __m512d w1rv = _mm512_set1_pd(w1r);
                const __m512d w1iv = _mm512_set1_pd(w1i);
                const __m512d w2rv = _mm512_set1_pd(w2r);
                const __m512d w2iv = _mm512_set1_pd(w2i);
                const __m512d w3rv = _mm512_set1_pd(w3r);
                const __m512d w3iv = _mm512_set1_pd(w3i);
                for (; q + 8 <= s; q += 8) {
                    __m512d ar = _mm512_loadu_pd(a_r + q);
                    __m512d ai = _mm512_loadu_pd(a_i + q);
                    __m512d br = _mm512_loadu_pd(b_r + q);
                    __m512d bi = _mm512_loadu_pd(b_i + q);
                    __m512d cr = _mm512_loadu_pd(c_r + q);
                    __m512d ci = _mm512_loadu_pd(c_i + q);
                    __m512d dr = _mm512_loadu_pd(d_r + q);
                    __m512d di = _mm512_loadu_pd(d_i + q);
                    __m512d t0r = _mm512_add_pd(ar, cr);
                    __m512d t0i = _mm512_add_pd(ai, ci);
                    __m512d t1r = _mm512_sub_pd(ar, cr);
                    __m512d t1i = _mm512_sub_pd(ai, ci);
                    __m512d t2r = _mm512_add_pd(br, dr);
                    __m512d t2i = _mm512_add_pd(bi, di);
                    __m512d sdr = _mm512_sub_pd(br, dr);
                    __m512d sdi = _mm512_sub_pd(bi, di);
                    __m512d t3r = _mm512_mul_pd(sgv, sdi);
                    __m512d t3i = _mm512_mul_pd(nsgv, sdr);
                    _mm512_storeu_pd(o0r + q, _mm512_add_pd(t0r, t2r));
                    _mm512_storeu_pd(o0i + q, _mm512_add_pd(t0i, t2i));
                    __m512d u1r = _mm512_add_pd(t1r, t3r);
                    __m512d u1i = _mm512_add_pd(t1i, t3i);
                    _mm512_storeu_pd(
                        o1r + q,
                        _mm512_fmsub_pd(u1r, w1rv, _mm512_mul_pd(u1i, w1iv)));
                    _mm512_storeu_pd(
                        o1i + q,
                        _mm512_fmadd_pd(u1r, w1iv, _mm512_mul_pd(u1i, w1rv)));
                    __m512d u2r = _mm512_sub_pd(t0r, t2r);
                    __m512d u2i = _mm512_sub_pd(t0i, t2i);
                    _mm512_storeu_pd(
                        o2r + q,
                        _mm512_fmsub_pd(u2r, w2rv, _mm512_mul_pd(u2i, w2iv)));
                    _mm512_storeu_pd(
                        o2i + q,
                        _mm512_fmadd_pd(u2r, w2iv, _mm512_mul_pd(u2i, w2rv)));
                    __m512d u3r = _mm512_sub_pd(t1r, t3r);
                    __m512d u3i = _mm512_sub_pd(t1i, t3i);
                    _mm512_storeu_pd(
                        o3r + q,
                        _mm512_fmsub_pd(u3r, w3rv, _mm512_mul_pd(u3i, w3iv)));
                    _mm512_storeu_pd(
                        o3i + q,
                        _mm512_fmadd_pd(u3r, w3iv, _mm512_mul_pd(u3i, w3rv)));
                }
            }
#elif R8BT_AVX2
            {
                const __m256d sgv = _mm256_set1_pd(sg);
                const __m256d nsgv = _mm256_set1_pd(-sg);
                const __m256d w1rv = _mm256_set1_pd(w1r);
                const __m256d w1iv = _mm256_set1_pd(w1i);
                const __m256d w2rv = _mm256_set1_pd(w2r);
                const __m256d w2iv = _mm256_set1_pd(w2i);
                const __m256d w3rv = _mm256_set1_pd(w3r);
                const __m256d w3iv = _mm256_set1_pd(w3i);
                for (; q + 4 <= s; q += 4) {
                    __m256d ar = _mm256_loadu_pd(a_r + q);
                    __m256d ai = _mm256_loadu_pd(a_i + q);
                    __m256d br = _mm256_loadu_pd(b_r + q);
                    __m256d bi = _mm256_loadu_pd(b_i + q);
                    __m256d cr = _mm256_loadu_pd(c_r + q);
                    __m256d ci = _mm256_loadu_pd(c_i + q);
                    __m256d dr = _mm256_loadu_pd(d_r + q);
                    __m256d di = _mm256_loadu_pd(d_i + q);
                    __m256d t0r = _mm256_add_pd(ar, cr);
                    __m256d t0i = _mm256_add_pd(ai, ci);
                    __m256d t1r = _mm256_sub_pd(ar, cr);
                    __m256d t1i = _mm256_sub_pd(ai, ci);
                    __m256d t2r = _mm256_add_pd(br, dr);
                    __m256d t2i = _mm256_add_pd(bi, di);
                    __m256d sdr = _mm256_sub_pd(br, dr);
                    __m256d sdi = _mm256_sub_pd(bi, di);
                    __m256d t3r = _mm256_mul_pd(sgv, sdi);
                    __m256d t3i = _mm256_mul_pd(nsgv, sdr);
                    _mm256_storeu_pd(o0r + q, _mm256_add_pd(t0r, t2r));
                    _mm256_storeu_pd(o0i + q, _mm256_add_pd(t0i, t2i));
                    __m256d u1r = _mm256_add_pd(t1r, t3r);
                    __m256d u1i = _mm256_add_pd(t1i, t3i);
                    _mm256_storeu_pd(
                        o1r + q,
                        _mm256_fmsub_pd(u1r, w1rv, _mm256_mul_pd(u1i, w1iv)));
                    _mm256_storeu_pd(
                        o1i + q,
                        _mm256_fmadd_pd(u1r, w1iv, _mm256_mul_pd(u1i, w1rv)));
                    __m256d u2r = _mm256_sub_pd(t0r, t2r);
                    __m256d u2i = _mm256_sub_pd(t0i, t2i);
                    _mm256_storeu_pd(
                        o2r + q,
                        _mm256_fmsub_pd(u2r, w2rv, _mm256_mul_pd(u2i, w2iv)));
                    _mm256_storeu_pd(
                        o2i + q,
                        _mm256_fmadd_pd(u2r, w2iv, _mm256_mul_pd(u2i, w2rv)));
                    __m256d u3r = _mm256_sub_pd(t1r, t3r);
                    __m256d u3i = _mm256_sub_pd(t1i, t3i);
                    _mm256_storeu_pd(
                        o3r + q,
                        _mm256_fmsub_pd(u3r, w3rv, _mm256_mul_pd(u3i, w3iv)));
                    _mm256_storeu_pd(
                        o3i + q,
                        _mm256_fmadd_pd(u3r, w3iv, _mm256_mul_pd(u3i, w3rv)));
                }
            }
#endif
            for (; q < s; ++q) {
                double t0r = a_r[q] + c_r[q], t0i = a_i[q] + c_i[q];
                double t1r = a_r[q] - c_r[q], t1i = a_i[q] - c_i[q];
                double t2r = b_r[q] + d_r[q], t2i = b_i[q] + d_i[q];
                double sdr = b_r[q] - d_r[q], sdi = b_i[q] - d_i[q];
                double t3r = sg * sdi, t3i = -sg * sdr;
                o0r[q] = t0r + t2r;
                o0i[q] = t0i + t2i;
                double u1r = t1r + t3r, u1i = t1i + t3i;
                o1r[q] = u1r * w1r - u1i * w1i;
                o1i[q] = u1r * w1i + u1i * w1r;
                double u2r = t0r - t2r, u2i = t0i - t2i;
                o2r[q] = u2r * w2r - u2i * w2i;
                o2i[q] = u2r * w2i + u2i * w2r;
                double u3r = t1r - t3r, u3i = t1i - t3i;
                o3r[q] = u3r * w3r - u3i * w3i;
                o3i[q] = u3r * w3i + u3i * w3r;
            }
        }
    }

    static void stage8(const Stage &st, const double *xr, const double *xi,
                       double *yr, double *yi, double sg) {
        const int m = st.m, s = st.s;
        const double C = 0.70710678118654752440;
        int p0 = 0;
#if R8BT_AVX512
        const __m512d sgv = _mm512_set1_pd(sg);
        const __m512d nsgv = _mm512_set1_pd(-sg);
        if (s == 1) {
            /* first stage: vectorize over p, outputs y[8p+j] via an
             * 8x8 transpose of the (j, p) result block */
            for (; p0 + 8 <= m; p0 += 8) {
                __m512d vr[8], vi[8];
                for (int r = 0; r < 8; ++r) {
                    vr[r] = _mm512_loadu_pd(xr + p0 + (size_t)r * m);
                    vi[r] = _mm512_loadu_pd(xi + p0 + (size_t)r * m);
                }
                bfly8(vr, vi, sgv, nsgv);
                for (int j = 1; j < 8; ++j) {
                    __m512d wjr =
                        _mm512_loadu_pd(st.twr[(size_t)(j - 1)].data() + p0);
                    __m512d wji = _mm512_mul_pd(
                        sgv,
                        _mm512_loadu_pd(st.twi[(size_t)(j - 1)].data() + p0));
                    __m512d rr = _mm512_fmsub_pd(vr[j], wjr,
                                                 _mm512_mul_pd(vi[j], wji));
                    __m512d ii = _mm512_fmadd_pd(vr[j], wji,
                                                 _mm512_mul_pd(vi[j], wjr));
                    vr[j] = rr;
                    vi[j] = ii;
                }
                tr8(vr);
                tr8(vi);
                for (int i = 0; i < 8; ++i) {
                    _mm512_storeu_pd(yr + 8 * (size_t)(p0 + i), vr[i]);
                    _mm512_storeu_pd(yi + 8 * (size_t)(p0 + i), vi[i]);
                }
            }
        } else if (s >= 8) {
            for (int p = 0; p < m; ++p) {
                __m512d wv[7][2];
                for (int j = 1; j < 8; ++j) {
                    wv[j - 1][0] =
                        _mm512_set1_pd(st.twr[(size_t)(j - 1)][(size_t)p]);
                    wv[j - 1][1] = _mm512_set1_pd(
                        sg * st.twi[(size_t)(j - 1)][(size_t)p]);
                }
                const double *base_r = xr + (size_t)s * p;
                const double *base_i = xi + (size_t)s * p;
                double *out_r = yr + (size_t)s * 8 * p;
                double *out_i = yi + (size_t)s * 8 * p;
                for (int q = 0; q + 8 <= s; q += 8) {
                    __m512d vr[8], vi[8];
                    for (int r = 0; r < 8; ++r) {
                        vr[r] = _mm512_loadu_pd(base_r + q +
                                                (size_t)s * r * m);
                        vi[r] = _mm512_loadu_pd(base_i + q +
                                                (size_t)s * r * m);
                    }
                    bfly8(vr, vi, sgv, nsgv);
                    _mm512_storeu_pd(out_r + q, vr[0]);
                    _mm512_storeu_pd(out_i + q, vi[0]);
                    for (int j = 1; j < 8; ++j) {
                        _mm512_storeu_pd(
                            out_r + q + (size_t)s * j,
                            _mm512_fmsub_pd(vr[j], wv[j - 1][0],
                                            _mm512_mul_pd(vi[j],
                                                          wv[j - 1][1])));
                        _mm512_storeu_pd(
                            out_i + q + (size_t)s * j,
                            _mm512_fmadd_pd(vr[j], wv[j - 1][1],
                                            _mm512_mul_pd(vi[j],
                                                          wv[j - 1][0])));
                    }
                }
            }
            p0 = m; /* fully handled */
        }
#elif R8BT_AVX2
        const __m256d sgv = _mm256_set1_pd(sg);
        const __m256d nsgv = _mm256_set1_pd(-sg);
        if (s == 1) {
            /* first stage: vectorize over p, outputs y[8p+j] via two
             * 4x4 transposes of the (j, p) result block */
            for (; p0 + 4 <= m; p0 += 4) {
                __m256d vr[8], vi[8];
                for (int r = 0; r < 8; ++r) {
                    vr[r] = _mm256_loadu_pd(xr + p0 + (size_t)r * m);
                    vi[r] = _mm256_loadu_pd(xi + p0 + (size_t)r * m);
                }
                bfly8(vr, vi, sgv, nsgv);
                for (int j = 1; j < 8; ++j) {
                    __m256d wjr =
                        _mm256_loadu_pd(st.twr[(size_t)(j - 1)].data() + p0);
                    __m256d wji = _mm256_mul_pd(
                        sgv,
                        _mm256_loadu_pd(st.twi[(size_t)(j - 1)].data() + p0));
                    __m256d rr = _mm256_fmsub_pd(vr[j], wjr,
                                                 _mm256_mul_pd(vi[j], wji));
                    __m256d ii = _mm256_fmadd_pd(vr[j], wji,
                                                 _mm256_mul_pd(vi[j], wjr));
                    vr[j] = rr;
                    vi[j] = ii;
                }
                r8bt_tr4(vr);      /* j = 0..3 block */
                r8bt_tr4(vr + 4);  /* j = 4..7 block */
                r8bt_tr4(vi);
                r8bt_tr4(vi + 4);
                for (int i = 0; i < 4; ++i) {
                    _mm256_storeu_pd(yr + 8 * (size_t)(p0 + i), vr[i]);
                    _mm256_storeu_pd(yr + 8 * (size_t)(p0 + i) + 4,
                                     vr[i + 4]);
                    _mm256_storeu_pd(yi + 8 * (size_t)(p0 + i), vi[i]);
                    _mm256_storeu_pd(yi + 8 * (size_t)(p0 + i) + 4,
                                     vi[i + 4]);
                }
            }
        } else if (s >= 4) {
            for (int p = 0; p < m; ++p) {
                __m256d wv[7][2];
                for (int j = 1; j < 8; ++j) {
                    wv[j - 1][0] =
                        _mm256_set1_pd(st.twr[(size_t)(j - 1)][(size_t)p]);
                    wv[j - 1][1] = _mm256_set1_pd(
                        sg * st.twi[(size_t)(j - 1)][(size_t)p]);
                }
                const double *base_r = xr + (size_t)s * p;
                const double *base_i = xi + (size_t)s * p;
                double *out_r = yr + (size_t)s * 8 * p;
                double *out_i = yi + (size_t)s * 8 * p;
                for (int q = 0; q + 4 <= s; q += 4) {
                    __m256d vr[8], vi[8];
                    for (int r = 0; r < 8; ++r) {
                        vr[r] = _mm256_loadu_pd(base_r + q +
                                                (size_t)s * r * m);
                        vi[r] = _mm256_loadu_pd(base_i + q +
                                                (size_t)s * r * m);
                    }
                    bfly8(vr, vi, sgv, nsgv);
                    _mm256_storeu_pd(out_r + q, vr[0]);
                    _mm256_storeu_pd(out_i + q, vi[0]);
                    for (int j = 1; j < 8; ++j) {
                        _mm256_storeu_pd(
                            out_r + q + (size_t)s * j,
                            _mm256_fmsub_pd(vr[j], wv[j - 1][0],
                                            _mm256_mul_pd(vi[j],
                                                          wv[j - 1][1])));
                        _mm256_storeu_pd(
                            out_i + q + (size_t)s * j,
                            _mm256_fmadd_pd(vr[j], wv[j - 1][1],
                                            _mm256_mul_pd(vi[j],
                                                          wv[j - 1][0])));
                    }
                }
            }
            p0 = m; /* fully handled (s is a power of 2 >= 4) */
        }
#endif
        /* scalar path: remainder p's (s==1) or non-SIMD builds */
        for (int p = p0; p < m; ++p) {
            for (int q = 0; q < s; ++q) {
                double vr[8], vi[8];
                for (int r = 0; r < 8; ++r) {
                    vr[r] = xr[q + (size_t)s * (p + r * m)];
                    vi[r] = xi[q + (size_t)s * (p + r * m)];
                }
                double cr[4], ci[4], dr[4], di[4];
                for (int r = 0; r < 4; ++r) {
                    cr[r] = vr[r] + vr[r + 4];
                    ci[r] = vi[r] + vi[r + 4];
                    dr[r] = vr[r] - vr[r + 4];
                    di[r] = vi[r] - vi[r + 4];
                }
                {
                    double x1 = dr[1], y1 = di[1];
                    dr[1] = C * (x1 + sg * y1);
                    di[1] = C * (y1 - sg * x1);
                    double x2 = dr[2], y2 = di[2];
                    dr[2] = sg * y2;
                    di[2] = -sg * x2;
                    double x3 = dr[3], y3 = di[3];
                    dr[3] = C * (-x3 + sg * y3);
                    di[3] = C * (-y3 - sg * x3);
                }
                double B_r[8], B_i[8];
                {
                    double t0r = cr[0] + cr[2], t0i = ci[0] + ci[2];
                    double t1r = cr[0] - cr[2], t1i = ci[0] - ci[2];
                    double t2r = cr[1] + cr[3], t2i = ci[1] + ci[3];
                    double sdr = cr[1] - cr[3], sdi = ci[1] - ci[3];
                    double t3r = sg * sdi, t3i = -sg * sdr;
                    B_r[0] = t0r + t2r; B_i[0] = t0i + t2i;
                    B_r[2] = t1r + t3r; B_i[2] = t1i + t3i;
                    B_r[4] = t0r - t2r; B_i[4] = t0i - t2i;
                    B_r[6] = t1r - t3r; B_i[6] = t1i - t3i;
                }
                {
                    double t0r = dr[0] + dr[2], t0i = di[0] + di[2];
                    double t1r = dr[0] - dr[2], t1i = di[0] - di[2];
                    double t2r = dr[1] + dr[3], t2i = di[1] + di[3];
                    double sdr = dr[1] - dr[3], sdi = di[1] - di[3];
                    double t3r = sg * sdi, t3i = -sg * sdr;
                    B_r[1] = t0r + t2r; B_i[1] = t0i + t2i;
                    B_r[3] = t1r + t3r; B_i[3] = t1i + t3i;
                    B_r[5] = t0r - t2r; B_i[5] = t0i - t2i;
                    B_r[7] = t1r - t3r; B_i[7] = t1i - t3i;
                }
                double *o_r = yr + (size_t)s * 8 * p + q;
                double *o_i = yi + (size_t)s * 8 * p + q;
                o_r[0] = B_r[0];
                o_i[0] = B_i[0];
                for (int j = 1; j < 8; ++j) {
                    double wjr = st.twr[(size_t)(j - 1)][(size_t)p];
                    double wji = sg * st.twi[(size_t)(j - 1)][(size_t)p];
                    o_r[(size_t)s * j] = B_r[j] * wjr - B_i[j] * wji;
                    o_i[(size_t)s * j] = B_r[j] * wji + B_i[j] * wjr;
                }
            }
        }
    }

    std::vector<Stage> stages;
    std::vector<double> wr, wi;
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
 * Execution: uniformly-partitioned overlap-save FFT convolution (a
 * frequency-domain delay line) on the input grid — the same
 * frequency-domain role as the reference DLL's monolithic OLS convolver
 * (CDSPBlockConvolver.h:252-354), but with the kernel split into P
 * segments of S taps so every FFT is 2S points and L1-resident:
 *   X_j = FFT(x[(j-1)S .. (j+1)S)),  block j outputs = last S points of
 *   IFFT(sum_p X_{j-p} * K_p),       K_p = FFT(segment p, zero-padded).
 * Phases pair-pack (K_p of phase ph and ph+1 combine into ONE complex
 * spectrum K0+i*K1, Re/Im of the inverse are the two phase streams).
 * Complete blocks push their input spectrum into the delay line and are
 * cached in a rolling w buffer; the head block (inputs still arriving)
 * reuses a cached tail accumulation sum_{p>=1} X_{j-p}*K_p, so a head
 * recompute costs one small forward FFT + one MAC + one inverse instead
 * of a monolithic-block FFT.  Tiny kernels keep the direct loop (FFT
 * overhead dominates below ~48 taps/phase). */
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
        if (Kx == 0 || nfft == 0) return K / up + down + 8;
        /* oldest input the next emit can read:
         *   - the FDL window of the next block to extend starts at
         *     (b0 - 1) * S with b0 = wcEnd / (S*up);
         *   - the krev head-direct dot reaches Kx back from nIn. */
        long wcEnd = wcT0 + (long)wc.size();
        long b0 = wcEnd / ((long)hop * up);
        long keepF = nIn - (b0 - 1) * hop + 16;
        long keepD = Kx + hop + 32;
        return keepF > keepD ? keepF : keepD;
    }
    void clear() override {
        Stage::clear();
        wc.clear();
        wcT0 = 0;
        lastPushed = -1;
        accFor = -1;
        accValid = false;
        for (auto &v : fdlRe) std::fill(v.begin(), v.end(), 0.0);
        for (auto &v : fdlIm) std::fill(v.begin(), v.end(), 0.0);
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
            /* breakeven: a head FFT block costs roughly one small
             * forward + one MAC + one inverse (~50*nfft flops with the
             * tail accumulation cached); the direct dot costs
             * 2*Kx*headCnt and is cache/latency-bound */
#ifndef R8BT_HEADK
#define R8BT_HEADK 25
#endif
            headDirect = headCnt * Kx < (long)nfft * R8BT_HEADK;
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
        /* segment size: FFT buffers (2S complex, split) stay L1/L2-hot */
#ifndef R8BT_SEG
#define R8BT_SEG 512
#endif
        long S = 128;
        while (S < Kx && S < R8BT_SEG) S <<= 1;
        P = (Kx + S - 1) / S;
        hop = S;
        int nf = (int)(2 * S);
        nfft = nf;
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
        /* per-phase segment spectra, then pair-fold: the pair packing
         * computes Z = X*K_ph + i*(X*K_ph1) = X * (K_ph + i*K_ph1), so
         * the two phase spectra of each segment fold into ONE combined
         * complex spectrum — one complex MAC per bin per segment and
         * half the spectrum bytes streamed per block.  Groups: g <
         * up/2 are pairs (2g, 2g+1); odd up adds a single last phase. */
        nGroups = (long)(up / 2) + (up & 1);
        segRe.assign((size_t)(nGroups * P), {});
        segIm.assign((size_t)(nGroups * P), {});
        {
            std::vector<std::vector<double>> phr((size_t)up),
                phi((size_t)up);
            std::vector<double> re((size_t)nf), im((size_t)nf);
            for (long ph = 0; ph < up; ++ph) {
                phr[(size_t)ph].assign((size_t)(P * nf), 0.0);
                phi[(size_t)ph].assign((size_t)(P * nf), 0.0);
                for (long p = 0; p < P; ++p) {
                    std::fill(re.begin(), re.end(), 0.0);
                    std::fill(im.begin(), im.end(), 0.0);
                    for (long j = p * S; j < (p + 1) * S && j < Kx; ++j) {
                        long m = ph + up * j;
                        if (m < K)
                            re[(size_t)(j - p * S)] =
                                k[(size_t)m] / nf;  /* fold 1/N here */
                    }
                    fft.run(re.data(), im.data(), false);
                    std::memcpy(phr[(size_t)ph].data() + p * nf, re.data(),
                                (size_t)nf * sizeof(double));
                    std::memcpy(phi[(size_t)ph].data() + p * nf, im.data(),
                                (size_t)nf * sizeof(double));
                }
            }
            for (long g = 0; g < nGroups; ++g) {
                const bool pair = 2 * g + 1 < up;
                for (long p = 0; p < P; ++p) {
                    std::vector<double> cr((size_t)nf), ci((size_t)nf);
                    const double *k0r = phr[(size_t)(2 * g)].data() + p * nf;
                    const double *k0i = phi[(size_t)(2 * g)].data() + p * nf;
                    if (pair) {
                        const double *k1r =
                            phr[(size_t)(2 * g + 1)].data() + p * nf;
                        const double *k1i =
                            phi[(size_t)(2 * g + 1)].data() + p * nf;
                        for (int i = 0; i < nf; ++i) {
                            cr[(size_t)i] = k0r[i] - k1i[i];
                            ci[(size_t)i] = k0i[i] + k1r[i];
                        }
                    } else {
                        std::memcpy(cr.data(), k0r,
                                    (size_t)nf * sizeof(double));
                        std::memcpy(ci.data(), k0i,
                                    (size_t)nf * sizeof(double));
                    }
                    segRe[(size_t)(g * P + p)] = std::move(cr);
                    segIm[(size_t)(g * P + p)] = std::move(ci);
                }
            }
        }
        pXr.assign((size_t)P, nullptr);
        pXi.assign((size_t)P, nullptr);
        pKr.assign((size_t)P, nullptr);
        pKi.assign((size_t)P, nullptr);
        fdlRe.assign((size_t)P, std::vector<double>((size_t)nf, 0.0));
        fdlIm.assign((size_t)P, std::vector<double>((size_t)nf, 0.0));
        accR.assign((size_t)nGroups, std::vector<double>((size_t)nf, 0.0));
        accI.assign((size_t)nGroups, std::vector<double>((size_t)nf, 0.0));
        lastPushed = -1;
        accFor = -1;
        accValid = false;
        rbuf.assign((size_t)nf, 0.0);
        xre.assign((size_t)nf, 0.0);
        xim.assign((size_t)nf, 0.0);
        yre.assign((size_t)nf, 0.0);
        yim.assign((size_t)nf, 0.0);
        blk.assign((size_t)(hop * up), 0.0);
    }

    /* z (+)= x * c, elementwise complex over split f64 arrays */
    static void cmac(double *zr, double *zi, const double *xr,
                     const double *xi, const double *cr, const double *ci,
                     int nf, bool first) {
        int i = 0;
#if R8BT_AVX512
        if (first) {
            for (; i + 8 <= nf; i += 8) {
                __m512d a = _mm512_loadu_pd(xr + i);
                __m512d b = _mm512_loadu_pd(xi + i);
                __m512d c = _mm512_loadu_pd(cr + i);
                __m512d d = _mm512_loadu_pd(ci + i);
                _mm512_storeu_pd(zr + i,
                                 _mm512_fmsub_pd(a, c, _mm512_mul_pd(b, d)));
                _mm512_storeu_pd(zi + i,
                                 _mm512_fmadd_pd(a, d, _mm512_mul_pd(b, c)));
            }
        } else {
            for (; i + 8 <= nf; i += 8) {
                __m512d a = _mm512_loadu_pd(xr + i);
                __m512d b = _mm512_loadu_pd(xi + i);
                __m512d c = _mm512_loadu_pd(cr + i);
                __m512d d = _mm512_loadu_pd(ci + i);
                __m512d sr = _mm512_loadu_pd(zr + i);
                __m512d si = _mm512_loadu_pd(zi + i);
                sr = _mm512_fmadd_pd(a, c, _mm512_fnmadd_pd(b, d, sr));
                si = _mm512_fmadd_pd(a, d, _mm512_fmadd_pd(b, c, si));
                _mm512_storeu_pd(zr + i, sr);
                _mm512_storeu_pd(zi + i, si);
            }
        }
#elif R8BT_AVX2
        if (first) {
            for (; i + 4 <= nf; i += 4) {
                __m256d a = _mm256_loadu_pd(xr + i);
                __m256d b = _mm256_loadu_pd(xi + i);
                __m256d c = _mm256_loadu_pd(cr + i);
                __m256d d = _mm256_loadu_pd(ci + i);
                _mm256_storeu_pd(zr + i,
                                 _mm256_fmsub_pd(a, c, _mm256_mul_pd(b, d)));
                _mm256_storeu_pd(zi + i,
                                 _mm256_fmadd_pd(a, d, _mm256_mul_pd(b, c)));
            }
        } else {
            for (; i + 4 <= nf; i += 4) {
                __m256d a = _mm256_loadu_pd(xr + i);
                __m256d b = _mm256_loadu_pd(xi + i);
                __m256d c = _mm256_loadu_pd(cr + i);
                __m256d d = _mm256_loadu_pd(ci + i);
                __m256d sr = _mm256_loadu_pd(zr + i);
                __m256d si = _mm256_loadu_pd(zi + i);
                sr = _mm256_fmadd_pd(a, c, _mm256_fnmadd_pd(b, d, sr));
                si = _mm256_fmadd_pd(a, d, _mm256_fmadd_pd(b, c, si));
                _mm256_storeu_pd(zr + i, sr);
                _mm256_storeu_pd(zi + i, si);
            }
        }
#elif R8BT_NEON
        if (first) {
            for (; i + 2 <= nf; i += 2) {
                float64x2_t a = vld1q_f64(xr + i);
                float64x2_t b = vld1q_f64(xi + i);
                float64x2_t c = vld1q_f64(cr + i);
                float64x2_t d = vld1q_f64(ci + i);
                vst1q_f64(zr + i, vfmsq_f64(vmulq_f64(a, c), b, d));
                vst1q_f64(zi + i, vfmaq_f64(vmulq_f64(a, d), b, c));
            }
        } else {
            for (; i + 2 <= nf; i += 2) {
                float64x2_t a = vld1q_f64(xr + i);
                float64x2_t b = vld1q_f64(xi + i);
                float64x2_t c = vld1q_f64(cr + i);
                float64x2_t d = vld1q_f64(ci + i);
                float64x2_t sr = vld1q_f64(zr + i);
                float64x2_t si = vld1q_f64(zi + i);
                sr = vfmaq_f64(vfmsq_f64(sr, b, d), a, c);
                si = vfmaq_f64(vfmaq_f64(si, b, c), a, d);
                vst1q_f64(zr + i, sr);
                vst1q_f64(zi + i, si);
            }
        }
#endif
        if (first) {
            for (; i < nf; ++i) {
                zr[i] = xr[i] * cr[i] - xi[i] * ci[i];
                zi[i] = xr[i] * ci[i] + xi[i] * cr[i];
            }
        } else {
            for (; i < nf; ++i) {
                zr[i] += xr[i] * cr[i] - xi[i] * ci[i];
                zi[i] += xr[i] * ci[i] + xi[i] * cr[i];
            }
        }
    }

    /* z = sum_p x_p * c_p, single pass over bins with the accumulator
     * held in registers (the per-p cmac form re-reads and re-writes z
     * from L2 once per segment; this reads each spectrum once and
     * writes z once) */
    static void cmacFused(double *zr, double *zi, const double *const *xr,
                          const double *const *xi, const double *const *cr,
                          const double *const *ci, long nP, int nf) {
        if (nP == 0) {
            std::memset(zr, 0, (size_t)nf * sizeof(double));
            std::memset(zi, 0, (size_t)nf * sizeof(double));
            return;
        }
        int i = 0;
#if R8BT_AVX512
        for (; i + 8 <= nf; i += 8) {
            __m512d sr = _mm512_setzero_pd();
            __m512d si = _mm512_setzero_pd();
            for (long p = 0; p < nP; ++p) {
                __m512d a = _mm512_loadu_pd(xr[p] + i);
                __m512d b = _mm512_loadu_pd(xi[p] + i);
                __m512d c = _mm512_loadu_pd(cr[p] + i);
                __m512d d = _mm512_loadu_pd(ci[p] + i);
                sr = _mm512_fmadd_pd(a, c, _mm512_fnmadd_pd(b, d, sr));
                si = _mm512_fmadd_pd(a, d, _mm512_fmadd_pd(b, c, si));
            }
            _mm512_storeu_pd(zr + i, sr);
            _mm512_storeu_pd(zi + i, si);
        }
#elif R8BT_AVX2
        for (; i + 4 <= nf; i += 4) {
            __m256d sr = _mm256_setzero_pd();
            __m256d si = _mm256_setzero_pd();
            for (long p = 0; p < nP; ++p) {
                __m256d a = _mm256_loadu_pd(xr[p] + i);
                __m256d b = _mm256_loadu_pd(xi[p] + i);
                __m256d c = _mm256_loadu_pd(cr[p] + i);
                __m256d d = _mm256_loadu_pd(ci[p] + i);
                sr = _mm256_fmadd_pd(a, c, _mm256_fnmadd_pd(b, d, sr));
                si = _mm256_fmadd_pd(a, d, _mm256_fmadd_pd(b, c, si));
            }
            _mm256_storeu_pd(zr + i, sr);
            _mm256_storeu_pd(zi + i, si);
        }
#elif R8BT_NEON
        for (; i + 2 <= nf; i += 2) {
            float64x2_t sr = vdupq_n_f64(0.0);
            float64x2_t si = vdupq_n_f64(0.0);
            for (long p = 0; p < nP; ++p) {
                float64x2_t a = vld1q_f64(xr[p] + i);
                float64x2_t b = vld1q_f64(xi[p] + i);
                float64x2_t c = vld1q_f64(cr[p] + i);
                float64x2_t d = vld1q_f64(ci[p] + i);
                sr = vfmaq_f64(vfmsq_f64(sr, b, d), a, c);
                si = vfmaq_f64(vfmaq_f64(si, b, c), a, d);
            }
            vst1q_f64(zr + i, sr);
            vst1q_f64(zi + i, si);
        }
#endif
        for (; i < nf; ++i) {
            double sr = 0.0, si = 0.0;
            for (long p = 0; p < nP; ++p) {
                sr += xr[p][i] * cr[p][i] - xi[p][i] * ci[p][i];
                si += xr[p][i] * ci[p][i] + xi[p][i] * cr[p][i];
            }
            zr[i] = sr;
            zi[i] = si;
        }
    }

    /* Forward FFT of the real input window via a half-size complex FFT
     * (pack z[m] = x[2m] + i x[2m+1], untwiddle, unfold by conjugate
     * symmetry) — ~45% cheaper than a full-size complex FFT of real
     * data.  Reads the real window from rbuf; the full N-point spectrum
     * lands in (outRe, outIm) — an FDL ring slot for complete blocks,
     * the xre/xim scratch for the transient head block. */
    void realForward(double *outRe, double *outIm) {
        const int h = nfft / 2;
        int m = 0;
#if R8BT_AVX512
        {
            /* stride-2 deinterleave: even lanes -> zre, odd -> zim */
            const __m512i iev = _mm512_set_epi64(14, 12, 10, 8, 6, 4, 2, 0);
            const __m512i iod = _mm512_set_epi64(15, 13, 11, 9, 7, 5, 3, 1);
            for (; m + 8 <= h; m += 8) {
                __m512d a = _mm512_loadu_pd(rbuf.data() + 2 * m);
                __m512d b = _mm512_loadu_pd(rbuf.data() + 2 * m + 8);
                _mm512_storeu_pd(zre.data() + m,
                                 _mm512_permutex2var_pd(a, iev, b));
                _mm512_storeu_pd(zim.data() + m,
                                 _mm512_permutex2var_pd(a, iod, b));
            }
        }
#elif R8BT_AVX2
        for (; m + 4 <= h; m += 4) {
            __m256d a = _mm256_loadu_pd(rbuf.data() + 2 * m);
            __m256d b = _mm256_loadu_pd(rbuf.data() + 2 * m + 4);
            _mm256_storeu_pd(zre.data() + m, r8bt_even(a, b));
            _mm256_storeu_pd(zim.data() + m, r8bt_odd(a, b));
        }
#endif
        for (; m < h; ++m) {
            zre[(size_t)m] = rbuf[(size_t)(2 * m)];
            zim[(size_t)m] = rbuf[(size_t)(2 * m + 1)];
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
                    outRe + k,
                    _mm512_fmadd_pd(
                        orr, twr,
                        _mm512_fnmadd_pd(oi, twi, er)));
                _mm512_storeu_pd(
                    outIm + k,
                    _mm512_fmadd_pd(
                        orr, twi,
                        _mm512_fmadd_pd(oi, twr, ei)));
            }
        }
#elif R8BT_AVX2
        {
            const __m256d half_ = _mm256_set1_pd(0.5);
            for (; k + 4 <= h; k += 4) {
                __m256d zr = _mm256_loadu_pd(zre.data() + k);
                __m256d zi = _mm256_loadu_pd(zim.data() + k);
                /* conj(Z[h-k .. h-k-3]) via reversed loads */
                __m256d cr = r8bt_rev4(
                    _mm256_loadu_pd(zre.data() + (h - k - 3)));
                __m256d ci = _mm256_sub_pd(
                    _mm256_setzero_pd(),
                    r8bt_rev4(_mm256_loadu_pd(zim.data() + (h - k - 3))));
                __m256d er = _mm256_mul_pd(half_, _mm256_add_pd(zr, cr));
                __m256d ei = _mm256_mul_pd(half_, _mm256_add_pd(zi, ci));
                __m256d orr = _mm256_mul_pd(half_, _mm256_sub_pd(zi, ci));
                __m256d oi = _mm256_mul_pd(half_, _mm256_sub_pd(cr, zr));
                __m256d twr = _mm256_loadu_pd(utwRe.data() + k);
                __m256d twi = _mm256_loadu_pd(utwIm.data() + k);
                _mm256_storeu_pd(
                    outRe + k,
                    _mm256_fmadd_pd(orr, twr,
                                    _mm256_fnmadd_pd(oi, twi, er)));
                _mm256_storeu_pd(
                    outIm + k,
                    _mm256_fmadd_pd(orr, twi,
                                    _mm256_fmadd_pd(oi, twr, ei)));
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
            outRe[(size_t)k] = er + orr * twr - oi * twi;
            outIm[(size_t)k] = ei + orr * twi + oi * twr;
        }
        outRe[0] = zre[0] + zim[0];
        outIm[0] = 0.0;
        outRe[(size_t)h] = zre[0] - zim[0];  /* Nyquist */
        outIm[(size_t)h] = 0.0;
        /* materialize the conjugate-symmetric upper half once: the FDL
         * MACs then run branch-free over all nf bins (the combined
         * pair spectra K0 + i*K1 are not symmetric, so Z is not) */
        int q = 1;
#if R8BT_AVX512
        {
            const __m512i ridx = _mm512_set_epi64(0, 1, 2, 3, 4, 5, 6, 7);
            const __m512d mz = _mm512_setzero_pd();
            for (; q + 8 <= h; q += 8) {
                __m512d a = _mm512_permutexvar_pd(
                    ridx, _mm512_loadu_pd(outRe + q));
                __m512d bneg = _mm512_sub_pd(
                    mz, _mm512_permutexvar_pd(
                            ridx, _mm512_loadu_pd(outIm + q)));
                _mm512_storeu_pd(outRe + (nfft - q - 7), a);
                _mm512_storeu_pd(outIm + (nfft - q - 7), bneg);
            }
        }
#elif R8BT_AVX2
        for (; q + 4 <= h; q += 4) {
            __m256d a = r8bt_rev4(_mm256_loadu_pd(outRe + q));
            __m256d bneg = _mm256_sub_pd(
                _mm256_setzero_pd(),
                r8bt_rev4(_mm256_loadu_pd(outIm + q)));
            _mm256_storeu_pd(outRe + (nfft - q - 3), a);
            _mm256_storeu_pd(outIm + (nfft - q - 3), bneg);
        }
#endif
        for (; q < h; ++q) {
            outRe[(size_t)(nfft - q)] = outRe[(size_t)q];
            outIm[(size_t)(nfft - q)] = -outIm[(size_t)q];
        }
    }

    /* forward-FFT the window of block b into (dr, di):
     * window = inputs [(b-1)*S, (b+1)*S), zero-extended outside the
     * arrived/kept range (exact for every emitted output, whose inputs
     * availOut() guarantees have arrived) */
    void frameFFT(long b, double *dr, double *di) {
        hist.copyRange((b - 1) * hop, nfft, rbuf.data());
        realForward(dr, di);
    }

    /* push complete blocks (from + .. to) into the spectrum delay line */
    void pushThrough(long to) {
        long from = lastPushed + 1;
        if (from < to - P + 1) from = to - P + 1;  /* older slots dead */
        if (from < 0) from = 0;
        for (long i = from; i <= to; ++i)
            frameFFT(i, fdlRe[(size_t)(i % P)].data(),
                     fdlIm[(size_t)(i % P)].data());
        if (to > lastPushed) lastPushed = to;
    }

    /* fill blk[] with w[t] for t in [b*S*up, (b*S+S)*up).  Complete
     * blocks ((b+1)*S <= nIn) advance the delay line; the head block
     * reuses a cached tail accumulation sum_{p>=1} X_{b-p}*K_p so its
     * per-call recompute is one small forward FFT + one MAC + one
     * inverse per phase group. */
    void computeBlock(long b) {
        const int nf = nfft;
        const long S = hop;
        const bool complete = (b + 1) * S <= nIn;
        if (complete) {
            pushThrough(b);
        } else {
            pushThrough(b - 1);
            frameFFT(b, xre.data(), xim.data());
            if (accFor != b || !accValid) {
                for (long g = 0; g < nGroups; ++g) {
                    long nP = 0;
                    for (long p = 1; p < P; ++p) {
                        long idx = b - p;
                        if (idx < 0) break;
                        pXr[(size_t)nP] = fdlRe[(size_t)(idx % P)].data();
                        pXi[(size_t)nP] = fdlIm[(size_t)(idx % P)].data();
                        pKr[(size_t)nP] = segRe[(size_t)(g * P + p)].data();
                        pKi[(size_t)nP] = segIm[(size_t)(g * P + p)].data();
                        ++nP;
                    }
                    cmacFused(accR[(size_t)g].data(),
                              accI[(size_t)g].data(), pXr.data(),
                              pXi.data(), pKr.data(), pKi.data(), nP, nf);
                }
                accFor = b;
                accValid = true;
            }
        }
        for (long g = 0; g < nGroups; ++g) {
            const long ph = 2 * g;
            const bool pair = ph + 1 < up;
            if (complete) {
                long nP = 0;
                for (long p = 0; p < P; ++p) {
                    long idx = b - p;
                    if (idx < 0) break;
                    pXr[(size_t)nP] = fdlRe[(size_t)(idx % P)].data();
                    pXi[(size_t)nP] = fdlIm[(size_t)(idx % P)].data();
                    pKr[(size_t)nP] = segRe[(size_t)(g * P + p)].data();
                    pKi[(size_t)nP] = segIm[(size_t)(g * P + p)].data();
                    ++nP;
                }
                cmacFused(yre.data(), yim.data(), pXr.data(), pXi.data(),
                          pKr.data(), pKi.data(), nP, nf);
            } else {
                /* head: Z = X_head * K_0 + cached tail acc */
                cmac(yre.data(), yim.data(), xre.data(), xim.data(),
                     segRe[(size_t)(g * P)].data(),
                     segIm[(size_t)(g * P)].data(), nf, true);
                const double *ar = accR[(size_t)g].data();
                const double *ai_ = accI[(size_t)g].data();
                int i = 0;
#if R8BT_AVX512
                for (; i + 8 <= nf; i += 8) {
                    _mm512_storeu_pd(
                        yre.data() + i,
                        _mm512_add_pd(_mm512_loadu_pd(yre.data() + i),
                                      _mm512_loadu_pd(ar + i)));
                    _mm512_storeu_pd(
                        yim.data() + i,
                        _mm512_add_pd(_mm512_loadu_pd(yim.data() + i),
                                      _mm512_loadu_pd(ai_ + i)));
                }
#elif R8BT_AVX2
                for (; i + 4 <= nf; i += 4) {
                    _mm256_storeu_pd(
                        yre.data() + i,
                        _mm256_add_pd(_mm256_loadu_pd(yre.data() + i),
                                      _mm256_loadu_pd(ar + i)));
                    _mm256_storeu_pd(
                        yim.data() + i,
                        _mm256_add_pd(_mm256_loadu_pd(yim.data() + i),
                                      _mm256_loadu_pd(ai_ + i)));
                }
#endif
                for (; i < nf; ++i) {
                    yre[(size_t)i] += ar[i];
                    yim[(size_t)i] += ai_[i];
                }
            }
            fft.run(yre.data(), yim.data(), true);
            /* valid outputs: last S points (the first S carry circular
             * wrap from the S-tap segments) */
            long m = 0;
#if R8BT_AVX512
            if (up == 2) {
                /* full interleave [w0 w1 w0 w1 ...] of the two phase
                 * streams in one pass (the scalar loop is a stride-2
                 * scatter gcc leaves scalar) */
                const __m512i ilo = _mm512_set_epi64(11, 3, 10, 2, 9, 1, 8, 0);
                const __m512i ihi =
                    _mm512_set_epi64(15, 7, 14, 6, 13, 5, 12, 4);
                for (; m + 8 <= S; m += 8) {
                    long j = m + S;
                    __m512d a = _mm512_loadu_pd(yre.data() + j);
                    __m512d bv = _mm512_loadu_pd(yim.data() + j);
                    _mm512_storeu_pd(blk.data() + 2 * m,
                                     _mm512_permutex2var_pd(a, ilo, bv));
                    _mm512_storeu_pd(blk.data() + 2 * m + 8,
                                     _mm512_permutex2var_pd(a, ihi, bv));
                }
            }
#elif R8BT_AVX2
            if (up == 2) {
                for (; m + 4 <= S; m += 4) {
                    long j = m + S;
                    __m256d a = _mm256_loadu_pd(yre.data() + j);
                    __m256d bv = _mm256_loadu_pd(yim.data() + j);
                    _mm256_storeu_pd(blk.data() + 2 * m, r8bt_ilo(a, bv));
                    _mm256_storeu_pd(blk.data() + 2 * m + 4,
                                     r8bt_ihi(a, bv));
                }
            }
#endif
            for (; m < S; ++m) {
                long j = m + S;
                blk[(size_t)(m * up + ph)] = yre[(size_t)j];
                if (pair) blk[(size_t)(m * up + ph + 1)] = yim[(size_t)j];
            }
        }
    }

    long Kx = 0;
    int nfft = 0;      /* 2*S */
    long hop = 0;      /* segment / block size S */
    long P = 0;        /* kernel segments per phase */
    long nGroups = 0;  /* phase pairs (+1 single when up is odd) */
    CFFT fft, fftHalf;
    std::vector<std::vector<double>> krev;
    /* combined segment spectra [group * P + p], delay line [p], and the
     * head block's cached tail accumulation [group] */
    std::vector<std::vector<double>> segRe, segIm, fdlRe, fdlIm, accR, accI;
    std::vector<const double *> pXr, pXi, pKr, pKi;  /* MAC ptr scratch */
    long lastPushed = -1;  /* newest complete block in the delay line */
    long accFor = -1;      /* head block the tail acc was built for */
    bool accValid = false;
    std::vector<double> rbuf, xre, xim, yre, yim, blk;
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
        long s = n0 + outLat;
        const long sEnd = n1 + outLat;
        auto one = [&](long s_) {
            long n = s_ / 2;
            double v;
            if ((s_ & 1) == 0) {
                v = hist.at(n);
            } else {
                v = 0.0;
                for (long i = 0; i < nt; ++i)
                    v += taps[(size_t)i] *
                         (hist.at(n + 1 + i) + hist.at(n - i));
            }
            out[s_ - outLat - n0] = v;
        };
#if R8BT_AVX512
        /* 16 outputs (8 input positions) per iteration: the odd-output
         * stencil is nt FMAs over unit-stride loads, evens interleave in
         * with a 2-source permute */
        const __m512i ilo = _mm512_set_epi64(11, 3, 10, 2, 9, 1, 8, 0);
        const __m512i ihi = _mm512_set_epi64(15, 7, 14, 6, 13, 5, 12, 4);
        while (s < sEnd) {
            if ((s & 1) != 0 || s + 16 > sEnd) {
                if (s >= sEnd) break;
                one(s);
                ++s;
                continue;
            }
            long n = s / 2;
            const double *W = hist.raw(n - (nt - 1), 2 * nt + 15);
            if (!W) {
                one(s);
                ++s;
                continue;
            }
            const double *C = W + (nt - 1); /* x[n + t] = C[t] */
            __m512d ev = _mm512_loadu_pd(C);
            __m512d od = _mm512_setzero_pd();
            for (long i = 0; i < nt; ++i)
                od = _mm512_fmadd_pd(
                    _mm512_set1_pd(taps[(size_t)i]),
                    _mm512_add_pd(_mm512_loadu_pd(C + 1 + i),
                                  _mm512_loadu_pd(C - i)),
                    od);
            double *o = out + (s - outLat - n0);
            _mm512_storeu_pd(o, _mm512_permutex2var_pd(ev, ilo, od));
            _mm512_storeu_pd(o + 8, _mm512_permutex2var_pd(ev, ihi, od));
            s += 16;
        }
#elif R8BT_AVX2
        /* 8 outputs (4 input positions) per iteration: the odd-output
         * stencil is nt FMAs over unit-stride loads, evens interleave in
         * with unpack+permute pairs */
        while (s < sEnd) {
            if ((s & 1) != 0 || s + 8 > sEnd) {
                if (s >= sEnd) break;
                one(s);
                ++s;
                continue;
            }
            long n = s / 2;
            const double *W = hist.raw(n - (nt - 1), 2 * nt + 7);
            if (!W) {
                one(s);
                ++s;
                continue;
            }
            const double *C = W + (nt - 1); /* x[n + t] = C[t] */
            __m256d ev = _mm256_loadu_pd(C);
            __m256d od = _mm256_setzero_pd();
            for (long i = 0; i < nt; ++i)
                od = _mm256_fmadd_pd(
                    _mm256_set1_pd(taps[(size_t)i]),
                    _mm256_add_pd(_mm256_loadu_pd(C + 1 + i),
                                  _mm256_loadu_pd(C - i)),
                    od);
            double *o = out + (s - outLat - n0);
            _mm256_storeu_pd(o, r8bt_ilo(ev, od));
            _mm256_storeu_pd(o + 4, r8bt_ihi(ev, od));
            s += 8;
        }
#elif R8BT_NEON
        /* 4 outputs (2 input positions) per iteration: 2-lane odd-output
         * stencil, evens interleave with vzip */
        while (s < sEnd) {
            if ((s & 1) != 0 || s + 4 > sEnd) {
                if (s >= sEnd) break;
                one(s);
                ++s;
                continue;
            }
            long n = s / 2;
            const double *W = hist.raw(n - (nt - 1), 2 * nt + 3);
            if (!W) {
                one(s);
                ++s;
                continue;
            }
            const double *C = W + (nt - 1); /* x[n + t] = C[t] */
            float64x2_t ev = vld1q_f64(C);
            float64x2_t od = vdupq_n_f64(0.0);
            for (long i = 0; i < nt; ++i)
                od = vfmaq_f64(od, vdupq_n_f64(taps[(size_t)i]),
                               vaddq_f64(vld1q_f64(C + 1 + i),
                                         vld1q_f64(C - i)));
            double *o = out + (s - outLat - n0);
            vst1q_f64(o, vzip1q_f64(ev, od));
            vst1q_f64(o + 2, vzip2q_f64(ev, od));
            s += 4;
        }
#endif
        for (; s < sEnd; ++s) one(s);
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
        long n = n0 + outLat;
        const long nEnd = n1 + outLat;
        auto one = [&](long n_) {
            double v = hist.at(2 * n_);
            for (long i = 0; i < nt; ++i)
                v += taps[(size_t)i] * (hist.at(2 * n_ + 1 + 2 * i) +
                                        hist.at(2 * n_ - 1 - 2 * i));
            out[n_ - outLat - n0] = v;
        };
#if R8BT_AVX512
        /* 8 outputs per iteration; each stride-2 tap read deinterleaves
         * two contiguous loads with a 2-source permute */
        const __m512i iev = _mm512_set_epi64(14, 12, 10, 8, 6, 4, 2, 0);
        while (n + 8 <= nEnd) {
            const double *W = hist.raw(2 * n - 2 * nt + 1, 4 * nt + 14);
            if (!W) {
                one(n);
                ++n;
                continue;
            }
            const long c0 = 2 * nt - 1; /* x[2n + c] = W[c0 + c + 2t] */
            auto dei = [&](long rel) {
                __m512d a = _mm512_loadu_pd(W + rel);
                __m512d b = _mm512_loadu_pd(W + rel + 8);
                return _mm512_permutex2var_pd(a, iev, b);
            };
            __m512d acc = dei(c0);
            for (long i = 0; i < nt; ++i)
                acc = _mm512_fmadd_pd(
                    _mm512_set1_pd(taps[(size_t)i]),
                    _mm512_add_pd(dei(c0 + 1 + 2 * i), dei(c0 - 1 - 2 * i)),
                    acc);
            _mm512_storeu_pd(out + (n - outLat - n0), acc);
            n += 8;
        }
#elif R8BT_AVX2
        /* 4 outputs per iteration; each stride-2 tap read deinterleaves
         * two contiguous loads with unpack+permute */
        while (n + 4 <= nEnd) {
            const double *W = hist.raw(2 * n - 2 * nt + 1, 4 * nt + 6);
            if (!W) {
                one(n);
                ++n;
                continue;
            }
            const long c0 = 2 * nt - 1; /* x[2n + c] = W[c0 + c + 2t] */
            auto dei = [&](long rel) {
                __m256d a = _mm256_loadu_pd(W + rel);
                __m256d b = _mm256_loadu_pd(W + rel + 4);
                return r8bt_even(a, b);
            };
            __m256d acc = dei(c0);
            for (long i = 0; i < nt; ++i)
                acc = _mm256_fmadd_pd(
                    _mm256_set1_pd(taps[(size_t)i]),
                    _mm256_add_pd(dei(c0 + 1 + 2 * i), dei(c0 - 1 - 2 * i)),
                    acc);
            _mm256_storeu_pd(out + (n - outLat - n0), acc);
            n += 4;
        }
#elif R8BT_NEON
        /* 2 outputs per iteration; each stride-2 tap read deinterleaves
         * two contiguous loads with vuzp1 */
        while (n + 2 <= nEnd) {
            const double *W = hist.raw(2 * n - 2 * nt + 1, 4 * nt + 4);
            if (!W) {
                one(n);
                ++n;
                continue;
            }
            const long c0 = 2 * nt - 1; /* x[2n + c] = W[c0 + c + 2t] */
            auto dei = [&](long rel) {
                return vuzp1q_f64(vld1q_f64(W + rel),
                                  vld1q_f64(W + rel + 2));
            };
            float64x2_t acc = dei(c0);
            for (long i = 0; i < nt; ++i)
                acc = vfmaq_f64(acc, vdupq_n_f64(taps[(size_t)i]),
                                vaddq_f64(dei(c0 + 1 + 2 * i),
                                          dei(c0 - 1 - 2 * i)));
            vst1q_f64(out + (n - outLat - n0), acc);
            n += 2;
        }
#endif
        for (; n < nEnd; ++n) one(n);
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
        if (!tablesBuilt) buildTables();
        long n = n0;
#if R8BT_AVX512
        if (outStep >= 8) {
            /* supercycle-table path: outputs n with n % outStep == q
             * share precomputed phase rows qRow[q] and window offsets
             * qS[q] (period outStep outputs = inStep inputs), so the
             * steady loop has no div/mod, no per-output history range
             * check, and a 4-output transposed horizontal reduction —
             * the same two optimizations as the reference's
             * whole-stepping fast path (convolve0<FL> templates +
             * PosIncr stepping, CDSPFracInterpolator.h:991-1060) */
            long nAlign = ((n + outStep - 1) / outStep) * outStep;
            if (nAlign > n1) nAlign = n1;
            emitGeneric(out, n0, n, nAlign);
            n = nAlign;
            const long nq4 = outStep & ~3L;
            while (n + outStep <= n1) {
                long g = w0 + n * inStep;
                long sBase = g / outStep;
                const double *W = hist.raw(sBase - (fl2() - 1), span);
                if (!W) {  /* stream-start boundary */
                    emitGeneric(out, n0, n, n + outStep);
                    n += outStep;
                    continue;
                }
                double *o = out + (n - n0);
                const double *tab = table.data();
                const long *qR = qRow.data(), *qO = qS.data();
                const int nv = (int)(fl >> 3);
                const unsigned rem = (unsigned)(fl & 7);
                const __mmask8 tm =
                    rem ? (__mmask8)((1u << rem) - 1) : (__mmask8)0;
                for (long q = 0; q < nq4; q += 4) {
                    const double *f0 = tab + qR[q], *f1 = tab + qR[q + 1];
                    const double *f2 = tab + qR[q + 2],
                                 *f3 = tab + qR[q + 3];
                    const double *w0p = W + qO[q], *w1p = W + qO[q + 1];
                    const double *w2p = W + qO[q + 2],
                                 *w3p = W + qO[q + 3];
                    __m512d a0 = _mm512_setzero_pd(), a1 = a0, a2 = a0,
                            a3 = a0;
                    for (int v = 0; v < nv; ++v) {
                        const long ofs = (long)v * 8;
                        a0 = _mm512_fmadd_pd(_mm512_loadu_pd(f0 + ofs),
                                             _mm512_loadu_pd(w0p + ofs), a0);
                        a1 = _mm512_fmadd_pd(_mm512_loadu_pd(f1 + ofs),
                                             _mm512_loadu_pd(w1p + ofs), a1);
                        a2 = _mm512_fmadd_pd(_mm512_loadu_pd(f2 + ofs),
                                             _mm512_loadu_pd(w2p + ofs), a2);
                        a3 = _mm512_fmadd_pd(_mm512_loadu_pd(f3 + ofs),
                                             _mm512_loadu_pd(w3p + ofs), a3);
                    }
                    if (tm) {
                        const long ofs = (long)nv * 8;
                        a0 = _mm512_fmadd_pd(
                            _mm512_maskz_loadu_pd(tm, f0 + ofs),
                            _mm512_maskz_loadu_pd(tm, w0p + ofs), a0);
                        a1 = _mm512_fmadd_pd(
                            _mm512_maskz_loadu_pd(tm, f1 + ofs),
                            _mm512_maskz_loadu_pd(tm, w1p + ofs), a1);
                        a2 = _mm512_fmadd_pd(
                            _mm512_maskz_loadu_pd(tm, f2 + ofs),
                            _mm512_maskz_loadu_pd(tm, w2p + ofs), a2);
                        a3 = _mm512_fmadd_pd(
                            _mm512_maskz_loadu_pd(tm, f3 + ofs),
                            _mm512_maskz_loadu_pd(tm, w3p + ofs), a3);
                    }
                    _mm256_storeu_pd(o + q, hsum4(a0, a1, a2, a3));
                }
                for (long q = nq4; q < outStep; ++q) {
                    const double *fp = tab + qR[q];
                    const double *wp = W + qO[q];
                    __m512d a = _mm512_setzero_pd();
                    for (int v = 0; v < nv; ++v)
                        a = _mm512_fmadd_pd(
                            _mm512_loadu_pd(fp + (long)v * 8),
                            _mm512_loadu_pd(wp + (long)v * 8), a);
                    if (tm) {
                        const long ofs = (long)nv * 8;
                        a = _mm512_fmadd_pd(
                            _mm512_maskz_loadu_pd(tm, fp + ofs),
                            _mm512_maskz_loadu_pd(tm, wp + ofs), a);
                    }
                    o[q] = _mm512_reduce_add_pd(a);
                }
                n += outStep;
            }
        }
#elif R8BT_AVX2
        if (outStep >= 8) {
            /* supercycle-table path, 4-lane: see the AVX-512 comment */
            long nAlign = ((n + outStep - 1) / outStep) * outStep;
            if (nAlign > n1) nAlign = n1;
            emitGeneric(out, n0, n, nAlign);
            n = nAlign;
            const long nq4 = outStep & ~3L;
            while (n + outStep <= n1) {
                long g = w0 + n * inStep;
                long sBase = g / outStep;
                const double *W = hist.raw(sBase - (fl2() - 1), span);
                if (!W) {  /* stream-start boundary */
                    emitGeneric(out, n0, n, n + outStep);
                    n += outStep;
                    continue;
                }
                double *o = out + (n - n0);
                const double *tab = table.data();
                const long *qR = qRow.data(), *qO = qS.data();
                const int nv = (int)(fl >> 2);
                const unsigned rem = (unsigned)(fl & 3);
                const __m256i tm = r8bt_tailmask4(rem);
                for (long q = 0; q < nq4; q += 4) {
                    const double *f0 = tab + qR[q], *f1 = tab + qR[q + 1];
                    const double *f2 = tab + qR[q + 2],
                                 *f3 = tab + qR[q + 3];
                    const double *w0p = W + qO[q], *w1p = W + qO[q + 1];
                    const double *w2p = W + qO[q + 2],
                                 *w3p = W + qO[q + 3];
                    __m256d a0 = _mm256_setzero_pd(), a1 = a0, a2 = a0,
                            a3 = a0;
                    for (int v = 0; v < nv; ++v) {
                        const long ofs = (long)v * 4;
                        a0 = _mm256_fmadd_pd(_mm256_loadu_pd(f0 + ofs),
                                             _mm256_loadu_pd(w0p + ofs), a0);
                        a1 = _mm256_fmadd_pd(_mm256_loadu_pd(f1 + ofs),
                                             _mm256_loadu_pd(w1p + ofs), a1);
                        a2 = _mm256_fmadd_pd(_mm256_loadu_pd(f2 + ofs),
                                             _mm256_loadu_pd(w2p + ofs), a2);
                        a3 = _mm256_fmadd_pd(_mm256_loadu_pd(f3 + ofs),
                                             _mm256_loadu_pd(w3p + ofs), a3);
                    }
                    if (rem) {
                        const long ofs = (long)nv * 4;
                        a0 = _mm256_fmadd_pd(
                            _mm256_maskload_pd(f0 + ofs, tm),
                            _mm256_maskload_pd(w0p + ofs, tm), a0);
                        a1 = _mm256_fmadd_pd(
                            _mm256_maskload_pd(f1 + ofs, tm),
                            _mm256_maskload_pd(w1p + ofs, tm), a1);
                        a2 = _mm256_fmadd_pd(
                            _mm256_maskload_pd(f2 + ofs, tm),
                            _mm256_maskload_pd(w2p + ofs, tm), a2);
                        a3 = _mm256_fmadd_pd(
                            _mm256_maskload_pd(f3 + ofs, tm),
                            _mm256_maskload_pd(w3p + ofs, tm), a3);
                    }
                    _mm256_storeu_pd(o + q, r8bt_hsum4x4(a0, a1, a2, a3));
                }
                for (long q = nq4; q < outStep; ++q) {
                    const double *fp = tab + qR[q];
                    const double *wp = W + qO[q];
                    __m256d a = _mm256_setzero_pd();
                    for (int v = 0; v < nv; ++v)
                        a = _mm256_fmadd_pd(
                            _mm256_loadu_pd(fp + (long)v * 4),
                            _mm256_loadu_pd(wp + (long)v * 4), a);
                    if (rem) {
                        const long ofs = (long)nv * 4;
                        a = _mm256_fmadd_pd(
                            _mm256_maskload_pd(fp + ofs, tm),
                            _mm256_maskload_pd(wp + ofs, tm), a);
                    }
                    o[q] = r8bt_hadd4(a);
                }
                n += outStep;
            }
        }
#elif R8BT_NEON
        if (outStep >= 8) {
            /* supercycle-table path, 2-lane: see the AVX-512 comment */
            long nAlign = ((n + outStep - 1) / outStep) * outStep;
            if (nAlign > n1) nAlign = n1;
            emitGeneric(out, n0, n, nAlign);
            n = nAlign;
            while (n + outStep <= n1) {
                long g = w0 + n * inStep;
                long sBase = g / outStep;
                const double *W = hist.raw(sBase - (fl2() - 1), span);
                if (!W) {  /* stream-start boundary */
                    emitGeneric(out, n0, n, n + outStep);
                    n += outStep;
                    continue;
                }
                double *o = out + (n - n0);
                const double *tab = table.data();
                const long *qR = qRow.data(), *qO = qS.data();
                const int nv = (int)(fl >> 1);
                const bool rem = (fl & 1) != 0;
                for (long q = 0; q < outStep; ++q) {
                    const double *fp = tab + qR[q];
                    const double *wp = W + qO[q];
                    float64x2_t a = vdupq_n_f64(0.0);
                    for (int v = 0; v < nv; ++v)
                        a = vfmaq_f64(a, vld1q_f64(fp + (long)v * 2),
                                      vld1q_f64(wp + (long)v * 2));
                    double sum = vaddvq_f64(a);
                    if (rem) sum += fp[fl - 1] * wp[fl - 1];
                    o[q] = sum;
                }
                n += outStep;
            }
        }
#endif
        emitGeneric(out, n0, n, n1);
    }

    /* generic path: incremental phase stepping + fixed-length tap dots
     * (used below outStep 8, for the misaligned prefix/suffix of each
     * emit, and for supercycles overlapping the stream-start zeros) */
    void emitGeneric(double *out, long nBase, long nFrom, long nTo) {
        if (nFrom >= nTo) return;
        long fll = fl2() - 1;
        long g0 = w0 + nFrom * inStep;
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
        for (long n = nFrom; n < nTo; ++n) {
            const double *flt = &table[(size_t)(f * fl)];
            const double *w = hist.raw(s - fll, fl);
            if (w) {
                fp[nb] = flt;
                wp[nb] = w;
                op[nb] = out + (n - nBase);
                if (++nb == 4) flush();
            } else {  /* stream-start boundary: zero-extended history */
                double acc = 0.0;
                for (long i = 0; i < fl; ++i)
                    acc += flt[i] * hist.at(s - fll + i);
                out[n - nBase] = acc;
            }
            s += sInc;
            f += fInc;
            if (f >= outStep) {
                f -= outStep;
                ++s;
            }
        }
        flush();
#elif R8BT_AVX2
        /* Four outputs in flight (see the AVX-512 comment); tails of
         * non-multiple-of-4 tap counts are AVX2 masked loads. */
        const int nv = (int)(fl >> 2);
        const unsigned rem = (unsigned)(fl & 3);
        const __m256i tmask = r8bt_tailmask4(rem);
        const double *fp[4], *wp[4];
        double *op[4];
        int nb = 0;
        auto flush = [&]() {
            if (nb == 4) {
                __m256d a0 = _mm256_setzero_pd(), a1 = a0, a2 = a0, a3 = a0;
                for (int v = 0; v < nv; ++v) {
                    const long o = (long)v * 4;
                    a0 = _mm256_fmadd_pd(_mm256_loadu_pd(fp[0] + o),
                                         _mm256_loadu_pd(wp[0] + o), a0);
                    a1 = _mm256_fmadd_pd(_mm256_loadu_pd(fp[1] + o),
                                         _mm256_loadu_pd(wp[1] + o), a1);
                    a2 = _mm256_fmadd_pd(_mm256_loadu_pd(fp[2] + o),
                                         _mm256_loadu_pd(wp[2] + o), a2);
                    a3 = _mm256_fmadd_pd(_mm256_loadu_pd(fp[3] + o),
                                         _mm256_loadu_pd(wp[3] + o), a3);
                }
                if (rem) {
                    const long o = (long)nv * 4;
                    a0 = _mm256_fmadd_pd(_mm256_maskload_pd(fp[0] + o, tmask),
                                         _mm256_maskload_pd(wp[0] + o, tmask),
                                         a0);
                    a1 = _mm256_fmadd_pd(_mm256_maskload_pd(fp[1] + o, tmask),
                                         _mm256_maskload_pd(wp[1] + o, tmask),
                                         a1);
                    a2 = _mm256_fmadd_pd(_mm256_maskload_pd(fp[2] + o, tmask),
                                         _mm256_maskload_pd(wp[2] + o, tmask),
                                         a2);
                    a3 = _mm256_fmadd_pd(_mm256_maskload_pd(fp[3] + o, tmask),
                                         _mm256_maskload_pd(wp[3] + o, tmask),
                                         a3);
                }
                double s4[4];
                _mm256_storeu_pd(s4, r8bt_hsum4x4(a0, a1, a2, a3));
                *op[0] = s4[0];
                *op[1] = s4[1];
                *op[2] = s4[2];
                *op[3] = s4[3];
            } else {
                for (int q = 0; q < nb; ++q) {
                    __m256d a = _mm256_setzero_pd();
                    for (int v = 0; v < nv; ++v)
                        a = _mm256_fmadd_pd(
                            _mm256_loadu_pd(fp[q] + (long)v * 4),
                            _mm256_loadu_pd(wp[q] + (long)v * 4), a);
                    if (rem) {
                        const long o = (long)nv * 4;
                        a = _mm256_fmadd_pd(
                            _mm256_maskload_pd(fp[q] + o, tmask),
                            _mm256_maskload_pd(wp[q] + o, tmask), a);
                    }
                    *op[q] = r8bt_hadd4(a);
                }
            }
            nb = 0;
        };
        for (long n = nFrom; n < nTo; ++n) {
            const double *flt = &table[(size_t)(f * fl)];
            const double *w = hist.raw(s - fll, fl);
            if (w) {
                fp[nb] = flt;
                wp[nb] = w;
                op[nb] = out + (n - nBase);
                if (++nb == 4) flush();
            } else {  /* stream-start boundary: zero-extended history */
                double acc = 0.0;
                for (long i = 0; i < fl; ++i)
                    acc += flt[i] * hist.at(s - fll + i);
                out[n - nBase] = acc;
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
        for (long n = nFrom; n < nTo; ++n) {
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
            out[n - nBase] = acc;
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
#if R8BT_AVX512
    /* transposed horizontal reduction: sums of four 8-lane accumulators
     * as one [s0 s1 s2 s3] vector */
    static inline __m256d hsum4(__m512d a0, __m512d a1, __m512d a2,
                                __m512d a3) {
        __m512d t01 = _mm512_add_pd(_mm512_unpacklo_pd(a0, a1),
                                    _mm512_unpackhi_pd(a0, a1));
        __m512d t23 = _mm512_add_pd(_mm512_unpacklo_pd(a2, a3),
                                    _mm512_unpackhi_pd(a2, a3));
        __m512d v = _mm512_add_pd(_mm512_shuffle_f64x2(t01, t23, 0x88),
                                  _mm512_shuffle_f64x2(t01, t23, 0xDD));
        __m512d r = _mm512_add_pd(v, _mm512_permutex_pd(v, 0x4E));
        return _mm256_insertf128_pd(
            _mm256_castpd128_pd256(_mm512_castpd512_pd128(r)),
            _mm512_extractf64x2_pd(r, 2), 1);
    }
#endif

    /* per-supercycle tables: for outputs n with n % outStep == q,
     * f(n) and s(n) - s(supercycle base) are functions of q only */
    void buildTables() {
        qRow.assign((size_t)outStep, 0);
        qS.assign((size_t)outStep, 0);
        const long f0c = ((w0 % outStep) + outStep) % outStep;
        for (long q = 0; q < outStep; ++q) {
            long g = f0c + q * inStep;
            qS[(size_t)q] = g / outStep;
            qRow[(size_t)q] = (g % outStep) * fl;
        }
        span = qS[(size_t)(outStep - 1)] + fl;
        tablesBuilt = true;
    }

    std::vector<long> qRow, qS;
    long span = 0;
    bool tablesBuilt = false;

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
#if R8BT_AVX512
        /* coefficient-plane layout [rows][3][fl] (repacked once from
         * the blob's [rows][fl][3]): the spline evaluate + tap dot is
         * then 2 FMAs + 1 FMA per 8 taps over unit-stride loads */
        if (planes.empty()) {
            planes.assign((size_t)(rows * 3 * fl), 0.0);
            for (long r = 0; r < rows; ++r)
                for (long i = 0; i < fl; ++i)
                    for (long c = 0; c < 3; ++c)
                        planes[(size_t)((r * 3 + c) * fl + i)] =
                            table[(size_t)((r * fl + i) * 3 + c)];
        }
        const int nv = (int)(fl >> 3);
        const unsigned rem = (unsigned)(fl & 7);
        const __mmask8 tm = rem ? (__mmask8)((1u << rem) - 1) : (__mmask8)0;
        for (long n = n0; n < n1; ++n) {
            double p = posOf(n);
            long s = (long)std::floor(p);
            double fr = (p - (double)s) * (double)fracs;
            long fi = (long)std::floor(fr);
            double t = fr - (double)fi;
            const double *c0 = planes.data() + (size_t)(fi * 3 * fl);
            const double *c1 = c0 + fl, *c2 = c1 + fl;
            const double *w = hist.raw(s - fll, fl);
            if (w) {
                const __m512d tv = _mm512_set1_pd(t);
                __m512d a = _mm512_setzero_pd();
                for (int v = 0; v < nv; ++v) {
                    const long o = (long)v * 8;
                    __m512d coef = _mm512_fmadd_pd(
                        _mm512_fmadd_pd(_mm512_loadu_pd(c2 + o), tv,
                                        _mm512_loadu_pd(c1 + o)),
                        tv, _mm512_loadu_pd(c0 + o));
                    a = _mm512_fmadd_pd(coef, _mm512_loadu_pd(w + o), a);
                }
                if (tm) {
                    const long o = (long)nv * 8;
                    __m512d coef = _mm512_fmadd_pd(
                        _mm512_fmadd_pd(_mm512_maskz_loadu_pd(tm, c2 + o),
                                        tv,
                                        _mm512_maskz_loadu_pd(tm, c1 + o)),
                        tv, _mm512_maskz_loadu_pd(tm, c0 + o));
                    a = _mm512_fmadd_pd(coef, _mm512_maskz_loadu_pd(tm, w + o),
                                        a);
                }
                out[n - n0] = _mm512_reduce_add_pd(a);
            } else {  /* stream-start boundary */
                double acc = 0.0;
                for (long i = 0; i < fl; ++i)
                    acc += (c0[i] + (c1[i] + c2[i] * t) * t) *
                           hist.at(s - fll + i);
                out[n - n0] = acc;
            }
        }
#elif R8BT_AVX2
        /* coefficient-plane layout (see the AVX-512 comment), 4-lane */
        if (planes.empty()) {
            planes.assign((size_t)(rows * 3 * fl), 0.0);
            for (long r = 0; r < rows; ++r)
                for (long i = 0; i < fl; ++i)
                    for (long c = 0; c < 3; ++c)
                        planes[(size_t)((r * 3 + c) * fl + i)] =
                            table[(size_t)((r * fl + i) * 3 + c)];
        }
        const int nv = (int)(fl >> 2);
        const unsigned rem = (unsigned)(fl & 3);
        const __m256i tm = r8bt_tailmask4(rem);
        for (long n = n0; n < n1; ++n) {
            double p = posOf(n);
            long s = (long)std::floor(p);
            double fr = (p - (double)s) * (double)fracs;
            long fi = (long)std::floor(fr);
            double t = fr - (double)fi;
            const double *c0 = planes.data() + (size_t)(fi * 3 * fl);
            const double *c1 = c0 + fl, *c2 = c1 + fl;
            const double *w = hist.raw(s - fll, fl);
            if (w) {
                const __m256d tv = _mm256_set1_pd(t);
                __m256d a = _mm256_setzero_pd();
                for (int v = 0; v < nv; ++v) {
                    const long o = (long)v * 4;
                    __m256d coef = _mm256_fmadd_pd(
                        _mm256_fmadd_pd(_mm256_loadu_pd(c2 + o), tv,
                                        _mm256_loadu_pd(c1 + o)),
                        tv, _mm256_loadu_pd(c0 + o));
                    a = _mm256_fmadd_pd(coef, _mm256_loadu_pd(w + o), a);
                }
                if (rem) {
                    const long o = (long)nv * 4;
                    __m256d coef = _mm256_fmadd_pd(
                        _mm256_fmadd_pd(_mm256_maskload_pd(c2 + o, tm), tv,
                                        _mm256_maskload_pd(c1 + o, tm)),
                        tv, _mm256_maskload_pd(c0 + o, tm));
                    a = _mm256_fmadd_pd(coef, _mm256_maskload_pd(w + o, tm),
                                        a);
                }
                out[n - n0] = r8bt_hadd4(a);
            } else {  /* stream-start boundary */
                double acc = 0.0;
                for (long i = 0; i < fl; ++i)
                    acc += (c0[i] + (c1[i] + c2[i] * t) * t) *
                           hist.at(s - fll + i);
                out[n - n0] = acc;
            }
        }
#else
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
#endif
    }

  private:
    std::vector<double> planes; /* [rows][3][fl], built on first emit */
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
        const double *curp = in;
        long curn = n;
        std::vector<double> *cur = &bufA, *nxt = &bufB;
        for (auto *s : stages) {
            long m = s->process(curp, curn, *nxt);
            nxt->resize((size_t)m);
            std::swap(cur, nxt);
            curp = cur->data();
            curn = m;
        }
        if (stages.empty()) {  /* identity plan: mirror input */
            bufA.assign(in, in + n);
            *out = bufA.data();
            return n;
        }
        *out = cur->data();
        return (long)curn;
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
            /* off >= 0 always holds for planner-produced blobs (the
             * content offset is base + a non-negative mod-down term,
             * models/plan.py _make_conv); a negative off would inflate
             * availOut() to ~|off| outputs on the first process() call
             * and abort the host on the resize. */
            if (s->up <= 0 || s->down <= 0 || s->off < 0 ||
                s->off > (1LL << 40) ||
                s->up > (1 << 20) || s->down > (1 << 20) || s->K <= 0 ||
                !rd.validCount(s->K)) {
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
            if (lat < 0 || lat > (1LL << 40) || nt <= 0 ||
                nt > (1 << 20) || !rd.validCount(nt)) {
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
                s->inStep > (1LL << 32) || s->w0 < 0 ||
                s->w0 > (1LL << 40) ||
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
                !std::isfinite(s->srcRate) || !std::isfinite(s->dstRate) ||
                !std::isfinite(s->initFracPos) || s->srcRate <= 0.0 ||
                s->dstRate <= 0.0 || s->initFracPos < 0.0 ||
                s->initFracPos > 1e9 || s->srcRate / s->dstRate > 1e9 ||
                s->dstRate / s->srcRate > 1e9 ||
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
    try {
        return ((Engine *)h)->process(in, in_len, out);
    } catch (...) {  // never let bad_alloc escape the extern "C" boundary
        return -1;
    }
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
