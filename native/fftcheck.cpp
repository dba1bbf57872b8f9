/* fftcheck — direct unit check of the engine's Stockham FFT kernel.
 *
 * The FFT is only exercised at sizes 256-1024 by the production chains
 * (R8BT_SEG caps nfft at 1024); this checks every power of two 8..8192
 * — covering every radix plan (pure 8s, 8+4, 8+2, the odd-parity 4*2
 * split, and the tiny odd-stage final-copy path) — against a naive f64
 * DFT, forward and unscaled-inverse, plus a round-trip identity.
 * Mirrors the role of the reference's FFT-backend swap compatibility
 * contract (r8bconf.h:149-206: backends must be interchangeable). */
#include "r8bt.cpp"

#include <cstdio>

static uint64_t seed = 987654321;
static double rnd() {
    seed = seed * 6364136223846793005ULL + 1442695040888963407ULL;
    return (double)(seed >> 11) / 4503599627370496.0 - 1.0;
}

static void naive(const double *xr, const double *xi, double *Xr,
                  double *Xi, int n, bool inv) {
    for (int k = 0; k < n; ++k) {
        double sr = 0, si = 0;
        for (int t = 0; t < n; ++t) {
            double a = (inv ? 2.0 : -2.0) * 3.14159265358979323846 *
                       (double)((long)k * t % n) / n;
            double c = std::cos(a), s = std::sin(a);
            sr += xr[t] * c - xi[t] * s;
            si += xr[t] * s + xi[t] * c;
        }
        Xr[k] = sr;
        Xi[k] = si;
    }
}

int main() {
    int fails = 0;
    for (int n = 8; n <= 8192; n <<= 1) {
        std::vector<double> xr(n), xi(n), rr(n), ri(n), Xr(n), Xi(n);
        for (int i = 0; i < n; ++i) {
            xr[(size_t)i] = rnd();
            xi[(size_t)i] = rnd();
        }
        CFFT f;
        f.init(n);
        for (int inv = 0; inv < 2; ++inv) {
            rr = xr;
            ri = xi;
            f.run(rr.data(), ri.data(), inv != 0);
            naive(xr.data(), xi.data(), Xr.data(), Xi.data(), n, inv != 0);
            double err = 0, ref = 1e-300;
            for (int i = 0; i < n; ++i) {
                err = std::max(err, std::abs(rr[(size_t)i] - Xr[(size_t)i]));
                err = std::max(err, std::abs(ri[(size_t)i] - Xi[(size_t)i]));
                ref = std::max(ref, std::abs(Xr[(size_t)i]));
            }
            double rel = err / ref;
            bool ok = rel < 1e-11; /* naive DFT's own error dominates */
            std::printf("n=%5d inv=%d relerr %.3e %s\n", n, inv, rel,
                        ok ? "ok" : "FAIL");
            if (!ok) ++fails;
        }
        /* round trip: inverse(forward(x)) == n * x to f64 rounding */
        rr = xr;
        ri = xi;
        f.run(rr.data(), ri.data(), false);
        f.run(rr.data(), ri.data(), true);
        double err = 0;
        for (int i = 0; i < n; ++i) {
            err = std::max(err,
                           std::abs(rr[(size_t)i] / n - xr[(size_t)i]));
            err = std::max(err,
                           std::abs(ri[(size_t)i] / n - xi[(size_t)i]));
        }
        bool ok = err < 1e-13;
        std::printf("n=%5d roundtrip err %.3e %s\n", n, err,
                    ok ? "ok" : "FAIL");
        if (!ok) ++fails;
    }
    std::printf(fails ? "FFTCHECK FAIL (%d)\n" : "FFTCHECK PASS\n", fails);
    return fails ? 1 : 0;
}
