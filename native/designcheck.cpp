/* designcheck.cpp — native designer robustness harness (ASan/UBSan).
 *
 * Exercises r8bt_create_ex across every planner branch (random rate pairs
 * from the production rate set, random trans-band/atten, min-phase every
 * 7th) and streams audio through each designed engine; then probes the
 * hostile parameter space (zero/negative/denormal/NaN/Inf rates, out-of-
 * range trans-band/atten/res, >1e9 rate ratios), which must return NULL
 * without crashing or leaking.  Built with -fsanitize=address,undefined
 * by tests/test_native.py::test_native_designcheck_asan — the designer
 * counterpart of the masstest engine-hardening run.
 */
#include "r8bt.h"
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <cmath>
static unsigned long long s = 12345;
static double urand() { s = s*6364136223846793005ULL + 1442695040888963407ULL; return (double)(s >> 11) / 9007199254740992.0; }
int main() {
    const double rates[] = {8000, 11025, 16000, 22050, 32000, 44100, 48000,
                            88200, 96000, 96001, 176400, 192000, 352800,
                            384000, 2822400};
    int n = 0;
    for (double src : rates) for (double dst : rates) {
        if (src == dst) continue;
        double tb = 0.5 + urand()*44.0;
        double atten = 49.0 + urand()*169.0;
        int phase = (n % 7 == 0) ? 1 : 0;
        r8bt_handle h = r8bt_create_ex(src, dst, tb, atten, phase);
        if (!h) { printf("create failed %g->%g tb=%g at=%g ph=%d\n", src, dst, tb, atten, phase); return 1; }
        std::vector<double> x(1000);
        for (auto &v : x) v = urand()*2-1;
        double *out; long m = r8bt_process(h, x.data(), 1000, &out);
        if (m < 0) { printf("process failed\n"); return 1; }
        for (long i = 0; i < m; ++i) if (!std::isfinite(out[i])) { printf("nonfinite output %g->%g\n", src, dst); return 1; }
        r8bt_delete(h);
        ++n;
    }
    // hostile parameter space: must return NULL, never crash
    const double bad[] = {0.0, -1.0, 1e308, 1e-308, NAN, INFINITY};
    for (double a : bad) for (double b : bad) {
        if (a == b && a > 0.0 && std::isfinite(a)) continue;  // identity plan is valid
        if (r8bt_create_ex(a, b, 2.0, 180.15, 0)) { printf("accepted bad rates %g %g\n", a, b); return 1; }
    }
    for (double tb : bad) if (r8bt_create_ex(44100, 96000, tb, 180.15, 0)) { printf("accepted bad tb %g\n", tb); return 1; }
    for (double at : bad) if (r8bt_create_ex(44100, 96000, 2.0, at, 0)) { printf("accepted bad atten %g\n", at); return 1; }
    if (r8bt_create(44100, 96000, 2.0, -1)) { printf("accepted res -1\n"); return 1; }
    if (r8bt_create(44100, 96000, 2.0, 99)) { printf("accepted res 99\n"); return 1; }
    if (r8bt_create_ex(1e-300, 1e300, 2.0, 180.15, 0)) { printf("accepted extreme ratio\n"); return 1; }
    printf("designer ASan sweep: %d engines ok\n", n);
    return 0;
}
