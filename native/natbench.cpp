/* natbench — steady-state-only native engine bench (for profiling). */
#include "r8bt.h"
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <sys/resource.h>
#include <vector>

/* user-CPU seconds: steal/scheduling-noise-resistant on shared VMs */
static double cpuTime() {
    rusage ru;
    getrusage(RUSAGE_SELF, &ru);
    return (double)ru.ru_utime.tv_sec + 1e-6 * (double)ru.ru_utime.tv_usec;
}

static uint64_t lcg(uint64_t &s) {
    s = s * 6364136223846793005ULL + 1442695040888963407ULL;
    return s;
}

int main(int argc, char **argv) {
    if (argc < 3) return 2;
    FILE *f = std::fopen(argv[1], "rb");
    if (!f) return 2;
    std::fseek(f, 0, SEEK_END);
    long len = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<unsigned char> blob((size_t)len);
    if (std::fread(blob.data(), 1, (size_t)len, f) != (size_t)len) return 2;
    std::fclose(f);
    long n = std::atol(argv[2]);
    long chunkLen = argc > 3 ? std::atol(argv[3]) : 8192;

    r8bt_handle h = r8bt_create_from_blob(blob.data(), blob.size());
    if (!h) return 1;
    uint64_t s = 7;
    std::vector<double> chunk((size_t)chunkLen);
    for (long i = 0; i < chunkLen; ++i)
        chunk[(size_t)i] = (double)(lcg(s) >> 11) / 4503599627370496.0 - 1.0;
    /* warmup */
    for (long fed = 0; fed < 4 * chunkLen; fed += chunkLen) {
        double *out = nullptr;
        r8bt_process(h, chunk.data(), chunkLen, &out);
    }
    double sink = 0.0;
    auto t0 = std::chrono::steady_clock::now();
    double c0 = cpuTime();
    for (long fed = 0; fed < n; fed += chunkLen) {
        double *out = nullptr;
        long m = r8bt_process(h, chunk.data(), chunkLen, &out);
        if (m > 0) sink += out[0] + out[m - 1];
    }
    auto t1 = std::chrono::steady_clock::now();
    double c1 = cpuTime();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    double dc = c1 - c0;
    std::printf("mrops %.2f cpu-mrops %.2f (%ld samples in %.3fs wall / "
                "%.3fs cpu; sink %.3g)\n",
                1e-6 * (double)n / dt, 1e-6 * (double)n / dc, n, dt, dc,
                sink);
    r8bt_delete(h);
    return 0;
}
