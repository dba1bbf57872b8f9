/* natbench — steady-state-only native engine bench (for profiling).
 *
 * usage: natbench <blob | src:dst[:atten]> n_samples [chunk_len] [threads]
 *
 * The first argument is either a plan-blob path or a src:dst rate pair
 * (optional :atten, default 180.15 dB) handed to the standalone native
 * designer (r8bt_create_ex) — no Python needed for the latter.
 *
 * threads > 1 runs one independent engine per thread over the same blob
 * (the reference's one-object-per-channel concurrency model,
 * README.md:52-55) and reports the aggregate rate; each thread still
 * processes n_samples.  Reports both wall-clock Mrops and user-CPU
 * Mrops (getrusage) — the CPU figure is resistant to neighbor load and
 * scheduling noise on shared VMs.
 */
#include "r8bt.h"
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <sys/resource.h>
#include <thread>
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

static double runOne(r8bt_handle h, const std::vector<double> &chunk,
                     long n) {
    const long chunkLen = (long)chunk.size();
    double sink = 0.0;
    for (long fed = 0; fed < n; fed += chunkLen) {
        double *out = nullptr;
        long m = r8bt_process(h, chunk.data(), chunkLen, &out);
        if (m > 0) sink += out[0] + out[m - 1];
    }
    return sink;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        std::fprintf(stderr,
                     "usage: %s <blob|src:dst[:atten]> n [chunk_len] "
                     "[threads]\n", argv[0]);
        return 2;
    }
    double srcRate = 0.0, dstRate = 0.0, atten = 180.15;
    const bool fromRates =
        std::sscanf(argv[1], "%lf:%lf:%lf", &srcRate, &dstRate, &atten) >= 2;
    std::vector<unsigned char> blob;
    if (!fromRates) {
        FILE *f = std::fopen(argv[1], "rb");
        if (!f) return 2;
        std::fseek(f, 0, SEEK_END);
        long len = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        blob.resize((size_t)len);
        if (std::fread(blob.data(), 1, (size_t)len, f) != (size_t)len)
            return 2;
        std::fclose(f);
    }
    long n = std::atol(argv[2]);
    long chunkLen = argc > 3 ? std::atol(argv[3]) : 8192;
    int nThreads = argc > 4 ? std::atoi(argv[4]) : 1;
    if (nThreads < 1) nThreads = 1;

    std::vector<r8bt_handle> hs((size_t)nThreads);
    for (int t = 0; t < nThreads; ++t) {
        hs[(size_t)t] = fromRates
            ? r8bt_create_ex(srcRate, dstRate, 2.0, atten, 0)
            : r8bt_create_from_blob(blob.data(), blob.size());
        if (!hs[(size_t)t]) return 1;
    }
    uint64_t s = 7;
    std::vector<double> chunk((size_t)chunkLen);
    for (long i = 0; i < chunkLen; ++i)
        chunk[(size_t)i] = (double)(lcg(s) >> 11) / 4503599627370496.0 - 1.0;
    /* warmup (fills the FDL and builds the per-stage tables) */
    for (int t = 0; t < nThreads; ++t)
        runOne(hs[(size_t)t], chunk, 4 * chunkLen);

    std::vector<double> sinks((size_t)nThreads, 0.0);
    auto t0 = std::chrono::steady_clock::now();
    double c0 = cpuTime();
    if (nThreads == 1) {
        sinks[0] = runOne(hs[0], chunk, n);
    } else {
        std::vector<std::thread> ths;
        for (int t = 0; t < nThreads; ++t)
            ths.emplace_back([&, t] {
                sinks[(size_t)t] = runOne(hs[(size_t)t], chunk, n);
            });
        for (auto &th : ths) th.join();
    }
    auto t1 = std::chrono::steady_clock::now();
    double c1 = cpuTime();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    double dc = c1 - c0;
    double total = (double)n * nThreads;
    double sink = 0.0;
    for (double v : sinks) sink += v;
    std::printf("mrops %.2f cpu-mrops %.2f (%d thread%s x %ld samples in "
                "%.3fs wall / %.3fs cpu; sink %.3g)\n",
                1e-6 * total / dt, 1e-6 * total / dc, nThreads,
                nThreads == 1 ? "" : "s", n, dt, dc, sink);
    for (int t = 0; t < nThreads; ++t) r8bt_delete(hs[(size_t)t]);
    return 0;
}
