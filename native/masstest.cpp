/* masstest — randomized streaming through the native engine under
 * sanitizers (bench/masstest.cpp:3-9 analog: the reference runs randomized
 * workloads under Dr.Memory; here the binary is built with
 * -fsanitize=address,undefined and exercised by tests/test_native.py).
 *
 * Usage: masstest <plan.blob> <n_samples> [seed] [threads]
 *        masstest <plan.blob> --dump <in.f64> <out.f64> <out_len> [seed]
 * Dump mode (the unified differential fuzzer's native executor,
 * tests/test_differential_slow.py): reads raw float64 input, streams it
 * through the engine in LCG-random-sized chunks, zero-flushes the
 * pipeline latency until out_len outputs exist (CDSPResampler.h:592-651
 * oneshot contract), and writes the first out_len outputs as raw
 * float64 — so the exact samples compared against the other three
 * executors are produced UNDER the sanitizers when run via the
 * masstest_asan build.
 * Default mode: streams n_samples of noise in random-sized chunks,
 * clears and repeats
 * once (state-reset coverage), prints a checksum — then streams one
 * steady-state timed pass in 8192-sample chunks and prints Mrops
 * (1e-6 * input-samples / second, the bench/r8bfreesrc.cpp:140-141
 * convention; single channel, single core).  With [threads] > 1, a
 * final pass runs one independent engine per thread (the reference's
 * one-object-per-channel concurrency contract, README.md:52-55) and
 * prints the aggregate Mrops — the n-core scaling the reference's
 * 38*n_cores figure assumes.
 */

#include "r8bt.h"

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string_view>
#include <thread>
#include <vector>

static uint64_t lcg(uint64_t &s) {
    s = s * 6364136223846793005ULL + 1442695040888963407ULL;
    return s;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s blob n [seed]\n", argv[0]);
        return 2;
    }
    FILE *f = std::fopen(argv[1], "rb");
    if (!f) {
        std::perror("open blob");
        return 2;
    }
    std::fseek(f, 0, SEEK_END);
    long len = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<unsigned char> blob((size_t)len);
    if (std::fread(blob.data(), 1, (size_t)len, f) != (size_t)len) {
        std::fclose(f);
        return 2;
    }
    std::fclose(f);

    if (std::string_view(argv[2]) == "--dump") {
        if (argc < 6) {
            std::fprintf(stderr, "usage: %s blob --dump in out len [seed]\n",
                         argv[0]);
            return 2;
        }
        FILE *fi = std::fopen(argv[3], "rb");
        if (!fi) {
            std::perror("open input");
            return 2;
        }
        std::fseek(fi, 0, SEEK_END);
        long ibytes = std::ftell(fi);
        std::fseek(fi, 0, SEEK_SET);
        std::vector<double> in((size_t)(ibytes / 8));
        if (std::fread(in.data(), 8, in.size(), fi) != in.size()) {
            std::fclose(fi);
            return 2;
        }
        std::fclose(fi);
        long want = std::atol(argv[5]);
        uint64_t s = argc > 6 ? (uint64_t)std::atoll(argv[6]) : 42;
        r8bt_handle h = r8bt_create_from_blob(blob.data(), blob.size());
        if (!h) {
            std::fprintf(stderr, "blob rejected\n");
            return 1;
        }
        std::vector<double> got;
        got.reserve((size_t)want);
        long fed = 0;
        std::vector<double> zeros(1024, 0.0);
        while ((long)got.size() < want) {
            long c = 1 + (long)(lcg(s) % 1024);
            const double *ip;
            if (fed < (long)in.size()) {
                if (fed + c > (long)in.size()) c = (long)in.size() - fed;
                ip = in.data() + fed;
            } else {
                ip = zeros.data();  /* latency flush */
            }
            double *out = nullptr;
            long m = r8bt_process(h, ip, c, &out);
            if (m < 0) {
                std::fprintf(stderr, "process failed\n");
                r8bt_delete(h);
                return 1;
            }
            got.insert(got.end(), out, out + m);
            fed += c;
            if (fed > (long)in.size() + 64 * want + (1 << 22)) {
                std::fprintf(stderr, "flush did not converge\n");
                r8bt_delete(h);
                return 1;
            }
        }
        r8bt_delete(h);
        FILE *fo = std::fopen(argv[4], "wb");
        if (!fo) {
            std::perror("open output");
            return 2;
        }
        std::fwrite(got.data(), 8, (size_t)want, fo);
        std::fclose(fo);
        std::printf("dump ok %ld\n", want);
        return 0;
    }

    long n = std::atol(argv[2]);
    uint64_t seed = argc > 3 ? (uint64_t)std::atoll(argv[3]) : 42;
    int nthreads = argc > 4 ? std::atoi(argv[4]) : 1;

    r8bt_handle h = r8bt_create_from_blob(blob.data(), blob.size());
    if (!h) {
        std::fprintf(stderr, "blob rejected\n");
        return 1;
    }

    double checksum = 0.0;
    for (int pass = 0; pass < 2; ++pass) {
        uint64_t s = seed + pass;
        long fed = 0;
        std::vector<double> chunk;
        while (fed < n) {
            long c = 1 + (long)(lcg(s) % 1024);
            if (fed + c > n) c = n - fed;
            chunk.resize((size_t)c);
            for (long i = 0; i < c; ++i)
                chunk[(size_t)i] =
                    (double)(lcg(s) >> 11) / 4503599627370496.0 - 1.0;
            double *out = nullptr;
            long m = r8bt_process(h, chunk.data(), c, &out);
            if (m < 0) {
                std::fprintf(stderr, "process failed\n");
                r8bt_delete(h);
                return 1;
            }
            for (long i = 0; i < m; ++i) checksum += out[i] * 1e-6;
            fed += c;
        }
        r8bt_clear(h);
    }

    /* timed steady-state pass */
    {
        uint64_t s = seed + 99;
        const long chunkLen = 8192;
        std::vector<double> chunk((size_t)chunkLen);
        for (long i = 0; i < chunkLen; ++i)
            chunk[(size_t)i] =
                (double)(lcg(s) >> 11) / 4503599627370496.0 - 1.0;
        long total = n < 8 * chunkLen ? 8 * chunkLen : n;
        double sink = 0.0;
        auto t0 = std::chrono::steady_clock::now();
        for (long fed = 0; fed < total; fed += chunkLen) {
            double *out = nullptr;
            long m = r8bt_process(h, chunk.data(), chunkLen, &out);
            if (m > 0) sink += out[0] + out[m - 1];
        }
        auto t1 = std::chrono::steady_clock::now();
        double dt = std::chrono::duration<double>(t1 - t0).count();
        std::printf("mrops %.2f (%ld samples in %.3fs; sink %.3g)\n",
                    1e-6 * (double)total / dt, total, dt, sink);
        r8bt_clear(h);
    }
    r8bt_delete(h);
    std::printf("checksum %.12g\n", checksum);

    if (nthreads > 1) {  /* one engine per thread, aggregate Mrops */
        const long chunkLen = 8192;
        long total = n < 8 * chunkLen ? 8 * chunkLen : n;
        std::vector<double> sinks((size_t)nthreads, 0.0);
        std::vector<std::thread> th;
        auto t0 = std::chrono::steady_clock::now();
        for (int ti = 0; ti < nthreads; ++ti) {
            th.emplace_back([&, ti]() {
                r8bt_handle hh =
                    r8bt_create_from_blob(blob.data(), blob.size());
                if (!hh) return;
                uint64_t s = seed + 1000 + (uint64_t)ti;
                std::vector<double> chunk((size_t)chunkLen);
                for (long i = 0; i < chunkLen; ++i)
                    chunk[(size_t)i] =
                        (double)(lcg(s) >> 11) / 4503599627370496.0 - 1.0;
                double sink = 0.0;
                for (long fed = 0; fed < total; fed += chunkLen) {
                    double *out = nullptr;
                    long m = r8bt_process(hh, chunk.data(), chunkLen, &out);
                    if (m > 0) sink += out[0] + out[m - 1];
                }
                sinks[(size_t)ti] = sink;
                r8bt_delete(hh);
            });
        }
        for (auto &t : th) t.join();
        auto t1 = std::chrono::steady_clock::now();
        double dt = std::chrono::duration<double>(t1 - t0).count();
        double sink = 0.0;
        for (double v : sinks) sink += v;
        std::printf("mrops_mt %.2f (threads %d; %ld samples each in "
                    "%.3fs; sink %.3g)\n",
                    1e-6 * (double)total * nthreads / dt, nthreads,
                    total, dt, sink);
    }
    return 0;
}
