// Golden-data generator for oracle validation.
//
// Compiles against the r8brain-free-src reference headers (mounted
// read-only at /root/reference — include path set by the build command;
// no reference code is copied into this repo).  Runs the reference
// CDSPResampler in oneshot mode on a deterministic pseudorandom signal and
// writes the raw f64 output, which tests/test_goldens.py compares against
// this repo's CPU oracle.
//
// Usage:
//   make_goldens <src> <dst> <tb> <atten> <phase:0|1> <inlen> <outlen>
//                <maxinlen> <seed> <outfile>
//
// Output file layout: int64 outlen, f64 latency_frac,
//                     int64 inlen_before_out_pos(16), f64 out[outlen]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "CDSPResampler.h"

// Deterministic 64-bit LCG (same constants in tests/helpers.py).
static uint64_t lcg_state;
static void lcg_seed(uint64_t s) { lcg_state = s * 6364136223846793005ULL + 1442695040888963407ULL; }
static double lcg_uniform()
{
    lcg_state = lcg_state * 6364136223846793005ULL + 1442695040888963407ULL;
    return (double)(lcg_state >> 11) / 9007199254740992.0 * 2.0 - 1.0;
}

int main(int argc, char** argv)
{
    if (argc != 11) {
        fprintf(stderr, "bad args\n");
        return 2;
    }
    const double src = atof(argv[1]);
    const double dst = atof(argv[2]);
    const double tb = atof(argv[3]);
    const double atten = atof(argv[4]);
    const int phase = atoi(argv[5]);
    const int inlen = atoi(argv[6]);
    const int outlen = atoi(argv[7]);
    const int maxinlen = atoi(argv[8]);
    const uint64_t seed = strtoull(argv[9], NULL, 10);
    const char* outfile = argv[10];

    lcg_seed(seed);
    std::vector<double> in((size_t)inlen);
    for (int i = 0; i < inlen; i++) in[(size_t)i] = lcg_uniform();

    r8b::CDSPResampler rs(src, dst, maxinlen, tb, atten,
        phase ? r8b::fprMinPhase : r8b::fprLinearPhase);

    std::vector<double> out((size_t)outlen);
    rs.oneshot(&in[0], inlen, &out[0], outlen);

    // latency queries at positions 0..15 scaled
    int64_t q[16];
    for (int i = 0; i < 16; i++) {
        q[i] = rs.getInLenBeforeOutPos(i * 97);
    }

    FILE* f = fopen(outfile, "wb");
    if (!f) return 3;
    int64_t ol = outlen;
    double lf = rs.getLatencyFrac();
    fwrite(&ol, sizeof ol, 1, f);
    fwrite(&lf, sizeof lf, 1, f);
    fwrite(q, sizeof q[0], 16, f);
    fwrite(&out[0], sizeof(double), (size_t)outlen, f);
    fclose(f);
    return 0;
}
