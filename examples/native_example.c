/* native_example.c — plain-C host application against the standalone
 * native engine (the reference's example.cpp workflow: design + stream,
 * no Python anywhere).
 *
 * Build + run (from the repo root):
 *   make -C native
 *   gcc -O2 -o /tmp/native_example examples/native_example.c \
 *       -Lnative -lr8bt -Wl,-rpath,$PWD/native -lm
 *   /tmp/native_example
 *
 * Mirrors the reference's example.cpp (sine through CDSPResampler24,
 * reference example.cpp:1-61) via the flat C ABI:
 *   r8bt_create(44100, 96000, 2.0, 2 /\* r8brr24 *\/)  — design in C++
 *   r8bt_process(...)                                  — push-mode loop
 */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "../native/r8bt.h"

int main(void) {
    const double src = 44100.0, dst = 96000.0;
    const long n = 44100; /* 1 s */
    const long want = 96000;

    r8bt_handle h = r8bt_create(src, dst, 2.0, 2 /* r8brr24, 180.15 dB */);
    if (!h) {
        fprintf(stderr, "create failed\n");
        return 1;
    }

    double *x = (double *)malloc(sizeof(double) * 4096);
    double *y = (double *)malloc(sizeof(double) * (want + 8192));
    long produced = 0, fed = 0;

    /* push-mode loop with zero-flush of the latency tail */
    while (produced < want) {
        long chunk = 4096;
        for (long i = 0; i < chunk; ++i) {
            long t = fed + i;
            x[i] = (t < n)
                ? 0.5 * sin(2.0 * M_PI * 440.0 * (double)t / src)
                : 0.0;
        }
        fed += chunk;
        double *out;
        long m = r8bt_process(h, x, chunk, &out);
        if (m < 0) {
            fprintf(stderr, "process failed\n");
            return 1;
        }
        for (long i = 0; i < m && produced < want; ++i)
            y[produced++] = out[i];
    }
    r8bt_delete(h);

    /* sanity: steady-state peak ~0.5, output frequency 440 Hz (count
     * zero crossings over the middle second's worth of samples) */
    double peak = 0.0;
    long zc = 0;
    long a = want / 4, b = want * 3 / 4;
    for (long i = a; i < b; ++i) {
        double v = fabs(y[i]);
        if (v > peak) peak = v;
        if (i > a && (y[i - 1] < 0.0) != (y[i] < 0.0)) ++zc;
    }
    double freq = (double)zc * 0.5 * dst / (double)(b - a);
    printf("resampled %ld -> %ld samples, peak %.4f, freq %.2f Hz\n",
           n, produced, peak, freq);
    /* zero-crossing counting quantizes freq to ~1 Hz at this window */
    if (fabs(peak - 0.5) > 0.01 || fabs(freq - 440.0) > 2.0) {
        fprintf(stderr, "FAIL\n");
        return 1;
    }
    printf("ok\n");
    free(x);
    free(y);
    return 0;
}
