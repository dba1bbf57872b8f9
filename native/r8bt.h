/* r8bt.h — C ABI for the r8brain_tpu native streaming engine.
 *
 * Counterpart of the reference's flat DLL interface (DLL/r8bsrc.h:68-132:
 * r8b_create / r8b_delete / r8b_clear / r8b_inlen / r8b_process).  The
 * TPU framework splits design from execution: filter design runs in the
 * Python design layer (r8brain_tpu.design) and is serialized into a plan
 * blob (r8brain_tpu.native.build_plan_blob); this engine executes the plan
 * as a sample-exact float64 streaming pipeline with no Python dependency —
 * the host-side deployment runtime (one handle per channel, the reference's
 * thread-safety contract, README.md:52-55).
 *
 * Blob layout (little-endian):
 *   magic "R8BT" | u32 version | f64 src_rate | f64 dst_rate
 *   | f64 latency_frac | u32 n_stages | stages...
 * stage: u32 kind (0=conv,1=hb_up,2=hb_down,3=frac_whole,4=frac_poly)
 *   conv:       i64 up, down, offset | i64 K | f64 kernel[K]
 *   hb_up/down: i64 nt, out_latency | f64 taps[nt]
 *   frac_whole: i64 in_step, out_step, w0, in_latency, fl
 *               | f64 table[out_step*fl]
 *   frac_poly:  f64 src_rate, dst_rate, init_frac_pos | i64 in_latency,
 *               fl, fracs, rows | f64 table[rows*fl*3]
 *
 * SIMD coverage (r8bt.cpp): AVX-512 and AVX2+FMA kernels for the FFT
 * butterflies, half-band stencils and fractional dot products, with a
 * portable scalar fallback.  ARM/NEON kernels are NOT provided (the
 * reference ships NEON variants, r8bbase.h:107-134 /
 * CDSPHBUpsampler.inc:298; this build environment has no ARM toolchain
 * or hardware to compile-check intrinsics against).  On ARM hosts the
 * scalar path runs and is correct but expect a ~2.2-3.8x throughput
 * cliff — the same deltas measured on x86 with AVX-512/AVX2 masked off
 * (NEXT.md item 6); contributions of __ARM_NEON counterparts slot into
 * the existing per-kernel dispatch points.
 */
#ifndef R8BT_H
#define R8BT_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef void *r8bt_handle;

/* Create a single-channel streaming resampler from a serialized plan.
 * Returns NULL on parse failure. */
r8bt_handle r8bt_create_from_blob(const void *blob, size_t len);

void r8bt_delete(r8bt_handle h);

/* Reset all stream state (CDSPResampler::clear equivalent). */
void r8bt_clear(r8bt_handle h);

/* Push in_len samples; *out receives a pointer (owned by the handle,
 * valid until the next call) to the newly emitted samples.  Returns the
 * emitted count, or -1 on error. */
long r8bt_process(r8bt_handle h, const double *in, long in_len,
                  double **out);

/* Exact minimal input count that yields >= out_count outputs
 * (getInputRequiredForOutput, CDSPResampler.h:476-484). */
long r8bt_in_required_for_out(r8bt_handle h, long out_count);

double r8bt_latency_frac(r8bt_handle h);

/* Library version string. */
const char *r8bt_version(void);

/* ---- Standalone native designer (r8bt_design.cpp) ----------------------
 * Design + create from sample rates alone, like the reference DLL's
 * r8b_create (DLL/r8bsrc.h:68-71) — no Python, no plan blob needed.
 * res follows ER8BResamplerRes (DLL/r8bsrc.h:38-43):
 *   0 = 16-bit (ReqAtten 136.45), 1 = 16-bit IR (109.56),
 *   2 = 24-bit / 32-bit float (180.15).
 * Returns NULL on invalid parameters. */
r8bt_handle r8bt_create(double src_rate, double dst_rate, double trans_band,
                        int res);

/* Fully-parameterized create: trans_band in [0.5, 45] (percent), atten in
 * [49, 218] dB, phase 0 = linear, 1 = minimum. */
r8bt_handle r8bt_create_ex(double src_rate, double dst_rate,
                           double trans_band, double atten, int phase);

/* Run the native designer and return the serialized plan blob (the same
 * format r8bt_create_from_blob consumes).  Returns the blob size in bytes
 * (copying it into buf when buf != NULL and buf_len suffices), or -1 on
 * design failure.  Call once with buf = NULL to size the buffer. */
long r8bt_design_blob(double src_rate, double dst_rate, double trans_band,
                      double atten, int phase, void *buf, long buf_len);

/* Deterministic double-double cepstral min-phase transform applied to a
 * caller-supplied kernel (testing/verification entry: the cross-designer
 * bit-parity tests feed both designers the SAME kernel through this).
 * out must hold n doubles.  Returns 0, or -1 on invalid parameters.
 * See native/r8bt_dd.h. */
int r8bt_minphase_dd(const double *kernel, long n, int len_mult,
                     double *out);

#ifdef __cplusplus
}
#endif

#endif /* R8BT_H */
