"""Headline benchmark: batched sample-rate conversion throughput on chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrops", "vs_baseline": N/38,
   "exec_value": N, "exec_vs_baseline": N/38}

value        — wall-convention throughput ((iters+1)-run minus 1-run anchor).
exec_value   — slope of two long runs (iters+1 vs 3*iters+1): dispatch and
               tunnel latency cancel, so THIS is the number to compare
               across sessions/rounds (wall swings +-25% on the shared
               tunnel; see NEXT.md env facts).

Metric follows the reference's convention (bench/r8bfreesrc.cpp:140-141):
Mrops = 1e-6 * input-samples * channels / second of wall time, steady-state
(compile excluded).  Baseline = 38 Mrops: CDSPResampler24 44100->96000 on one
Ryzen 3700X core with the default Ooura FFT (README.md:111-116).

Env knobs (defaults in parens):
  R8B_BENCH_CHANNELS (1024)   R8B_BENCH_SECONDS (1.0)  R8B_BENCH_ITERS (10)
  R8B_BENCH_REPEATS (3)       — best-of-N repeats of the timed block
  R8B_BENCH_DTYPE (float32)   R8B_BENCH_PRECISION (fast)
  R8B_BENCH_SRC (44100)       R8B_BENCH_DST (96000)
  R8B_BENCH_ATTEN (180.15)    R8B_BENCH_TB (2.0)
  R8B_BENCH_ENGINE (auto)     — conv_engine: toeplitz/fft/pallas/pallas_fft/
                                pallas_fft4/...
  R8B_BENCH_FUSED (auto)      — auto/1/0
  R8B_BENCH_METRIC (derived)  — override the metric name
  R8B_BENCH_PROFILE           — directory for a jax.profiler trace

Timing over the remote-TPU tunnel: per-iteration host syncs measure
round-trip latency and block_until_ready can acknowledge early, so the
iteration loop runs ON DEVICE inside one jitted fori_loop, each iteration
data-dependent on the previous checksum, with one scalar fetched at the
end; a 1-iteration call is subtracted to remove dispatch.
"""

import json
import os
import sys
import time

import numpy as np


def _probe_backend(jax, timeout_s: float | None = None):
    """Fail fast (non-zero exit, stderr diagnostic) when the remote-TPU
    tunnel is down instead of hanging the caller: backend discovery runs
    in a daemon thread with a bounded wait (R8B_BENCH_PROBE_S, 300 s
    default).  On success the main thread reuses the initialized backend.
    """
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("R8B_BENCH_PROBE_S", "300"))
    result: list = []

    def probe():
        try:
            result.append(jax.devices())
        except Exception as e:  # noqa: BLE001 — report, don't hang
            result.append(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if not result:
        print(f"bench.py: jax.devices() did not respond within "
              f"{timeout_s:.0f}s — TPU tunnel down?", file=sys.stderr)
        os._exit(1)  # the hung discovery thread can't be cancelled
    if isinstance(result[0], Exception):
        print(f"bench.py: backend init failed: {result[0]!r}",
              file=sys.stderr)
        sys.exit(1)
    print(f"bench.py: devices {result[0]}", file=sys.stderr)


def _timed(run, x0, n) -> float:
    t0 = time.perf_counter()
    float(run(x0, n))
    return time.perf_counter() - t0


def main():
    channels = int(os.environ.get("R8B_BENCH_CHANNELS", "1024"))
    seconds = float(os.environ.get("R8B_BENCH_SECONDS", "1.0"))
    iters = int(os.environ.get("R8B_BENCH_ITERS", "10"))
    dtype = os.environ.get("R8B_BENCH_DTYPE", "float32")
    precision = os.environ.get("R8B_BENCH_PRECISION", "fast")
    src = float(os.environ.get("R8B_BENCH_SRC", "44100"))
    dst = float(os.environ.get("R8B_BENCH_DST", "96000"))
    atten = float(os.environ.get("R8B_BENCH_ATTEN", "180.15"))
    tb = float(os.environ.get("R8B_BENCH_TB", "2.0"))
    engine = os.environ.get("R8B_BENCH_ENGINE", "auto")
    frac_engine = os.environ.get("R8B_BENCH_FRAC_ENGINE",
                                 "ozaki" if engine == "ozaki" else "auto")
    fused_env = os.environ.get("R8B_BENCH_FUSED", "auto")
    fused = {"auto": "auto", "1": True, "0": False}[fused_env]

    import jax

    from r8brain_tpu.utils.cache import (enable_compilation_cache,
                                         honor_jax_platforms_env)

    honor_jax_platforms_env()
    _probe_backend(jax)
    enable_compilation_cache()
    import jax.numpy as jnp  # noqa: F401

    from r8brain_tpu.models.resampler import Resampler

    n_in = int(src * seconds)
    rs = Resampler(src, dst, tb, atten, 0, dtype=dtype,
                   precision=precision, fused=fused, conv_engine=engine,
                   frac_engine=frac_engine)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.standard_normal((channels, n_in)) * 0.5, dtype=dtype))

    chain = rs._chain

    @jax.jit
    def run(x0, n):
        def body(i, c):
            # each iteration's input differs by the previous checksum, so
            # nothing can be cached, elided, or overlapped
            y = chain(x0 + c * 1e-30)
            return jnp.sum(y[:, 1024:1032])

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    repeats = max(1, int(os.environ.get("R8B_BENCH_REPEATS", "3")))
    float(run(x0, 1))  # compile + warmup
    # best-of-repeats: the remote chip is shared and the tunnel adds
    # variable latency; the minimum is the least-interfered steady state
    # (same convention as the reference bench's manual best-of-N runs)
    acc = np.nan
    t_one, t_many = np.inf, np.inf
    for attempt in range(3):  # timing jitter (e.g. sub-ms CPU smoke runs
        # where the 1-iter anchor lands slower than the long run): take
        # more minima rather than recording a negative/garbage rate
        t_one = min([t_one] + [_timed(run, x0, 1) for _ in range(repeats)])
        for _ in range(repeats):
            t0 = time.perf_counter()
            a = float(run(x0, iters + 1))
            t_many = min(t_many, time.perf_counter() - t0)
            acc = a
        if t_many > t_one:
            break
    dt = (t_many - t_one) / iters  # pure per-iteration device time
    assert np.isfinite(acc)
    assert dt > 0, (t_many, t_one)  # pathological tunnel jitter: fail loudly

    # Exec-only estimate for ROUND-OVER-ROUND comparability: the slope
    # between two LONG runs (iters+1 and 3*iters+1 iterations).  Per-call
    # dispatch/tunnel overhead cancels between two long endpoints and is a
    # far smaller fraction of each sample than in the 1-iteration anchor,
    # so session-to-session tunnel swings (observed +-25% on the wall
    # number: 5753/4368/4211 Mrops for identical code) mostly divide out.
    t_more = np.inf
    for attempt in range(3):  # same jitter guard as the wall measurement
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(x0, 3 * iters + 1))
            t_more = min(t_more, time.perf_counter() - t0)
        if t_more > t_many:
            break
    dt_exec = (t_more - t_many) / (2 * iters)
    assert dt_exec > 0, (t_more, t_many)

    prof_dir = os.environ.get("R8B_BENCH_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            float(run(x0, 2))

    mrops = 1e-6 * channels * n_in / dt
    metric = os.environ.get("R8B_BENCH_METRIC")
    if not metric:
        def rate_tag(r: float) -> str:
            if abs(r - round(r)) < 1e-9:
                return str(int(round(r)))
            return f"{r:g}".replace(".", "p").replace("+", "").replace(
                "-", "m")
        if (src, dst) == (44100.0, 96000.0):
            cfg = "44k_to_96k"  # driver-tracked headline name (round 1)
        else:
            cfg = f"{rate_tag(src)}_to_{rate_tag(dst)}"
        # the bit-depth tag follows the preset attenuations
        # (CDSPResampler.h:746,777,807,119); other attens are named as-is
        tag = {136.45: "16bit", 109.56: "16bitIR", 180.15: "24bit",
               206.91: "default"}.get(atten) or f"a{rate_tag(atten)}"
        metric = f"resample_{cfg}_{tag}_throughput"
        if precision != "fast":
            metric = f"resample_{cfg}_{tag}_hp_throughput"
    exec_mrops = 1e-6 * channels * n_in / dt_exec
    rec = {
        "metric": metric,
        "value": round(mrops, 1),
        "unit": "Mrops",
        "vs_baseline": round(mrops / 38.0, 2),
        # slope of two long runs — tunnel-insensitive; compare THIS number
        # across rounds/sessions (see the comment at dt_exec)
        "exec_value": round(exec_mrops, 1),
        "exec_vs_baseline": round(exec_mrops / 38.0, 2),
    }
    if (src, dst) != (44100.0, 96000.0):
        # the Mrops convention counts INPUT samples (r8bfreesrc.cpp:
        # 140-141) and the 38 Mrops baseline is a 44.1k->96k figure, so
        # for other ratios — especially heavy upsampling like PCM->DSD64,
        # where the input-sample count understates the work 64x — also
        # publish output samples/s and the conversion ratio, making the
        # row self-describing (VERDICT r3 weak #4)
        out_len = rs.out_len_for_in(n_in)
        rec["ratio"] = round(dst / src, 6)
        rec["exec_out_msamples_s"] = round(
            1e-6 * channels * out_len / dt_exec, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
