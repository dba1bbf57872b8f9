"""Headline benchmark: batched 44.1 kHz -> 96 kHz, 24-bit preset.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrops", "vs_baseline": N/38}

Metric follows the reference's convention (bench/r8bfreesrc.cpp:140-141):
Mrops = 1e-6 * input-samples * channels / second of wall time, steady-state
(compile excluded).  Baseline = 38 Mrops: CDSPResampler24 44100->96000 on one
Ryzen 3700X core with the default Ooura FFT (README.md:111-116).

Env knobs: R8B_BENCH_CHANNELS (default 1024), R8B_BENCH_SECONDS (1.0),
R8B_BENCH_ITERS (10), R8B_BENCH_DTYPE (float32), R8B_BENCH_PRECISION
(fast).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    channels = int(os.environ.get("R8B_BENCH_CHANNELS", "1024"))
    seconds = float(os.environ.get("R8B_BENCH_SECONDS", "1.0"))
    iters = int(os.environ.get("R8B_BENCH_ITERS", "10"))
    dtype = os.environ.get("R8B_BENCH_DTYPE", "float32")
    precision = os.environ.get("R8B_BENCH_PRECISION", "fast")

    import jax

    from r8brain_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from r8brain_tpu.models.resampler import Resampler24

    n_in = int(44100 * seconds)
    from r8brain_tpu.models.resampler import Resampler

    rs = Resampler(44100, 96000, 2.0, 180.15, 0, dtype=dtype,
                   precision=precision)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.standard_normal((channels, n_in)) * 0.5, dtype=dtype))

    # Timing over the remote-TPU tunnel: per-iteration host syncs measure
    # round-trip latency, and plain block_until_ready can acknowledge before
    # real completion.  Instead the iteration loop runs ON DEVICE inside one
    # jitted fori_loop, each iteration data-dependent on the previous
    # checksum (so nothing can be elided or overlapped), with a single
    # scalar fetched at the end.
    chain = rs._chain

    @jax.jit
    def run(x0, n):
        def body(i, c):
            # each iteration's input differs by the previous checksum, so
            # nothing can be cached, elided, or overlapped
            y = chain(x0 + c * 1e-30)
            return jnp.sum(y[:, 1024:1032])

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(x0, 1))  # compile + warmup
    t1 = time.perf_counter()
    float(run(x0, 1))
    t_one = time.perf_counter() - t1  # dispatch + 1 iter

    t0 = time.perf_counter()
    acc = float(run(x0, iters + 1))
    t_many = time.perf_counter() - t0  # dispatch + (iters+1) iters
    dt = (t_many - t_one) / iters  # pure per-iteration device time
    assert np.isfinite(acc)

    prof_dir = os.environ.get("R8B_BENCH_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            float(run(x0, 2))

    mrops = 1e-6 * channels * n_in / dt
    print(json.dumps({
        "metric": "resample_44k_to_96k_24bit_throughput"
        if precision == "fast" else "resample_44k_to_96k_24bit_hp_throughput",
        "value": round(mrops, 1),
        "unit": "Mrops",
        "vs_baseline": round(mrops / 38.0, 2),
    }))


if __name__ == "__main__":
    main()
