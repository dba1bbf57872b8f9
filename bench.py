"""Headline benchmark: batched 44.1 kHz -> 96 kHz, 24-bit preset.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrops", "vs_baseline": N/38}

Metric follows the reference's convention (bench/r8bfreesrc.cpp:140-141):
Mrops = 1e-6 * input-samples * channels / second of wall time, steady-state
(compile excluded).  Baseline = 38 Mrops: CDSPResampler24 44100->96000 on one
Ryzen 3700X core with the default Ooura FFT (README.md:111-116).

Env knobs: R8B_BENCH_CHANNELS (default 2048), R8B_BENCH_SECONDS (1.0),
R8B_BENCH_ITERS (5), R8B_BENCH_DTYPE (float32).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    channels = int(os.environ.get("R8B_BENCH_CHANNELS", "2048"))
    seconds = float(os.environ.get("R8B_BENCH_SECONDS", "1.0"))
    iters = int(os.environ.get("R8B_BENCH_ITERS", "5"))
    dtype = os.environ.get("R8B_BENCH_DTYPE", "float32")
    precision = os.environ.get("R8B_BENCH_PRECISION", "fast")

    import jax
    import jax.numpy as jnp

    from r8brain_tpu.models.resampler import Resampler24

    n_in = int(44100 * seconds)
    from r8brain_tpu.models.resampler import Resampler

    rs = Resampler(44100, 96000, 2.0, 180.15, 0, dtype=dtype,
                   precision=precision)
    rng = np.random.default_rng(0)
    # two distinct input buffers, alternated per iteration, so a caching
    # dispatch layer cannot elide repeated identical executions
    xs = [jax.device_put(jnp.asarray(
        rng.standard_normal((channels, n_in)) * 0.5, dtype=dtype))
        for _ in range(2)]

    fn = jax.jit(rs._chain)
    for x in xs:
        fn(x).block_until_ready()  # compile + warmup

    t0 = time.perf_counter()
    for i in range(iters):
        y = fn(xs[i % 2])
        y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

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
