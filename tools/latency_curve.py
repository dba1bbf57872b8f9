"""Serving latency curve: device-resident streaming ms/block vs block size.

Throughput alone (tools/bench_stream.py) doesn't certify real-time
serving — a block must also FINISH before the next one arrives.  This
tool measures steady-state seconds/block for the device-resident
streaming step at several block sizes and reports, per size, the
per-block latency against the block's real-time duration (the reference
target being beaten: 860 real-time streams/core, README.md:114-116).

Prints ONE JSON line:
  {"metric": "stream_latency_curve", "channels": C, "points": [
     {"block_len": L, "ms_per_block": t, "block_ms": d,
      "realtime": t < d, "streams_per_chip": N}, ...]}

Env knobs: R8B_LBENCH_CHANNELS (1024), R8B_LBENCH_BLOCKS (csv of
requested block lengths, default "256,1024,4096,8192"),
R8B_LBENCH_SRC/DST/ATTEN/PRECISION, R8B_LBENCH_ITERS (16).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from r8brain_tpu.utils.cache import (enable_compilation_cache,
                                     honor_jax_platforms_env)

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must win over sitecustomize
enable_compilation_cache()
import jax
import jax.numpy as jnp

from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.models.stream import StreamResampler


def measure(core, C: int, iters: int):
    """Steady-state seconds/block via the in-jit chained fori_loop
    (bench.py timing discipline: tunnel round-trips never enter dt)."""
    L, H = core.L, core.H
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.standard_normal((C, L)) * 0.5, jnp.float32))
    h0 = jax.device_put(jnp.zeros((C, H), jnp.float32))
    steady = core._steady

    @jax.jit
    def run(h0, x0, n):
        def body(i, carry):
            h, c = carry
            y, h2 = steady(h, x0 + c * 1e-30)
            return (h2, jnp.sum(y[:, 64:72]))

        h, c = jax.lax.fori_loop(0, n, body, (h0, jnp.float32(0.0)))
        return c + jnp.sum(h[:, :2])

    float(run(h0, x0, 1))  # compile

    def robust_dt(n: int, tries: int = 3) -> float:
        """bench.py's discipline: take the MINIMUM anchor and the MINIMUM
        long run separately, then difference — a tunnel hiccup in one
        anchor cannot shrink dt (pairing min over per-attempt dt would
        prefer exactly the attempts whose 1-iter anchor got inflated,
        systematically UNDERSTATING ms/block in the committed artifact)."""
        t_ones, t_manys = [], []
        for _ in range(tries):
            t1 = time.perf_counter()
            float(run(h0, x0, 1))
            t_ones.append(time.perf_counter() - t1)
            t0 = time.perf_counter()
            acc = float(run(h0, x0, n + 1))
            t_manys.append(time.perf_counter() - t0)
            assert np.isfinite(acc)
        return (min(t_manys) - min(t_ones)) / n

    dt = robust_dt(iters)
    if not dt > 0:  # pathological jitter: amortize over a 4x longer run
        dt = robust_dt(iters * 4)
    assert dt > 0, "timing jitter: no positive dt"
    return dt, L


def measure_poly(st, C: int, iters: int):
    """Steady-state seconds/block for a POLY plan's device-resident
    streaming step.  Positions/filters are per-block host data, so the
    step cannot be fori_looped with fixed operands; instead the real
    process_block_device call sequence is timed with async dispatch (one
    sync at the end), min-anchor discipline as in measure()."""
    L = st.block
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((C, L)) * 0.5, jnp.float32))
    for _ in range(10):  # warm all (win_len, cap) and count-slice shapes
        st.process_block_device(x)

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        y = None
        for _ in range(n):
            y = st.process_block_device(x)
        y.block_until_ready()
        return time.perf_counter() - t0

    t_ones, t_manys = [], []
    for _ in range(3):
        t_ones.append(timed(1))
        t_manys.append(timed(iters + 1))
    dt = (min(t_manys) - min(t_ones)) / iters
    assert dt > 0, "timing jitter: no positive dt"
    return dt, L


def main():
    C = int(os.environ.get("R8B_LBENCH_CHANNELS", "1024"))
    blocks = [int(b) for b in os.environ.get(
        "R8B_LBENCH_BLOCKS", "256,1024,4096,8192").split(",")]
    iters = int(os.environ.get("R8B_LBENCH_ITERS", "16"))
    src = float(os.environ.get("R8B_LBENCH_SRC", "44100"))
    dst = float(os.environ.get("R8B_LBENCH_DST", "96000"))
    atten = float(os.environ.get("R8B_LBENCH_ATTEN", "180.15"))
    precision = os.environ.get("R8B_LBENCH_PRECISION", "fast")

    rs = Resampler(src, dst, 2.0, atten, 0, dtype="float32",
                   precision=precision)
    points = []
    seen = set()
    for blk in blocks:
        st = StreamResampler(rs, block_len=blk)
        if st._mode == "poly":
            if st.block in seen:
                continue
            seen.add(st.block)
            dt, L = measure_poly(st, C, iters)
        else:
            core = st._core
            assert core is not None, "empty plan"
            if core.L in seen:  # block geometry quantizes: skip duplicates
                continue
            seen.add(core.L)
            dt, L = measure(core, C, iters)
        block_ms = 1e3 * L / src
        ms = 1e3 * dt
        points.append({
            "requested": blk,
            "block_len": L,
            "ms_per_block": round(ms, 3),
            "block_ms": round(block_ms, 3),
            "realtime": bool(ms < block_ms),
            # C channels in this many ms of audio -> streams at 1x
            "streams_per_chip": int(C * block_ms / ms),
        })
        print(f"block {L:6d}: {ms:8.3f} ms/block vs {block_ms:8.3f} ms "
              f"audio -> {'REALTIME' if ms < block_ms else 'too slow'} "
              f"({points[-1]['streams_per_chip']} streams/chip)",
              file=sys.stderr)
    print(json.dumps({
        "metric": "stream_latency_curve",
        "channels": C,
        "src": src, "dst": dst, "precision": precision,
        "points": points,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
