"""Streaming (serving) throughput on chip: steady-state push-mode blocks.

The reference quotes real-time 44.1k->96k streams at 100% CPU: 860/core
(Ooura) / 1270/core (IPP) (README.md:114-116).  The TPU equivalent is the
device-resident streaming path: the per-block carry function
(_PeriodStream._steady: [C, H] history + [C, L] block -> outputs + new
history) scanned ON DEVICE so the tunnel round-trip cannot pollute the
timing (same rationale as bench.py).

Prints ONE JSON line with Mrops and the real-time-streams equivalent.

Env knobs: R8B_SBENCH_CHANNELS (1024), R8B_SBENCH_BLOCK (8192),
R8B_SBENCH_BLOCKS (24), R8B_SBENCH_SRC/DST/ATTEN/PRECISION.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from r8brain_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.models.stream import StreamResampler


def main():
    C = int(os.environ.get("R8B_SBENCH_CHANNELS", "1024"))
    block = int(os.environ.get("R8B_SBENCH_BLOCK", "8192"))
    nblk = int(os.environ.get("R8B_SBENCH_BLOCKS", "24"))
    src = float(os.environ.get("R8B_SBENCH_SRC", "44100"))
    dst = float(os.environ.get("R8B_SBENCH_DST", "96000"))
    atten = float(os.environ.get("R8B_SBENCH_ATTEN", "180.15"))
    precision = os.environ.get("R8B_SBENCH_PRECISION", "fast")

    rs = Resampler(src, dst, 2.0, atten, 0, dtype="float32",
                   precision=precision)
    st = StreamResampler(rs, block_len=block)
    if st._mode == "poly":
        # polynomial (irrational-ratio) serving path: device-resident
        # blocks through process_block_device (prefix jit + tail with
        # per-block device position args + device re-blocked suffix) —
        # the any-ratio streaming contract, CDSPResampler.h:559-575.
        # R8B_SBENCH_KBATCH > 1 measures the k-block batched path
        # (process_blocks_device: scanned prefix + ONE tail program per k
        # blocks), which amortizes the per-block tunnel dispatch latency
        # that dominates the per-block wall number (NEXT.md round-6 #2).
        kb = int(os.environ.get("R8B_SBENCH_KBATCH", "8"))
        L = st.block
        rng = np.random.default_rng(0)
        xb = jax.device_put(jnp.asarray(
            rng.standard_normal((C, L * max(1, kb))) * 0.5, jnp.float32))

        def run_blocks(n):
            y = None
            for _ in range(n):
                y = (st.process_blocks_device(xb) if kb > 1
                     else st.process_block_device(xb))
            if y is not None:
                jax.block_until_ready(y)

        # warm up PAST any banded-tail recompiles: the tail's jit key
        # includes the per-block W bucket, which can change with
        # position drift over the first few blocks (round-5 review)
        run_blocks(6)
        t0 = time.perf_counter()
        run_blocks(4)
        t_few = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_blocks(4 + nblk)
        t_many = time.perf_counter() - t0
        dt = (t_many - t_few) / nblk  # steady seconds per push call
        n_per_call = L * max(1, kb)
        mrops = 1e-6 * C * n_per_call / dt
        streams = C * (n_per_call / src) / dt
        print(json.dumps({
            "metric": f"stream_{int(src)}_to_{int(dst)}"
                      "_steady_throughput",
            "value": round(mrops, 1),
            "unit": "Mrops",
            # 38 Mrops/core: the reference DLL's measured single-core
            # flagship rate (BASELINE.md / README.md:114-116)
            "vs_baseline": round(mrops / 38.0, 2),
            "block_len": L,
            "k_batch": max(1, kb),
            "mode": "poly_device_resident",
            "realtime": bool(dt < n_per_call / src),
            "realtime_streams_per_chip": int(streams),
        }))
        return
    core = st._core
    assert core is not None and st._mode == "period", "period plans only"
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

    float(run(h0, x0, 1))
    t1 = time.perf_counter()
    float(run(h0, x0, 1))
    t_one = time.perf_counter() - t1
    t0 = time.perf_counter()
    acc = float(run(h0, x0, nblk + 1))
    t_many = time.perf_counter() - t0
    assert np.isfinite(acc)
    dt = (t_many - t_one) / nblk  # steady-state seconds per block
    mrops = 1e-6 * C * L / dt
    # one chip sustains this many independent real-time input streams
    streams = C * (L / src) / dt
    print(json.dumps({
        "metric": "stream_44k_to_96k_steady_throughput",
        "value": round(mrops, 1),
        "unit": "Mrops",
        "vs_baseline": round(mrops / 38.0, 2),
        "block_len": L,
        "realtime_streams_per_chip": int(streams),
    }))


if __name__ == "__main__":
    main()
