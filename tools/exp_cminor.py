"""Chip experiment: fused-composite matmul layout A/B (flagship MXU
utilization).

The profiled flagship fused einsums run at ~12 Tflop/s logical (~37% of
the 6-pass-bf16 MXU roof) while the poly chain's plain Toeplitz convs
hit ~32 (=~98%).  Hypothesis: the supercycle stride p_in = 588 is
neither lane- (128) nor sublane- (8) aligned, so the segmented reshape
views feed the MXU through a relayout.  Variants:

  A. production FusedUpExec (kx=4, time-minor, p_in=588)
  B. FusedUpExec kx=8 (time-minor, p_in=1176 — sublane-aligned rows)
  C. channel-minor: x -> [T, C], chunks = bitcast [(n+nseg), p_in, C]
     (rows sublane-aligned at kx=8, lanes = channels, fully aligned),
     segments einsum 'bdc,dk->bkc', transpose back.

Timing: the in-jit chained fori_loop (bench.py method).  Usage:
  python tools/exp_cminor.py [variants: A,B,C]
"""

from __future__ import annotations

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

from r8brain_tpu.models.plan import make_plan
from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.ops.fused import FusedUpExec


def timed(fn, x0, iters=8):
    @jax.jit
    def run(x0, n):
        def body(i, c):
            y = fn(x0 + c * 1e-30)
            return jnp.sum(y[:, 1024:1032])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(x0, 1))
    t1 = time.perf_counter()
    float(run(x0, 1))
    t_one = time.perf_counter() - t1
    t0 = time.perf_counter()
    acc = float(run(x0, iters + 1))
    assert np.isfinite(acc)
    return (time.perf_counter() - t0 - t_one) / iters


def c_minor_apply(ex: FusedUpExec):
    """Variant C: channel-minor segmented composite matmul."""
    p_in, p_out, D = ex.p_in, ex.p_out, ex.D
    skT = jnp.asarray(ex.skT)  # [D, p_out]
    n_seg = -(-D // p_in)

    def apply(x):
        C, N = x.shape
        M = ex.out_len(N)
        n_cyc = -(-M // p_out)
        need = (n_cyc - 1) * p_in + ex.a0 + ex.D
        pad_r = max(0, need - N)
        xp = jnp.pad(x, ((0, 0), (ex.pad_l, pad_r)))
        xp = xp[:, ex.a0 + ex.pad_l :]
        total = (n_cyc + n_seg) * p_in
        if xp.shape[1] < total:
            xp = jnp.pad(xp, ((0, 0), (0, total - xp.shape[1])))
        else:
            xp = xp[:, :total]
        xt = xp.T  # [T, C] channel-minor
        chunks = xt.reshape(n_cyc + n_seg, p_in, C)
        out = None
        for e in range(n_seg):
            w = min(p_in, D - e * p_in)
            seg = chunks[e : n_cyc + e, :w]
            Te = jax.lax.slice(skT, (e * p_in, 0), (e * p_in + w, p_out))
            o = jnp.einsum("bdc,dk->bkc", seg, Te,
                           precision=jax.lax.Precision.HIGHEST)
            out = o if out is None else out + o
        y = out.reshape(n_cyc * p_out, C).T
        return y[:, :M]

    return apply


def main():
    variants = (sys.argv[1].split(",") if len(sys.argv) > 1
                else ["A", "B", "C"])
    channels = int(os.environ.get("EXP_CHANNELS", "1024"))
    seconds = float(os.environ.get("EXP_SECONDS", "1.0"))
    plan = make_plan(44100, 96000, 2.0, 180.15, 0)
    n_in = int(44100 * seconds)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.standard_normal((channels, n_in)) * 0.5, jnp.float32))
    base = None
    for v in variants:
        if v == "A":
            ex = FusedUpExec(plan, jnp.float32, "fast")
            fn = ex.apply
        elif v == "B":
            ex = FusedUpExec(plan, jnp.float32, "fast", kx=8)
            fn = ex.apply
        elif v == "C":
            ex = FusedUpExec(plan, jnp.float32, "fast", kx=8)
            fn = c_minor_apply(ex)
        else:
            continue
        dt = timed(fn, x0)
        mrops = 1e-6 * channels * n_in / dt
        print(f"variant {v}: kx={ex.kx} p_in={ex.p_in} D={ex.D} "
              f"dt={dt*1e3:.2f} ms  {mrops:.0f} Mrops(exec-only)",
              flush=True)
        y = np.asarray(fn(x0)[:, 1000:200000:997], np.float64)
        if base is None:
            base = y
        else:
            d = 20 * np.log10(np.sqrt(np.mean((y - base) ** 2))
                              / np.sqrt(np.mean(base**2)) + 1e-300)
            print(f"  vs A content: {d:.1f} dB", flush=True)


if __name__ == "__main__":
    main()
