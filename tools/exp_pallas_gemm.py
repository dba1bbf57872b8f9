"""Round-5 #1 scouting experiment: Mosaic-vs-XLA GEMM baseline on the
conv stage's exact shape.

RETRACTED (round 5): this scout's "xla_chain" baseline runs its batch
einsum on a MATERIALIZED frames tensor — a formulation the chain never
uses — and so understated XLA.  The chain's real segmented reshape-view
einsum measures 24.5 Tflop/s vs Mosaic's 19.3 GEMM ceiling on this
shape; see tools/exp_framed_kernel.py and NEXT.md "Round-5
framed-kernel autopsy".  Kept for the record.

The poly chain's toeplitz convolvers run at 61-73% of the 6-pass
f32-HIGHEST MXU roofline under XLA's einsum, and the round-3 Pallas
mini-Toeplitz kernel reached only ~60% of XLA's own efficiency.  This
isolates WHERE that loss lives: a plain dense Pallas GEMM (no toeplitz
logic, straight VMEM-tiled dot) on the same [M=C*nb, K, N] problem.  If
the plain kernel already trails XLA, the custom-conv-kernel avenue is
dead on this toolchain (Mosaic matmul baseline), not a kernel-craft
problem; if it matches, round 5 should invest in the fused conv kernel.

Usage: python tools/exp_pallas_gemm.py [--m 175104] [--k 708] [--n 512]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=175104)  # 1024 ch x 171 blk
    ap.add_argument("--k", type=int, default=704)     # ~L_f, 8-aligned
    ap.add_argument("--n", type=int, default=512)     # 2B columns
    ap.add_argument("--mt", type=int, default=512)    # M tile
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from r8brain_tpu.utils.cache import (enable_compilation_cache,
                                         honor_jax_platforms_env)

    honor_jax_platforms_env()
    enable_compilation_cache()

    M, K, N, MT = args.m, args.k, args.n, args.mt
    M = -(-M // MT) * MT
    rng = np.random.default_rng(0)
    A = jax.device_put(jnp.asarray(
        rng.standard_normal((M, K)), dtype=jnp.float32))
    B = jax.device_put(jnp.asarray(
        rng.standard_normal((K, N)), dtype=jnp.float32))

    def gemm_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

    @jax.jit
    def pallas_gemm(A, B):
        return pl.pallas_call(
            gemm_kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            grid=(M // MT,),
            in_specs=[pl.BlockSpec((MT, K), lambda i: (i, 0)),
                      pl.BlockSpec((K, N), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((MT, N), lambda i: (i, 0)),
        )(A, B)

    @jax.jit
    def xla_gemm(A, B):
        return jnp.einsum("mk,kn->mn", A, B,
                          precision=jax.lax.Precision.HIGHEST)

    # the chain's actual operand structure: [C, nb, K] batch einsum
    C_dim = 1024
    nb = M // C_dim
    A3 = A.reshape(C_dim, nb, K)

    @jax.jit
    def xla_gemm_chain(A3, B):
        return jnp.einsum("cbl,lk->cbk", A3, B,
                          precision=jax.lax.Precision.HIGHEST)

    # chained fori_loop timing (bench.py discipline: data-dependent
    # iterations, long-run slope)
    def chain(f):
        @jax.jit
        def run(A, B, n):
            def body(i, c):
                y = f(A + c * 1e-30, B)
                # FULL reduction: a sliced checksum lets XLA slice-
                # propagate into the dot and compute an 8x8 GEMM
                return jnp.sum(y)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    flops = 2.0 * M * K * N
    out = {}
    for name, f in (("xla", xla_gemm), ("xla_chain", None),
                    ("pallas", pallas_gemm)):
        if name == "xla_chain":
            f = lambda a, b: xla_gemm_chain(a.reshape(C_dim, nb, K), b)
        run = chain(f)
        float(run(A, B, 1))  # compile
        it = args.iters
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(A, B, it + 1))
            t_many = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(A, B, 3 * it + 1))
            t_more = time.perf_counter() - t0
            best = min(best, (t_more - t_many) / (2 * it))
        tf = flops / best / 1e12
        out[name] = round(tf, 2)
        print(f"{name:8s} {best*1e3:7.3f} ms  {tf:6.2f} Tflop/s logical "
              f"({6*tf:6.1f} physical bf16-pass Tops)", file=sys.stderr)
    out["ratio_pallas_over_xla"] = round(out["pallas"] / out["xla"], 3)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
