"""Round-5 #1 kernel autopsy: WHERE does the framed Pallas kernel lose
the scout's 1.28x GEMM headroom?

tools/exp_pallas_gemm.py measured a plain aligned Mosaic GEMM at 19.9
Tflop/s vs 15.6 for XLA's chain-shaped batch einsum on the conv shape,
yet the framed kernel (deleted ops/pallas_framed.py) measured SLOWER
than XLA in-chain (round-4 cpb=1: -18%; round-5 channel-folded cpb=3:
-35%).  This experiment measured each delta standalone on the exact
conv shape and settled it (chip, round 5): the chain's REAL segmented
reshape-view einsum runs 24.5 Tflop/s vs Mosaic's 19.3 GEMM ceiling
(insensitive to M tile and K segmentation) — the round-4 scout had
compared materialized-frames formulations the chain never uses, so the
kernel was deleted and its cases removed here (full table in NEXT.md
"Round-5 framed-kernel autopsy"):

  gemm_mt512 / gemm_mt176   plain aligned Mosaic GEMM at both M tiles
  gemm_seg512               aligned GEMM, K segmented into hop chunks
  xla_chain                 the chain's real segmented reshape-view
                            einsum (ops/stages._framed_matmul)

Usage: python tools/exp_framed_kernel.py [--iters 20]
"""

from __future__ import annotations

import argparse

import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=1024)
    ap.add_argument("--nb", type=int, default=171)
    ap.add_argument("--hop", type=int, default=256)
    ap.add_argument("--k", type=int, default=704)
    ap.add_argument("--n", type=int, default=512)
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

    C, nb, hop, L_f, N = args.c, args.nb, args.hop, args.k, args.n
    n_seg = -(-L_f // hop)
    rng = np.random.default_rng(0)
    xp = jax.device_put(jnp.asarray(
        rng.standard_normal((C, (nb + n_seg + 8) * hop)),
        dtype=jnp.float32))
    T = jax.device_put(jnp.asarray(
        rng.standard_normal((L_f, N)), dtype=jnp.float32))
    M = C * nb  # logical frame rows

    # ---- plain aligned GEMMs (scout baseline at two tile sizes) ----
    # NOTE: operands must be ARGUMENTS, not closure constants — closure
    # constants are inlined into the program and the remote compiler
    # rejects the ~500 MB request (HTTP 413)
    Mp_all = -(-M // (512 * 176 // np.gcd(512, 176))) * \
        (512 * 176 // np.gcd(512, 176))  # common multiple of both tiles
    A_big = jax.device_put(jnp.asarray(
        rng.standard_normal((Mp_all, L_f)), dtype=jnp.float32))

    def make_gemm(MT, seg_k=False):
        Mp = Mp_all

        if seg_k:
            def kern(a_ref, b_ref, o_ref):
                acc = None
                for e in range(n_seg):
                    w = min(hop, L_f - e * hop)
                    o = jnp.dot(a_ref[:, e * hop : e * hop + w],
                                b_ref[e * hop : e * hop + w, :],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                    acc = o if acc is None else acc + o
                o_ref[:] = acc
        else:
            def kern(a_ref, b_ref, o_ref):
                o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)

        @jax.jit
        def f(A, T):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
                grid=(Mp // MT,),
                in_specs=[pl.BlockSpec((MT, L_f), lambda i: (i, 0)),
                          pl.BlockSpec((L_f, N), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((MT, N), lambda i: (i, 0)),
            )(A, T)
        return f, A_big

    @jax.jit
    def xla_chain_f(xp, T):
        from r8brain_tpu.ops.stages import _framed_matmul
        return _framed_matmul(xp, T, nb, hop)

    def chain(f):
        @jax.jit
        def run(A, T, n):
            def body(i, c):
                # FULL reduction: a sliced checksum lets XLA slice-
                # propagate into the dot and skip the bulk of the work
                # (pallas custom calls can't be sliced into, so the
                # comparison would be unfair to the kernels)
                y = f(A + c * 1e-30, T)
                return jnp.sum(y)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    flops = 2.0 * M * L_f * N
    cases = [
        ("xla_chain", xla_chain_f, xp),
        ("gemm_mt512", *make_gemm(512)),
        ("gemm_mt176", *make_gemm(176)),
        ("gemm_seg512", *make_gemm(512, seg_k=True)),
    ]
    out = {}
    for name, f, A in cases:
        run = chain(f)
        float(run(A, T, 1))  # compile
        it = args.iters
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(A, T, it + 1))
            t_many = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(A, T, 3 * it + 1))
            t_more = time.perf_counter() - t0
            best = min(best, (t_more - t_many) / (2 * it))
        tf = flops / best / 1e12
        out[name] = round(tf, 2)
        print(f"{name:12s} {best*1e3:7.3f} ms  {tf:6.2f} Tflop/s logical",
              file=sys.stderr)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
