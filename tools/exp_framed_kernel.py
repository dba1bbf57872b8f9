"""Round-5 #1 kernel autopsy: WHERE does the framed Pallas kernel lose
the scout's 1.28x GEMM headroom?

tools/exp_pallas_gemm.py measured a plain aligned Mosaic GEMM at 19.9
Tflop/s vs 15.6 for XLA's chain-shaped batch einsum on the conv shape,
yet ops/pallas_framed.py measures SLOWER than XLA in-chain (round-4
cpb=1: -18%; round-5 channel-folded cpb=3: -35%).  The kernel differs
from the scout in (a) the M tile size, (b) the two-view window load +
in-kernel concat, (c) the sublane-SHIFTED segment slices (Mosaic
relayouts), (d) the segmented K.  This experiment measures each delta
standalone on the exact conv shape so the next kernel iteration is
aimed at the real cost:

  gemm_mt512 / gemm_mt176   plain aligned GEMM at both tile sizes
  gemm_seg512               aligned GEMM, K segmented into hop chunks
  framed_cpb1 / framed_cpb3 the real ops/pallas_framed.py kernel
  xla_chain                 the chain-shaped XLA batch einsum baseline

Usage: python tools/exp_framed_kernel.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial
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

    # ---- the real in-chain kernel (env-configured) ----
    def make_framed(env):
        def f(xp, T):
            from r8brain_tpu.ops.pallas_framed import framed_matmul_pallas
            old = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                out = framed_matmul_pallas(xp, T, nb, hop)
            finally:
                for k, v in old.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            assert out is not None
            return out
        return jax.jit(f), xp

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
        ("framed_cpb1", *make_framed({"R8BT_FRAMED_CPB": "1"})),
        ("framed_cpb3", *make_framed({"R8BT_FRAMED_CPB": "3"})),
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
