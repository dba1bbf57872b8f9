"""Interleaved A/B of poly-chain seam variants on the chip.

Builds one jitted fori_loop program per variant (env knobs read at build
time), then measures the exec-only slope (bench.py convention) in an
INTERLEAVED round-robin so tunnel/thermal drift hits all variants
equally.  Usage: python tools/ab_poly.py [--iters 8] [--rounds 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VARIANTS = [
    # (label, env overrides at Resampler build time); override with
    # --variants "label:K=V;K=V,label2:..."
    ("seam_only", {"R8BT_SEAM_MINOUT": "0", "R8BT_POLY_WIDE": "0"}),
    ("seam_minout", {"R8BT_SEAM_MINOUT": "1", "R8BT_POLY_WIDE": "0"}),
    ("seam_minout_wide", {"R8BT_SEAM_MINOUT": "1", "R8BT_POLY_WIDE": "1"}),
    ("seam_wide", {"R8BT_SEAM_MINOUT": "0", "R8BT_POLY_WIDE": "1"}),
]


def parse_variants(spec: str):
    out = []
    for part in spec.split(","):
        label, _, kvs = part.partition(":")
        env = {}
        for kv in filter(None, kvs.split(";")):
            k, _, v = kv.partition("=")
            env[k] = v
        out.append((label, env))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--src", type=float, default=44100.0)
    ap.add_argument("--dst", type=float, default=96001.0)
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--variants", default=None,
                    help='e.g. "b256:,b192:R8BT_TOEP_B=192"')
    args = ap.parse_args(argv)
    variants = (parse_variants(args.variants) if args.variants
                else VARIANTS)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from r8brain_tpu.utils.cache import (enable_compilation_cache,
                                         honor_jax_platforms_env)

    honor_jax_platforms_env()
    enable_compilation_cache()
    from r8brain_tpu.models.resampler import Resampler

    n_in = int(args.src)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.standard_normal((args.channels, n_in)) * 0.5,
        dtype=jnp.float32))

    runs = []
    base_env = {k: os.environ.get(k) for _l, e in variants for k in e}
    for label, env in variants:
        for k in base_env:  # reset so variants don't leak into each other
            if base_env[k] is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = base_env[k]
        for k, v in env.items():
            os.environ[k] = v
        rs = Resampler(args.src, args.dst, 2.0, 180.15, 0,
                       dtype="float32")
        chain = rs._chain

        def make(chain=chain):
            @jax.jit
            def run(x0, n):
                def body(i, c):
                    y = chain(x0 + c * 1e-30)
                    return jnp.sum(y[:, 1024:1032])
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return run

        run = make()
        float(run(x0, 1))  # compile
        runs.append((label, run))

    it = args.iters
    best = {label: np.inf for label, _ in runs}
    for rnd in range(args.rounds):
        for label, run in runs:
            t0 = time.perf_counter()
            float(run(x0, it + 1))
            t_many = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(x0, 3 * it + 1))
            t_more = time.perf_counter() - t0
            dt = (t_more - t_many) / (2 * it)
            best[label] = min(best[label], dt)
            print(f"round {rnd} {label:18s} dt_exec {dt*1e3:7.2f} ms "
                  f"({1e-6*args.channels*n_in/dt:7.1f} Mrops)",
                  file=sys.stderr)
    print({label: round(1e-6 * args.channels * n_in / dt, 1)
           for label, dt in best.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
