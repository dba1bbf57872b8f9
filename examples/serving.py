"""Serving-shape demo: continuous many-channel conversion over a device
mesh with per-block halo exchange — the BASELINE north-star workload
(thousands of channels, unbounded stream) in ~40 lines.

The reference scales this by running one CDSPResampler object per channel
on caller threads (README.md:52-55, example.cpp:29-39); here the whole
channel batch is ONE sharded program per block: channels ride the ``ch``
mesh axis (no collectives), time segments within each pushed block ride
``t`` with ppermute halo exchange, and the inter-block carry stays
device-resident.

Usage: python examples/serving.py [--cpu] [--channels 64] [--blocks 4]
(--cpu forces an 8-device virtual CPU mesh; on real hardware the same
code spans the actual devices.)
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=4)
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np
    from jax.sharding import Mesh

    from r8brain_tpu import Resampler
    from r8brain_tpu.parallel import ShardedStreamResampler

    devs = jax.devices()
    n = len(devs)
    if n >= 4 and n % 2 == 0:
        mesh = Mesh(np.array(devs).reshape(2, n // 2), ("ch", "t"))
    else:
        mesh = Mesh(np.array(devs), ("ch",))
    rs = Resampler(44100, 96000, 2.0, 180.15, 0, dtype="float32",
                   precision="high")
    ss = ShardedStreamResampler(rs, mesh, seg_len=4096)
    print(f"mesh {dict(mesh.shape)}; block {ss.block} in-samples "
          f"({ss.block/44100*1e3:.0f} ms), halo {ss.H}, lag {ss.lat_o} "
          f"out-samples")

    rng = np.random.default_rng(0)
    t = np.arange(args.blocks * ss.block) / 44100.0
    sig = np.sin(2 * np.pi * 440.0 * t)[None, :] * np.linspace(
        0.1, 0.9, args.channels)[:, None]
    total = 0
    for b in range(args.blocks):
        block = sig[:, b * ss.block : (b + 1) * ss.block]
        y = ss.process_block(block)  # device array, sharded (ch, t)
        total += int(y.shape[1])
        print(f"block {b}: pushed {ss.block}, emitted {y.shape[1]} "
              f"(sharding {y.sharding.spec})")
    expect = rs.default_out_len(args.blocks * ss.block)
    print(f"emitted {total} of {expect} (lag {expect - total} flushes "
          f"with the next block or ss.flush())")

    # Single-device any-ratio serving: when the host<->device link (not
    # the chip) bounds wall throughput, push k blocks per call —
    # StreamResampler.process_blocks_device runs ONE scanned-prefix jit
    # + ONE polynomial-tail program per k blocks (docs/API.md; 343 ->
    # 8964 Mrops at k=8 on a tunneled chip, BENCHMATRIX_r5.json).
    import jax.numpy as jnp

    from r8brain_tpu.models.stream import StreamResampler

    st = StreamResampler(Resampler(44100, 96001, 2.0, 180.15, 0,
                                   dtype="float32"), block_len=2048)
    k = 4
    xk = np.asarray(sig[:, : k * st.block], dtype=np.float32)
    y = st.process_blocks_device(jnp.asarray(xk))
    print(f"poly 44100->96001 batched k={k}: pushed {k}x{st.block}, "
          f"emitted {y.shape[1]} in one call")


if __name__ == "__main__":
    main()
