"""Command-line WAV sample-rate converter (bench/r8bfreesrc.cpp equivalent).

Usage:
    python -m r8brain_tpu.cli in.wav out.wav <dst_rate>
        [--tb 2.0] [--atten 180.15] [--phase lin|min]
        [--bits 24] [--precision fast|high|oracle|native]
        [--platform auto|cpu]
        [--bench]

Channels are converted as one batched device call (the reference loops one
CDSPResampler object per channel, example.cpp:29-39).  --bench prints timing
and Mrops like the reference tool (bench/r8bfreesrc.cpp:118-141).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="r8brain_tpu.cli",
        description="TPU-native professional sample-rate converter")
    ap.add_argument("infile")
    ap.add_argument("outfile")
    ap.add_argument("dst_rate", type=float)
    ap.add_argument("--tb", type=float, default=2.0,
                    help="transition band %% (0.5-45)")
    ap.add_argument("--atten", type=float, default=180.15,
                    help="stop-band attenuation dB (49-218)")
    ap.add_argument("--phase", choices=("lin", "min"), default="lin")
    ap.add_argument("--bits", type=int, default=None,
                    choices=(16, 24, 32, 64),
                    help="output sample depth (PCM: 16/24/32, default 24; "
                         "with --float: 32/64, default 32)")
    ap.add_argument("--float", action="store_true",
                    help="write IEEE float output (32-bit by default)")
    ap.add_argument("--precision",
                    choices=("fast", "high", "oracle", "native"),
                    default="high",
                    help="fast=f32, high=f32+df32 convolver (-141 dB class), "
                         "oracle=CPU float64 reference executor, "
                         "native=C++ engine+designer (f64, no JAX)")
    ap.add_argument("--platform", choices=("auto", "cpu"), default="auto",
                    help="cpu forces the JAX CPU backend")
    ap.add_argument("--bench", action="store_true",
                    help="print timing/Mrops for the conversion")
    ap.add_argument("--stream", action="store_true",
                    help="convert via the push-mode streaming engine in "
                         "fixed device blocks with incremental WAV "
                         "read/write — O(block) host memory regardless "
                         "of file length")
    ap.add_argument("--max-chunk", type=int, default=None, metavar="N",
                    help="bound DEVICE memory on the oneshot path: inputs "
                         "longer than N samples run through the streaming "
                         "engine in N-sample blocks (whole file stays "
                         "host-side; see --stream for bounded host memory "
                         "too)")
    args = ap.parse_args(argv)
    if args.bits is None:
        args.bits = 32 if getattr(args, "float") else 24
    elif getattr(args, "float") and args.bits not in (32, 64):
        ap.error(f"--float writes IEEE-float WAVs (32 or 64 bits); "
                 f"--bits {args.bits} is PCM-only")
    elif not getattr(args, "float") and args.bits == 64:
        ap.error("--bits 64 requires --float (no 64-bit PCM)")
    if args.stream and args.precision in ("oracle", "native"):
        ap.error("--stream applies to the device paths only "
                 "(use --precision fast|high)")

    from .io.wavio import read_wav, write_wav

    dst_rate = args.dst_rate
    phase = 0 if args.phase == "lin" else 1

    if args.stream:
        return _stream_convert(args, dst_rate, phase)

    wav = read_wav(args.infile)
    src_rate = wav.rate
    x = wav.data
    out_len = int(np.floor(wav.frames * dst_rate / src_rate))

    t0 = time.perf_counter()
    if args.precision == "oracle":
        from .models.oracle import OracleResampler

        y = np.stack([
            OracleResampler(src_rate, dst_rate, 4096, args.tb, args.atten,
                            phase).oneshot(c, out_len) for c in x])
    elif args.precision == "native":
        # C++ engine + C++ designer (one handle per channel, the
        # reference's example.cpp loop) — no JAX in the path; design
        # runs ONCE and every channel engine shares the plan blob
        from .native import NativeResampler, native_design_blob

        blob = native_design_blob(src_rate, dst_rate, args.tb, args.atten,
                                  phase)
        y = np.stack([
            NativeResampler(src_rate, dst_rate, blob=blob)
            .oneshot(c, out_len) for c in x])
    else:
        if args.platform == "cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        from .models.resampler import Resampler

        rs = Resampler(src_rate, dst_rate, args.tb, args.atten, phase,
                       dtype="float32", precision=args.precision)
        y = np.asarray(rs.oneshot(x.astype(np.float32), out_len,
                                  max_chunk=args.max_chunk),
                       dtype=np.float64)
    dt = time.perf_counter() - t0

    write_wav(args.outfile, int(dst_rate), y, args.bits, args.float)
    if args.bench:
        mrops = 1e-6 * wav.frames * wav.channels / dt
        print(f"{wav.frames} frames x {wav.channels} ch "
              f"{src_rate:g} -> {dst_rate:g} in {dt:.3f}s = {mrops:.1f} Mrops",
              file=sys.stderr)
    return 0


def _stream_convert(args, dst_rate, phase, block: int = 65536):
    """Incremental convert: WavReader -> StreamResampler -> WavWriter,
    O(block) host memory (the reference's example.cpp push loop, with the
    file I/O streamed too)."""
    import numpy as np

    from .io.wavio import WavReader, WavWriter

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from .models.resampler import Resampler
    from .models.stream import StreamResampler

    t0 = time.perf_counter()
    frames = 0
    with WavReader(args.infile) as rd:
        src_rate = rd.rate
        out_len = int(np.floor(rd.frames * dst_rate / src_rate))
        rs = Resampler(src_rate, dst_rate, args.tb, args.atten, phase,
                       dtype="float32", precision=args.precision)
        st = StreamResampler(rs, block_len=block)
        written = 0
        with WavWriter(args.outfile, int(dst_rate), rd.channels,
                       args.bits, getattr(args, "float")) as wr:
            while True:
                blk = rd.read(block)
                if blk.shape[1] == 0:
                    break
                frames += blk.shape[1]
                y = st.process(blk.astype(np.float32))
                y = y[:, : max(0, out_len - written)]
                wr.write(y)
                written += y.shape[1]
            tail = st.flush(out_len)[:, : max(0, out_len - written)]
            wr.write(tail)
            written += tail.shape[1]
        channels = rd.channels
    dt = time.perf_counter() - t0
    if args.bench:
        mrops = 1e-6 * frames * channels / dt
        print(f"{frames} frames x {channels} ch "
              f"{src_rate:g} -> {dst_rate:g} in {dt:.3f}s = {mrops:.1f} "
              f"Mrops (streamed)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
