"""PCM <-> DSD64 conversion demo (bench/sacd.cpp:20-270 equivalent).

Forward: 44.1 kHz PCM -> 2.8224 MHz (DSD64 rate) via the resampler's
extreme-ratio path, then 1-bit quantization with second-order noise-shaping
dither (the reference uses a 2-biquad 1-bit dither, CDither1Bit,
bench/sacd.cpp:20-106; here: a classic second-order error-feedback
delta-sigma modulator with TPDF dither, expressed TPU-natively as a
lax.scan over time, parallel across channels).
Back: DSD64 bitstream -> 176.4 kHz PCM through the same resampler chain
(bench/sacd.cpp:218-264).

Run:  python examples/sacd.py [--seconds 0.5] [--cpu]
Prints the in-band SNR of the round trip.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DSD64 = 2822400.0


def one_bit_noise_shape(x, seed: int = 0):
    """Second-order error-feedback 1-bit modulator with TPDF dither.

    y[n] = sign(x[n] + 2 e[n-1] - e[n-2] + d[n]),  e = y - (input to quant)
    Runs as lax.scan over time, vectorized over channels.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x, dtype=jnp.float32)
    C, N = x.shape
    key = jax.random.PRNGKey(seed)
    # TPDF dither at 1 LSB (here full scale is +-1)
    d = (jax.random.uniform(key, (N, C)) +
         jax.random.uniform(jax.random.fold_in(key, 1), (N, C)) - 1.0) * 0.5

    def step(carry, inp):
        e1, e2 = carry
        xn, dn = inp
        v = xn + 2.0 * e1 - e2
        y = jnp.where(v + dn >= 0.0, 1.0, -1.0)
        e = v - y
        return (e, e1), y

    (_, _), ys = jax.lax.scan(
        step, (jnp.zeros(C), jnp.zeros(C)), (x.T, d))
    return ys.T  # [C, N] of +-1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=0.25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from r8brain_tpu.models.resampler import Resampler

    src = 44100.0
    n = int(src * args.seconds)
    t = np.arange(n) / src
    x = (0.45 * np.sin(2 * np.pi * 1000.0 * t)
         + 0.1 * np.sin(2 * np.pi * 7333.0 * t)).astype(np.float32)[None]

    print(f"PCM {src:g} -> DSD64 {DSD64:g} ...")
    up = Resampler(src, DSD64, 2.0, 140.0, 0, dtype="float32")
    hi = np.asarray(up.oneshot(x))
    print(f"  {x.shape[1]} -> {hi.shape[1]} samples; 1-bit noise shaping ...")
    dsd = np.asarray(one_bit_noise_shape(np.clip(hi, -0.99, 0.99)))

    back_rate = 176400.0
    print(f"DSD64 -> PCM {back_rate:g} ...")
    dn = Resampler(DSD64, back_rate, 2.0, 140.0, 0, dtype="float32")
    y = np.asarray(dn.oneshot(dsd.astype(np.float32)))[0]

    # in-band SNR vs an ideally-resampled reference
    ref = np.asarray(Resampler(src, back_rate, 2.0, 140.0, 0,
                               dtype="float32").oneshot(x))[0]
    m = min(len(y), len(ref))
    sl = slice(m // 8, m - m // 8)
    d = y[sl] - ref[sl]
    # restrict to the audio band (0..20 kHz)
    D = np.fft.rfft(d * np.hanning(len(d)))
    S = np.fft.rfft(ref[sl] * np.hanning(len(d)))
    f = np.fft.rfftfreq(len(d), 1 / back_rate)
    band = f <= 20000.0
    snr = 10 * np.log10(np.sum(np.abs(S[band]) ** 2)
                        / (np.sum(np.abs(D[band]) ** 2) + 1e-30))
    print(f"round-trip in-band SNR: {snr:.1f} dB "
          f"(2nd-order 1-bit modulator at 64x oversampling)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
