"""Differentiable DSP through the resampler (no reference analog).

Inverse problem: we observe a signal only AFTER sample-rate conversion
(y_obs at 96 kHz) and recover the 44.1 kHz source by gradient descent
through the converter itself — possible because the whole stage chain is
a pure linear jax function (r8brain_tpu.functional.resample_fn), so
``jax.grad`` of the data-fit loss is exact.  The reference
(CDSPResampler.h) is a stateful C++ object and cannot do this.

The same pattern drives on-TPU data-augmentation pipelines (SRC inside a
jitted training step) and joint optimization of any upstream DSP whose
output passes through rate conversion.

Run: python examples/differentiable.py [--cpu] [--iters N]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--n", type=int, default=2048)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    import r8brain_tpu as r8b

    src, dst, n = 44100, 96000, args.n

    # Hidden source: bandlimited noise (content below the SRC passband
    # edge, so the chain preserves it and the problem is well-posed).
    rng = np.random.default_rng(0)
    spec = rng.standard_normal(n // 2 + 1) + 1j * rng.standard_normal(
        n // 2 + 1)
    spec[int(0.4 * n / 2):] = 0.0
    x_true = np.fft.irfft(spec, n).astype(np.float32)
    x_true *= 0.5 / np.abs(x_true).max()

    rs = r8b.Resampler(src, dst, atten=136.45)
    f = r8b.resample_fn(rs, n)
    y_obs = f(x_true)
    print(f"observed: {n} @ {src} Hz -> {y_obs.shape[0]} @ {dst} Hz")

    def loss(x):
        r = f(x) - y_obs
        return jnp.mean(r * r)

    # Minimal Adam (kept dependency-free; swap in optax.adam if you use it)
    lr, b1, b2, eps = 3e-2, 0.9, 0.999, 1e-8
    x = jnp.zeros(n, jnp.float32)
    state = (jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros((), jnp.int32))

    @jax.jit
    def step(x, state):
        m, v, t = state
        l, g = jax.value_and_grad(loss)(x)
        t = t + 1
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** t.astype(jnp.float32))
        vh = v / (1 - b2 ** t.astype(jnp.float32))
        return x - lr * mh / (jnp.sqrt(vh) + eps), (m, v, t), l

    for i in range(args.iters):
        x, state, l = step(x, state)
        if i % max(1, args.iters // 5) == 0 or i == args.iters - 1:
            print(f"iter {i:4d}  loss {float(l):.3e}")

    err = np.asarray(x) - x_true
    snr = 10 * np.log10(np.mean(x_true**2) / (np.mean(err**2) + 1e-30))
    print(f"recovered source SNR: {snr:.1f} dB")
    if snr < 20.0:
        raise SystemExit("recovery failed — gradient path broken?")


if __name__ == "__main__":
    main()
