"""Two-float ("double-float", df32) arithmetic for TPU.

TPU hardware has no fast float64: XLA:TPU emulates f64 at a large slowdown,
which makes it unusable on the hot path.  The reference library computes
everything in native f64 (r8bbase.h uses ``double`` throughout); to reach the
same −141 dB RMS output-accuracy class (bench/README.md:9-11) on TPU we
represent a high-precision value as an unevaluated sum of two float32s
``hi + lo`` with ``|lo| <= ulp(hi)/2``, giving an effective ~48-bit mantissa.

Algorithms are the classic error-free transformations (Dekker 1971, Knuth
TAOCP v2) that need only IEEE round-to-nearest add/mul — no FMA — so they
lower to plain VPU ops and fuse under XLA.  Cost: ~20 flops per df op vs 1
for f32; used only where f32 roundoff would dominate the output error budget
(FFT butterflies, spectrum multiplies, long dot products, sample-position
computation).

All functions operate on ``DF = (hi, lo)`` tuples of equal-shape f32 arrays
and are fully jit/vmap/shard_map compatible.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

DF = Tuple[jnp.ndarray, jnp.ndarray]

# Veltkamp splitting constant for float32 (2^12 + 1): splits a 24-bit
# mantissa into two 12-bit halves whose product is exact in f32.
_SPLIT = np.float32(4097.0)


def two_sum(a, b) -> DF:
    """Error-free a + b = s + e (Knuth). 6 flops."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b) -> DF:
    """Error-free a + b = s + e assuming |a| >= |b|. 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a) -> DF:
    """Veltkamp split of an f32 into two 12-bit-mantissa halves."""
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b) -> DF:
    """Error-free a * b = p + e (Dekker, FMA-free). 17 flops."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# -- df operations -----------------------------------------------------------


def df(hi, lo=None) -> DF:
    hi = jnp.asarray(hi, dtype=jnp.float32)
    if lo is None:
        lo = jnp.zeros_like(hi)
    return hi, jnp.asarray(lo, dtype=jnp.float32)


def df_from_f64(x: np.ndarray) -> DF:
    """Split a host float64 array into (hi, lo) float32 pair."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def df_to_f64(a: DF) -> np.ndarray:
    return np.asarray(a[0], dtype=np.float64) + np.asarray(a[1], dtype=np.float64)


def df_neg(a: DF) -> DF:
    return -a[0], -a[1]


def df_add(a: DF, b: DF) -> DF:
    """df + df (accurate variant, ~20 flops)."""
    s, e = two_sum(a[0], b[0])
    e = e + (a[1] + b[1])
    return quick_two_sum(s, e)


def df_add_f(a: DF, b) -> DF:
    """df + f32."""
    s, e = two_sum(a[0], b)
    e = e + a[1]
    return quick_two_sum(s, e)


def df_sub(a: DF, b: DF) -> DF:
    return df_add(a, df_neg(b))


def df_mul(a: DF, b: DF) -> DF:
    """df * df (~28 flops)."""
    p, e = two_prod(a[0], b[0])
    e = e + (a[0] * b[1] + a[1] * b[0])
    return quick_two_sum(p, e)


def df_mul_f(a: DF, b) -> DF:
    """df * f32 (~22 flops)."""
    p, e = two_prod(a[0], b)
    e = e + a[1] * b
    return quick_two_sum(p, e)


def df_mul_ff(a, b) -> DF:
    """Exact product of two f32 as a df."""
    return two_prod(a, b)


def df_sum(a: DF, axis=None, keepdims=False) -> DF:
    """Sum a df array along ``axis``: pairwise-ish via sorted two-sum chain.

    XLA reduces f32 sums in an implementation-defined order; for df we do an
    explicit sequential compensated reduction via scan-free log-depth
    splitting (halving) which keeps O(eps^2) accuracy.
    """
    hi, lo = a
    if axis is None:
        hi = hi.reshape(-1)
        lo = lo.reshape(-1)
        axis = 0
    n = hi.shape[axis]
    # log-depth pairwise df additions
    while n > 1:
        half = n // 2
        a0 = (jnp.take(hi, jnp.arange(0, 2 * half, 2), axis=axis),
              jnp.take(lo, jnp.arange(0, 2 * half, 2), axis=axis))
        a1 = (jnp.take(hi, jnp.arange(1, 2 * half, 2), axis=axis),
              jnp.take(lo, jnp.arange(1, 2 * half, 2), axis=axis))
        s = df_add(a0, a1)
        if n % 2:
            tail = (jnp.take(hi, jnp.array([n - 1]), axis=axis),
                    jnp.take(lo, jnp.array([n - 1]), axis=axis))
            s = (jnp.concatenate([s[0], tail[0]], axis=axis),
                 jnp.concatenate([s[1], tail[1]], axis=axis))
            n = half + 1
        else:
            n = half
        hi, lo = s
    if not keepdims:
        hi = jnp.squeeze(hi, axis=axis)
        lo = jnp.squeeze(lo, axis=axis)
    return hi, lo


def df_dot(a: DF, b: DF, axis=-1) -> DF:
    """Compensated dot product sum(a*b) along axis."""
    p = df_mul(a, b)
    return df_sum(p, axis=axis)
