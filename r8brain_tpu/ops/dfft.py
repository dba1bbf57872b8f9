"""Two-float (df32) complex FFT for the high-precision convolution path.

TPU has no fast float64 and XLA:TPU cannot compile f64 FFTs at all (probed:
"Element type C128 is not supported on TPU").  The reference computes its
overlap-save convolution in native f64 (CDSPRealFFT.h); to reach the
library's −141 dB golden-equality class (bench/README.md:9-11) the convolver
FFT must carry ~48-bit mantissas.  This module implements a radix-2 DIT FFT
whose butterflies run in two-float arithmetic (ops/dfloat.py): each complex
value is (re_hi, re_lo, im_hi, im_lo) float32 arrays.

The error-free transforms survive XLA: two_sum uses only adds/subs (XLA does
not reassociate floats), and two_prod's Dekker form stays exact even if the
compiler contracts multiply-add into FMA (the fma-based two_prod is the
textbook variant).

Cost is ~25x a plain f32 FFT in flops; used only for the convolver stage in
precision="high" mode where f32 FFT rounding (−133 dB on TPU) dominates the
output error budget.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .dfloat import DF, df_add, df_mul_f, df_sub, quick_two_sum, two_prod

CDF = Tuple[DF, DF]  # (re, im)


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    perm = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        x = i
        for _ in range(bits):
            r = (r << 1) | (x & 1)
            x >>= 1
        perm[i] = r
    return perm


def _cmul_df_const(b: CDF, w_re_hi, w_re_lo, w_im_hi, w_im_lo) -> CDF:
    """(complex df) * (complex constant split hi/lo).

    The constant split (hi, lo) is applied as two f32 multiplies per
    component: b*(hi+lo) = b*hi + b*lo with df accumulation.
    """
    br, bi = b

    def mul_split(a: DF, hi, lo) -> DF:
        p = df_mul_f(a, hi)
        if lo is not None:
            p = df_add(p, df_mul_f(a, lo))
        return p

    rr = df_sub(mul_split(br, w_re_hi, w_re_lo), mul_split(bi, w_im_hi, w_im_lo))
    ii = df_add(mul_split(br, w_im_hi, w_im_lo), mul_split(bi, w_re_hi, w_re_lo))
    return rr, ii


class DfFFT:
    """Plan for a length-N (power of 2) df32 complex FFT over the last axis."""

    def __init__(self, n: int):
        assert n & (n - 1) == 0 and n >= 2
        self.n = n
        self.bits = n.bit_length() - 1
        self.perm = _bit_reverse_perm(n)
        # per-stage twiddles w_j = exp(-2i*pi*j/(2*half)), j in [0, half)
        self.tw = []
        for s in range(self.bits):
            half = 1 << s
            ang = -np.pi * np.arange(half, dtype=np.float64) / half
            wr = np.cos(ang)
            wi = np.sin(ang)
            self.tw.append(tuple(
                (v.astype(np.float32),
                 (v - v.astype(np.float32).astype(np.float64)).astype(np.float32))
                for v in (wr, wi)))

    def _stages(self, re: DF, im: DF, sign: int) -> CDF:
        n = self.n
        for s in range(self.bits):
            half = 1 << s
            nblk = n >> (s + 1)
            shape = re[0].shape[:-1]

            def rs(a):
                return a.reshape(shape + (nblk, 2, half))

            re = (rs(re[0]), rs(re[1]))
            im = (rs(im[0]), rs(im[1]))
            a = ((re[0][..., 0, :], re[1][..., 0, :]),
                 (im[0][..., 0, :], im[1][..., 0, :]))
            b = ((re[0][..., 1, :], re[1][..., 1, :]),
                 (im[0][..., 1, :], im[1][..., 1, :]))
            (wr_hi, wr_lo), (wi_hi, wi_lo) = self.tw[s]
            if sign > 0:  # inverse: conjugate twiddles
                wi_hi, wi_lo = -wi_hi, -wi_lo
            t_re, t_im = _cmul_df_const(b, wr_hi, wr_lo, wi_hi, wi_lo)
            o0r = df_add(a[0], t_re)
            o0i = df_add(a[1], t_im)
            o1r = df_sub(a[0], t_re)
            o1i = df_sub(a[1], t_im)

            def cat(u, v):
                return jnp.concatenate([u[..., None, :], v[..., None, :]],
                                       axis=-2).reshape(shape + (n,))

            re = (cat(o0r[0], o1r[0]), cat(o0r[1], o1r[1]))
            im = (cat(o0i[0], o1i[0]), cat(o0i[1], o1i[1]))
        return re, im

    def fft(self, re: DF, im: DF) -> CDF:
        p = self.perm
        re = (re[0][..., p], re[1][..., p])
        im = (im[0][..., p], im[1][..., p])
        return self._stages(re, im, sign=-1)

    def ifft_unscaled(self, re: DF, im: DF) -> CDF:
        """Inverse DFT without the 1/N scale."""
        p = self.perm
        re = (re[0][..., p], re[1][..., p])
        im = (im[0][..., p], im[1][..., p])
        return self._stages(re, im, sign=+1)


def df_ols_convolve(frames: jnp.ndarray, H_re: np.ndarray, H_im: np.ndarray,
                    plan: DfFFT) -> jnp.ndarray:
    """Circular convolution of real f32 frames [..., N] with a kernel given
    by its full f64 spectrum (split hi/lo internally), in df32 arithmetic.
    Returns real f32 result [..., N]; the 1/N inverse scale is folded into
    the kernel spectrum by the caller or applied here.

    H_re/H_im: float64 numpy arrays of length N (full complex spectrum of
    the kernel, already divided by N).
    """
    z = jnp.zeros_like(frames)
    re: DF = (frames, z)
    im: DF = (z, z)
    Fre, Fim = plan.fft(re, im)

    def split(v):
        hi = v.astype(np.float32)
        lo = (v - hi.astype(np.float64)).astype(np.float32)
        return hi, lo

    hr_hi, hr_lo = split(H_re)
    hi_hi, hi_lo = split(H_im)
    Yre, Yim = _cmul_df_const((Fre, Fim), hr_hi, hr_lo, hi_hi, hi_lo)
    wre, _wim = plan.ifft_unscaled(Yre, Yim)
    s, e = quick_two_sum(wre[0], wre[1])
    del e
    return s
