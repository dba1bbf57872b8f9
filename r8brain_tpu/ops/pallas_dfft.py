"""Pallas TPU kernel: VMEM-resident two-float (df32) FFT convolution.

The pure-jnp df32 FFT (ops/dfft.py) is HBM-bound: 13 butterfly stages x 4
float32 component arrays round-trip main memory per stage (measured 76
Mrops for the hp convolver).  This kernel keeps a tile of frames resident
in VMEM for the whole forward-FFT -> spectrum-multiply -> inverse-FFT
pipeline, with butterflies expressed as static rolls:

* layout: each frame [N] viewed as [N1=rows, 128 lanes]; a butterfly at
  flat distance d is a row-roll (d >= 128) or a lane-roll (d < 128) — all
  static power-of-two shifts, fully Mosaic-legal (no dynamic slicing, no
  transposes);
* ordering: forward DIF (natural in -> bit-reversed out), kernel spectrum
  pre-permuted to the bit-reversed layout on the host, inverse DIT
  (bit-reversed in -> natural out) — zero runtime permutations;
* arithmetic: error-free two-float transforms (ops/dfloat.py algebra,
  re-derived inline on jnp values) giving ~48-bit mantissas in float32-only
  hardware ops.

Stage coefficients (twiddles at the v-positions + u/v masks) are packed
into single [n_stages, 64, 128] arrays and live in VMEM (~3.5 MB for
N=8192).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

__all__ = ["HAVE_PALLAS", "DfFFTConvPlan", "df_ols_convolve_pallas"]

LANES = 128


def _bitrev_perm(n: int) -> np.ndarray:
    b = n.bit_length() - 1
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        r = 0
        x = i
        for _ in range(b):
            r = (r << 1) | (x & 1)
            x >>= 1
        out[i] = r
    return out


def _split64(v: np.ndarray):
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


class DfFFTConvPlan:
    """Host-side constants for a length-N df32 OLS convolution kernel.

    H_full: complex128 [N] kernel spectrum with the 1/N inverse scale
    folded in (np.fft.fft(k, N) / N).
    """

    def __init__(self, n: int, H_full: np.ndarray):
        assert n % LANES == 0 and (n & (n - 1)) == 0 and n >= 2 * LANES
        self.n = n
        self.rows = n // LANES
        bits = n.bit_length() - 1
        self.bits = bits
        shape = (self.rows, LANES)
        flat = np.arange(n).reshape(shape)

        # per-stage (distance h = n/2 ... 1): u-mask and twiddle at the
        # v-positions.  DIF stage: u' = u + v; v' = (u - v) * w, with
        # w = exp(sign*2i*pi*j/(2h)), j = position within the block.
        masks = np.zeros((bits,) + shape, dtype=np.float32)
        tw_f = np.zeros((bits,) + shape, dtype=np.complex128)
        tw_i = np.zeros((bits,) + shape, dtype=np.complex128)
        for s in range(bits):
            h = n >> (s + 1)
            pos = flat % (2 * h)
            is_u = pos < h
            masks[s] = is_u.astype(np.float32)
            j = np.where(is_u, 0, pos - h)
            ang = 2.0 * np.pi * j / (2.0 * h)
            # forward DIF twiddle (applied at v positions)
            tw_f[s] = np.where(is_u, 1.0, np.exp(-1j * ang))
            # inverse DIT twiddle for the mirrored stage order
            tw_i[s] = np.where(is_u, 1.0, np.exp(+1j * ang))

        self.masks = masks
        self.twf_re_hi, self.twf_re_lo = _split64(tw_f.real)
        self.twf_im_hi, self.twf_im_lo = _split64(tw_f.imag)
        self.twi_re_hi, self.twi_re_lo = _split64(tw_i.real)
        self.twi_im_hi, self.twi_im_lo = _split64(tw_i.imag)

        # kernel spectrum in the bit-reversed layout the DIF output uses
        perm = _bitrev_perm(n)
        Hs = np.asarray(H_full, dtype=np.complex128)[perm].reshape(shape)
        self.h_re_hi, self.h_re_lo = _split64(Hs.real)
        self.h_im_hi, self.h_im_lo = _split64(Hs.imag)

        # roll geometry per stage: axis (1=rows, 2=lanes) and shift
        self.rolls = []
        for s in range(bits):
            h = n >> (s + 1)
            if h >= LANES:
                self.rolls.append((1, h // LANES))
            else:
                self.rolls.append((2, h))


# ---- inline two-float algebra on jnp values (see ops/dfloat.py) --------

_SPLIT = np.float32(4097.0)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick(s, e):
    t = s + e
    return t, e - (t - s)


def _two_prod(a, b):
    p = a * b
    t = _SPLIT * a
    ah = t - (t - a)
    al = a - ah
    t = _SPLIT * b
    bh = t - (t - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _df_add(a, b):
    s, e = _two_sum(a[0], b[0])
    return _quick(s, e + (a[1] + b[1]))


def _df_sub(a, b):
    return _df_add(a, (-b[0], -b[1]))


def _df_mul(a, b):
    p, e = _two_prod(a[0], b[0])
    return _quick(p, e + (a[0] * b[1] + a[1] * b[0]))


def _cmul(ar, ai, br, bi):
    rr = _df_sub(_df_mul(ar, br), _df_mul(ai, bi))
    ii = _df_add(_df_mul(ar, bi), _df_mul(ai, br))
    return rr, ii


def _roll(v, axis, shift):
    """out[i] = v[i + shift] (circular); pltpu.roll requires non-negative
    shifts, so negatives are expressed modulo the axis size."""
    size = v.shape[axis]
    return pltpu.roll(v, (-shift) % size, axis)


def _roll_df(a, axis, shift):
    return (_roll(a[0], axis, shift), _roll(a[1], axis, shift))


def _sel(mask, a, b):
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def _make_kernel(plan: DfFFTConvPlan, T: int):
    bits = plan.bits
    rolls = plan.rolls

    def stage(re, im, mask, wr, wi, dif: bool, axis, shift):
        # partner values: at u rows the partner is +h away, at v rows -h
        re_dn = _roll_df(re, axis, shift)
        im_dn = _roll_df(im, axis, shift)
        re_up = _roll_df(re, axis, -shift)
        im_up = _roll_df(im, axis, -shift)
        if dif:
            # u' = x + down;  v' = (up - x) * w
            u_re = _df_add(re, re_dn)
            u_im = _df_add(im, im_dn)
            d_re = _df_sub(re_up, re)
            d_im = _df_sub(im_up, im)
            v_re, v_im = _cmul(d_re, d_im, wr, wi)
        else:
            # DIT: u' = x + w*down;  v' = w_at_v... mirrored:
            # at u rows: x + (w.v)*down where w sits at the v position ->
            # roll w down too;  at v rows: up - w*x
            wr_dn = _roll_df(wr, axis, shift)
            wi_dn = _roll_df(wi, axis, shift)
            t_re, t_im = _cmul(re_dn, im_dn, wr_dn, wi_dn)
            u_re = _df_add(re, t_re)
            u_im = _df_add(im, t_im)
            s_re, s_im = _cmul(re, im, wr, wi)
            v_re = _df_sub(re_up, s_re)
            v_im = _df_sub(im_up, s_im)
        return (_sel(mask, u_re, v_re), _sel(mask, u_im, v_im))

    def kernel(x_ref, masks_ref, twf_ref, twi_ref, h_ref, o_ref,
               xi_ref=None, oi_ref=None):
        # x_ref: [T, rows, 128] f32 real frames (or the EVEN frames of a
        # real-packed pair when xi_ref/oi_ref are provided: convolution by
        # a fixed real kernel commutes with z = x_even + i*x_odd, so two
        # frames ride one complex FFT with no spectral pack/unpack)
        # masks_ref: [bits, rows, 128]; twf/twi_ref: [4, bits, rows, 128]
        # h_ref: [4, rows, 128]; o_ref: [T, rows, 128]
        x = x_ref[:]
        z = jnp.zeros_like(x)
        re = (x, z)
        im = (xi_ref[:], z) if xi_ref is not None else (z, z)

        def cst(ref, comp, s):
            v = ref[comp, s][None]  # [1, rows, 128] broadcasts over T
            return v

        # forward DIF: h = n/2 ... 1
        for s in range(bits):
            axis, shift = rolls[s]
            mask = masks_ref[s][None] > 0.5
            wr = (cst(twf_ref, 0, s), cst(twf_ref, 1, s))
            wi = (cst(twf_ref, 2, s), cst(twf_ref, 3, s))
            re, im = stage(re, im, mask, wr, wi, True, axis + 0, shift)

        # spectrum multiply (bit-reversed layout)
        hr = (h_ref[0][None], h_ref[1][None])
        hi = (h_ref[2][None], h_ref[3][None])
        re, im = _cmul(re, im, hr, hi)

        # inverse DIT: h = 1 ... n/2 (reverse stage order, conj twiddles)
        for s in reversed(range(bits)):
            axis, shift = rolls[s]
            mask = masks_ref[s][None] > 0.5
            wr = (cst(twi_ref, 0, s), cst(twi_ref, 1, s))
            wi = (cst(twi_ref, 2, s), cst(twi_ref, 3, s))
            re, im = stage(re, im, mask, wr, wi, False, axis + 0, shift)

        s0, e0 = _two_sum(re[0], re[1])
        del e0
        o_ref[:] = s0
        if oi_ref is not None:
            s1, e1 = _two_sum(im[0], im[1])
            del e1
            oi_ref[:] = s1

    def kernel_packed(xr_ref, xi_ref, masks_ref, twf_ref, twi_ref, h_ref,
                      or_ref, oi_ref):
        return kernel(xr_ref, masks_ref, twf_ref, twi_ref, h_ref, or_ref,
                      xi_ref=xi_ref, oi_ref=oi_ref)

    return kernel, kernel_packed


def df_ols_convolve_pallas(frames: jnp.ndarray, plan: DfFFTConvPlan,
                           T: int = 8, interpret: bool = False,
                           pack: bool = True) -> jnp.ndarray:
    """frames: [..., F, N] f32 -> circular convolution with the plan's
    kernel spectrum, [..., F, N] f32 (hi part of the df result).

    pack=True (default): real-pack two frames per complex FFT (2x fewer
    kernel invocations, numerically identical butterfly path)."""
    lead = frames.shape[:-1]
    N = frames.shape[-1]
    assert N == plan.n
    total = int(np.prod(lead)) if lead else 1

    masks = jnp.asarray(plan.masks)
    twf = jnp.asarray(np.stack([plan.twf_re_hi, plan.twf_re_lo,
                                plan.twf_im_hi, plan.twf_im_lo]))
    twi = jnp.asarray(np.stack([plan.twi_re_hi, plan.twi_re_lo,
                                plan.twi_im_hi, plan.twi_im_lo]))
    h = jnp.asarray(np.stack([plan.h_re_hi, plan.h_re_lo,
                              plan.h_im_hi, plan.h_im_lo]))
    kernel, kernel_packed = _make_kernel(plan, T)
    blk = (T, plan.rows, LANES)

    if pack:
        x = frames.reshape(total, N)
        pad = (-total) % (2 * T)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        tp = x.shape[0]
        xr = x[0::2].reshape(tp // 2, plan.rows, LANES)
        xi = x[1::2].reshape(tp // 2, plan.rows, LANES)
        n_cells = (tp // 2) // T
        out_r, out_i = pl.pallas_call(
            kernel_packed,
            out_shape=[jax.ShapeDtypeStruct(xr.shape, jnp.float32),
                       jax.ShapeDtypeStruct(xi.shape, jnp.float32)],
            grid=(n_cells,),
            in_specs=[
                pl.BlockSpec(blk, lambda c: (c, 0, 0)),
                pl.BlockSpec(blk, lambda c: (c, 0, 0)),
                pl.BlockSpec(masks.shape, lambda c: (0, 0, 0)),
                pl.BlockSpec(twf.shape, lambda c: (0, 0, 0, 0)),
                pl.BlockSpec(twi.shape, lambda c: (0, 0, 0, 0)),
                pl.BlockSpec(h.shape, lambda c: (0, 0, 0)),
            ],
            out_specs=[pl.BlockSpec(blk, lambda c: (c, 0, 0)),
                       pl.BlockSpec(blk, lambda c: (c, 0, 0))],
            interpret=interpret,
        )(xr, xi, masks, twf, twi, h)
        y = jnp.stack([out_r.reshape(tp // 2, N),
                       out_i.reshape(tp // 2, N)], axis=1).reshape(tp, N)
        if pad:
            y = y[:total]
        return y.reshape(*lead, N)

    x = frames.reshape(total, plan.rows, LANES)
    pad = (-total) % T
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    n_cells = x.shape[0] // T
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(blk, lambda c: (c, 0, 0)),
            pl.BlockSpec(masks.shape, lambda c: (0, 0, 0)),
            pl.BlockSpec(twf.shape, lambda c: (0, 0, 0, 0)),
            pl.BlockSpec(twi.shape, lambda c: (0, 0, 0, 0)),
            pl.BlockSpec(h.shape, lambda c: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(blk, lambda c: (c, 0, 0)),
        interpret=interpret,
    )(x, masks, twf, twi, h)
    if pad:
        out = out[:total]
    return out.reshape(*lead, N)
