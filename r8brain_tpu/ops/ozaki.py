"""Error-free split-operand (Ozaki-style) banded matmul on the MXU.

The backend-independent -141 dB guarantee previously lived only in the
df32-FFT engines (ops/dfft.py, ops/pallas_dfft*.py) — two-float butterfly
arithmetic on the VPU, measured at ~28x baseline.  This module moves that
guarantee onto the MXU (role being matched: the reference's full-64-bit
FFT path, fft/pffft_double.c + CDSPRealFFT.h:289-385) via fixed-point
operand splitting:

* Each operand is block-normalized by a POWER OF TWO (x per channel, the
  operator per output column) and split into 4 slices of 8 mantissa bits:
  every slice value is an integer multiple of 2^(e-8(p+1)) with
  |integer| <= 2^8, hence EXACTLY representable in bfloat16.
* A slice-pair product is an integer < 2^16 on the common grid
  2^(e_x + e_T - 8(p+q+2)); a dot of K0 <= 256 such products stays below
  2^24, so EVERY IEEE-754 float32 accumulation of it — any order, any
  backend, MXU or CPU — is EXACT.  Contractions longer than 256 are
  chunked and the exact chunk results combined in two-float (df32)
  arithmetic; the power-of-two scales multiply out exactly at the end.
* Slice pairs are kept for diagonals d = p+q <= 3 (10 bf16 matmuls per
  chunk).  Same-diagonal partials and the d>=1 running sums combine in
  plain f32 (their magnitude is 2^-8d of the output: the add noise lands
  at 2^-32 or below); only the d=0 chain and the final cross-diagonal
  add use df32.

Error model (all relative to output RMS, crest factors c_x, c_T):
  dropped diagonals (d >= 4):   ~ 2^-32
  x / T quantization (32 bits): ~ 2^-32 * c_x, 2^-32 * c_T
  f32 same-diagonal combines:   <= 2^-32
measured end to end at -176 dB on the flagship-geometry operator — 35 dB
of margin under the -141 dB golden class, by construction on any backend
(tests/test_ozaki.py asserts both the exactness lemma and the class).

Cost: 10 bfloat16 MXU passes per 256-deep chunk vs 6 for one
f32-HIGHEST pass — ~1.7x the fast toeplitz engine's MXU time, ~2x faster
than the VPU df-FFT guarantee engine it replaces.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["split_operator_host", "split_operator_host_batched",
           "split_input", "framed_matmul_ozaki",
           "N_PARTS", "N_DIAG", "K0"]

N_PARTS = 4   # 8-bit slices per operand (32 bits below the block peak)
#: keep diagonals d = p+q in [0, N_DIAG); env override for A/B timing
#: experiments ONLY (3 loses the -141 dB class, see module docstring)
N_DIAG = int(os.environ.get("R8BT_OZAKI_DIAG", "4"))
#: max exact f32 accumulation length for 16-bit products; env override
#: for timing experiments ONLY (512 loses the exactness lemma)
K0 = int(os.environ.get("R8BT_OZAKI_K0", "256"))


def _pow2_ceil_scale(amax: np.ndarray) -> np.ndarray:
    """Smallest power of two >= amax (1.0 where amax == 0)."""
    e = np.where(amax > 0,
                 np.ceil(np.log2(np.maximum(amax, 1e-300))), 0.0)
    return np.exp2(e)


def split_operator_host(T64: np.ndarray):
    """Split a [L_f, Kcols] f64 operator into N_PARTS bf16 slices on a
    per-COLUMN power-of-two grid, with the column scale FOLDED back into
    the slices (a pure exponent shift, so bf16 exactness and the
    per-column common-grid property both survive).  Returns
    (parts [N_PARTS, L_f, Kcols] bfloat16, scale [Kcols] f32 — the folded
    scales, for diagnostics only)."""
    amax = np.abs(T64).max(axis=0)
    s = _pow2_ceil_scale(amax)
    xs = T64 / s[None, :]
    parts = []
    r = xs
    for p in range(N_PARTS):
        step = 2.0 ** (-8 * (p + 1))
        q = np.round(r / step) * step
        parts.append(q * s[None, :])
        r = r - q
    parts = np.stack(parts)
    pb = parts.astype(jnp.bfloat16)
    assert np.array_equal(np.asarray(pb, dtype=np.float64), parts), \
        "operator slice not bf16-exact"
    return pb, s.astype(np.float32)


def split_operator_host_batched(T64: np.ndarray, axis: int = 1):
    """split_operator_host for a BATCHED operator [nloc, W, G]: slices on
    a per-(m, g)-column power-of-two grid (max over the contraction axis
    ``axis``), scales folded in.  Returns [N_PARTS, nloc, W, G] bfloat16.
    Used by the banded poly interpolator's guarantee path — the same
    exactness lemma applies per (channel, m, g) output cell."""
    amax = np.abs(T64).max(axis=axis, keepdims=True)
    s = _pow2_ceil_scale(amax)
    xs = T64 / s
    parts = []
    r = xs
    for p in range(N_PARTS):
        step = 2.0 ** (-8 * (p + 1))
        q = np.round(r / step) * step
        parts.append(q * s)
        r = r - q
    parts = np.stack(parts)
    pb = parts.astype(jnp.bfloat16)
    assert np.array_equal(np.asarray(pb, dtype=np.float64), parts), \
        "operator slice not bf16-exact"
    return pb


def channel_scale(x: jnp.ndarray) -> jnp.ndarray:
    """[C, 1] power-of-two >= per-channel max |x| (1.0 for silent rows)."""
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    e = jnp.where(amax > 0,
                  jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-300))),
                  jnp.float32(0))
    return jnp.exp2(e).astype(jnp.float32)


def split_input(x: jnp.ndarray):
    """Split [C, N] input on a per-CHANNEL power-of-two grid.  Returns
    (parts [N_PARTS, C, N] bfloat16, scale [C, 1] f32).  All device ops
    are exact: the scale is a power of two and each slice is an integer
    multiple of its grid step with <= 8 significant bits."""
    x = x.astype(jnp.float32)
    s = channel_scale(x)
    xs = x / s  # exact: power-of-two divide
    parts = []
    r = xs
    for p in range(N_PARTS):
        step = jnp.float32(2.0 ** (-8 * (p + 1)))
        q = jnp.round(r / step) * step  # exact: pow2 scale + round
        parts.append(q.astype(jnp.bfloat16))
        r = r - q  # exact: Sterbenz-class cancellation
    return jnp.stack(parts), s


def _exact_chunk(xp_parts, T_parts, e, hop, n_blocks, a0, a1):
    """All kept (p, q) partials for operator rows [a0, a1) of segment e.
    Returns per-diagonal f32 sums [N_DIAG] of [C, n_blocks, Kcols]."""
    diags = [None] * N_DIAG
    for p in range(N_PARTS):
        for q in range(N_PARTS):
            d = p + q
            if d >= N_DIAG:
                continue
            seg = xp_parts[p][:, e: n_blocks + e,
                              a0 - e * hop: a1 - e * hop]
            Te = jax.lax.slice(T_parts[q], (a0, 0),
                               (a1, T_parts[q].shape[1]))
            o = jnp.einsum("cbl,lk->cbk", seg, Te,
                           preferred_element_type=jnp.float32)
            diags[d] = o if diags[d] is None else diags[d] + o
    return diags


def framed_cheap(x_lo: jnp.ndarray, T0, n_blocks: int, hop: int):
    """One-pass bf16 contribution of a seam-residual stream: the same
    segmented reshape-view framing as framed_matmul_ozaki, contracted
    against the TOP operator slice only (the residual needs ~8 relative
    bits; error ~2^-32 of the main output).  Used by stages whose main
    pass runs in a kernel that should not pay a second operand DMA
    (e.g. the frac stage's dense kernel — framing the residual stream
    separately measured ~7 ms/iter of duplicated HBM pads/copies)."""
    C = x_lo.shape[0]
    L_f = T0.shape[0]
    n_seg = -(-L_f // hop)
    total = (n_blocks + n_seg) * hop
    pad = total - x_lo.shape[1]
    xl = jnp.pad(x_lo, ((0, 0), (0, pad))) if pad > 0 \
        else x_lo[:, :total]
    ch = xl.astype(jnp.bfloat16).reshape(C, n_blocks + n_seg, hop)
    out = None
    for e in range(n_seg):
        w = min(hop, L_f - e * hop)
        seg = ch[:, e : n_blocks + e, :w]
        Te = jax.lax.slice(T0, (e * hop, 0), (e * hop + w, T0.shape[1]))
        o = jnp.einsum("cbl,lk->cbk", seg, Te,
                       preferred_element_type=jnp.float32)
        out = o if out is None else out + o
    return out


def framed_matmul_ozaki(xp: jnp.ndarray, T_parts,
                        n_blocks: int, hop: int, x_lo=None,
                        pair: bool = False):
    """out[c, b, k] = sum_l xp[c, b*hop + l] * T[l, k], f32 result with
    backend-independent ~2^-30 relative accuracy.

    xp: [C, N] f32; T_parts: [N_PARTS, L_f, Kcols] bfloat16 (host-split
    literals from split_operator_host, column scales folded in).
    Framing and segment views are identical to _framed_matmul
    (ops/stages.py); each segment is evaluated in K0-deep chunks whose
    f32 accumulation is exact by the grid argument above.

    df32 inter-stage carry (round 5): ``x_lo`` is the previous seam's
    residual stream (|x_lo| <= 2^-24 |xp| after normalization; carried
    as BFLOAT16 — its consumer needs only ~8 relative bits to land at
    ~2^-32 of the output, and halving its bytes halves the carry's HBM
    cost).  It costs ONE extra bf16 pass per chunk against the TOP
    operator slice (T_parts[0], column scales already folded in).
    ``pair=True`` returns the two_sum-normalized (hi f32, lo bfloat16)
    instead of collapsing — the caller threads the pair to the next
    stage so the per-seam f32 store rounding never happens.  x_lo and
    pair compose freely (emit-only for a chain's first stage,
    consume-only for its last).  The default path (x_lo=None,
    pair=False) is BIT-IDENTICAL to round 4.
    """
    from .dfloat import df_add, two_sum

    C = xp.shape[0]
    L_f = T_parts[0].shape[0]
    n_seg = -(-L_f // hop)
    total = (n_blocks + n_seg) * hop

    def _padto(a):
        p = total - a.shape[1]
        return jnp.pad(a, ((0, 0), (0, p))) if p > 0 else a[:, :total]

    xpp = _padto(xp)
    xparts, x_scale = split_input(xpp)
    xparts = [xparts[p].reshape(C, n_blocks + n_seg, hop)
              for p in range(N_PARTS)]
    xl_chunks = None
    if x_lo is not None:
        xl_chunks = _padto(x_lo).astype(
            jnp.bfloat16).reshape(C, n_blocks + n_seg, hop)

    hi = lo = None          # df32 chain for the d = 0 partials
    rest = None             # plain-f32 sum of d >= 1 partials
    cheap = None            # x_lo (seam residual) contribution
    for e in range(n_seg):
        w = min(hop, L_f - e * hop)
        for c0 in range(0, w, K0):
            a0 = e * hop + c0
            a1 = min(e * hop + w, a0 + K0)
            diags = _exact_chunk(xparts, T_parts, e, hop, n_blocks, a0, a1)
            d0 = diags[0]
            if hi is None:
                hi, lo = d0, jnp.zeros_like(d0)
            else:
                s, err = two_sum(hi, d0)
                hi, lo = s, lo + err
            small = None
            for d in range(1, N_DIAG):
                if diags[d] is not None:
                    small = diags[d] if small is None else small + diags[d]
            if small is not None:
                rest = small if rest is None else rest + small
            if xl_chunks is not None:
                seg = xl_chunks[:, e: n_blocks + e, a0 - e * hop:
                                a1 - e * hop]
                Te = jax.lax.slice(T_parts[0], (a0, 0),
                                   (a1, T_parts[0].shape[1]))
                o = jnp.einsum("cbl,lk->cbk", seg, Te,
                               preferred_element_type=jnp.float32)
                cheap = o if cheap is None else cheap + o
    small_all = lo + (rest if rest is not None else jnp.float32(0))
    if x_lo is None and not pair:
        # round-4 collapse, bit-identical
        return (hi + small_all) * x_scale[:, None, :]
    # exact power-of-two rescale commutes into both streams (x_lo was
    # never normalized, so its contribution enters unscaled)
    y_hi = hi * x_scale[:, None, :]
    y_small = small_all * x_scale[:, None, :]
    if cheap is not None:
        y_small = y_small + cheap
    if not pair:
        return y_hi + y_small
    H, L = two_sum(y_hi, y_small)
    return H, L.astype(jnp.bfloat16)
