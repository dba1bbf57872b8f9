"""Pallas TPU kernel v3: four-step, direct-butterfly, VMEM-resident
df32-FFT convolution — the backend-independent high-precision (guarantee)
engine's fast form (NEXT r2 item 2).

Why v3: the v2 kernel (ops/pallas_dfft4.py) expresses EVERY butterfly
level through pltpu.roll + per-element select networks because Mosaic
cannot slice vectors inside a 128-lane vreg.  That costs ~4x the flops of
a textbook butterfly (24 rolls + ~10 select trees per radix-4 stage).
This kernel restructures the transform so almost every level CAN use
plain tile-aligned row slices:

  four-step decomposition, N = A x B with B = 128 (the lane count) and
  A = N/128 rows:
    1. DFT_A over the ROW axis (lanes = i2 batch)      <- direct slices
    2. twiddle w_N^(k1*i2)                              <- one cmul
    3. ONE [128, 128] transpose (T2 frame-pairs stacked
       so T2*A == 128 keeps lanes fully utilized)
    4. DFT_B over the (new) row axis (lanes = (t2,k1))  <- direct slices
  spectrum multiply in the transposed layout (H stored pre-permuted and
  pre-transposed), then the mirror for the inverse: one transpose back.

A row slice at offset c*h is tile-aligned whenever h >= 8 (the f32
sublane tile), so every level except the bottom three (h = 4, 2, 1 =
radix-4 at h=2 plus radix-2 at h=1) becomes a direct butterfly: slice
four quarter blocks, 8 df add/sub per component, twiddle-cmul only the
three quarters that need it (the v2 form cmuls everything).  The bottom
two stages per part keep the v2 roll+select form (shifts 1..6 stay legal
pltpu.roll row shifts).

Layout invariant: a kernel cell holds T2 = 128//A frame-pairs as
[T2, A, 128] planes; reshaped to [128, 128], the A-part blocks (4h <= A
rows) never straddle a frame boundary, the four-step twiddle tiles
per-frame, and the transpose keeps frames separable because the B-part
treats lanes as pure batch.

The output permutation is never derived analytically: the plan runs the
vectorized numpy model of the forward pipeline on a unit phasor and
reads the frequency->position map off the phases, then bakes the kernel
spectrum pre-permuted (same recovery trick as v2, extended to the
transposed two-part pipeline).

Reference role parity: CDSPRealFFT.h:53-170 (the f64 FFT class every
backend must provide) + fft/pffft_double (the SIMD double-precision
backend); here the "double" is two-float arithmetic on f32 VPU lanes.
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

from .pallas_dfft4 import (_cmul_pc, _df_add, _df_neg, _df_sub, _neg4,
                           _split64_pc)

__all__ = ["HAVE_PALLAS", "DfFFTConvPlan5", "df_ols_convolve_pallas5",
           "df_ols_convolve_pallas5_framed",
           "df_ols_convolve_pallas5_framed_poly", "host_pipeline_forward",
           "supported_n", "framed_supported"]

LANES = 128
TILE = 8  # f32 sublane tile: row slices at multiples of 8 are free


def supported_n(n: int) -> bool:
    """n = A*128 with A a power of two, 8 <= A <= 128 (so T2 = 128//A
    keeps the transposed layout fully lane-populated)."""
    if n % LANES:
        return False
    A = n // LANES
    return 8 <= A <= 128 and (A & (A - 1)) == 0


def framed_supported(n: int) -> bool:
    """Framed (in-VMEM overlap-save) mode needs frame starts on sublane
    tiles: hop = 3n/4 must be a 1024-multiple, i.e. A >= 32."""
    return supported_n(n) and n >= 4096


def _part_plan(n: int):
    """Radix descent [(radix, h), ...] for one pow2 sub-transform."""
    bits = n.bit_length() - 1
    plan = []
    if bits % 2 == 0:
        plan.append((2, n // 2))
        h = n // 8
    else:
        h = n // 4
    while h >= 2:
        plan.append((4, h))
        h //= 4
    plan.append((2, 1))
    assert sum(2 if r == 4 else 1 for r, _ in plan) == bits, (n, plan)
    return plan


# ---- numpy host model (permutation recovery + unit-test oracle) ---------

def _fwd4_host(x, h):
    """Radix-4 DIF butterfly over axis 0 of a 2-D array."""
    R = x.shape[0]
    v = x.reshape(R // (4 * h), 4, h, -1)
    x0, x1, x2, x3 = v[:, 0], v[:, 1], v[:, 2], v[:, 3]
    t0, t1 = x0 + x2, x1 + x3
    t2, t3 = x0 - x2, -1j * (x1 - x3)
    w = np.exp(-2j * np.pi * np.arange(h) / (4.0 * h))[:, None]
    y = np.empty_like(v)
    y[:, 0] = t0 + t1
    y[:, 1] = (t2 + t3) * w
    y[:, 2] = (t0 - t1) * (w * w)
    y[:, 3] = (t2 - t3) * (w * w * w)
    return y.reshape(x.shape)


def _fwd2_host(x, h):
    R = x.shape[0]
    v = x.reshape(R // (2 * h), 2, h, -1)
    u, d = v[:, 0], v[:, 1]
    w = np.exp(-2j * np.pi * np.arange(h) / (2.0 * h))[:, None]
    y = np.empty_like(v)
    y[:, 0] = u + d
    y[:, 1] = (u - d) * w
    return y.reshape(x.shape)


def _inv4_host(x, h):
    R = x.shape[0]
    v = x.reshape(R // (4 * h), 4, h, -1)
    w = np.exp(+2j * np.pi * np.arange(h) / (4.0 * h))[:, None]
    x0 = v[:, 0]
    x1 = v[:, 1] * w
    x2 = v[:, 2] * (w * w)
    x3 = v[:, 3] * (w * w * w)
    t0, t1 = x0 + x2, x1 + x3
    t2, t3 = x0 - x2, +1j * (x1 - x3)
    y = np.empty_like(v)
    y[:, 0] = t0 + t1
    y[:, 1] = t2 + t3
    y[:, 2] = t0 - t1
    y[:, 3] = t2 - t3
    return y.reshape(x.shape)


def _inv2_host(x, h):
    R = x.shape[0]
    v = x.reshape(R // (2 * h), 2, h, -1)
    w = np.exp(+2j * np.pi * np.arange(h) / (2.0 * h))[:, None]
    u, d = v[:, 0], v[:, 1] * w
    y = np.empty_like(v)
    y[:, 0] = u + d
    y[:, 1] = u - d
    return y.reshape(x.shape)


def _part_fwd_host(x2d, plan):
    for r, h in plan:
        x2d = _fwd4_host(x2d, h) if r == 4 else _fwd2_host(x2d, h)
    return x2d


def _part_inv_host(x2d, plan):
    for r, h in reversed(plan):
        x2d = _inv4_host(x2d, h) if r == 4 else _inv2_host(x2d, h)
    return x2d


def _recover_freq_map(plan, n):
    """f[pos] = frequency index held at row `pos` after the part's
    forward stages (input delta at index 1 -> output phases)."""
    e1 = np.zeros((n, 1), dtype=np.complex128)
    e1[1, 0] = 1.0
    ph = _part_fwd_host(e1, plan)[:, 0]
    f = np.mod(np.round(-np.angle(ph) * n / (2.0 * np.pi)), n).astype(
        np.int64)
    assert len(set(f.tolist())) == n, "frequency map recovery failed"
    return f


def host_pipeline_forward(x: np.ndarray, n: int) -> np.ndarray:
    """Exact complex128 model of the kernel's forward pipeline for ONE
    frame: input [n] natural order -> output [B, A] permuted layout."""
    A = n // LANES
    x2 = np.asarray(x, dtype=np.complex128).reshape(A, LANES)
    x2 = _part_fwd_host(x2, _part_plan(A))
    fA = _recover_freq_map(_part_plan(A), A)
    i2 = np.arange(LANES)[None, :]
    x2 = x2 * np.exp(-2j * np.pi * fA[:, None] * i2 / float(n))
    x2 = x2.T.copy()  # [B, A]
    return _part_fwd_host(x2, _part_plan(LANES))


def host_pipeline_inverse(y: np.ndarray, n: int) -> np.ndarray:
    """Mirror of host_pipeline_forward: [B, A] permuted -> [n] natural
    (unscaled; the 1/n lives in the baked spectrum)."""
    A = n // LANES
    y = _part_inv_host(np.asarray(y, dtype=np.complex128),
                       _part_plan(LANES))
    y = y.T.copy()  # [A, B]
    fA = _recover_freq_map(_part_plan(A), A)
    i2 = np.arange(LANES)[None, :]
    y = y * np.exp(+2j * np.pi * fA[:, None] * i2 / float(n))
    return _part_inv_host(y, _part_plan(A)).reshape(n)


class DfFFTConvPlan5:
    """Host constants for the four-step df32-FFT convolution kernel.

    H_full: complex128 [n] = np.fft.fft(k, n) / n (inverse scale folded).
    H_full2: optional second spectrum (same layout) for the polyphase
    up=2 mode — one forward transform shared by two spectrum-multiply +
    inverse passes (k_even / k_odd), mirroring the reference's trick of
    folding the power-of-2 UpFactor into a smaller input FFT
    (CDSPBlockConvolver.h:62-110).
    """

    def __init__(self, n: int, H_full: np.ndarray,
                 H_full2: np.ndarray = None):
        assert supported_n(n), n
        self.n = n
        self.A = A = n // LANES
        self.T2 = LANES // A
        # framed (in-VMEM overlap-save) geometry: hop = 3n/4 so the
        # overlap head p_pad = n/4 exactly divides the cell span and all
        # frame starts land on sublane-tile rows (needs A >= 32)
        self.hop = 3 * n // 4
        self.p_pad = n // 4
        self.planA = _part_plan(A)
        self.planB = _part_plan(LANES)

        # stage twiddle planes, [S, 8, 128, 128] f32: per component
        # (re, im) the 4-tuple (hi, hi_a, hi_b, lo) with (hi_a, hi_b) the
        # PRECOMPUTED Dekker split (ops/pallas_dfft4._split64_pc) — the
        # in-kernel constant-operand multiply then skips the runtime
        # split, bit-identically.  Rows in quarter c carry w^c.
        def stage_planes(plan, part_len, tile):
            out = []
            r_idx = np.arange(LANES)
            a = r_idx % part_len if tile else r_idx
            for radix, h in plan:
                c = (a % (radix * h)) // h
                j = a % h
                ang = 2.0 * np.pi * (c * j) / float(radix * h)
                w = np.exp(-1j * ang)  # forward; inverse = conj in-kernel
                pl8 = np.stack(_split64_pc(w.real) + _split64_pc(w.imag))
                out.append(np.repeat(pl8[:, :, None], LANES, axis=2))
                # quarter masks for roll stages ride along as f32 rows
            return np.stack(out)  # [S, 8, 128, 128]

        self.twA = stage_planes(self.planA, A, tile=True)
        self.twB = stage_planes(self.planB, LANES, tile=False)

        def stage_masks(plan, part_len, tile):
            r_idx = np.arange(LANES)
            a = r_idx % part_len if tile else r_idx
            out = []
            for radix, h in plan:
                c = (a % (radix * h)) // h
                out.append(np.repeat(c.astype(np.float32)[:, None],
                                     LANES, axis=1))
            return np.stack(out)  # [S, 128, 128]

        self.mskA = stage_masks(self.planA, A, tile=True)
        self.mskB = stage_masks(self.planB, LANES, tile=False)

        # four-step twiddle in the pre-transpose [128, 128] layout:
        # row r = t2*A + a holds A-part output position a -> frequency
        # fA[a]; lane = i2.
        fA = _recover_freq_map(self.planA, A)
        a_of_row = np.arange(LANES) % A
        i2 = np.arange(LANES)[None, :]
        fs = np.exp(-2j * np.pi * fA[a_of_row][:, None] * i2 / float(n))
        self.fstep = np.stack(_split64_pc(fs.real) + _split64_pc(fs.imag))

        # spectrum in the post-transpose [B, T2*A] layout:
        # row rb holds B-part frequency fB[rb]; lane t2*A + a holds
        # A-part frequency fA[a]; Y[k] at k = fA + A*fB.
        fB = _recover_freq_map(self.planB, LANES)
        k_idx = (fA[a_of_row][None, :] + A * fB[:, None]) % n
        Hs = np.asarray(H_full, dtype=np.complex128)[k_idx]
        self.h_tw = np.stack(_split64_pc(Hs.real) + _split64_pc(Hs.imag))
        if H_full2 is not None:
            H2 = np.asarray(H_full2, dtype=np.complex128)[k_idx]
            self.h_tw2 = np.stack(_split64_pc(H2.real)
                                  + _split64_pc(H2.imag))
        else:
            self.h_tw2 = None


# ---- kernel-side butterfly forms ----------------------------------------

def _dfsl(a, s, h):
    return (a[0][s : s + h], a[1][s : s + h])


def _dfsl4(b4, s, h):
    return tuple(x[s : s + h] for x in b4)


def _dfcat(parts):
    return (jnp.concatenate([p[0] for p in parts], axis=0),
            jnp.concatenate([p[1] for p in parts], axis=0))


def _r4_direct(re, im, h, wr, wi, inv: bool):
    """Tile-aligned radix-4 butterfly over rows; twiddle-cmul only the
    three quarters that need it (c=0 rows of the planes are unused)."""
    R = re[0].shape[0]
    pr, pi = [], []
    for b0 in range(0, R, 4 * h):
        xs = [(_dfsl(re, b0 + c * h, h), _dfsl(im, b0 + c * h, h))
              for c in range(4)]
        if inv:  # DIT: un-twiddle quarters first (conj twiddle)
            for c in range(1, 4):
                rc, ic = xs[c]
                wrc = _dfsl4(wr, b0 + c * h, h)
                wic = _dfsl4(wi, b0 + c * h, h)
                xs[c] = _cmul_pc(rc, ic, wrc, _neg4(wic))
        (r0, i0), (r1, i1), (r2_, i2_), (r3, i3) = xs
        t0r, t0i = _df_add(r0, r2_), _df_add(i0, i2_)
        t1r, t1i = _df_add(r1, r3), _df_add(i1, i3)
        t2r, t2i = _df_sub(r0, r2_), _df_sub(i0, i2_)
        d1r, d1i = _df_sub(r1, r3), _df_sub(i1, i3)
        if not inv:  # t3 = -i * (x1 - x3)
            t3r, t3i = d1i, _df_neg(d1r)
        else:  # t3 = +i * (x1 - x3)
            t3r, t3i = _df_neg(d1i), d1r
        ys = [
            (_df_add(t0r, t1r), _df_add(t0i, t1i)),
            (_df_add(t2r, t3r), _df_add(t2i, t3i)),
            (_df_sub(t0r, t1r), _df_sub(t0i, t1i)),
            (_df_sub(t2r, t3r), _df_sub(t2i, t3i)),
        ]
        for c in range(4):
            yr, yi = ys[c]
            if not inv and c:
                wrc = _dfsl4(wr, b0 + c * h, h)
                wic = _dfsl4(wi, b0 + c * h, h)
                yr, yi = _cmul_pc(yr, yi, wrc, wic)
            pr.append(yr)
            pi.append(yi)
    return _dfcat(pr), _dfcat(pi)


def _r2_direct(re, im, h, wr, wi, inv: bool):
    R = re[0].shape[0]
    pr, pi = [], []
    for b0 in range(0, R, 2 * h):
        x0r, x0i = _dfsl(re, b0, h), _dfsl(im, b0, h)
        x1r, x1i = _dfsl(re, b0 + h, h), _dfsl(im, b0 + h, h)
        wrc = _dfsl4(wr, b0 + h, h)
        wic = _dfsl4(wi, b0 + h, h)
        if inv:
            x1r, x1i = _cmul_pc(x1r, x1i, wrc, _neg4(wic))
            y0r, y0i = _df_add(x0r, x1r), _df_add(x0i, x1i)
            y1r, y1i = _df_sub(x0r, x1r), _df_sub(x0i, x1i)
        else:
            y0r, y0i = _df_add(x0r, x1r), _df_add(x0i, x1i)
            y1r, y1i = _cmul_pc(_df_sub(x0r, x1r), _df_sub(x0i, x1i),
                                wrc, wic)
        pr += [y0r, y1r]
        pi += [y0i, y1i]
    return _dfcat(pr), _dfcat(pi)


def _shift(v, k):
    """value at row p + k (k may be negative), row axis 0."""
    R = v.shape[0]
    return pltpu.roll(v, (-k) % R, 0)


def _shift_df(a, k):
    return (_shift(a[0], k), _shift(a[1], k))


def _sel(mask, a, b):
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def _sel4(c, v0, v1, v2, v3):
    lo = _sel(c == 0, v0, v1)
    hi = _sel(c == 2, v2, v3)
    return _sel(c < 2, lo, hi)


def _r4_roll(re, im, h, c, wr, wi, inv: bool):
    """Sub-tile radix-4 stage: roll + select network (v2 form, 2-D)."""
    if inv:
        re, im = _cmul_pc(re, im, wr, _neg4(wi))
    R = {k: (_shift_df(re, k * h), _shift_df(im, k * h)) for k in (1, 2, 3)}
    L = {k: (_shift_df(re, -k * h), _shift_df(im, -k * h))
         for k in (1, 2, 3)}

    def combo(comp):
        x = re if comp == 0 else im
        r1, r2, r3 = R[1][comp], R[2][comp], R[3][comp]
        l1, l2, l3 = L[1][comp], L[2][comp], L[3][comp]
        a1 = _sel4(c, x, l1, l2, l3)
        b1 = _sel4(c, r2, _df_neg(r1), x, _df_neg(l1))
        t1 = _df_add(a1, b1)
        a2 = _sel4(c, r1, x, l1, l2)
        b2 = _sel4(c, r3, _df_neg(r2), r1, _df_neg(x))
        t2 = _df_add(a2, b2)
        return t1, t2

    t1r, t2r = combo(0)
    t1i, t2i = combo(1)
    if not inv:  # mu = (1, -i, -1, +i)
        mu_r = _sel4(c, t2r, t2i, _df_neg(t2r), _df_neg(t2i))
        mu_i = _sel4(c, t2i, _df_neg(t2r), _df_neg(t2i), t2r)
    else:  # mu = (1, +i, -1, -i)
        mu_r = _sel4(c, t2r, _df_neg(t2i), _df_neg(t2r), t2i)
        mu_i = _sel4(c, t2i, t2r, _df_neg(t2i), _df_neg(t2r))
    yr = _df_add(t1r, mu_r)
    yi = _df_add(t1i, mu_i)
    if not inv:
        yr, yi = _cmul_pc(yr, yi, wr, wi)
    return yr, yi


def _r2_roll(re, im, h, c, inv: bool):
    """Sub-tile radix-2 stage; only reached at h == 1 where the twiddle
    is trivial (w = 1) for both directions."""
    dn_r, dn_i = _shift_df(re, h), _shift_df(im, h)
    up_r, up_i = _shift_df(re, -h), _shift_df(im, -h)
    mask = c < 0.5
    u_r, u_i = _df_add(re, dn_r), _df_add(im, dn_i)
    v_r, v_i = _df_sub(up_r, re), _df_sub(up_i, im)
    return _sel(mask, u_r, v_r), _sel(mask, u_i, v_i)


def _make_kernel5(plan: "DfFFTConvPlan5", transpose_mode: str,
                  framed: bool = False):
    planA, planB = plan.planA, plan.planB
    SA = len(planA)
    T2, A = plan.T2, plan.A

    if transpose_mode == "mxu":

        def _tr(v):
            # identity built in-kernel (a closed-over constant would be
            # rejected by pallas); exact: each output element is one
            # product with 1.0 plus zeros
            rows = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            eye = (rows == cols).astype(jnp.float32)
            return jax.lax.dot_general(
                v, eye, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    else:
        def _tr(v):
            return v.T

    def _tr_df(a):
        return (_tr(a[0]), _tr(a[1]))

    def apply_part(re, im, part, s0, tw_ref, msk_ref, inv: bool):
        stages = list(enumerate(part))
        if inv:
            stages = list(reversed(stages))
        for idx, (radix, h) in stages:
            s = s0 + idx
            wr = (tw_ref[s, 0], tw_ref[s, 1], tw_ref[s, 2], tw_ref[s, 3])
            wi = (tw_ref[s, 4], tw_ref[s, 5], tw_ref[s, 6], tw_ref[s, 7])
            if h >= TILE:
                if radix == 4:
                    re, im = _r4_direct(re, im, h, wr, wi, inv)
                else:
                    re, im = _r2_direct(re, im, h, wr, wi, inv)
            else:
                c = msk_ref[s]
                if radix == 4:
                    re, im = _r4_roll(re, im, h, c, wr, wi, inv)
                else:
                    re, im = _r2_roll(re, im, h, c, inv)
        return re, im

    def forward(re, im, tw_ref, msk_ref, fs_ref):
        re, im = apply_part(re, im, planA, 0, tw_ref, msk_ref, False)
        fr = (fs_ref[0], fs_ref[1], fs_ref[2], fs_ref[3])
        fi = (fs_ref[4], fs_ref[5], fs_ref[6], fs_ref[7])
        re, im = _cmul_pc(re, im, fr, fi)
        re, im = _tr_df(re), _tr_df(im)
        return apply_part(re, im, planB, SA, tw_ref, msk_ref, False)

    def inverse(re, im, tw_ref, msk_ref, fs_ref, h_ref):
        hr = (h_ref[0], h_ref[1], h_ref[2], h_ref[3])
        hi_ = (h_ref[4], h_ref[5], h_ref[6], h_ref[7])
        re, im = _cmul_pc(re, im, hr, hi_)
        re, im = apply_part(re, im, planB, SA, tw_ref, msk_ref, True)
        re, im = _tr_df(re), _tr_df(im)
        fr = (fs_ref[0], fs_ref[1], fs_ref[2], fs_ref[3])
        fi = (fs_ref[4], fs_ref[5], fs_ref[6], fs_ref[7])
        re, im = _cmul_pc(re, im, fr, _neg4(fi))
        re, im = apply_part(re, im, planA, 0, tw_ref, msk_ref, True)
        return re[0] + re[1], im[0] + im[1]

    def pipeline(re, im, tw_ref, msk_ref, fs_ref, h_ref):
        re, im = forward(re, im, tw_ref, msk_ref, fs_ref)
        return inverse(re, im, tw_ref, msk_ref, fs_ref, h_ref)

    def kernel(x_ref, tw_ref, msk_ref, fs_ref, h_ref, o_ref):
        # block = 2*T2 consecutive frames, interleaved (even frame ->
        # real, odd -> imag of one packed complex transform).  The
        # deinterleave is T2 tile-aligned row slices in VMEM — the
        # wrapper never materializes strided even/odd HBM copies.
        z = jnp.zeros((LANES, LANES), dtype=jnp.float32)
        x2 = x_ref[:].reshape(2 * LANES, LANES)
        re = (jnp.concatenate(
            [x2[2 * t * A : (2 * t + 1) * A] for t in range(T2)]), z)
        im = (jnp.concatenate(
            [x2[(2 * t + 1) * A : (2 * t + 2) * A] for t in range(T2)]), z)
        rr, ii = pipeline(re, im, tw_ref, msk_ref, fs_ref, h_ref)
        o_ref[:] = jnp.concatenate(
            [jnp.concatenate([rr[t * A : (t + 1) * A],
                              ii[t * A : (t + 1) * A]]) for t in range(T2)]
        ).reshape(2 * T2, A, LANES)

    G = 2 * T2
    hr_rows = plan.hop // LANES       # frame advance, in sublane rows
    pr_rows = A - hr_rows             # overlap-save head (P_pad rows)

    def kernel_framed(xm_ref, xt_ref, tw_ref, msk_ref, fs_ref, h_ref,
                      o_ref):
        # Overlap-save framing IN VMEM: the cell's signal window is the
        # main block (G*hop samples) plus the next cell's first P_pad
        # samples (the tail block — a second blocked view of the same
        # HBM array, so pallas double-buffers both and no frame tensor
        # ever exists in HBM).  Frame g = window rows [g*hr, g*hr + A);
        # all offsets are sublane-tile aligned because hop = 3n/4 is a
        # 1024-multiple for A >= 32.
        z = jnp.zeros((LANES, LANES), dtype=jnp.float32)
        win = jnp.concatenate(
            [xm_ref[:].reshape(G * hr_rows, LANES),
             xt_ref[:].reshape(pr_rows, LANES)])
        re = (jnp.concatenate(
            [win[2 * t * hr_rows : 2 * t * hr_rows + A]
             for t in range(T2)]), z)
        im = (jnp.concatenate(
            [win[(2 * t + 1) * hr_rows : (2 * t + 1) * hr_rows + A]
             for t in range(T2)]), z)
        rr, ii = pipeline(re, im, tw_ref, msk_ref, fs_ref, h_ref)
        # only the valid hop-sample tail of each frame leaves VMEM: the
        # output block is already the contiguous overlap-save stream
        o_ref[:] = jnp.concatenate(
            [jnp.concatenate([rr[t * A + pr_rows : (t + 1) * A],
                              ii[t * A + pr_rows : (t + 1) * A]])
             for t in range(T2)]).reshape(1, G * hr_rows, LANES)

    def kernel_framed_poly(xm_ref, xt_ref, tw_ref, msk_ref, fs_ref,
                           h_ref, h2_ref, o_ref):
        # polyphase up=2: the window is the UNSTUFFED signal; one shared
        # forward transform, then two spectrum-multiply + inverse passes
        # (k_even / k_odd).  Output slot p holds (k_p * x) valid streams;
        # the caller interleaves them back to the stuffed grid.
        z = jnp.zeros((LANES, LANES), dtype=jnp.float32)
        win = jnp.concatenate(
            [xm_ref[:].reshape(G * hr_rows, LANES),
             xt_ref[:].reshape(pr_rows, LANES)])
        re = (jnp.concatenate(
            [win[2 * t * hr_rows : 2 * t * hr_rows + A]
             for t in range(T2)]), z)
        im = (jnp.concatenate(
            [win[(2 * t + 1) * hr_rows : (2 * t + 1) * hr_rows + A]
             for t in range(T2)]), z)
        fre, fim = forward(re, im, tw_ref, msk_ref, fs_ref)
        outs = []
        for h_k in (h_ref, h2_ref):
            rr, ii = inverse(fre, fim, tw_ref, msk_ref, fs_ref, h_k)
            outs.append(jnp.concatenate(
                [jnp.concatenate([rr[t * A + pr_rows : (t + 1) * A],
                                  ii[t * A + pr_rows : (t + 1) * A]])
                 for t in range(T2)]))
        o_ref[:] = jnp.stack(outs).reshape(1, 2, G * hr_rows, LANES)

    if framed == "poly":
        return kernel_framed_poly
    return kernel_framed if framed else kernel


@functools.partial(jax.jit, static_argnames=("plan", "interpret",
                                             "transpose_mode"))
def _convolve5(x, plan: "DfFFTConvPlan5", interpret: bool,
               transpose_mode: str):
    """x: [F, n] f32, F a multiple of 2*T2, frames INTERLEAVED (even row
    -> real part, odd row -> imag part of one packed complex frame)."""
    T2, A = plan.T2, plan.A
    n_cells = x.shape[0] // (2 * T2)
    tw = jnp.asarray(np.concatenate([plan.twA, plan.twB]))
    msk = jnp.asarray(np.concatenate([plan.mskA, plan.mskB]))
    fs = jnp.asarray(plan.fstep)
    h = jnp.asarray(plan.h_tw)
    S = tw.shape[0]
    kernel = _make_kernel5(plan, transpose_mode)
    blk = (2 * T2, A, LANES)
    x3 = x.reshape(x.shape[0], A, LANES)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x3.shape, jnp.float32),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(blk, lambda c: (c, 0, 0)),
            pl.BlockSpec((S, 8, LANES, LANES), lambda c: (0, 0, 0, 0)),
            pl.BlockSpec((S, LANES, LANES), lambda c: (0, 0, 0)),
            pl.BlockSpec((8, LANES, LANES), lambda c: (0, 0, 0)),
            pl.BlockSpec((8, LANES, LANES), lambda c: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(blk, lambda c: (c, 0, 0)),
        interpret=interpret,
    )(x3, tw, msk, fs, h)


def df_ols_convolve_pallas5(frames: jnp.ndarray, plan: "DfFFTConvPlan5",
                            interpret: bool = False,
                            transpose_mode: str = None) -> jnp.ndarray:
    """frames: [..., F, N] f32 -> circular convolution with the plan's
    kernel spectrum, real-packed two frames per complex transform.  The
    even/odd packing rides the natural frame order — no strided HBM
    slices on either side of the kernel."""
    if transpose_mode is None:
        import os
        transpose_mode = os.environ.get("R8B_DFFT5_TR", "vector")
    lead = frames.shape[:-1]
    N = frames.shape[-1]
    assert N == plan.n
    total = int(np.prod(lead)) if lead else 1
    x = frames.reshape(total, N)
    T2 = plan.T2
    pad = (-total) % (2 * T2)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    y = _convolve5(x, plan, interpret, transpose_mode)
    y = y.reshape(x.shape[0], N)
    if pad:
        y = y[:total]
    return y.reshape(*lead, N)


@functools.partial(jax.jit, static_argnames=("plan", "n_frames",
                                             "interpret", "transpose_mode"))
def _convolve5_framed(u_p, plan: "DfFFTConvPlan5", n_frames: int,
                      interpret: bool, transpose_mode: str):
    T2, A, n, hop = plan.T2, plan.A, plan.n, plan.hop
    G = 2 * T2
    n_cells_t = -(-n_frames // G)
    C = u_p.shape[0]
    L_need = n_cells_t * G * hop + plan.p_pad
    if u_p.shape[1] < L_need:
        u_p = jnp.pad(u_p, ((0, 0), (0, L_need - u_p.shape[1])))
    elif u_p.shape[1] > L_need:
        u_p = u_p[:, :L_need]
    tw = jnp.asarray(np.concatenate([plan.twA, plan.twB]))
    msk = jnp.asarray(np.concatenate([plan.mskA, plan.mskB]))
    fs = jnp.asarray(plan.fstep)
    h = jnp.asarray(plan.h_tw)
    S = tw.shape[0]
    kernel = _make_kernel5(plan, transpose_mode, framed=True)
    span = G * hop
    sr = span // LANES          # rows per cell span
    pr = plan.p_pad // LANES    # rows per overlap head
    ratio = span // plan.p_pad  # integer: span = 6*T2 * p_pad
    u3 = u_p.reshape(C, L_need // LANES, LANES)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, n_cells_t * sr, LANES),
                                       jnp.float32),
        grid=(C, n_cells_t),
        in_specs=[
            pl.BlockSpec((1, sr, LANES), lambda c, t: (c, t, 0)),
            pl.BlockSpec((1, pr, LANES),
                         lambda c, t: (c, (t + 1) * ratio, 0)),
            pl.BlockSpec((S, 8, LANES, LANES), lambda c, t: (0, 0, 0, 0)),
            pl.BlockSpec((S, LANES, LANES), lambda c, t: (0, 0, 0)),
            pl.BlockSpec((8, LANES, LANES), lambda c, t: (0, 0, 0)),
            pl.BlockSpec((8, LANES, LANES), lambda c, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sr, LANES), lambda c, t: (c, t, 0)),
        interpret=interpret,
    )(u3, u3, tw, msk, fs, h)
    return out.reshape(C, n_cells_t * span)


def df_ols_convolve_pallas5_framed(u_p: jnp.ndarray,
                                   plan: "DfFFTConvPlan5", n_frames: int,
                                   interpret: bool = False,
                                   transpose_mode: str = None
                                   ) -> jnp.ndarray:
    """In-VMEM overlap-save convolution of the front-padded signal.

    u_p: [C, L] f32 with p_pad = n/4 leading zeros already applied;
    returns w [C, >= n_frames*hop] where w[c, t] = (k * u)[c, t] — the
    valid overlap-save stream.  Unlike df_ols_convolve_pallas5, the
    frame tensor never exists in HBM: each grid cell reads its signal
    window as two blocked views of u_p (the main span plus the next
    cell's first p_pad samples) and writes only valid samples, so the
    HBM traffic is one read of u_p (~4/3x for the overlap views) and
    one write of the output."""
    assert framed_supported(plan.n), plan.n
    if transpose_mode is None:
        import os
        transpose_mode = os.environ.get("R8B_DFFT5_TR", "vector")
    return _convolve5_framed(u_p, plan, n_frames, interpret,
                             transpose_mode)


@functools.partial(jax.jit, static_argnames=("plan", "n_frames",
                                             "interpret", "transpose_mode"))
def _convolve5_framed_poly(x_p, plan: "DfFFTConvPlan5", n_frames: int,
                           interpret: bool, transpose_mode: str):
    T2, A, n, hop = plan.T2, plan.A, plan.n, plan.hop
    G = 2 * T2
    n_cells_t = -(-n_frames // G)
    C = x_p.shape[0]
    L_need = n_cells_t * G * hop + plan.p_pad
    if x_p.shape[1] < L_need:
        x_p = jnp.pad(x_p, ((0, 0), (0, L_need - x_p.shape[1])))
    elif x_p.shape[1] > L_need:
        x_p = x_p[:, :L_need]
    tw = jnp.asarray(np.concatenate([plan.twA, plan.twB]))
    msk = jnp.asarray(np.concatenate([plan.mskA, plan.mskB]))
    fs = jnp.asarray(plan.fstep)
    h = jnp.asarray(plan.h_tw)
    h2 = jnp.asarray(plan.h_tw2)
    S = tw.shape[0]
    kernel = _make_kernel5(plan, transpose_mode, framed="poly")
    span = G * hop
    sr = span // LANES
    pr = plan.p_pad // LANES
    ratio = span // plan.p_pad
    u3 = x_p.reshape(C, L_need // LANES, LANES)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, 2, n_cells_t * sr, LANES),
                                       jnp.float32),
        grid=(C, n_cells_t),
        in_specs=[
            pl.BlockSpec((1, sr, LANES), lambda c, t: (c, t, 0)),
            pl.BlockSpec((1, pr, LANES),
                         lambda c, t: (c, (t + 1) * ratio, 0)),
            pl.BlockSpec((S, 8, LANES, LANES), lambda c, t: (0, 0, 0, 0)),
            pl.BlockSpec((S, LANES, LANES), lambda c, t: (0, 0, 0)),
            pl.BlockSpec((8, LANES, LANES), lambda c, t: (0, 0, 0)),
            pl.BlockSpec((8, LANES, LANES), lambda c, t: (0, 0, 0)),
            pl.BlockSpec((8, LANES, LANES), lambda c, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, sr, LANES),
                               lambda c, t: (c, 0, t, 0)),
        interpret=interpret,
    )(u3, u3, tw, msk, fs, h, h2)
    return out.reshape(C, 2, n_cells_t * span)


def df_ols_convolve_pallas5_framed_poly(x_p: jnp.ndarray,
                                        plan: "DfFFTConvPlan5",
                                        n_frames: int,
                                        interpret: bool = False,
                                        transpose_mode: str = None
                                        ) -> jnp.ndarray:
    """Polyphase up=2 in-VMEM overlap-save: x_p is the UNSTUFFED signal
    with p_pad leading zeros; returns wp [C, 2, S] where
    wp[c, p, s] = (k_p * x)[c, s] for the even (p=0) / odd (p=1)
    polyphase kernel components — i.e. the stuffed convolution stream is
    w[2s + p] = wp[p, s].  One forward transform feeds both inverse
    passes, and the kernel reads half the bytes of the stuffed form."""
    assert framed_supported(plan.n) and plan.h_tw2 is not None
    if transpose_mode is None:
        import os
        transpose_mode = os.environ.get("R8B_DFFT5_TR", "vector")
    return _convolve5_framed_poly(x_p, plan, n_frames, interpret,
                                  transpose_mode)
