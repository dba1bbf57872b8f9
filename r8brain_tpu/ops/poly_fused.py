"""Fused [upsampling convolver -> polynomial-mode interpolator] executor:
the poly-chain analog of ops/fused.py (NEXT r2 item 4, "mid-chain poly
fusion").

The polynomial chain (e.g. 44.1 kHz -> 96.001 kHz: 2X convolver, poly
fractional interpolator, 2X convolver — CDSPResampler.h:229-324) spends
most of its MACs in the standalone front convolver: the Toeplitz engine
costs ~K/up MACs per *oversampled* sample, of which the interpolator
consumes only dst/src'.  Composing the pair gives, for frac output n
(read position w_n on the convolver-output grid, spline filter flt_n):

    y[n] = sum_q  Comp_n[q] * x[q],
    Comp_n[q] = sum_i flt_n[i] * k[(w_n + i) - up*q]

i.e. a drifting banded operator over the ORIGINAL input at ~(K+fl)/up
MACs per output — ~2.5-3x fewer than the two-stage pipeline, with no
intermediate [C, up*N] array in HBM.

Execution reuses the gather-free banded machinery of
ops/stages.FracPolyExec._apply_banded: pick a rational convergent S/G of
the per-output input advance, chunk groups to a drift budget, read
frames as reshape views at the uniform stride S, and contract each chunk
with its operator R'[m, w, g].  The only new ingredient is the operator
build: R' rows are dense composite bands (width ~(K+fl)/up), constructed
on device as

    R'[m, w, g] = sum_i flt[m, g, i] * K2D[e(m, g) + i, w]

where K2D[e, w] = k[e - up*w] is a small static host table and
e(m, g) = w_n - up*(A' + m*S) is a bounded host-side index — fl fused
gather-accumulate passes, no [M, fl] data gather, no giant operator
literal.

precision="high" adds the kernel-representation residual pass of the
other matmul engines (ops/stages.py truncate_residual rationale): K2D is
split into f32 hi + lo parts and the lo operator is contracted at bf16
DEFAULT precision (residual magnitude ~2^-25 relative, so bf16 rounding
sits ~2^-33 below the signal).

The interpolator reads hard zeros below its stream start while the
composite formula extends the convolver into its latency zone, so the
few affected leading outputs get the same start-correction as
ops/fused.FusedUpExec (delta matmul against the input prefix).

Reference parity: CDSPFracInterpolator.h:1069-1179 (convolve2 is the
reference's FAST poly path) + CDSPBlockConvolver.h content formula; the
fusion itself has no reference counterpart (the reference streams
sample-serially and cannot fold stages).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import jax
import jax.numpy as jnp

from ..models.lengths import chain_out_len, frac_positions, stage_out_len
from ..models.plan import ConvStage, FracStage
from .stages import banded_contract, chunk_drift_groups

__all__ = ["FusedPolyExec"]


class FusedPolyExec:
    def __init__(self, conv: ConvStage, frac: FracStage, dtype=jnp.float32,
                 precision: str = "fast"):
        assert conv.down == 1 and not frac.is_whole
        self.conv = conv
        self.frac = frac
        self.stages = (conv, frac)
        self.dtype = jnp.dtype(dtype)
        self.precision = precision if self.dtype == jnp.float32 else "fast"

        up = conv.up
        self.up = up
        k64 = np.asarray(conv.filt.kernel, dtype=np.float64)
        self.k64 = k64
        self.K = K = k64.shape[0]
        self.off = conv.offset
        tab = np.asarray(frac.bank.table, dtype=np.float64)  # [rows, fl, 3]
        self.tab64 = tab
        cast = np.float64 if self.dtype == jnp.float64 else np.float32
        self.c0 = tab[:, :, 0].astype(cast)
        self.c1 = tab[:, :, 1].astype(cast)
        self.c2 = tab[:, :, 2].astype(cast)
        self.fracs = frac.bank.fracs
        self.fl = fl = frac.filter_len
        self.fll = fl // 2 - 1
        self.in_lat = frac.in_latency

        # rational convergent of the per-output advance on the INPUT grid
        # (frac positions live on the convolver-output grid at up*x-rate)
        r_in = (frac.src_rate / frac.dst_rate) / up
        g_max = 160
        fr = Fraction(r_in).limit_denominator(g_max)
        if fr.denominator >= 8:
            km = max(1, min(g_max // fr.denominator,
                            -(-128 // fr.denominator)))
            self.G = fr.denominator * km
            self.S = fr.numerator * km
        else:
            self.G = 128
            self.S = int(round(128 * r_in))
        self.drift = abs(self.G * r_in - self.S)
        self.slack = 6
        self.ngrp_max = max(8, int(self.slack / max(self.drift, 1e-12)))
        # static operator-row budget: e <= (K-1) + up*(intra-group ramp
        # S-1 + drift slack), plus fl for the i offset
        self.E = K + fl + up * (self.S + self.slack)
        self.W = -(-(self.E // up + 2) // 8) * 8

        # K2D[e, w] = k[e - up*w] (zero outside) — the static table the
        # device operator build gathers its composite bands from
        e_i = np.arange(self.E)[:, None]
        w_i = np.arange(self.W)[None, :]
        kk = e_i - up * w_i
        valid = (kk >= 0) & (kk < K)
        K2D = np.where(valid, k64[np.clip(kk, 0, K - 1)], 0.0)
        if self.dtype == jnp.float64:
            self.K2D = K2D
            self.K2D_lo = None
        else:
            self.K2D = K2D.astype(np.float32)
            if self.precision == "high":
                self.K2D_lo = (K2D - self.K2D.astype(np.float64)).astype(
                    np.float32)
            else:
                self.K2D_lo = None

        self._build_corr()

    # -- host-side position algebra ------------------------------------

    def _positions(self, M: int):
        """(w[int64] composite read base, fti[int32], t[poly coord]) for
        outputs [0, M): w_n = s_n - fll + in_latency + conv.offset."""
        s, f = frac_positions(self.frac, 0, M)
        fr_ = f * self.fracs
        fti = np.floor(fr_).astype(np.int64)
        t = (fr_ - fti).astype(np.float64)
        w = s - self.fll + self.in_lat + self.off
        cast = np.float32 if self.dtype == jnp.float32 else np.float64
        return w, s, fti.astype(np.int32), t.astype(cast)

    def _build_corr(self):
        """Stream-start correction (ops/fused.py FusedUpExec rationale):
        for leading outputs whose interpolator window dips below the
        convolver-output stream start (s_n - fll + i < 0 reads a hard
        zero in the two-stage chain), subtract the composite formula's
        spurious contribution — a small f64 host matrix vs the input
        prefix."""
        up, K, fl, fll = self.up, self.K, self.fl, self.fll
        k64, tab = self.k64, self.tab64
        corr_rows, corr_js = [], []
        n = 0
        while True:
            s, f = frac_positions(self.frac, n, 1)
            s_n = int(s[0])
            if s_n - fll >= 0:
                break
            fr_ = float(f[0]) * self.fracs
            fti = int(np.floor(fr_))
            t = fr_ - fti
            B = (tab[fti, :, 0] + (tab[fti, :, 1] + tab[fti, :, 2] * t) * t)
            w_n = s_n - fll + self.in_lat + self.off
            qw = (w_n + fl - 1) // up + 1
            if qw > 0:
                row = np.zeros(qw, dtype=np.float64)
                for i in range(min(fl, fll - s_n)):  # window below start
                    for q in range(qw):
                        v = w_n + i - up * q
                        if 0 <= v < K:
                            row[q] += B[i] * k64[v]
                if np.any(row):
                    corr_rows.append(row)
                    corr_js.append(n)
            n += 1
        if corr_js:
            qw_max = max(r.shape[0] for r in corr_rows)
            Cm = np.zeros((len(corr_js), qw_max), dtype=np.float64)
            for r_i, row in enumerate(corr_rows):
                Cm[r_i, : row.shape[0]] = row
            self.corr_js = np.asarray(corr_js, dtype=np.int32)
            self.corr = Cm.astype(
                np.float64 if self.dtype == jnp.float64 else np.float32)
        else:
            self.corr_js = None

    def out_len(self, n_in: int) -> int:
        return chain_out_len(self.stages, n_in)

    # -- device path ----------------------------------------------------

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        C, N = x.shape
        M = self.out_len(N)
        if M <= 0:
            return jnp.zeros((C, 0), dtype=self.dtype)
        up, K, fl, G, S, W, E = (self.up, self.K, self.fl, self.G, self.S,
                                 self.W, self.E)
        n_grp = -(-M // G)
        Mp = n_grp * G
        w_np, s_np, fti_np, t_np = self._positions(Mp)

        # window starts on the input grid (earliest q with a nonzero
        # composite coefficient): e stays in [K - up, E) by construction
        q_lo = -(-(w_np - K + 1) // up)
        sg = q_lo.reshape(n_grp, G)
        wg = w_np.reshape(n_grp, G)

        # band indices e live on the zero-stuffed (up-scaled) grid; a
        # leading chunk base can dip below x[0] (zeros), handled by the
        # shift the helper returns
        chunks, need_len, pad_l = chunk_drift_groups(
            sg, wg, up, S, fl, E, self.ngrp_max, W)

        pad_r = max(0, need_len - (N + pad_l))
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (pad_l, pad_r)))
        c0t = jnp.asarray(self.c0)
        c1t = jnp.asarray(self.c1)
        c2t = jnp.asarray(self.c2)
        K2D = jnp.asarray(self.K2D)
        K2D_lo = (jnp.asarray(self.K2D_lo) if self.K2D_lo is not None
                  else None)
        fti2 = fti_np.reshape(n_grp, G)
        t2 = t_np.reshape(n_grp, G)

        def build_R(tbl, flt, e_d):
            R = None
            for i in range(fl):
                term = flt[..., i : i + 1] * jnp.take(tbl, e_d + i, axis=0)
                R = term if R is None else R + term
            return jnp.swapaxes(R, 1, 2)  # [nloc, W, G]

        outs = []
        for g0, nloc, A, e_h in chunks:
            # the position arrays are trace-time constants; without a
            # barrier XLA constant-folds the whole operator build into
            # ~[nloc*G, W] literals (hundreds of MB, minutes of compile,
            # OOM at production channel counts) — the barrier keeps the
            # build a cheap fused runtime pass instead
            fti_c, t_c, e_d = jax.lax.optimization_barrier(
                (jnp.asarray(fti2[g0 : g0 + nloc]),
                 jnp.asarray(t2[g0 : g0 + nloc]),
                 jnp.asarray(e_h)))
            t_c = t_c[..., None]
            flt = c0t[fti_c] + (c1t[fti_c] + c2t[fti_c] * t_c) * t_c
            xc = xp[:, A:]
            R = build_R(K2D, flt, e_d)
            o = banded_contract(xc, R, nloc, S, W,
                                jax.lax.Precision.HIGHEST)
            if K2D_lo is not None:
                R_lo = build_R(K2D_lo, flt, e_d)
                o = o + banded_contract(xc, R_lo, nloc, S, W,
                                        jax.lax.Precision.DEFAULT)
            outs.append(o.reshape(C, nloc * G))
        y = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        if self.corr_js is not None:
            qw = self.corr.shape[1]
            xw = x.astype(self.dtype)[:, :qw]
            if xw.shape[1] < qw:
                xw = jnp.pad(xw, ((0, 0), (0, qw - xw.shape[1])))
            delta = xw @ jnp.asarray(self.corr).T
            y = y.at[:, self.corr_js].add(-delta.astype(self.dtype))
        return y[:, :M]
