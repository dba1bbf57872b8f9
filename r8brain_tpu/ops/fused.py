"""Fused two-stage executor: upsampling convolver + whole-stepping
interpolator as ONE per-phase composite matmul.

The most common audio chain (e.g. 44.1 kHz -> 96 kHz: 2X convolver then
147/160 interpolator, CDSPResampler.h:218-227) is a cascade of two LTI+
resampling stages.  Composing them analytically gives, for each output
phase j in [0, p_out), a single composite FIR over the *input* stream at
stride p_in:

    y[m*p_out + j] = sum_q C_j[q] * x[m*p_in + q + a_j]
    C_j[q] = G_j(t_j - up*q),   G_j(v) = sum_i bank[f_j][i] * k[v + i]

derived by substituting the convolver's content formula
(y_c[r] = sum_m k[m] u[r + off - m], u = zero-stuff(x)) into the
interpolator's (y[n] = sum_i bank[f_n][i] y_c[s_n - fll + i]); the phase
residue t_j mod up is constant per j because the per-supercycle advance
p_in*up is divisible by up.

Benefits vs the two-stage pipeline (measured motivation in NEXT.md):
~1.5x fewer MACs per output (no Toeplitz band zeros, composite length
(K + up*fl)/up vs K/up + fl at separate rates), no intermediate
[C, 2*N] array in HBM, and one matmul epilogue instead of two.

Applicability: plan == [ConvStage(up, down=1), FracStage(whole)].  The
executor is sample-exact vs the two-stage oracle chain by construction
(validated in tests/test_fused.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.lengths import chain_out_len
from ..models.plan import ConvStage, FracStage, Plan
from .stages import RESIDUAL_PRECISION, _framed_matmul

__all__ = ["can_fuse", "FusedUpExec"]


def _pair_fusable(a, b) -> bool:
    # every planner branch that puts a convolver directly before the
    # interpolator uses down == 1 (exact-ratio downsampling bypasses the
    # interpolator, CDSPResampler.h:337-391), so this covers all plans
    return (isinstance(a, ConvStage) and a.down == 1
            and isinstance(b, FracStage) and b.is_whole)


def can_fuse(plan: Plan) -> bool:
    s = plan.stages
    return len(s) == 2 and _pair_fusable(s[0], s[1])


def _poly_pair_fusable(a, b, dtype, engine, poly) -> bool:
    # fused poly composite (ops/poly_fused.py): f32 matmul engines only —
    # f64 keeps the bit-exact two-stage gather chain.  NOT fused by
    # default: the composite saves 2.9x MACs but its on-device operator
    # build (24 gather-accumulate passes over ~170 MB) measured 971 Mrops
    # vs the two-stage banded chain's 2190 on chip — opt in with
    # Resampler(fused="poly") until the build beats the gathers.
    return (poly and isinstance(a, ConvStage) and a.down == 1
            and isinstance(b, FracStage) and not b.is_whole
            and jnp.dtype(dtype) == jnp.float32
            and engine in ("auto", "toeplitz", "matmul"))


def fuse_stage_list(plan: Plan, dtype, precision, build_exec,
                    engine: str = "auto", poly: bool = False):
    """Executor list for the plan with every adjacent [conv(up, down=1),
    whole-frac] pair replaced by a FusedUpExec, every run of >= 2
    consecutive half-band upsamplers by an HBUpCascadeExec (f32; one
    polyphase matmul, ops/hb_cascade.py), and every [conv(down=1),
    poly-frac] pair by a FusedPolyExec on f32.  Mid-chain pairs are valid:
    a pair's input stream starts at absolute zero of ITS input (upstream
    stages emit from stream start), which is exactly the fused executor's
    stream-start semantics.  Returns None if nothing fuses."""
    stages = plan.stages
    execs = []
    i = 0
    fused_any = False
    from .hb_cascade import HBUpCascadeExec, hb_up_run_fusable
    while i < len(stages):
        hb_run = hb_up_run_fusable(stages, i, dtype, engine)
        if hb_run:
            execs.append(HBUpCascadeExec(stages[i : i + hb_run], dtype))
            fused_any = True
            i += hb_run
        elif i + 1 < len(stages) and _pair_fusable(stages[i], stages[i + 1]):
            sub = Plan(plan.src_rate, plan.dst_rate, plan.trans_band,
                       plan.atten, plan.phase,
                       (stages[i], stages[i + 1]),
                       stages[i + 1].latency_frac_out)
            execs.append(FusedUpExec(sub, dtype, precision, engine=engine))
            fused_any = True
            i += 2
        elif (i + 1 < len(stages)
              and _poly_pair_fusable(stages[i], stages[i + 1], dtype,
                                     engine, poly)):
            from .poly_fused import FusedPolyExec
            execs.append(FusedPolyExec(stages[i], stages[i + 1], dtype,
                                       precision))
            fused_any = True
            i += 2
        else:
            execs.append(build_exec(stages[i], dtype, precision))
            i += 1
    return execs if fused_any else None


class FusedUpExec:
    def __init__(self, plan: Plan, dtype=jnp.float32,
                 precision: str = "fast", engine: str = "auto",
                 kx: int = None):
        assert can_fuse(plan)
        # "auto"/"matmul": segmented-view framed matmul (XLA);  "pallas":
        # VMEM-resident kernel via the adaptive-Q tiling (any stride)
        self.engine = "matmul" if engine in ("auto", "toeplitz") else engine
        conv: ConvStage = plan.stages[0]
        frac: FracStage = plan.stages[1]
        self.plan = plan
        self.stages = plan.stages
        self.dtype = jnp.dtype(dtype)
        self.precision = precision if self.dtype == jnp.float32 else "fast"

        up = conv.up
        k = np.asarray(conv.filt.kernel, dtype=np.float64)
        K = k.shape[0]
        bank = np.asarray(frac.bank.table, dtype=np.float64)  # [O_f, fl]
        fl = frac.filter_len
        fll = fl // 2 - 1
        I_f, O_f, W0 = frac.in_step, frac.out_step, frac.init_frac_pos_w

        # full-chain shift period
        from ..parallel.sharding import chain_shift_period
        period = chain_shift_period(plan)
        assert period is not None
        p_in, p_out = period
        # frac-input advance per supercycle must be whole and a multiple
        # of up (constant phase residue per j)
        assert (p_out * I_f) % O_f == 0
        assert (p_out * I_f // O_f) % up == 0
        self.p_in, self.p_out = p_in, p_out

        # per-phase composite kernels over the input grid
        a = np.zeros(p_out, dtype=np.int64)
        width = (K + up * fl) // up + 2
        C = np.zeros((p_out, width), dtype=np.float64)
        for j in range(p_out):
            g = W0 + j * I_f
            s_j = g // O_f + frac.in_latency
            f_j = g % O_f
            t_j = s_j - fll + conv.offset
            B = bank[f_j]
            # G_j(v) = sum_i B[i] k[v + i], nonzero for v in
            # [-(fl-1), K); x[q] has coefficient G_j(t_j - up*q)
            # valid q: t_j - up*q in [-(fl-1), K)  ->
            #   q in ((t_j - K)/up, (t_j + fl - 1)/up]
            q_lo = -(-(t_j - K + 1) // up)  # ceil((t_j-K+1)/up)
            q_hi = (t_j + fl - 1) // up
            a[j] = q_lo
            for d, q in enumerate(range(q_lo, q_hi + 1)):
                v = t_j - up * q
                i0 = max(0, -v)
                i1 = min(fl, K - v)
                if i1 > i0:
                    C[j, d] = np.dot(B[i0:i1], k[v + i0 : v + i1])
        # extend the supercycle by the smallest k that makes the matmul
        # column count k*p_out a lane multiple (free output reshape on TPU;
        # costs (k-1)*p_in extra rows = a few % flops).  kx can be forced
        # for layout experiments (e.g. kx=8 makes p_in sublane-aligned).
        if kx is None:
            kx = 1
            for cand in range(1, 5):
                if (cand * p_out) % 128 == 0:
                    kx = cand
                    break
        self.kx = kx
        a_min = int(a.min())
        D = int((a.max() - a_min)) + width + (kx - 1) * p_in
        sk = np.zeros((kx * p_out, D), dtype=np.float64)
        for c_off in range(kx):
            for j in range(p_out):
                o = int(a[j] - a_min) + c_off * p_in
                sk[c_off * p_out + j, o : o + width] = C[j]
        p_in, p_out = kx * p_in, kx * p_out
        self.p_in, self.p_out = p_in, p_out
        self.a0 = a_min
        self.D = D

        # Stream-start correction: the composite extends the convolver
        # formula into its discarded latency zone, but the real chain's
        # interpolator reads hard zeros below its (post-skip) stream start
        # (the same pre-ring effect as parallel/sharding.py device 0).
        # Subtract the spurious contribution for the few affected outputs:
        #   delta[n] = sum_{i: r'_i < 0} bank[f_n][i] * yc[r'_i + in_lat]
        # where r'_i = g_n//O_f - fll + i and yc is the convolver formula.
        corr_rows = []
        corr_js = []
        n = 0
        while True:
            # walk OUTPUT indices until the interpolator window clears the
            # stream start — for small supercycle advances (p_in*up < fll)
            # this spans multiple supercycles, not just the first
            g = W0 + n * I_f
            s_nolat = g // O_f
            if s_nolat - fll >= 0:
                break
            j = n
            B = bank[g % O_f]
            t_j = (s_nolat + frac.in_latency) - fll + conv.offset
            qw = (t_j + fl - 1) // up + 1  # x window [0, qw)
            if qw > 0:
                row = np.zeros(qw, dtype=np.float64)
                for i in range(min(fl, fll - s_nolat)):  # r'_i < 0
                    # yc[r'_i + in_lat] = sum_q k[(t_j + i) - up*q] x[q]
                    for q in range(qw):
                        v = t_j + i - up * q
                        if 0 <= v < K:
                            row[q] += B[i] * k[v]
                if np.any(row):
                    corr_rows.append(row)
                    corr_js.append(j)
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
        self.skT = sk.T.astype(
            np.float64 if self.dtype == jnp.float64 else np.float32)
        if self.precision == "high":
            from .stages import truncate_residual
            hi = sk.T.astype(np.float32)
            self.skT_lo = (sk.T - hi.astype(np.float64)).astype(np.float32)
            self.lo_r0, self.skT_lo_t = truncate_residual(
                self.skT_lo, float(np.abs(hi).max()))
        self.pad_l = max(0, -a_min)

    def out_len(self, n_in: int) -> int:
        return chain_out_len(self.stages, n_in)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        C_, N = x.shape
        M = self.out_len(N)
        if M <= 0:
            return jnp.zeros((C_, 0), dtype=self.dtype)
        p_in, p_out = self.p_in, self.p_out
        n_cyc = -(-M // p_out)
        x = x.astype(self.dtype)
        # one pad through to the framed-matmul buffer ((n_cyc + n_seg) *
        # p_in past a0): its internal pad (a full-array copy) never runs
        n_seg = -(-self.D // p_in)
        need = self.a0 + (n_cyc + n_seg) * p_in
        pad_r = max(0, need - N)
        xp = jnp.pad(x, ((0, 0), (self.pad_l, pad_r)))
        xp = xp[:, self.a0 + self.pad_l :]
        skT = jnp.asarray(self.skT)
        y = None
        if self.engine == "pallas":
            from .pallas_frac import choose_tiles, frac_whole_pallas
            Q, CT = choose_tiles(p_in, self.D, p_out, C_,
                                 has_lo=self.precision == "high")
            if CT:
                n_blocks = -(-n_cyc // Q)
                span_need = (n_blocks * Q - 1) * p_in + self.D
                if xp.shape[1] < span_need:
                    xp2 = jnp.pad(xp, ((0, 0),
                                       (0, span_need - xp.shape[1])))
                else:
                    xp2 = xp
                lo = (jnp.asarray(self.skT_lo)
                      if self.precision == "high" else None)
                y = frac_whole_pallas(xp2, skT, Q, p_in, self.D, p_out,
                                      CT=CT, skT_lo=lo)[:, : n_cyc * p_out]
            else:
                from ..utils.trace import trace
                trace("fused_pallas_fallback", C=C_, stride=p_in,
                      fallback="matmul")
        if y is None:
            lo = ((self.lo_r0, jnp.asarray(self.skT_lo_t))
                  if self.precision == "high" else None)
            out = _framed_matmul(xp, skT, n_cyc, p_in, T_lo=lo)
            y = out.reshape(C_, n_cyc * p_out)
        if self.corr_js is not None:
            qw = self.corr.shape[1]
            xw = x[:, :qw]
            if xw.shape[1] < qw:
                xw = jnp.pad(xw, ((0, 0), (0, qw - xw.shape[1])))
            delta = xw @ jnp.asarray(self.corr).T  # [C, n_aff]
            y = y.at[:, self.corr_js].add(-delta.astype(self.dtype))
        return y[:, :M]
