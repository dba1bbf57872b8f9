"""Multi-device sharded execution: channels x time-blocks over a Mesh.

The reference library has NO distributed layer — concurrency is "one
resampler object per channel, caller's threads" (README.md:52-55).  The
TPU-native scale-out (SURVEY.md §2 note, §7 step 4) is invented here:

* **Channel sharding** (the data-parallel analog): the [channels, time]
  batch is split over the ``ch`` mesh axis.  Stages are channel-independent,
  so this needs zero collectives.
* **Time-block sharding** (the context/sequence-parallel analog): the time
  axis is split over the ``t`` mesh axis.  Each device computes a contiguous
  segment of the *output* stream from its input shard plus two halos
  exchanged with its neighbors via ``lax.ppermute`` over ICI:
    - a left halo (history: the overlap-save / ring-buffer carry state of
      the reference, CDSPBlockConvolver.h:303-305, CDSPHBUpsampler.h:735-747)
    - a right halo (lookahead: the latency lead the chain needs before its
      first output, CDSPResampler.h:476-484).
  Device 0's missing left halo and device n-1's missing right halo arrive as
  ppermute's zero fill — exactly the reference's zero history at stream
  start and zero-flush at stream end.

Correctness rests on shift-invariance of the planned chain: shifting the
input by p_in samples shifts the output by p_out = p_in*dst/src samples with
identical filter phases (all stage decimation/interpolation phases cycle).
``chain_shift_period`` computes the minimal such (p_in, p_out); halos and
per-device segment sizes are rounded to these periods so every device runs
the *same compiled program* on shifted data.

Plans containing a polynomial-mode fractional interpolator (irrational
ratios) have no finite whole-chain period, but every stage AROUND the
interpolator is periodic and the interpolator's read positions are a
closed-form function of the absolute output index (the reference's
resettable-counter timing, CDSPFracInterpolator.h:907-919: p_n =
(n + shift) * src/dst exactly, no carried recurrence).  Time sharding
therefore splits the chain at the poly stage: the periodic prefix runs
under the same halo machinery; each device's read positions and f64 spline
filter values are computed host-side for ITS absolute output range and
passed as device arrays sharded over the time axis — one SPMD program,
per-shard data, only the existing input halo crosses the boundary; the
periodic suffix (intermediate-interpolation plans) is window-aligned on
its own period.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.lengths import (chain_in_for_out, chain_out_len,
                              frac_positions)
from ..models.plan import ConvStage, FracStage, HBDownStage, HBUpStage, Plan
from ..models.resampler import Resampler
from ..ops.stages import build_exec

__all__ = ["chain_shift_period", "chain_input_span", "split_poly_chain",
           "ShardedResampler"]


def split_poly_chain(plan: Plan):
    """(pre_stages, frac_spec, post_stages) around the single poly-mode
    interpolator, or None when the plan has none."""
    idx = [i for i, s in enumerate(plan.stages)
           if isinstance(s, FracStage) and not s.is_whole]
    if not idx:
        return None
    assert len(idx) == 1, "plans carry at most one fractional interpolator"
    i = idx[0]
    return plan.stages[:i], plan.stages[i], plan.stages[i + 1:]


def _subplan(plan: Plan, stages) -> Plan:
    return Plan(plan.src_rate, plan.dst_rate, plan.trans_band, plan.atten,
                plan.phase, tuple(stages), plan.latency_frac)


def chain_shift_period(plan: Plan) -> Optional[Tuple[int, int]]:
    """Minimal (p_in, p_out) integer shift-invariance period of the chain,
    or None when the plan contains a polynomial-mode interpolator."""
    stages = plan.stages
    if any(isinstance(s, FracStage) and not s.is_whole for s in stages):
        return None
    p = 1
    for _ in range(16):
        q = Fraction(p)
        mult = 1
        for s in stages:
            if isinstance(s, ConvStage):
                q = q * s.up / s.down
            elif isinstance(s, HBUpStage):
                q = q * 2
            elif isinstance(s, HBDownStage):
                q = q / 2
            elif isinstance(s, FracStage):
                q = q * s.out_step / s.in_step
            if q.denominator != 1:
                mult = mult * q.denominator // math.gcd(mult, q.denominator)
        if mult == 1 and q.denominator == 1:
            return p, int(q)
        p *= mult
    return None


def chain_input_span(plan: Plan) -> int:
    """Conservative dependency width: any output sample depends on at most
    this many consecutive input samples."""
    span = 1
    for s in reversed(plan.stages):
        if isinstance(s, ConvStage):
            span = ((span - 1) * s.down + s.filt.kernel_len) // s.up + 2
        elif isinstance(s, HBUpStage):
            span = span // 2 + 2 * s.hb.num_taps + 2
        elif isinstance(s, HBDownStage):
            span = 2 * span + 4 * s.hb.num_taps + 2
        elif isinstance(s, FracStage):
            span = int(math.ceil(span * s.src_rate / s.dst_rate)) \
                + s.filter_len + 2
    return span


def shard_geometry(plan: Plan, period: Optional[Tuple[int, int]],
                   span: int, n_t: int, out_len: int, n_in: int):
    """Per-device (M_s, L_s, H, W, R) for ``n_t`` time shards: M_s
    outputs / L_s useful inputs per device, H left halo (input span),
    W warmup outputs recomputed from the halo, R right halo.  Shared by
    ShardedResampler and tools/halo_model.py, so the published scaling
    model is computed from the exact production geometry."""
    if n_t == 1:
        # channel-only: one time block covering the whole input
        M_s = out_len
        L_s = max(n_in, chain_in_for_out(plan.stages, out_len))
        R = max(0, chain_in_for_out(plan.stages, out_len) - L_s)
        return M_s, L_s, 0, 0, R
    p_in, p_out = period
    M_s = _round_up(_round_up(out_len, n_t) // n_t, p_out)
    # cover both the output-derived input need and the full given input
    # (outputs near out_len reach up to lat_in real samples past
    # out_len * p_in/p_out; truncating real input would wrongly feed
    # the last device zeros)
    L_s = _round_up(max(M_s * p_in // p_out, -(-n_in // n_t)), p_in)
    M_s = L_s * p_out // p_in
    H = _round_up(span + 64, p_in)
    W = H * p_out // p_in
    need = chain_in_for_out(plan.stages, W + M_s)
    R = max(0, need - (H + L_s))
    R = _round_up(R, p_in) + p_in
    if H > L_s or R > L_s:
        # halos must come from the immediate neighbor only
        grow = _round_up(max(H, R), p_in)
        L_s = max(L_s, grow)
        M_s = L_s * p_out // p_in
    return M_s, L_s, H, W, R


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class ShardedResampler:
    """Executes a Resampler's chain over a 1-or-2-axis device mesh.

    mesh axes: ``ch_axis`` shards channels (no collectives), ``t_axis``
    shards time blocks (two ppermute halo exchanges per call).  Either axis
    may be absent or size 1.
    """

    def __init__(self, rs: Resampler, mesh: Mesh, ch_axis: str = "ch",
                 t_axis: str = "t"):
        self.rs = rs
        self.mesh = mesh
        self.ch_axis = ch_axis if ch_axis in mesh.axis_names else None
        self.t_axis = t_axis if t_axis in mesh.axis_names else None
        self.n_ch = mesh.shape[ch_axis] if self.ch_axis else 1
        self.n_t = mesh.shape[t_axis] if self.t_axis else 1
        self.period = chain_shift_period(rs.plan)
        self._poly = None
        if self.period is None:
            # polynomial-interpolator plan: time sharding splits the chain
            # at the poly stage (see module docstring)
            pre, fs, post = split_poly_chain(rs.plan)
            pre_p = chain_shift_period(_subplan(rs.plan, pre)) \
                if pre else (1, 1)
            post_p = chain_shift_period(_subplan(rs.plan, post)) \
                if post else (1, 1)
            if pre_p is None or post_p is None:
                raise ValueError(
                    "plan has non-periodic stages around the polynomial "
                    "interpolator; channel sharding only")
            import functools
            bld = functools.partial(
                build_exec, conv_engine=getattr(rs, "conv_engine", "auto"),
                frac_engine=getattr(rs, "frac_engine", "auto"))
            self._poly = {
                "pre": pre, "fs": fs, "post": post,
                "pre_p": pre_p, "post_p": post_p,
                "span_pre": chain_input_span(_subplan(rs.plan, pre))
                if pre else 1,
                "span_post": chain_input_span(_subplan(rs.plan, post))
                if post else 0,
                "pre_execs": [bld(s, rs.dtype, rs.precision) for s in pre],
                "post_execs": [bld(s, rs.dtype, rs.precision) for s in post],
            }
        self.span = chain_input_span(rs.plan)
        self._jit_cache = {}

    # -- geometry --------------------------------------------------------

    def _geometry(self, out_len: int, n_in: int):
        """Per-device segment/halo sizes for a target output length."""
        return shard_geometry(self.rs.plan, self.period, self.span,
                              self.n_t, out_len, n_in)

    # -- execution -------------------------------------------------------

    def _build_local(self, M_s, L_s, H, W, R):
        n_t, t_axis = self.n_t, self.t_axis
        chain = self.rs._chain

        def local(xl):  # [C_loc, L_s]
            if n_t > 1:
                left = jax.lax.ppermute(
                    xl[:, L_s - H:], t_axis,
                    [(i, i + 1) for i in range(n_t - 1)])
                right = jax.lax.ppermute(
                    xl[:, :R], t_axis,
                    [(i, i - 1) for i in range(1, n_t)])
                # Mid-stream devices: [left-halo | own | right-halo], then
                # discard W warmup outputs.  Device 0 must compute the TRUE
                # stream start: the chain is not shift-invariant there — the
                # latency skip discards the filters' pre-ring, and a zero
                # history would materialize ghost pre-ring samples into the
                # zone downstream stages read (the reference's stream
                # semantics start all buffers at absolute zero,
                # CDSPBlockConvolver.h:94-158).  So device 0 uses an
                # unshifted window and takes outputs from position 0.
                k = jax.lax.axis_index(t_axis)
                zpad = jnp.zeros((xl.shape[0], H), dtype=xl.dtype)
                win_mid = jnp.concatenate([left, xl, right], axis=1)
                win_start = jnp.concatenate([xl, right, zpad], axis=1)
                window = jnp.where(k == 0, win_start, win_mid)
                y = chain(window)
                start = jnp.where(k == 0, 0, W)
                return jax.lax.dynamic_slice(
                    y, (0, start), (y.shape[0], M_s))
            right = jnp.zeros((xl.shape[0], R), dtype=xl.dtype)
            window = jnp.concatenate([xl, right], axis=1)
            return chain(window)[:, W : W + M_s]

        return local

    # -- polynomial (irrational-ratio) time sharding ----------------------

    def _poly_geometry(self, out_len: int, n_in: int):
        """Host-side geometry + per-shard position/filter data for the
        split-chain poly program.  Returns (geom dict, relpos[n_t, Fc]
        int32, flt[n_t, Fc, fl] dtype)."""
        P_ = self._poly
        pre, fs, post = P_["pre"], P_["fs"], P_["post"]
        pp_in, pp_out = P_["pre_p"]
        sp_in, sp_out = P_["post_p"]
        span_pre, span_post = P_["span_pre"], P_["span_post"]
        n_t = self.n_t
        fl = fs.filter_len
        fll = fl // 2 - 1
        in_lat = fs.in_latency

        ratio = self.rs.plan.dst_rate / self.rs.plan.src_rate
        Wf_in = _round_up(span_post + 16, sp_in) if post else 0
        Wf_out = Wf_in * sp_out // sp_in if post else 0

        L_s = _round_up(max(-(-n_in // n_t), 2 * pp_in), pp_in)
        H = _round_up(span_pre + 64, pp_in)
        R = H
        settle = -(-(span_pre * pp_out) // pp_in) + 2
        for _ in range(64):
            # outputs per shard track the shard's own input segment (k*M_s
            # reads land near k*Lmid); n_t*M_s >= out_len by construction
            M_s = _round_up(max(-(-out_len // n_t),
                                int(math.ceil(L_s * ratio))), sp_out)
            if post:
                Ff = M_s * sp_in // sp_out
                Fc = chain_in_for_out(post, Wf_out + M_s) + sp_in
            else:
                Ff, Fc = M_s, M_s
            F0 = [0] + [k * Ff - Wf_in for k in range(1, n_t)]

            # absolute frac read positions per shard (closed form,
            # CDSPFracInterpolator.h:907-919) + edge-clamp past each
            # shard's consumed range (window-relative): the post window
            # emits [0, Wf_out_k + end_k), so positions past
            # chain_in_for_out(post, that) feed only discarded outputs
            # and must not inflate the right halo
            s_rows, t_rows = [], []
            for k in range(n_t):
                s, xf = frac_positions(fs, F0[k], Fc)
                end_k = min(out_len, (k + 1) * M_s) - k * M_s
                if post:
                    need = chain_in_for_out(post, max(end_k, 0)
                                            + (Wf_out if k else 0))
                else:
                    need = max(end_k, 0)
                v = int(np.clip(need, 1, Fc))
                s[v:] = s[v - 1]
                xf[v:] = xf[v - 1]
                s_rows.append(s)
                t_rows.append(xf)
            s_all = np.stack(s_rows)        # [n_t, Fc] int64
            xf_all = np.stack(t_rows)       # [n_t, Fc] f64

            W_pre = H * pp_out // pp_in
            midlen = chain_out_len(pre, H + L_s + R) if pre \
                else H + L_s + R
            Lmid = L_s * pp_out // pp_in
            # relpos[k, n] = in_lat + s - fll - origin_k ; origin_0 = 0,
            # origin_k = k*Lmid - W_pre
            origin = np.array([0] + [k * Lmid - W_pre
                                     for k in range(1, n_t)])[:, None]
            relpos = in_lat + s_all - fll - origin
            if n_t > 1 and relpos[1:].min() < settle:
                d = settle - int(relpos[1:].min())
                H += _round_up(-(-d * pp_in // pp_out) + pp_in, pp_in)
                if H > L_s:
                    L_s = _round_up(H, pp_in)
                continue
            if relpos.max() + fl > midlen:
                d = int(relpos.max()) + fl - midlen
                R += _round_up(-(-d * pp_in // pp_out) + pp_in, pp_in)
                if R > L_s:
                    L_s = _round_up(R, pp_in)
                continue
            if H > L_s or R > L_s:
                L_s = _round_up(max(H, R), pp_in)
                continue
            break
        else:
            raise RuntimeError("poly shard geometry did not converge")
        padl = max(0, -int(relpos.min()))
        relpos = relpos + padl

        # spline filter values in host f64 (same evaluation as
        # FracPolyExec's host-literal path); under precision="high" the
        # f64 value is carried as an (hi, lo) two-float pair so the
        # sharded gather-dot can accumulate in df32 and stay in the
        # -141 dB class on any backend
        tb = np.asarray(fs.bank.table, dtype=np.float64)  # [rows, fl, 3]
        fr = xf_all * fs.bank.fracs
        fti = np.floor(fr).astype(np.int64)
        t = (fr - fti)[..., None]
        flt = tb[fti, :, 0] + (tb[fti, :, 1] + tb[fti, :, 2] * t) * t

        geom = dict(M_s=M_s, L_s=L_s, H=H, R=R, Fc=Fc, padl=padl,
                    Wf_out=Wf_out, fl=fl)
        dt = np.dtype(self.rs.dtype)
        if self.rs.precision == "high" and dt == np.float32:
            hi = flt.astype(np.float32)
            lo = (flt - hi.astype(np.float64)).astype(np.float32)
            fv = np.stack([hi, lo], axis=-1)  # [n_t, Fc, fl, 2]
        else:
            fv = flt.astype(dt)
        return geom, relpos.astype(np.int32), fv

    def _build_local_poly(self, geom):
        n_t, t_axis = self.n_t, self.t_axis
        P_ = self._poly
        pre_execs, post_execs = P_["pre_execs"], P_["post_execs"]
        M_s, L_s, H, R = geom["M_s"], geom["L_s"], geom["H"], geom["R"]
        padl, fl, Wf_out = geom["padl"], geom["fl"], geom["Wf_out"]

        def local(xl, rp, fv):  # [C, L_s], [1, Fc] i32, [1, Fc, fl]
            rp = rp[0]
            fv = fv[0]
            if n_t > 1:
                left = jax.lax.ppermute(
                    xl[:, L_s - H:], t_axis,
                    [(i, i + 1) for i in range(n_t - 1)])
                right = jax.lax.ppermute(
                    xl[:, :R], t_axis,
                    [(i, i - 1) for i in range(1, n_t)])
                k = jax.lax.axis_index(t_axis)
                zpad = jnp.zeros((xl.shape[0], H), dtype=xl.dtype)
                win_mid = jnp.concatenate([left, xl, right], axis=1)
                win_start = jnp.concatenate([xl, right, zpad], axis=1)
                window = jnp.where(k == 0, win_start, win_mid)
            else:
                window = jnp.concatenate(
                    [xl, jnp.zeros((xl.shape[0], R + H), dtype=xl.dtype)],
                    axis=1)
                k = 0
            mid = window
            for e in pre_execs:
                mid = e.apply(mid)
            if padl:
                mid = jnp.concatenate(
                    [jnp.zeros((mid.shape[0], padl), dtype=mid.dtype), mid],
                    axis=1)
            if fv.ndim == 3:  # df32 accumulation (precision="high")
                from ..ops.dfloat import df_add, df_add_f, df_mul_ff
                acc = None
                for i in range(fl):
                    xi = jnp.take(mid, rp + i, axis=1)
                    p = df_mul_ff(xi, fv[None, :, i, 0])
                    p = df_add_f(p, xi * fv[None, :, i, 1])
                    acc = p if acc is None else df_add(acc, p)
                y = acc[0] + acc[1]
            else:
                y = None
                for i in range(fl):
                    c = fv[None, :, i] * jnp.take(mid, rp + i, axis=1)
                    y = c if y is None else y + c
            if post_execs:
                for e in post_execs:
                    y = e.apply(y)
                start = jnp.where(k == 0, 0, Wf_out) if n_t > 1 else 0
                y = jax.lax.dynamic_slice(
                    y, (0, start), (y.shape[0], M_s))
            else:
                y = y[:, :M_s]
            return y

        return local

    def _oneshot_poly(self, x, out_len: int) -> jnp.ndarray:
        C, N = x.shape
        geom, relpos, flt = self._poly_geometry(out_len, N)
        M_s, L_s = geom["M_s"], geom["L_s"]
        T = self.n_t * L_s
        C_pad = _round_up(C, self.n_ch)
        x = jnp.pad(x, ((0, C_pad - C), (0, max(0, T - N))))[:, :T]

        from ..utils.trace import trace
        trace("sharded_oneshot_poly", n_ch=self.n_ch, n_t=self.n_t,
              M_s=M_s, L_s=L_s, halo_left=geom["H"], halo_right=geom["R"],
              frac_per_shard=geom["Fc"])
        key = ("poly", M_s, L_s, geom["H"], geom["R"], geom["Fc"],
               geom["padl"], geom["Wf_out"])
        jfn = self._jit_cache.get(key)
        if jfn is None:
            spec_x = P(self.ch_axis, self.t_axis)
            spec_rp = P(self.t_axis, None)
            spec_fv = P(self.t_axis, None, None)
            local = self._build_local_poly(geom)
            jfn = jax.jit(shard_map(
                local, mesh=self.mesh, in_specs=(spec_x, spec_rp, spec_fv),
                out_specs=P(self.ch_axis, self.t_axis), check_vma=False))
            self._jit_cache[key] = jfn
        y = jfn(x, jnp.asarray(relpos), jnp.asarray(flt))
        return y[:C, :out_len]

    def oneshot(self, x, out_len: Optional[int] = None) -> jnp.ndarray:
        """Sharded offline conversion.  x: [C, N] (host or device array)."""
        x = jnp.asarray(x, dtype=self.rs.dtype)
        C, N = x.shape
        if out_len is None:
            out_len = self.rs.default_out_len(N)
        if not self.rs.plan.stages:
            y = x[:, :out_len]
            return jnp.pad(y, ((0, 0), (0, max(0, out_len - N))))
        if self._poly is not None and self.n_t > 1:
            # split-chain program with per-shard position data; the
            # channel-only case keeps the (faster) whole-chain banded path
            return self._oneshot_poly(x, out_len)

        M_s, L_s, H, W, R = self._geometry(out_len, N)
        T = self.n_t * L_s
        C_pad = _round_up(C, self.n_ch)
        x = jnp.pad(x, ((0, C_pad - C), (0, max(0, T - N))))[:, :T]

        from ..utils.trace import trace
        trace("sharded_oneshot", n_ch=self.n_ch, n_t=self.n_t,
              M_s=M_s, L_s=L_s, halo_left=H, warmup=W, halo_right=R)
        key = (M_s, L_s, H, W, R)
        jfn = self._jit_cache.get(key)
        if jfn is None:
            spec_in = P(self.ch_axis, self.t_axis)
            spec_out = P(self.ch_axis, self.t_axis)
            local = self._build_local(M_s, L_s, H, W, R)
            jfn = jax.jit(shard_map(local, mesh=self.mesh,
                                    in_specs=(spec_in,),
                                    out_specs=spec_out, check_vma=False))
            self._jit_cache[key] = jfn
        y = jfn(x)
        return y[:C, :out_len]
