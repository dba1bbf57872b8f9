"""Sharded push-mode streaming: per-block halo exchange over a Mesh.

The host StreamResampler (models/stream.py) carries the last H input
samples between blocks — the explicit-carry form of the reference's ring
buffers (SURVEY.md §5).  This module shards that loop over a device mesh:

* channels over ``ch`` (no collectives, the DP analog);
* time WITHIN each pushed block over ``t``: device k processes segment k
  of the block.  Its required history (the H samples preceding its
  segment) comes from device k-1 via ``lax.ppermute`` — except device 0,
  whose history is the carry from the previous call (the tail of the last
  block, fed back each call).  This is the per-block halo exchange the
  reference's ring buffers become under context-parallel execution.

Causality makes steady-state blocks need NO right (lookahead) halo: the
chain emits only outputs computable from inputs received so far
(out(n) = n*r - lat_o, the steady-state latency line), so device k's
emission range ends exactly at its own segment's last input.  Only the
FIRST call is special — it must reproduce the true stream start (the
chain is not shift-invariant across the start: per-stage latency skips
re-zero each stage's pre-history, see parallel/sharding.py device 0) — so
call 0 runs a start-program where device 0 takes an unshifted window plus
a right halo from device 1, mid devices take left+right halos, and the
final lat_o outputs (which depend on the *next* block) are withheld and
re-emitted by call 1.

Output equals the unsharded StreamResampler / Resampler.oneshot stream
exactly in f64 and to f32 round-off under f32 (tests/test_sharding_stream.py).

Polynomial-interpolator (irrational-ratio) plans stream sharded too, via
``_PolyShardedStream``: the same [history | segment] window and carry, but
each call the host assigns every device a contiguous output range bounded
by what its window can causally produce (read positions are closed-form in
the absolute output index) and ships positions + spline filter values as
per-call sharded device data.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lengths import chain_out_len
from ..models.resampler import Resampler
from .sharding import chain_input_span, chain_shift_period, split_poly_chain

__all__ = ["ShardedStreamResampler"]


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def ShardedStreamResampler(rs: Resampler, mesh: Mesh, ch_axis: str = "ch",
                           t_axis: str = "t", seg_len: int = 8192):
    """Push-mode streaming over a (ch, t) mesh.

    Feed fixed-size blocks of ``self.block`` input samples per call
    (``process_block``); each call returns the newly computable outputs.
    Rational-ratio plans stream through the period-aligned program
    (:class:`_RationalShardedStream`); polynomial-interpolator plans whose
    interpolator is the final stage stream through the split-chain program
    with per-call host-computed positions (:class:`_PolyShardedStream`).
    Poly plans with a periodic suffix (intermediate-interpolation branch)
    stream unsharded via models.stream.StreamResampler.
    """
    if chain_shift_period(rs.plan) is None:
        return _PolyShardedStream(rs, mesh, ch_axis, t_axis, seg_len)
    return _RationalShardedStream(rs, mesh, ch_axis, t_axis, seg_len)


class _RationalShardedStream:
    """Period-aligned sharded streaming for whole-stepping plans."""

    def __init__(self, rs: Resampler, mesh: Mesh, ch_axis: str = "ch",
                 t_axis: str = "t", seg_len: int = 8192):
        self.rs = rs
        self.mesh = mesh
        self.ch_axis = ch_axis if ch_axis in mesh.axis_names else None
        self.t_axis = t_axis if t_axis in mesh.axis_names else None
        self.n_ch = mesh.shape[ch_axis] if self.ch_axis else 1
        self.n_t = mesh.shape[t_axis] if self.t_axis else 1
        period = chain_shift_period(rs.plan)
        assert period is not None
        p_in, p_out = period
        span = chain_input_span(rs.plan)
        stages = rs.plan.stages

        # --- geometry (all period-aligned) ---------------------------------
        H = _round_up(span + 64, p_in)          # history / left halo
        L = _round_up(max(seg_len, H, 2 * p_in), p_in)  # per-device segment
        # steady-state output lag: n*r - out_len(n) constant past warmup
        n0 = _round_up(3 * (H + L) + span, p_in)
        lat_o = n0 * p_out // p_in - chain_out_len(stages, n0)
        # W0 = emission offset in the steady window [hist H | seg L]
        W0 = H * p_out // p_in - lat_o
        while W0 < 0:
            H += _round_up((-W0) * p_in // p_out + p_in, p_in)
            W0 = H * p_out // p_in - lat_o
        M = L * p_out // p_in                    # per-device outputs/call
        # the steady window must be past warmup (emission on the steady
        # line) and causal: out_len(H + L) == (H+L)*r - lat_o >= W0 + M
        guard = 0
        while chain_out_len(stages, H + L) < W0 + M or M <= lat_o:
            L += _round_up(max(p_in, span), p_in)
            M = L * p_out // p_in
            guard += 1
            assert guard < 64, "cannot reach steady state; plan too deep"
        if H > L:  # halos must come from the immediate neighbor
            L = _round_up(H, p_in)
            M = L * p_out // p_in
        # call-0 right halo: mid/start windows emit [W, W+M) / [0, M) and
        # need inputs chain_in_for_out(W + M) <= H + L + R
        from ..models.lengths import chain_in_for_out
        W = H * p_out // p_in
        R = max(0, chain_in_for_out(stages, W + M) - (H + L))
        R = _round_up(R, p_in) + p_in
        if R > L:
            L = _round_up(R, p_in)
            M = L * p_out // p_in
        self.p_in, self.p_out = p_in, p_out
        self.H, self.L, self.M, self.R = H, L, M, R
        self.W0, self.W, self.lat_o = W0, W, lat_o
        self.block = self.n_t * L                # inputs per process_block
        self.dtype = rs.dtype
        self._chain = rs._chain

        # --- compiled programs ---------------------------------------------
        spec_x = P(self.ch_axis, self.t_axis)
        spec_carry = P(self.ch_axis, None)

        n_t, t_ax = self.n_t, self.t_axis

        def start_prog(xl):
            # call 0: true stream start on device 0, halos elsewhere,
            # last lat_o outputs withheld (host-side trim)
            if n_t > 1:
                left = jax.lax.ppermute(
                    xl[:, L - H :], t_ax,
                    [(i, i + 1) for i in range(n_t - 1)])
                right = jax.lax.ppermute(
                    xl[:, :R], t_ax, [(i, i - 1) for i in range(1, n_t)])
                k = jax.lax.axis_index(t_ax)
                zpad = jnp.zeros((xl.shape[0], H), dtype=xl.dtype)
                win_mid = jnp.concatenate([left, xl, right], axis=1)
                win_start = jnp.concatenate([xl, right, zpad], axis=1)
                window = jnp.where(k == 0, win_start, win_mid)
                y = self._chain(window)
                start = jnp.where(k == 0, 0, W)
                return jax.lax.dynamic_slice(y, (0, start),
                                             (y.shape[0], M))
            window = jnp.concatenate(
                [xl, jnp.zeros((xl.shape[0], R + H), dtype=xl.dtype)],
                axis=1)
            return self._chain(window)[:, :M]

        def steady_prog(xl, carry):
            # carry: [C_loc, H] last H global inputs of the previous call
            if n_t > 1:
                left = jax.lax.ppermute(
                    xl[:, L - H :], t_ax,
                    [(i, i + 1) for i in range(n_t - 1)])
                k = jax.lax.axis_index(t_ax)
                hist = jnp.where(k == 0, carry, left)
            else:
                hist = carry
            window = jnp.concatenate([hist, xl], axis=1)
            y = self._chain(window)
            return y[:, W0 : W0 + M]

        self._jit_start = jax.jit(shard_map(
            start_prog, mesh=mesh, in_specs=(spec_x,), out_specs=spec_x,
            check_vma=False))
        self._jit_steady = jax.jit(shard_map(
            steady_prog, mesh=mesh, in_specs=(spec_x, spec_carry),
            out_specs=spec_x, check_vma=False))
        self._x_sharding = NamedSharding(mesh, spec_x)
        self._c_sharding = NamedSharding(mesh, spec_carry)
        self.reset()

    # -- streaming ----------------------------------------------------------

    def reset(self):
        self._carry = None
        self.n_in = 0
        self.n_out = 0
        self._channels = None
        self._pending = None

    def process_block(self, x) -> jnp.ndarray:
        """x: [C, self.block] -> newly computable outputs (device array,
        sharded over (ch, t) / (ch,)).  First call returns
        n_t*M - lat_o samples, subsequent calls n_t*M."""
        x = jnp.asarray(x, dtype=self.dtype)
        if x.ndim != 2 or x.shape[1] != self.block:
            raise ValueError(
                f"block must be [channels, {self.block}], got {x.shape}")
        if self._channels is None:
            self._channels = int(x.shape[0])
        elif int(x.shape[0]) != self._channels:
            raise ValueError(
                f"block has {int(x.shape[0])} channels, stream started "
                f"with {self._channels}")
        C = x.shape[0]
        C_pad = _round_up(C, self.n_ch)
        if C_pad != C:
            x = jnp.pad(x, ((0, C_pad - C), (0, 0)))
        x = jax.device_put(x, self._x_sharding)
        if self._carry is None:
            y = self._jit_start(x)
            y = y[:, : self.n_t * self.M - self.lat_o]
        else:
            y = self._jit_steady(x, self._carry)
        self._carry = jax.device_put(x[:, -self.H :], self._c_sharding)
        self.n_in += self.block
        self.n_out += int(y.shape[1])
        return y[:C]

    def process(self, x) -> np.ndarray:
        """Arbitrary-length chunks, host re-blocked on the block grid."""
        x = np.asarray(x)
        if x.ndim == 1:
            x = x[None]
        buf = x if self._pending is None else \
            np.concatenate([self._pending, x], axis=1)
        outs = []
        while buf.shape[1] >= self.block:
            outs.append(np.asarray(self.process_block(buf[:, : self.block]),
                                   dtype=np.float64))
            buf = buf[:, self.block :]
        self._pending = buf
        return (np.concatenate(outs, axis=1) if outs
                else np.zeros((x.shape[0], 0), dtype=np.float64))

    def flush(self, out_len: Optional[int] = None) -> np.ndarray:
        """Zero-feed until out_len total outputs (default floor(n_in*r))."""
        import math
        n_real = self.n_in + (0 if self._pending is None
                              else self._pending.shape[1])
        if out_len is None:
            out_len = int(math.floor(
                n_real * self.rs.plan.dst_rate / self.rs.plan.src_rate))
        C = self._channels or 1
        outs = []
        guard = 0
        while self.n_out < out_len and guard < 10000:
            n_pend = 0 if self._pending is None else self._pending.shape[1]
            outs.append(self.process(
                np.zeros((C, self.block - n_pend), dtype=np.float64)))
            guard += 1
        y = (np.concatenate(outs, axis=1) if outs
             else np.zeros((C, 0), dtype=np.float64))
        extra = self.n_out - out_len
        if extra > 0:
            y = y[:, : y.shape[1] - extra]
            self.n_out = out_len
        return y

    # -- checkpoint / resume ------------------------------------------------

    def get_state(self) -> dict:
        return {
            "carry": None if self._carry is None
            else np.asarray(self._carry),
            "n_in": self.n_in, "n_out": self.n_out,
            "channels": self._channels,
            "pending": None if self._pending is None
            else np.asarray(self._pending),
        }

    def set_state(self, st: dict) -> None:
        self._carry = None if st["carry"] is None else jax.device_put(
            jnp.asarray(st["carry"], dtype=self.dtype), self._c_sharding)
        self.n_in = st["n_in"]
        self.n_out = st["n_out"]
        self._channels = st["channels"]
        self._pending = None if st["pending"] is None \
            else np.asarray(st["pending"])


class _PolyShardedStream:
    """Sharded push-mode streaming for polynomial-interpolator plans.

    One SPMD program serves every call: device k's window is
    [history H | segment L], where the history is the previous block's
    global tail (device 0, via the replicated carry) or the left neighbor's
    segment tail (ppermute).  The interpolator's read positions are
    closed-form in the absolute output index (CDSPFracInterpolator.h:
    907-919), so each call the host assigns every device a contiguous
    FINAL-output range bounded by what its own window can causally
    produce, computes the interpolator positions + f64 spline filter
    values backing that range, and passes them as device data padded to
    fixed per-device caps (padded columns read the zero pad with zero
    filters).  A periodic suffix (the intermediate-interpolation branch)
    has shift period (1, sp_out) — pure integer upsampling — so each
    device runs the suffix on its own frac window and takes its outputs
    at a per-device offset w passed as sharded data.  Call 0 is selected
    by a traced flag: device 0's window places the input at the true
    stream origin ([x | zeros]) so the stage latency skips see the
    reference's zero history.
    """

    def __init__(self, rs: Resampler, mesh: Mesh, ch_axis: str = "ch",
                 t_axis: str = "t", seg_len: int = 8192):
        import functools

        from ..models.lengths import chain_in_for_out
        from ..ops.stages import build_exec
        from .sharding import _subplan

        self.rs = rs
        self.mesh = mesh
        self.ch_axis = ch_axis if ch_axis in mesh.axis_names else None
        self.t_axis = t_axis if t_axis in mesh.axis_names else None
        self.n_ch = mesh.shape[ch_axis] if self.ch_axis else 1
        self.n_t = mesh.shape[t_axis] if self.t_axis else 1
        pre, fs, post = split_poly_chain(rs.plan)
        pre_p = chain_shift_period(_subplan(rs.plan, pre)) if pre else (1, 1)
        post_p = chain_shift_period(_subplan(rs.plan, post)) if post \
            else (1, 1)
        if pre_p is None or post_p is None:
            raise ValueError("non-periodic stages around the interpolator")
        assert post_p[0] == 1, \
            "suffix after a polynomial stage must be integer-upsampling"
        pp_in, pp_out = pre_p
        self.sp_out = sp_out = post_p[1]
        span_pre = chain_input_span(_subplan(rs.plan, pre)) if pre else 1
        span_post = chain_input_span(_subplan(rs.plan, post)) if post else 0
        bld = functools.partial(
            build_exec, conv_engine=getattr(rs, "conv_engine", "auto"),
            frac_engine=getattr(rs, "frac_engine", "auto"))
        pre_execs = [bld(s, rs.dtype, rs.precision) for s in pre]
        post_execs = [bld(s, rs.dtype, rs.precision) for s in post]
        self.post = post
        self.fs = fs
        self.fl = fl = fs.filter_len
        self.fll = fl // 2 - 1
        self.in_lat = fs.in_latency
        self.pp_in, self.pp_out = pp_in, pp_out
        self.settle = -(-(span_pre * pp_out) // pp_in) + 2
        self.Wf_in = span_post + 16 if post else 0
        self.Wf_out = self.Wf_in * sp_out
        r_frac = fs.src_rate / fs.dst_rate
        # H must let device k's first assigned output — whose interpolator
        # reads start ~ (suffix warmup + suffix latency)*r_frac + fl
        # before the previous device's coverage limit (itself short of the
        # window end by the prefix latency) — stay past settle; the
        # latency terms are taken from the exact length algebra and the
        # whole hand-off is then VALIDATED by dry-running the per-call
        # assignment below, growing H until it holds
        lam_pre = chain_in_for_out(pre, 1) if pre else 0
        lam_post = chain_in_for_out(post, 1) if post else 0
        reach_mid = fl + 66 + int(math.ceil(
            (self.Wf_in + lam_post) * r_frac))
        H = _round_up(span_pre + 64 + lam_pre
                      + (-(-reach_mid * pp_in // pp_out)), pp_in)
        ratio = rs.plan.dst_rate / rs.plan.src_rate
        self.dtype = rs.dtype
        self._high = (rs.precision == "high"
                      and jnp.dtype(rs.dtype) == jnp.float32)
        for _ in range(10):
            # call-0 device-0 must emit at least the suffix warmup before
            # device 1 takes over (its window start a_k must be >= 0)
            L_min = int(math.ceil((self.Wf_out + sp_out + 64) / ratio)) \
                + span_pre + H if post else 0
            L = _round_up(max(seg_len, H, 2 * pp_in, L_min), pp_in)
            self.H, self.L = H, L
            self.block = self.n_t * L
            self.midlen = chain_out_len(pre, H + L) if pre else H + L
            self.padl = fl + 4
            self.M_cap = int(math.ceil((H + L) * ratio)) + 8
            if post:
                self.Fc_cap = chain_in_for_out(
                    post, self.Wf_out + sp_out + self.M_cap) + 2
                self.plen = chain_out_len(post, self.Fc_cap)
                assert self.plen >= self.Wf_out + sp_out + self.M_cap
            else:
                self.Fc_cap = self.M_cap
            # device-0 call-0 window is [x | zeros]: mid j is true-stream
            # only while its input dependency stays inside the L real
            # samples
            lo, hi = 0, self.midlen
            while lo < hi:
                m = (lo + hi + 1) // 2
                if (chain_in_for_out(pre, m) if pre else m) <= L:
                    lo = m
                else:
                    hi = m - 1
            self.valid_hi0 = lo
            # dry-run the host assignment for the start + two steady calls
            # (the geometry is call-invariant past that, drift bounded by
            # one sample per device)
            self.n_out = 0
            try:
                for c in range(3):
                    _, _, _, counts = self._positions(c)
                    self.n_out += int(sum(counts))
                break
            except RuntimeError:
                H = _round_up(H + max(H // 4, pp_in), pp_in)
        else:
            raise RuntimeError("poly stream geometry did not converge")

        n_t, t_ax, padl = self.n_t, self.t_axis, self.padl
        M_cap = self.M_cap

        def prog(xl, carry, rp, fv, w, is_start):
            rp = rp[0]
            fv = fv[0]
            if n_t > 1:
                left = jax.lax.ppermute(
                    xl[:, L - H:], t_ax,
                    [(i, i + 1) for i in range(n_t - 1)])
                k = jax.lax.axis_index(t_ax)
                hist = jnp.where(k == 0, carry, left)
                start0 = is_start & (k == 0)
            else:
                hist = carry
                start0 = is_start
            win_norm = jnp.concatenate([hist, xl], axis=1)
            win_s = jnp.concatenate(
                [xl, jnp.zeros((xl.shape[0], H), dtype=xl.dtype)], axis=1)
            window = jnp.where(start0, win_s, win_norm)
            mid = window
            for e in pre_execs:
                mid = e.apply(mid)
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
                y = jax.lax.dynamic_slice(
                    y, (jnp.zeros((), dtype=w.dtype), w[0]),
                    (y.shape[0], M_cap))
            return y

        spec_x = P(self.ch_axis, self.t_axis)
        spec_c = P(self.ch_axis, None)
        spec_rp = P(self.t_axis, None)
        spec_fv = P(self.t_axis, None, None)
        spec_w = P(self.t_axis)
        self._jit = jax.jit(shard_map(
            prog, mesh=mesh,
            in_specs=(spec_x, spec_c, spec_rp, spec_fv, spec_w, P()),
            out_specs=spec_x, check_vma=False))
        self._x_sharding = NamedSharding(mesh, spec_x)
        self._c_sharding = NamedSharding(mesh, spec_c)
        self.reset()

    # -- host-side per-call output assignment -----------------------------

    def _max_n_for_read(self, lim: int) -> int:
        """Largest output index n with integer read position s(n) <= lim
        (guarded closed-form search, models/lengths.py semantics)."""
        from ..models.lengths import _frac_read_pos_scalar as srd
        fs = self.fs
        r = fs.src_rate / fs.dst_rate
        shift = fs.init_frac_pos * fs.dst_rate / fs.src_rate
        n = int(math.floor((lim + 1) / r - shift))
        while n >= 0 and srd(fs, n) > lim:
            n -= 1
        while srd(fs, n + 1) <= lim:
            n += 1
        return n

    def _positions(self, call_idx: int):
        """(rp[n_t, Fc_cap] i32, fv, w[n_t] i32, counts[n_t]) for this
        call.  Per device: final-output range [b, b+cnt) mapped to a
        suffix window starting at frac index a with emission offset
        w = b - a*sp_out; interpolator positions computed for frac
        range [a, a+Fc_cap) (edge-clamped past the consumed count)."""
        from ..models.lengths import chain_in_for_out, frac_positions
        n_t, H, L = self.n_t, self.H, self.L
        fl, fll, in_lat = self.fl, self.fll, self.in_lat
        post, sp_out, Wf_out = self.post, self.sp_out, self.Wf_out
        B = self.block
        rp_rows, fv_rows, w_rows, counts = [], [], [], []
        b = self.n_out
        for k in range(n_t):
            start0 = call_idx == 0 and k == 0
            org_in = 0 if start0 else call_idx * B + k * L - H
            org_mid = org_in * self.pp_out // self.pp_in
            mid_hi = org_mid + (self.valid_hi0 if start0 else self.midlen)
            # frac outputs producible from this window (exclusive bound):
            # max n whose full read window [s-fll+in_lat, +fl) fits
            lim = mid_hi - fl + fll - in_lat
            n_frac_hi = self._max_n_for_read(lim) + 1
            if post:
                if start0:
                    a, w = 0, 0
                else:
                    a = (b - Wf_out) // sp_out
                    w = b - a * sp_out
                    if a < 0:
                        raise RuntimeError(
                            "suffix warmup precedes stream start; "
                            "increase seg_len")
                navail = n_frac_hi - a
                lo, hi = 0, self.M_cap
                while lo < hi:
                    m = (lo + hi + 1) // 2
                    if chain_in_for_out(post, w + m) <= navail:
                        lo = m
                    else:
                        hi = m - 1
                cnt = lo
                fc_need = chain_in_for_out(post, w + cnt)
            else:
                a, w = b, 0
                cnt = min(max(n_frac_hi - b, 0), self.M_cap)
                fc_need = cnt
            if fc_need > 0:
                s, xf = frac_positions(self.fs, a, fc_need)
                rel = in_lat + s - fll - org_mid + self.padl
                if rel.min() < 0 or rel.max() + fl > self.padl + self.midlen:
                    raise RuntimeError("poly stream read out of window")
                if not start0 and rel.min() < self.padl + self.settle:
                    raise RuntimeError("poly stream read before settle")
                tb = np.asarray(self.fs.bank.table, dtype=np.float64)
                fr = xf * self.fs.bank.fracs
                fti = np.floor(fr).astype(np.int64)
                t = (fr - fti)[:, None]
                flt = tb[fti, :, 0] + (tb[fti, :, 1] + tb[fti, :, 2] * t) * t
            else:
                rel = np.zeros(0, dtype=np.int64)
                flt = np.zeros((0, fl), dtype=np.float64)
            pad = self.Fc_cap - fc_need
            rel = np.concatenate([rel, np.zeros(pad, dtype=np.int64)])
            flt = np.concatenate([flt, np.zeros((pad, fl))], axis=0)
            rp_rows.append(rel)
            fv_rows.append(flt)
            w_rows.append(w)
            counts.append(cnt)
            b += cnt
        rp = np.stack(rp_rows).astype(np.int32)
        flt = np.stack(fv_rows)
        if self._high:
            hi_ = flt.astype(np.float32)
            lo_ = (flt - hi_.astype(np.float64)).astype(np.float32)
            fv = np.stack([hi_, lo_], axis=-1)
        else:
            fv = flt.astype(np.dtype(self.dtype))
        return rp, fv, np.asarray(w_rows, dtype=np.int32), counts

    # -- streaming ---------------------------------------------------------

    def reset(self):
        self._carry = None
        self.n_in = 0
        self.n_out = 0
        self._call = 0
        self._channels = None
        self._pending = None

    def process_block(self, x) -> jnp.ndarray:
        """x: [C, self.block] -> newly computable outputs (device array)."""
        x = jnp.asarray(x, dtype=self.dtype)
        if x.ndim != 2 or x.shape[1] != self.block:
            raise ValueError(
                f"block must be [channels, {self.block}], got {x.shape}")
        if self._channels is None:
            self._channels = int(x.shape[0])
        elif int(x.shape[0]) != self._channels:
            raise ValueError(
                f"block has {int(x.shape[0])} channels, stream started "
                f"with {self._channels}")
        C = x.shape[0]
        C_pad = _round_up(C, self.n_ch)
        if C_pad != C:
            x = jnp.pad(x, ((0, C_pad - C), (0, 0)))
        x = jax.device_put(x, self._x_sharding)
        rp, fv, w, counts = self._positions(self._call)
        carry = self._carry if self._carry is not None else jax.device_put(
            jnp.zeros((C_pad, self.H), dtype=self.dtype), self._c_sharding)
        y = self._jit(x, carry, jnp.asarray(rp), jnp.asarray(fv),
                      jnp.asarray(w), jnp.asarray(self._call == 0))
        self._carry = jax.device_put(x[:, -self.H:], self._c_sharding)
        self.n_in += self.block
        self._call += 1
        parts = [y[:C, k * self.M_cap: k * self.M_cap + counts[k]]
                 for k in range(self.n_t) if counts[k]]
        self.n_out += int(sum(counts))
        if not parts:
            return jnp.zeros((C, 0), dtype=self.dtype)
        return parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=1)

    def process(self, x) -> np.ndarray:
        """Arbitrary-length chunks, host re-blocked on the block grid."""
        x = np.asarray(x)
        if x.ndim == 1:
            x = x[None]
        buf = x if self._pending is None else \
            np.concatenate([self._pending, x], axis=1)
        outs = []
        while buf.shape[1] >= self.block:
            outs.append(np.asarray(self.process_block(buf[:, :self.block]),
                                   dtype=np.float64))
            buf = buf[:, self.block:]
        self._pending = buf
        return (np.concatenate(outs, axis=1) if outs
                else np.zeros((x.shape[0], 0), dtype=np.float64))

    def flush(self, out_len: Optional[int] = None) -> np.ndarray:
        """Zero-feed until out_len total outputs (default floor(n_in*r))."""
        n_real = self.n_in + (0 if self._pending is None
                              else self._pending.shape[1])
        if out_len is None:
            out_len = int(math.floor(
                n_real * self.rs.plan.dst_rate / self.rs.plan.src_rate))
        C = self._channels or 1
        outs = []
        guard = 0
        while self.n_out < out_len and guard < 10000:
            n_pend = 0 if self._pending is None else self._pending.shape[1]
            outs.append(self.process(
                np.zeros((C, self.block - n_pend), dtype=np.float64)))
            guard += 1
        y = (np.concatenate(outs, axis=1) if outs
             else np.zeros((C, 0), dtype=np.float64))
        extra = self.n_out - out_len
        if extra > 0:
            y = y[:, : y.shape[1] - extra]
            self.n_out = out_len
        return y

    # -- checkpoint / resume ------------------------------------------------

    def get_state(self) -> dict:
        return {
            "carry": None if self._carry is None
            else np.asarray(self._carry),
            "n_in": self.n_in, "n_out": self.n_out, "call": self._call,
            "channels": self._channels,
            "pending": None if self._pending is None
            else np.asarray(self._pending),
        }

    def set_state(self, st: dict) -> None:
        self._carry = None if st["carry"] is None else jax.device_put(
            jnp.asarray(st["carry"], dtype=self.dtype), self._c_sharding)
        self.n_in = st["n_in"]
        self.n_out = st["n_out"]
        self._call = st["call"]
        self._channels = st["channels"]
        self._pending = None if st["pending"] is None \
            else np.asarray(st["pending"])
