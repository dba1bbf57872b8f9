"""Push-mode streaming resampler (CDSPResampler::process equivalent).

The reference's `process(ip, l, op&)` is sample-serial with internal ring
buffers (CDSPResampler.h:559-575).  The TPU-native streaming model instead
runs the whole-array stage chain over fixed-size *blocks* with a carried
device-side history window:

* Plans with a finite shift-invariance period (every rational rate pair —
  see parallel/sharding.chain_shift_period) stream with period-aligned
  blocks: after the first block, every call runs ONE jitted program of
  static shape emitting exactly ``block * dst/src`` samples.  The carried
  state is the last H input samples (H >= the chain's dependency span) —
  the explicit-carry equivalent of the reference's per-stage ring buffers
  (SURVEY.md §5 checkpoint state).
* Plans with a polynomial-mode fractional interpolator stream the rational
  prefix the same way and drive the interpolator with host-computed
  absolute read positions passed as device arguments each block (the
  resettable-counter timing of CDSPFracInterpolator.h:907-919 lives on the
  host), emitting into a fixed-capacity buffer with a valid-count.  This
  covers the poly stage FINAL (e.g. 44100->96001) and MID-CHAIN — the
  intermediate-interpolation branch, conv->poly->conv->hb_up (e.g.
  44100->352800.3, CDSPResampler.h:286-324) — because every suffix the
  planner emits after a poly stage is pure integer upsampling (period-1
  shift-invariant), so the poly stage's varying per-block output counts
  re-block freely onto the suffix grid (host pending buffer, or the
  device-resident ring of _SufDeviceReblock).  A non-integer-upsampling
  suffix would be the one unstreamable shape; the constructor asserts it
  never occurs.

The streamed output is bit-identical to oneshot over the same total input:
tests/test_stream.py asserts equality for mixed chunk sizes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stages import FracPolyExec, build_exec
from .lengths import chain_out_len, frac_positions, stage_out_len
from .plan import FracStage, Plan
from .resampler import Resampler

__all__ = ["StreamResampler"]


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class _PeriodStream:
    """Streaming executor for a chain with shift period (p_in, p_out)."""

    def __init__(self, rs: Resampler, stages, block_len: int,
                 p_in: int, p_out: int, span: int):
        # mirror the parent resampler's executor choice: fused composite
        # matmuls when it fused (the fused exec is sample-exact vs the
        # two-stage chain, so all period/warmup algebra is unchanged)
        from ..ops.fused import FusedUpExec, fuse_stage_list
        if (len(stages) == len(rs.plan.stages)
                and all(a is b for a, b in zip(stages, rs.plan.stages))):
            self.execs = rs.execs  # identical chain: reuse, don't rebuild
        else:
            import functools
            bld = functools.partial(
                build_exec, conv_engine=getattr(rs, "conv_engine", "auto"),
                frac_engine=getattr(rs, "frac_engine", "auto"))
            from ..ops.hb_cascade import HBUpCascadeExec
            fused_parent = any(isinstance(e, (FusedUpExec, HBUpCascadeExec))
                               for e in rs.execs)
            sub = Plan(rs.plan.src_rate, rs.plan.dst_rate,
                       rs.plan.trans_band, rs.plan.atten, rs.plan.phase,
                       tuple(stages), rs.plan.latency_frac)
            execs = (fuse_stage_list(sub, rs.dtype, rs.precision, bld,
                                     engine=getattr(rs, "conv_engine",
                                                    "auto"))
                     if fused_parent else None)
            self.execs = execs if execs is not None else \
                [bld(s, rs.dtype, rs.precision) for s in stages]
        self.stages = stages
        self.dtype = rs.dtype
        self.p_in, self.p_out = p_in, p_out
        L = _round_up(max(block_len, 2 * p_in), p_in)
        H = _round_up(span + 64, p_in)
        # steady-state latency in output samples: n*r - out_len(n) is
        # constant for period-aligned n past warmup
        n0 = _round_up(H + L + span, p_in)
        lat_o = n0 * p_out // p_in - chain_out_len(stages, n0)
        # the first block must complete the chain warmup: its emission
        # count must already be on the steady-state line, else the steady
        # slice would mis-place every subsequent block (silently shifted
        # output for too-small block_len)
        guard = 0
        while (chain_out_len(stages, L) != L * p_out // p_in - lat_o
               or chain_out_len(stages, L) <= 0):
            L += _round_up(max(p_in, span), p_in)
            guard += 1
            assert guard < 64, "cannot reach steady state; plan too deep"
        W0 = H * p_out // p_in - lat_o
        while W0 < 0:
            H += _round_up(-W0 * p_in // p_out + p_in, p_in)
            W0 = H * p_out // p_in - lat_o
        # The first block must carry the FULL real history: if L < H the
        # first carried hist would be left-zero-padded, silently
        # switching the stream head to MID-STREAM (zero-prefixed)
        # semantics — which differ from the fresh-start chain in the
        # first ~span outputs at stop-band level, because later stages
        # read their predecessors' pre-start look-ahead spill that a
        # fresh start never materializes (found by the round-5 streaming
        # fuzzer executor at -83 dB on a deep hb+frac downsampling plan;
        # the f64 oracle shows the same head transient, so this is chain
        # semantics, not arithmetic).  Growing the effective block is
        # the documented behavior for too-small block_len.
        if L < H:
            L = _round_up(H, p_in)
            guard = 0
            while (chain_out_len(stages, L) != L * p_out // p_in - lat_o
                   or chain_out_len(stages, L) <= 0):
                L += _round_up(max(p_in, span), p_in)
                guard += 1
                assert guard < 64, "cannot reach steady state; plan too deep"
        self.L, self.H, self.W0 = L, H, W0
        self.out_per_block = L * p_out // p_in
        #: round 5: the df32 inter-stage carry applies WITHIN each
        #: block's chain application (blocks recompute from the carried
        #: raw f32 input window, so block boundaries add no rounding) —
        #: the streaming guarantee class matches the oneshot's
        self.df_carry = getattr(rs, "df_carry", False)
        self._jit_first = jax.jit(self._chain)
        self._jit_steady = jax.jit(self._steady)
        self.reset(None)

    def _chain(self, x):
        if self.df_carry:
            from ..ops.stages import _df_collapse_input
            h, l, n = x, None, x.shape[1]
            for i, e in enumerate(self.execs):
                last = i == len(self.execs) - 1
                if hasattr(e, "apply_df"):
                    h, l, n = e.apply_df(h, l, n, emit_pair=not last)
                else:
                    h = e.apply(_df_collapse_input(h, l, n))
                    l = None
                    n = h.shape[1]
            if l is not None:
                h = h + l
            return h if h.shape[1] == n else h[:, :n]
        for e in self.execs:
            x = e.apply(x)
        return x

    def _steady(self, hist, block):
        window = jnp.concatenate([hist, block], axis=1)
        y = self._chain(window)
        return (y[:, self.W0 : self.W0 + self.out_per_block],
                window[:, -self.H :])

    def reset(self, channels: Optional[int]):
        self.hist = None
        self.n_in = 0

    def process_block_device(self, block: jnp.ndarray) -> jnp.ndarray:
        """block: [C, L] device array -> emitted outputs as a DEVICE array
        (no host round trip; the carry stays resident)."""
        assert block.shape[1] == self.L
        if self.hist is None:
            # true stream start: run the chain from absolute zero
            y = self._jit_first(block)
            window = block
            self.hist = window[:, -self.H :] if self.L >= self.H else \
                jnp.pad(window, ((0, 0), (self.H - self.L, 0)))[:, -self.H :]
            self.n_in = self.L
            return y
        y, self.hist = self._jit_steady(self.hist, block)
        self.n_in += self.L
        return y

    def process_block(self, block: jnp.ndarray) -> np.ndarray:
        """block: [C, L] device/host array -> emitted outputs (numpy)."""
        return np.asarray(self.process_block_device(jnp.asarray(
            block, dtype=self.dtype)))

    # -- k-block batched serving ------------------------------------------

    def _steady_k(self, k: int, hist, xk):
        """One jitted program for k consecutive steady blocks: lax.scan
        carries the [C, H] history, so the chain body compiles ONCE and
        the k-block call costs a single dispatch (the per-block form pays
        one tunnel round trip per block — NEXT.md round-6 #2)."""
        C = xk.shape[0]
        blocks = jnp.transpose(
            xk.reshape(C, k, self.L), (1, 0, 2))  # [k, C, L]

        def body(h, xb):
            y, h2 = self._steady(h, xb)
            return h2, y

        h2, ys = jax.lax.scan(body, hist, blocks)
        out = jnp.transpose(ys, (1, 0, 2)).reshape(
            C, k * self.out_per_block)
        return out, h2

    def _jit_steady_k(self, k: int):
        if not hasattr(self, "_steady_k_jits"):
            self._steady_k_jits = {}
        if k not in self._steady_k_jits:
            import functools
            self._steady_k_jits[k] = jax.jit(
                functools.partial(self._steady_k, k))
        return self._steady_k_jits[k]

    def process_blocks_device(self, xk: jnp.ndarray, k: int) -> jnp.ndarray:
        """xk: [C, k*L] device array of k consecutive blocks -> emitted
        outputs as ONE device array.  Bit-identical to k successive
        process_block_device calls (the scan body IS _steady)."""
        assert xk.shape[1] == k * self.L
        if self.hist is None:
            # stream head keeps its dedicated (fresh-start) program
            y0 = self.process_block_device(xk[:, : self.L])
            if k == 1:
                return y0
            yk, self.hist = self._jit_steady_k(k - 1)(
                self.hist, xk[:, self.L :])
            self.n_in += (k - 1) * self.L
            return jnp.concatenate([y0, yk], axis=1)
        y, self.hist = self._jit_steady_k(k)(self.hist, xk)
        self.n_in += k * self.L
        return y


class _PolyTailStream:
    """Streaming final-stage polynomial interpolator with host-side timing."""

    def __init__(self, spec: FracStage, dtype, guarantee: bool = False):
        self.spec = spec
        self.exec = FracPolyExec(spec, dtype)
        self.dtype = dtype
        #: guarantee-config parent (df32 carry): the banded serving tail
        #: ships host-f64-evaluated spline values as bf16 SLICES per
        #: block and contracts in the error-free split-operand form, so
        #: the tail holds the guarantee stage class (~-152) instead of
        #: the device-f32 spline-eval class (~-140)
        self.guarantee = bool(guarantee)
        fl = spec.filter_len
        self.fll = fl // 2 - 1
        r = spec.src_rate / spec.dst_rate
        self.H = fl + int(math.ceil(r)) + 8
        self._jits = {}
        self.reset()

    def reset(self):
        self.n_in = 0  # post-skip input samples received
        self.m_out = 0  # outputs emitted
        self.skip_left = self.spec.in_latency
        self.buf = None  # device [C, H] history (absolute end = n_in)

    def _apply(self, window, start_rel, fti, t):
        ex = self.exec
        c0 = jnp.asarray(ex.c0)[fti]
        c1 = jnp.asarray(ex.c1)[fti]
        c2 = jnp.asarray(ex.c2)[fti]
        flt = c0 + (c1 + c2 * t[:, None]) * t[:, None]
        C = window.shape[0]
        y = jnp.zeros((C, start_rel.shape[0]), dtype=self.dtype)
        for i in range(ex.fl):
            y = y + flt[None, :, i] * jnp.take(window, start_rel + i, axis=1)
        return y

    def _jit_for(self, win_len: int, cap: int):
        key = (win_len, cap)
        if key not in self._jits:
            self._jits[key] = jax.jit(self._apply)
        return self._jits[key]

    def _apply_banded_serve(self, n_grp: int, W: int, cap: int, window,
                            a0, off, fti, t):
        """Serving-path banded (MXU) tail: one [W] x [W, G] matmul per
        G-output group against an operator built ON DEVICE from per-
        block position args — static shapes, so every block reuses ONE
        compiled program (the per-tap jnp.take form runs at gather
        speed, ~10x under DMA bandwidth on TPU; measured 16 -> 290+
        Mrops on the 44100->96001 serving block).  Positions, group
        offsets and the window start a0 ship as device arguments; the
        operator's nonzeros land only on valid samples, and the zero-
        padded window tail is multiplied by operator zeros only."""
        from ..ops.stages import banded_contract
        ex = self.exec
        S, G, fl = ex.S, ex.G, ex.fl
        c0 = jnp.asarray(ex.c0)[fti]          # [n_grp, G, fl]
        c1 = jnp.asarray(ex.c1)[fti]
        c2 = jnp.asarray(ex.c2)[fti]
        flt = c0 + (c1 + c2 * t[..., None]) * t[..., None]
        iota_w = jnp.arange(W, dtype=jnp.int32)
        R = jnp.zeros((n_grp, G, W), dtype=self.dtype)
        for i in range(fl):
            R = R + flt[..., i : i + 1] * (
                iota_w[None, None, :] == (off + i)[..., None])
        R = jnp.swapaxes(R, 1, 2)             # [n_grp, W, G]
        n_seg = -(-W // S)
        need = (n_grp + n_seg) * S
        C = window.shape[0]
        PADL = S + fl + 64  # static left margin: a0 = A0 + PADL >= 0
        wp = jnp.pad(window, ((0, 0), (PADL, need)))
        xw = jax.lax.dynamic_slice_in_dim(wp, a0, need, axis=1)
        o = banded_contract(xw, R, n_grp, S, W,
                            jax.lax.Precision.HIGHEST)
        return o.reshape(C, n_grp * G)[:, :cap]

    def _jit_banded_for(self, win_len: int, n_grp: int, W: int,
                        cap: int):
        key = ("banded", win_len, n_grp, W, cap)
        if key not in self._jits:
            import functools
            self._jits[key] = jax.jit(functools.partial(
                self._apply_banded_serve, n_grp, W, cap))
        return self._jits[key]

    def _apply_banded_spans_serve(self, n_span: int, P: int, W: int,
                                  cap: int, window, a0s, off, fti, t):
        """Per-SPAN variant of _apply_banded_serve for long (k-block
        batched) output spans: group offsets drift off the integer S-grid
        linearly with span length, so a single global base A0 makes the
        per-group window W — and with it FLOPs/output — grow with the
        span (measured: W 384 -> 704 from k=8 to k=32 blocks, regressing
        k=32 below k=8).  Splitting the groups into spans of P with their
        OWN device-arg bases ``a0s`` keeps W at its short-span value; the
        contract runs vmapped over spans on reshape views, no gather."""
        from ..ops.stages import banded_contract
        ex = self.exec
        S, G, fl = ex.S, ex.G, ex.fl
        c0 = jnp.asarray(ex.c0)[fti]          # [n_span*P, G, fl]
        c1 = jnp.asarray(ex.c1)[fti]
        c2 = jnp.asarray(ex.c2)[fti]
        flt = c0 + (c1 + c2 * t[..., None]) * t[..., None]
        iota_w = jnp.arange(W, dtype=jnp.int32)
        R = jnp.zeros((n_span * P, G, W), dtype=self.dtype)
        for i in range(fl):
            R = R + flt[..., i : i + 1] * (
                iota_w[None, None, :] == (off + i)[..., None])
        Rs = jnp.swapaxes(R, 1, 2).reshape(n_span, P, W, G)
        n_seg = -(-W // S)
        need_p = (P + n_seg) * S
        C = window.shape[0]
        PADL = S + fl + 64
        wp = jnp.pad(window, ((0, 0), (PADL, need_p)))
        xspans = jax.vmap(
            lambda a: jax.lax.dynamic_slice_in_dim(wp, a, need_p,
                                                   axis=1))(a0s)
        o = jax.vmap(lambda xs, Rp: banded_contract(
            xs, Rp, P, S, W, jax.lax.Precision.HIGHEST))(xspans, Rs)
        # [n_span, C, P, G] -> [C, n_span*P*G]
        o = jnp.transpose(o, (1, 0, 2, 3)).reshape(C, n_span * P * G)
        return o[:, :cap]

    def _jit_banded_spans_for(self, win_len: int, n_span: int, P: int,
                              W: int, cap: int):
        key = ("banded_spans", win_len, n_span, P, W, cap)
        if key not in self._jits:
            import functools
            self._jits[key] = jax.jit(functools.partial(
                self._apply_banded_spans_serve, n_span, P, W, cap))
        return self._jits[key]

    def _apply_banded_oz_serve(self, n_grp: int, W: int, cap: int,
                               window, a0, off, fps):
        """Guarantee-config serving tail: like _apply_banded_serve, but
        the operator values arrive as host-split bf16 SLICES (``fps``
        [N_PARTS, n_grp, G, fl], f64-evaluated spline values, per-block
        device args) one-hot placed into per-slice operators and
        contracted with the ozaki exactness lemma
        (ops/stages.banded_contract_ozaki) — the tail then holds the
        same ~-152 dB stage class as the oneshot guarantee engine
        instead of the device-f32 spline-eval ~-140 class."""
        from ..ops.ozaki import N_PARTS
        from ..ops.stages import banded_contract_ozaki
        ex = self.exec
        S, G, fl = ex.S, ex.G, ex.fl
        iota_w = jnp.arange(W, dtype=jnp.int32)
        parts = []
        for q in range(N_PARTS):
            fq = fps[q].astype(jnp.float32)
            Rq = jnp.zeros((n_grp, G, W), jnp.float32)
            for i in range(fl):
                Rq = Rq + fq[..., i : i + 1] * (
                    iota_w[None, None, :] == (off + i)[..., None])
            parts.append(jnp.swapaxes(Rq, 1, 2).astype(jnp.bfloat16))
        R_parts = jnp.stack(parts)
        n_seg = -(-W // S)
        need = (n_grp + n_seg) * S
        C = window.shape[0]
        PADL = S + fl + 64
        wp = jnp.pad(window, ((0, 0), (PADL, need)))
        xw = jax.lax.dynamic_slice_in_dim(wp, a0, need, axis=1)
        o = banded_contract_ozaki(xw, R_parts, n_grp, S, W)
        return o.reshape(C, n_grp * G)[:, :cap]

    def _jit_banded_oz_for(self, win_len: int, n_grp: int, W: int,
                           cap: int):
        key = ("banded_oz", win_len, n_grp, W, cap)
        if key not in self._jits:
            import functools
            self._jits[key] = jax.jit(functools.partial(
                self._apply_banded_oz_serve, n_grp, W, cap))
        return self._jits[key]

    def _apply_banded_oz_spans_serve(self, n_span: int, P: int, W: int,
                                     cap: int, window, a0s, off, fps):
        """Per-span variant of _apply_banded_oz_serve (same flat-W
        rationale as _apply_banded_spans_serve): the exactness lemma is
        per-(c, m, g) output cell, so re-basing groups per span changes
        only WHICH zero-padded window samples multiply operator zeros —
        the guarantee class is unchanged."""
        from ..ops.ozaki import N_PARTS
        from ..ops.stages import banded_contract_ozaki
        ex = self.exec
        S, G, fl = ex.S, ex.G, ex.fl
        iota_w = jnp.arange(W, dtype=jnp.int32)
        parts = []
        for q in range(N_PARTS):
            fq = fps[q].astype(jnp.float32)       # [n_span*P, G, fl]
            Rq = jnp.zeros((n_span * P, G, W), jnp.float32)
            for i in range(fl):
                Rq = Rq + fq[..., i : i + 1] * (
                    iota_w[None, None, :] == (off + i)[..., None])
            parts.append(jnp.swapaxes(Rq, 1, 2).astype(jnp.bfloat16))
        Rp = jnp.stack(parts).reshape(N_PARTS, n_span, P, W, G)
        n_seg = -(-W // S)
        need_p = (P + n_seg) * S
        C = window.shape[0]
        PADL = S + fl + 64
        wp = jnp.pad(window, ((0, 0), (PADL, need_p)))
        xspans = jax.vmap(
            lambda a: jax.lax.dynamic_slice_in_dim(wp, a, need_p,
                                                   axis=1))(a0s)
        o = jax.vmap(
            lambda xs, R: banded_contract_ozaki(xs, R, P, S, W),
            in_axes=(0, 1))(xspans, Rp)
        o = jnp.transpose(o, (1, 0, 2, 3)).reshape(C, n_span * P * G)
        return o[:, :cap]

    def _jit_banded_oz_spans_for(self, win_len: int, n_span: int, P: int,
                                 W: int, cap: int):
        key = ("banded_oz_spans", win_len, n_span, P, W, cap)
        if key not in self._jits:
            import functools
            self._jits[key] = jax.jit(functools.partial(
                self._apply_banded_oz_spans_serve, n_span, P, W, cap))
        return self._jits[key]

    def process_block_padded(self, z: jnp.ndarray):
        """z: [C, n] fractional-stage input samples -> (y[C, cap] device
        array, count) with valid outputs in y[:, :count] — the fully
        device-resident form (positions ship as per-block device args;
        the count is host-known without a device sync)."""
        C, n = z.shape
        if self.skip_left > 0:
            d = min(self.skip_left, n)
            z = z[:, d:]
            n -= d
            self.skip_left -= d
        if n == 0:
            return jnp.zeros((C, 0), dtype=self.dtype), 0
        if self.buf is None:
            self.buf = jnp.zeros((C, self.H), dtype=self.dtype)
        window = jnp.concatenate([self.buf, z], axis=1)
        base = self.n_in - self.H  # absolute index of window[:, 0]
        self.n_in += n
        self.buf = window[:, -self.H :]

        m_avail = stage_out_len(self.spec, self.n_in + self.spec.in_latency)
        count = m_avail - self.m_out
        if count <= 0:
            return jnp.zeros((C, 0), dtype=self.dtype), 0
        cap = int(math.ceil(
            (n + 1) * self.spec.dst_rate / self.spec.src_rate)) + 2
        cap = max(cap, count)
        s, f = frac_positions(self.spec, self.m_out, count)
        fr = f * self.exec.fracs
        fti = np.floor(fr).astype(np.int32)
        t64 = fr - fti  # exact f64 fractional phase (guarantee eval)
        t = t64.astype(np.float32 if self.dtype == jnp.float32
                       else np.float64)
        start_rel = (s - self.fll - base).astype(np.int32)
        assert start_rel.min() >= 0, "poly window underrun"
        assert start_rel.max() + self.exec.fl <= window.shape[1]
        ex = self.exec
        if ex.engine == "banded":
            # serving-path MXU form: pad to the group grid, derive the
            # per-block (a0, group offsets, W) and run the static-shape
            # banded program with positions as device args
            G, S, fl = ex.G, ex.S, ex.fl
            PADL = S + fl + 64
            n_grp0 = -(-cap // G)
            if n_grp0 >= 256:
                # long (k-block batched) span: per-SPAN bases keep W flat
                P = 64
                n_span = -(-n_grp0 // P)
                capG = n_span * P * G
                padG = capG - count
                # pad positions ON the S-grid (continue at the grid rate
                # S/G), NOT edge-replicated: a repeated position drifts
                # off the grid by S per padded group, blowing W up for
                # the last span (padG can approach P*G here, vs < G on
                # the single-span path).  Grid-extrapolated pad reads
                # land in the window's static right zero-pad; the padded
                # outputs are sliced off by [:, :cap].
                jpad = np.arange(1, padG + 1, dtype=np.int64)
                sr = np.concatenate([
                    start_rel.astype(np.int64),
                    start_rel[-1] + (jpad * S) // G])
                fg = np.pad(fti, (0, padG), mode="edge").reshape(-1, G)
                tg = np.pad(t, (0, padG), mode="edge").reshape(-1, G)
                rel = sr.reshape(n_span * P, G) \
                    - (np.arange(n_span * P, dtype=np.int64)[:, None] * S)
                rel2 = rel.reshape(n_span, P, G)
                A0s = rel2.min(axis=(1, 2))
                off = (rel2 - A0s[:, None, None]).reshape(
                    n_span * P, G).astype(np.int32)
                W_need = int(off.max()) + fl
                W = -(-W_need // 32) * 32
                # the vmapped contract indexes groups span-LOCALLY, so
                # each span's slice base carries its global offset s*P*S
                a0s = (A0s + PADL
                       + np.arange(n_span, dtype=np.int64) * (P * S)
                       ).astype(np.int32)
                if W <= 4 * ex.W + 256 and int(a0s.min()) >= 0:
                    if self.guarantee:
                        from ..ops.ozaki import split_operator_host_batched
                        tb = ex.tab64
                        tcg = np.pad(t64, (0, padG),
                                     mode="edge").reshape(-1, G)[..., None]
                        flt64 = (tb[fg, :, 0]
                                 + (tb[fg, :, 1] + tb[fg, :, 2] * tcg)
                                 * tcg)
                        fps = jnp.asarray(
                            split_operator_host_batched(flt64, axis=-1))
                        fn = self._jit_banded_oz_spans_for(
                            window.shape[1], n_span, P, W, cap)
                        y = fn(window, jnp.asarray(a0s),
                               jnp.asarray(off), fps)
                        self.m_out = m_avail
                        return y, count
                    fn = self._jit_banded_spans_for(window.shape[1],
                                                    n_span, P, W, cap)
                    y = fn(window, jnp.asarray(a0s), jnp.asarray(off),
                           jnp.asarray(fg), jnp.asarray(tg))
                    self.m_out = m_avail
                    return y, count
            capG = -(-cap // G) * G
            padG = capG - count
            sr = np.pad(start_rel, (0, padG), mode="edge")
            fg = np.pad(fti, (0, padG), mode="edge").reshape(-1, G)
            tg = np.pad(t, (0, padG), mode="edge").reshape(-1, G)
            n_grp = capG // G
            rel = sr.reshape(n_grp, G) \
                - (np.arange(n_grp, dtype=np.int64)[:, None] * S)
            A0 = int(rel.min())
            off = (rel - A0).astype(np.int32)
            W_need = int(off.max()) + fl
            W = -(-W_need // 32) * 32
            PADL = S + fl + 64
            if W <= 4 * ex.W + 256 and A0 + PADL >= 0:
                if self.guarantee:
                    # host f64 spline eval + bf16 split (exact values)
                    from ..ops.ozaki import split_operator_host_batched
                    tb = ex.tab64
                    tcg = np.pad(t64, (0, padG),
                                 mode="edge").reshape(-1, G)[..., None]
                    flt64 = (tb[fg, :, 0]
                             + (tb[fg, :, 1] + tb[fg, :, 2] * tcg) * tcg)
                    fps = jnp.asarray(
                        split_operator_host_batched(flt64, axis=-1))
                    fn = self._jit_banded_oz_for(window.shape[1],
                                                 n_grp, W, cap)
                    y = fn(window, jnp.int32(A0 + PADL),
                           jnp.asarray(off), fps)
                    self.m_out = m_avail
                    return y, count
                fn = self._jit_banded_for(window.shape[1], n_grp, W, cap)
                y = fn(window, jnp.int32(A0 + PADL), jnp.asarray(off),
                       jnp.asarray(fg), jnp.asarray(tg))
                self.m_out = m_avail
                return y, count
        # pad to capacity for shape stability (padded columns recompute
        # the last valid output; callers ignore them)
        pad = cap - count
        if pad:
            start_rel = np.pad(start_rel, (0, pad), mode="edge")
            fti = np.pad(fti, (0, pad), mode="edge")
            t = np.pad(t, (0, pad), mode="edge")
        fn = self._jit_for(window.shape[1], cap)
        y = fn(window, jnp.asarray(start_rel), jnp.asarray(fti),
               jnp.asarray(t))
        self.m_out = m_avail
        return y, count

    def process_block(self, z: jnp.ndarray) -> np.ndarray:
        """z: [C, n] fractional-stage input samples -> (outputs numpy)."""
        y, count = self.process_block_padded(z)
        return np.asarray(y[:, :count])


class _SufDeviceReblock:
    """Device-resident re-blocker feeding a periodic suffix stream.

    The poly tail emits a varying (host-known) count per block; the suffix
    _PeriodStream needs fixed L2-sample blocks.  A device ring buffer of
    static shape absorbs the variance: each push writes the PADDED tail
    output at the current (host-tracked) fill offset via one jitted
    dynamic_update_slice, then emits as many L2 blocks as are filled.
    Padded garbage columns are overwritten by the next push before they
    can be consumed (fill only advances by the valid count).
    """

    def __init__(self, suf: "_PeriodStream", cap_in: int, dtype):
        self.suf = suf
        L2 = suf.L
        self.L2 = L2
        self.cap = L2 + 2 * cap_in
        self.dtype = dtype
        self._jit_write = jax.jit(
            lambda buf, y, at: jax.lax.dynamic_update_slice(
                buf, y, (jnp.zeros((), dtype=at.dtype), at)))
        self._shift_jits = {}
        self.reset()

    def _jit_shift(self, s: int):
        """Shift the ring left by s samples (one jit per static s; s takes
        few values in steady state, so the cache stays small)."""
        if s not in self._shift_jits:
            self._shift_jits[s] = jax.jit(
                lambda buf: jnp.concatenate(
                    [buf[:, s:], jnp.zeros((buf.shape[0], s), buf.dtype)],
                    axis=1))
        return self._shift_jits[s]

    def reset(self):
        self.buf = None
        self.fill = 0

    def push(self, y_padded: jnp.ndarray, count: int):
        """y_padded: [C, cap_y] with y[:, :count] valid -> list of suffix
        output device arrays."""
        C = y_padded.shape[0]
        if self.buf is None:
            self.buf = jnp.zeros((C, self.cap), dtype=self.dtype)
        if y_padded.shape[1]:
            at = jnp.asarray(self.fill, dtype=jnp.int32)
            self.buf = self._jit_write(self.buf, y_padded, at)
        self.fill += count
        L2 = self.L2
        m = self.fill // L2
        if m == 0:
            return []
        # all m filled suffix blocks in ONE scanned call + ONE ring shift
        # (the per-block form paid 2m dispatches per push; with k-block
        # batching upstream, m grows with k and the suffix became the
        # dominant dispatch cost of mid-chain poly serving)
        out = self.suf.process_block_device(self.buf[:, :L2]) if m == 1 \
            else self.suf.process_blocks_device(self.buf[:, : m * L2], m)
        self.buf = self._jit_shift(m * L2)(self.buf)
        self.fill -= m * L2
        return [out]


class StreamResampler:
    """Chunked push-mode front-end over a Resampler's plan.

    process(x[C, n]) accepts arbitrary chunk lengths and returns all output
    samples computable so far; flush() drains the pipeline's latency tail
    with zero input (CDSPResampler.h:592-651 zero-flush semantics).
    """

    def __init__(self, rs: Resampler, block_len: int = 8192):
        from ..parallel.sharding import chain_input_span, chain_shift_period

        self.rs = rs
        self.plan = rs.plan
        stages = self.plan.stages
        self._n_in_total = 0
        self._n_out_total = 0
        self._pending = None  # host buffer [C, <L]
        self._channels = None
        self._squeeze = False

        period = chain_shift_period(self.plan)
        if period is not None or not stages:
            p_in, p_out = period if period else (1, 1)
            self._mode = "period"
            self._core = _PeriodStream(
                rs, stages, block_len, p_in, p_out,
                chain_input_span(self.plan)) if stages else None
            self.block = self._core.L if stages else max(1, block_len)
            return
        # split the chain at the (single) polynomial interpolator; the
        # prefix is rational (periodic), the suffix — when present (the
        # intermediate-interpolation branch, CDSPResampler.h:286-324) — is
        # pure integer upsampling (conv up/1 + half-band 2X), which is
        # shift-invariant under EVERY integer shift (period 1), so it can
        # be re-blocked on fixed boundaries regardless of the poly stage's
        # varying per-block output counts.
        poly_idx = [i for i, s in enumerate(stages)
                    if isinstance(s, FracStage) and not s.is_whole]
        assert len(poly_idx) == 1
        pi = poly_idx[0]
        prefix, suffix = stages[:pi], stages[pi + 1 :]

        def _subplan(sub):
            return self.plan.__class__(
                self.plan.src_rate, self.plan.dst_rate, self.plan.trans_band,
                self.plan.atten, self.plan.phase, tuple(sub),
                self.plan.latency_frac)

        pperiod = chain_shift_period(_subplan(prefix))
        if pperiod is None:
            raise NotImplementedError(
                "streaming needs a rational-prefix plan; use oneshot")
        self._mode = "poly"
        p_in, p_out = pperiod
        self._core = _PeriodStream(rs, prefix, block_len, p_in, p_out,
                                   chain_input_span(_subplan(prefix))) \
            if prefix else None
        self.block = self._core.L if prefix else _round_up(block_len, 1)
        self._tail = _PolyTailStream(stages[pi], rs.dtype,
                                     guarantee=getattr(rs, "df_carry",
                                                       False))
        self._suf = None
        self._suf_pending = None
        self._sufdev = None  # device re-blocker, built on first device call
        if suffix:
            speriod = chain_shift_period(_subplan(suffix))
            assert speriod is not None and speriod[0] == 1, \
                "suffix after a polynomial stage must be integer-upsampling"
            self._suf = _PeriodStream(rs, suffix, block_len, speriod[0],
                                      speriod[1],
                                      chain_input_span(_subplan(suffix)))

    def clear(self):
        self._n_in_total = 0
        self._n_out_total = 0
        self._pending = None
        if self._core is not None:
            self._core.reset(self._channels)
        if self._mode == "poly":
            self._tail.reset()
            if self._suf is not None:
                self._suf.reset(self._channels)
                self._suf_pending = None
                if self._sufdev is not None:
                    self._sufdev.reset()

    def _emit(self, block_np: np.ndarray) -> np.ndarray:
        x = jnp.asarray(block_np, dtype=self.rs.dtype)
        if self._mode == "period":
            if self._core is None:  # passthrough
                return np.asarray(x, dtype=np.float64)
            return np.asarray(self._core.process_block(x), dtype=np.float64)
        y = self._core.process_block(x) if self._core is not None else \
            np.asarray(x)
        y = self._tail.process_block(jnp.asarray(y, dtype=self.rs.dtype))
        if self._suf is None:
            return np.asarray(y, dtype=np.float64)
        if self._sufdev is not None and self._sufdev.fill:
            # drain the device re-blocker into the host pending buffer so
            # process()/flush() can follow process_block_device calls
            dev = np.asarray(self._sufdev.buf[:, : self._sufdev.fill],
                             dtype=np.float64)
            self._suf_pending = dev if self._suf_pending is None else \
                np.concatenate([self._suf_pending, dev], axis=1)
            self._sufdev.reset()
        # re-block the variable-count poly output on the suffix grid
        buf = y if self._suf_pending is None else \
            np.concatenate([self._suf_pending, y], axis=1)
        L2 = self._suf.L
        outs = []
        while buf.shape[1] >= L2:
            outs.append(np.asarray(
                self._suf.process_block(
                    jnp.asarray(buf[:, :L2], dtype=self.rs.dtype)),
                dtype=np.float64))
            buf = buf[:, L2:]
        self._suf_pending = buf
        return (np.concatenate(outs, axis=1) if outs
                else np.zeros((y.shape[0], 0), dtype=np.float64))

    def process_block_device(self, x_block) -> "jnp.ndarray":
        """Serving-path variant: push EXACTLY ``self.block`` samples as a
        device array and receive the emitted outputs as a device array —
        no per-block host transfer (the reference has no analog; its
        process() is host-memory by construction, CDSPResampler.h:559-575).

        Rational-ratio plans emit a fixed count per call.  Polynomial
        plans emit a varying (host-known, no device sync) count: the tail
        interpolator runs with per-block device position args, and a
        suffix — when present — is re-blocked on device through a static
        ring buffer (_SufDeviceReblock)."""
        if self._core is None and self._mode == "period":
            raise NotImplementedError(
                "device-resident streaming requires a non-empty plan")
        x_block = jnp.asarray(x_block, dtype=self.rs.dtype)
        if x_block.ndim != 2 or x_block.shape[1] != self.block:
            raise ValueError(
                f"block must be [channels, {self.block}] (got "
                f"{x_block.shape})")
        if self._pending is not None and self._pending.shape[1]:
            raise RuntimeError(
                "cannot mix process_block_device with a partial process() "
                "chunk still pending — feed whole blocks only")
        if self._channels is None:
            self._channels = int(x_block.shape[0])
            self._squeeze = False
        elif int(x_block.shape[0]) != self._channels:
            raise ValueError(
                f"block has {int(x_block.shape[0])} channels, stream "
                f"started with {self._channels}")
        self._n_in_total += self.block
        if self._mode == "period":
            y = self._core.process_block_device(x_block)
            self._n_out_total += int(y.shape[-1])
            return y
        # poly mode: prefix (device) -> tail with device position args
        z = self._core.process_block_device(x_block) \
            if self._core is not None else x_block
        y, count = self._tail.process_block_padded(z)
        C = x_block.shape[0]
        if self._suf is None:
            out = y[:, :count]
            self._n_out_total += count
            return out
        if self._sufdev is None:
            cap_in = int(math.ceil(
                (self._core.out_per_block + 1) * self._tail.spec.dst_rate
                / self._tail.spec.src_rate)) + 2 if self._core is not None \
                else int(math.ceil(
                    (self.block + 1) * self._tail.spec.dst_rate
                    / self._tail.spec.src_rate)) + 2
            self._sufdev = _SufDeviceReblock(self._suf, cap_in,
                                             self.rs.dtype)
        outs = []
        if self._suf_pending is not None and self._suf_pending.shape[1]:
            pend = jnp.asarray(self._suf_pending, dtype=self.rs.dtype)
            outs += self._sufdev.push(pend, int(pend.shape[1]))
            self._suf_pending = None
        outs += self._sufdev.push(y, count)
        if not outs:
            out = jnp.zeros((C, 0), dtype=self.rs.dtype)
        else:
            out = outs[0] if len(outs) == 1 else \
                jnp.concatenate(outs, axis=1)
        self._n_out_total += int(out.shape[1])
        return out

    def process_blocks_device(self, xk) -> "jnp.ndarray":
        """Batched serving path: push k consecutive ``self.block``-sample
        blocks as ONE [C, k*block] device array and receive all emitted
        outputs as one device array.

        Semantically identical to k successive process_block_device calls
        but with ~k-fold fewer host->device dispatches: the rational
        prefix runs as one scanned jit program, and the polynomial tail —
        being length-general — runs ONE banded program over the whole
        k-block window with a single position-args upload (its outputs
        are contiguous by construction, so no compaction step exists).
        Under an axon-style tunneled device, per-block dispatch latency
        dominates the per-block path (NEXT.md round-6 #2: ~24.5 ms/block
        wall vs ~1.9 ms device compute at C=1024); this path amortizes it.
        """
        xk = jnp.asarray(xk, dtype=self.rs.dtype)
        L = self.block
        if xk.ndim != 2 or xk.shape[1] % L or xk.shape[1] == 0:
            raise ValueError(
                f"batched block must be [channels, k*{L}] (got {xk.shape})")
        k = xk.shape[1] // L
        if k == 1:
            return self.process_block_device(xk)
        if self._core is None and self._mode == "period":
            raise NotImplementedError(
                "device-resident streaming requires a non-empty plan")
        if self._pending is not None and self._pending.shape[1]:
            raise RuntimeError(
                "cannot mix process_blocks_device with a partial process() "
                "chunk still pending — feed whole blocks only")
        if self._channels is None:
            self._channels = int(xk.shape[0])
            self._squeeze = False
        elif int(xk.shape[0]) != self._channels:
            raise ValueError(
                f"block has {int(xk.shape[0])} channels, stream "
                f"started with {self._channels}")
        self._n_in_total += k * L
        if self._mode == "period":
            y = self._core.process_blocks_device(xk, k)
            self._n_out_total += int(y.shape[-1])
            return y
        # poly mode: scanned prefix -> ONE tail call over the k-block span
        z = self._core.process_blocks_device(xk, k) \
            if self._core is not None else xk
        y, count = self._tail.process_block_padded(z)
        C = xk.shape[0]
        if self._suf is None:
            out = y[:, :count]
            self._n_out_total += count
            return out
        if self._sufdev is None:
            cap_in = int(y.shape[1]) + 2
            self._sufdev = _SufDeviceReblock(self._suf, cap_in,
                                             self.rs.dtype)
        elif self._sufdev.cap < self._sufdev.L2 + int(y.shape[1]):
            # the batched tail output exceeds the per-block ring capacity:
            # grow the ring (preserving fill) before the push
            old = self._sufdev
            grown = _SufDeviceReblock(self._suf, int(y.shape[1]) + 2,
                                      self.rs.dtype)
            if old.buf is not None and old.fill:
                grown.buf = jnp.zeros((C, grown.cap), dtype=self.rs.dtype)
                grown.buf = grown.buf.at[:, : old.fill].set(
                    old.buf[:, : old.fill])
                grown.fill = old.fill
            self._sufdev = grown
        outs = []
        if self._suf_pending is not None and self._suf_pending.shape[1]:
            pend = jnp.asarray(self._suf_pending, dtype=self.rs.dtype)
            outs += self._sufdev.push(pend, int(pend.shape[1]))
            self._suf_pending = None
        outs += self._sufdev.push(y, count)
        if not outs:
            out = jnp.zeros((C, 0), dtype=self.rs.dtype)
        else:
            out = outs[0] if len(outs) == 1 else \
                jnp.concatenate(outs, axis=1)
        self._n_out_total += int(out.shape[1])
        return out

    def process(self, x) -> np.ndarray:
        """x: [C, n] or [n] chunk; returns [C, m] (or [m]) new outputs."""
        x = np.asarray(x)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        C = x.shape[0]
        if self._channels is None:
            self._channels = C
            self._squeeze = squeeze
        elif C != self._channels:
            raise ValueError(
                f"chunk has {C} channels, stream started with "
                f"{self._channels}")
        self._n_in_total += x.shape[1]
        buf = x if self._pending is None else \
            np.concatenate([self._pending, x], axis=1)
        outs = []
        L = self.block
        while buf.shape[1] >= L:
            outs.append(self._emit(buf[:, :L]))
            buf = buf[:, L:]
        self._pending = buf
        y = (np.concatenate(outs, axis=1) if outs
             else np.zeros((C, 0), dtype=np.float64))
        self._n_out_total += y.shape[1]
        return y[0] if squeeze else y

    # -- checkpoint / resume ---------------------------------------------
    # The carried state is small and explicit (SURVEY.md §5: the reference's
    # would-be checkpoint state is exactly its ring buffers + position
    # counters); serializing it enables elastic restart mid-stream.

    def get_state(self) -> dict:
        st = {
            "n_in_total": self._n_in_total,
            "n_out_total": self._n_out_total,
            "pending": None if self._pending is None
            else np.asarray(self._pending),
            "channels": self._channels,
            "squeeze": self._squeeze,
        }
        if self._core is not None:
            st["core"] = {
                "hist": None if self._core.hist is None
                else np.asarray(self._core.hist),
                "n_in": self._core.n_in,
            }
        if self._mode == "poly":
            t = self._tail
            st["tail"] = {
                "n_in": t.n_in, "m_out": t.m_out,
                "skip_left": t.skip_left,
                "buf": None if t.buf is None else np.asarray(t.buf),
            }
            if self._suf is not None:
                st["suf"] = {
                    "hist": None if self._suf.hist is None
                    else np.asarray(self._suf.hist),
                    "n_in": self._suf.n_in,
                    "pending": None if self._suf_pending is None
                    else np.asarray(self._suf_pending),
                    "dev_fill": 0 if self._sufdev is None
                    else self._sufdev.fill,
                    "dev_buf": None if (self._sufdev is None
                                        or not self._sufdev.fill)
                    else np.asarray(
                        self._sufdev.buf[:, : self._sufdev.fill]),
                }
        return st

    def set_state(self, st: dict) -> None:
        self._n_in_total = st["n_in_total"]
        self._n_out_total = st["n_out_total"]
        self._pending = None if st["pending"] is None \
            else np.asarray(st["pending"])
        self._channels = st["channels"]
        self._squeeze = st["squeeze"]
        if self._core is not None:
            c = st["core"]
            self._core.hist = None if c["hist"] is None \
                else jnp.asarray(c["hist"], dtype=self.rs.dtype)
            self._core.n_in = c["n_in"]
        if self._mode == "poly":
            t = self._tail
            tl = st["tail"]
            t.n_in = tl["n_in"]
            t.m_out = tl["m_out"]
            t.skip_left = tl["skip_left"]
            t.buf = None if tl["buf"] is None \
                else jnp.asarray(tl["buf"], dtype=self.rs.dtype)
            if self._suf is not None:
                sf = st["suf"]
                self._suf.hist = None if sf["hist"] is None \
                    else jnp.asarray(sf["hist"], dtype=self.rs.dtype)
                self._suf.n_in = sf["n_in"]
                self._suf_pending = None if sf["pending"] is None \
                    else np.asarray(sf["pending"])
                if self._sufdev is not None:
                    self._sufdev.reset()
                if sf.get("dev_buf") is not None:
                    # restore the device re-block remainder as host
                    # pending (re-absorbed on the next device call)
                    self._suf_pending = sf["dev_buf"] \
                        if self._suf_pending is None else np.concatenate(
                            [self._suf_pending, sf["dev_buf"]], axis=1)

    def flush(self, out_len: Optional[int] = None) -> np.ndarray:
        """Feed zeros until ``out_len`` total outputs have been produced
        (default: floor(total_input * dst/src))."""
        if out_len is None:
            out_len = int(math.floor(
                self._n_in_total * self.plan.dst_rate / self.plan.src_rate))
        C = self._channels or 1
        outs = []
        produced = self._n_out_total
        guard = 0
        sq = self._squeeze
        self._squeeze = False
        while produced < out_len and guard < 10000:
            z = np.zeros((C, self.block), dtype=np.float64)
            y = self.process(z)
            produced = self._n_out_total
            outs.append(y)
            guard += 1
        y = (np.concatenate(outs, axis=1) if outs
             else np.zeros((C, 0), dtype=np.float64))
        extra = produced - out_len
        if extra > 0:
            y = y[:, : y.shape[1] - extra]
            self._n_out_total = out_len
        self._squeeze = sq
        return y[0] if sq else y
