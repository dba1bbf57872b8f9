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
the *same compiled program* on shifted data.  Plans containing a
polynomial-mode fractional interpolator (irrational ratios) have no finite
period and support channel sharding only.
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

from ..models.lengths import chain_in_for_out, chain_out_len
from ..models.plan import ConvStage, FracStage, HBDownStage, HBUpStage, Plan
from ..models.resampler import Resampler

__all__ = ["chain_shift_period", "chain_input_span", "ShardedResampler"]


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
        if self.n_t > 1 and self.period is None:
            raise ValueError(
                "time-block sharding requires a whole-stepping (rational "
                "ratio) plan; this plan uses the polynomial interpolator — "
                "use channel sharding only")
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

    def oneshot(self, x, out_len: Optional[int] = None) -> jnp.ndarray:
        """Sharded offline conversion.  x: [C, N] (host or device array)."""
        x = jnp.asarray(x, dtype=self.rs.dtype)
        C, N = x.shape
        if out_len is None:
            out_len = self.rs.default_out_len(N)
        if not self.rs.plan.stages:
            y = x[:, :out_len]
            return jnp.pad(y, ((0, 0), (0, max(0, out_len - N))))

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
