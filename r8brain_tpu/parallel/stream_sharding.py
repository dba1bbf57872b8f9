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
"""

from __future__ import annotations

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
from .sharding import chain_input_span, chain_shift_period

__all__ = ["ShardedStreamResampler"]


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class ShardedStreamResampler:
    """Push-mode streaming over a (ch, t) mesh.

    Feed fixed-size blocks of ``self.block`` input samples per call
    (``process_block``); each call returns the newly computable outputs.
    Requires a whole-stepping (rational-ratio) plan when the ``t`` axis is
    larger than 1 (same constraint as ShardedResampler); channel-only
    meshes accept any periodic plan.
    """

    def __init__(self, rs: Resampler, mesh: Mesh, ch_axis: str = "ch",
                 t_axis: str = "t", seg_len: int = 8192):
        self.rs = rs
        self.mesh = mesh
        self.ch_axis = ch_axis if ch_axis in mesh.axis_names else None
        self.t_axis = t_axis if t_axis in mesh.axis_names else None
        self.n_ch = mesh.shape[ch_axis] if self.ch_axis else 1
        self.n_t = mesh.shape[t_axis] if self.t_axis else 1
        period = chain_shift_period(rs.plan)
        if period is None:
            raise ValueError(
                "sharded streaming requires a whole-stepping (rational "
                "ratio) plan; polynomial-interpolator plans stream "
                "channel-sharded through StreamResampler with sharded "
                "device arrays")
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
