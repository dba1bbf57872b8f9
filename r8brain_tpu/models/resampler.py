"""Batched TPU resampler front-end.

TPU-native counterpart of the CDSPResampler public API
(CDSPResampler.h:406-651): plans the stage chain on the host (models/plan.py),
builds whole-array executors (ops/stages.py), and exposes an offline
``oneshot`` over a [channels, samples] batch — the reference's
one-object-per-channel streaming loop (example.cpp:29-39) becomes a single
jitted program vectorized over thousands of channels.

Shapes are static per (channels, padded_input_len); jax.jit caches one
compiled executable per shape.  The zero-flush semantics of the reference's
oneshot (CDSPResampler.h:592-651) are reproduced by right-padding the input
with the exact number of zeros whose outputs cover ``out_len``
(models/lengths.py inverse emission algebra).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stages import build_exec
from .lengths import chain_in_for_out, chain_out_len
from .plan import Plan, make_plan

__all__ = ["Resampler", "Resampler16", "Resampler16IR", "Resampler24"]


class Resampler:
    def __init__(self, src_rate: float, dst_rate: float,
                 trans_band: float = 2.0, atten: float = 206.91,
                 phase: int = 0, dtype=jnp.float32,
                 plan: Optional[Plan] = None, precision: str = "fast",
                 fused="auto", conv_engine: str = "auto",
                 frac_engine: str = "auto"):
        """precision: "fast" runs everything in ``dtype``; "high" (float32
        only) adds a kernel-representation residual pass to every matmul
        engine (and selects two-float df32 arithmetic on the FFT engine) so
        the pipeline meets the reference's -141 dB golden-equality class by
        design.  The default high mode is the FAST high mode (fused /
        toeplitz residual matmuls, ~7/6x the fast path's cost);
        conv_engine="fft" selects the df32-FFT backend-independent
        guarantee engine instead.

        fused: compose a [conv(up), whole-frac] plan into one per-phase
        composite matmul (ops/fused.py).  "auto" enables it for f32 in
        both precision modes; pass False to force the two-stage pipeline.

        conv_engine: convolver engine for unfused stages — "auto",
        "toeplitz", "fft", "direct", "pallas", the VMEM-resident
        df32-FFT guarantee engines "pallas_fft" (radix-2),
        "pallas_fft4" (radix-4), "pallas_fft5" (four-step
        direct-butterfly; in-VMEM overlap-save framing when the kernel
        geometry allows), or "ozaki" — the error-free split-operand MXU
        guarantee engine (ops/ozaki.py: provably exact f32 accumulation
        of bf16 operand slices on a power-of-two grid; the fastest
        backend-independent -141 dB configuration, pair it with
        frac_engine="ozaki").

        frac_engine: whole-stepping interpolator engine for unfused stages
        — "auto", "im2col", "conv", "pallas" (the pallas engine requires
        128-aligned cell strides and channel tiles; it falls back to
        im2col, visibly under R8B_TRACE)."""
        self.plan = plan if plan is not None else make_plan(
            src_rate, dst_rate, trans_band, atten, phase)
        self.dtype = jnp.dtype(dtype)
        self.precision = precision
        self.conv_engine = conv_engine
        self.frac_engine = frac_engine
        from ..utils.trace import trace_plan
        trace_plan(self.plan, context=f"resampler dtype={self.dtype} "
                                      f"precision={precision}")
        self.execs = None
        fuse_poly = fused == "poly"  # opt-in FusedPolyExec (ops/poly_fused)
        if fused == "auto" or fuse_poly:
            # f32 fast AND high: the fused composite (with its cheap
            # residual pass in high mode) is the fastest configuration
            # meeting each precision class's bound — the -141 dB class
            # must not default to a slow engine (VERDICT r1 weak #2)
            fused = (self.dtype == jnp.float32
                     and precision in ("fast", "high")
                     and conv_engine == "auto" and frac_engine == "auto"
                     ) or fuse_poly
        import functools
        bld = functools.partial(build_exec, conv_engine=conv_engine,
                                frac_engine=frac_engine)
        if fused:
            from ..ops.fused import fuse_stage_list
            self.execs = fuse_stage_list(self.plan, self.dtype, precision,
                                         bld, engine=conv_engine,
                                         poly=fuse_poly)
        if self.execs is None:
            self.execs = [bld(s, self.dtype, precision)
                          for s in self.plan.stages]
        # df32 inter-stage carry (round 5): under the backend-independent
        # guarantee configuration, stages hand (hi, lo) pairs across the
        # seams instead of rounding to f32 at every stage boundary — the
        # accumulated per-seam store roundings were the guarantee chain's
        # dominant residual error (differential fuzzer worst -142.4 dB,
        # NEXT.md round-5 #2).  Only the final output rounds.
        self.df_carry = (precision == "high" and conv_engine == "ozaki"
                         and self.dtype == jnp.float32
                         and os.environ.get("R8BT_DF_CARRY", "1") != "0")
        self._jit_chain = jax.jit(self._chain)

    @property
    def latency_frac(self) -> float:
        return self.plan.latency_frac

    @property
    def latency(self) -> int:
        """Always 0: like the reference front-end (CDSPResampler.h:430-436),
        whole-sample latency is consumed inside the chain; only the
        fractional remainder (latency_frac) is reported."""
        return 0

    def clear(self) -> None:
        """No-op: the whole-array executor is stateless between oneshot
        calls (CDSPResampler::clear resets stream buffers; streaming state
        lives in StreamResampler, which has its own clear())."""

    def _chain(self, x: jnp.ndarray) -> jnp.ndarray:
        # valid-prefix seam protocol: stages that implement apply_v hand
        # their raw (unsliced) framing buffer + a logical length to the
        # next stage, so the per-seam prefix slice and the consumer's
        # re-pad (each one full-array HBM round trip) never execute;
        # other stages get the sliced view and return exact outputs.
        # A host-side backward pass first propagates each consumer's
        # physical framing need so producers overproduce a few surplus
        # blocks/groups instead of the consumer right-padding.
        if getattr(self, "df_carry", False):
            # guarantee-chain df32 carry: stages thread RAW (unsliced)
            # (hi f32, lo bfloat16) pair buffers plus the logical count
            # n — the same valid-prefix argument as apply_v, so neither
            # the per-seam f32 store rounding NOR the per-seam
            # slice/re-pad HBM round trips happen.  The first stage
            # only EMITS (l is None — no zero stream to consume), the
            # last only CONSUMES (its output is collapsed anyway), so a
            # two-stage chain pays one extra bf16 output write + one
            # cheap bf16 pass.  Stages without a carry path collapse
            # via _df_collapse_input (one rounding — exactly the
            # non-carry seam).
            from ..ops.stages import _df_collapse_input
            h = x
            l = None
            n = x.shape[1]
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
        n = x.shape[1]
        n_log = [n]
        for e in self.execs:
            n_log.append(e.out_len(n_log[-1])
                         if hasattr(e, "out_len") else -1)
        need = [None] * (len(self.execs) + 1)
        # DEFAULT OFF: interleaved chip A/B (tools/ab_poly.py, round 4)
        # measured overproduction at -2% — surplus blocks cost real MXU
        # time while the right-pads they remove overlap with compute
        if os.environ.get("R8BT_SEAM_MINOUT", "0") == "1":
            for i in range(len(self.execs) - 1, -1, -1):
                if (hasattr(self.execs[i], "phys_in_need")
                        and n_log[i] >= 0):
                    need[i] = self.execs[i].phys_in_need(
                        n_log[i], min_out=need[i + 1])
        for i, e in enumerate(self.execs):
            if hasattr(e, "apply_v"):
                x, n = e.apply_v(x, n, min_out=need[i + 1])
            else:
                if x.shape[1] != n:
                    x = x[:, :n]
                x = e.apply(x)
                n = x.shape[1]
        return x if x.shape[1] == n else x[:, :n]

    def out_len_for_in(self, n_in: int) -> int:
        return chain_out_len(self.plan.stages, n_in)

    def in_len_for_out(self, out_len: int) -> int:
        return chain_in_for_out(self.plan.stages, out_len)

    def default_out_len(self, n_in: int) -> int:
        return int(math.floor(n_in * self.plan.dst_rate / self.plan.src_rate))

    def max_out_len(self, max_in: int) -> int:
        """Upper bound on outputs a ``max_in``-sample block can produce at
        ANY stream position — the reference's buffer-sizing query
        (getMaxOutLen, CDSPResampler.h:497-506).  Unlike out_len_for_in
        (exact count from stream start) this ignores start latency, so it
        also bounds mid-stream StreamResampler blocks."""
        from .lengths import chain_max_out_len
        return chain_max_out_len(self.plan.stages, max_in)

    def get_input_required_for_output(self, req_out: int) -> int:
        """Minimal input count yielding >= req_out outputs
        (getInputRequiredForOutput, CDSPResampler.h:476-484)."""
        return chain_in_for_out(self.plan.stages, req_out) if req_out > 0 \
            else 0

    def get_in_len_before_out_pos(self, req_out_pos: int) -> int:
        """Input samples required to advance past output position
        ``req_out_pos`` (CDSPResampler.h:406-419)."""
        return self.get_input_required_for_output(req_out_pos + 1) - 1

    def oneshot(self, x, out_len: Optional[int] = None,
                max_chunk: Optional[int] = None) -> jnp.ndarray:
        """Offline conversion with zero-flush.  x: [C, N] or [N].

        max_chunk bounds device memory for long signals: inputs longer
        than ``max_chunk`` samples are pushed through the streaming path
        (StreamResampler, content-identical to the whole-array program)
        in ``max_chunk``-sized blocks, so the device working set is
        O(channels x max_chunk) instead of O(channels x N).  Default
        None keeps the single jitted whole-array program (fastest; one
        executable per input shape)."""
        x = jnp.asarray(x, dtype=self.dtype)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        C, N = x.shape
        if out_len is None:
            out_len = self.default_out_len(N)
        if not self.plan.stages:  # src == dst passthrough
            y = x[:, :out_len]
            if out_len > N:
                y = jnp.pad(y, ((0, 0), (0, out_len - N)))
            return y[0] if squeeze else y
        if max_chunk is not None and max_chunk < 1:
            raise ValueError(f"max_chunk must be >= 1, got {max_chunk}")
        if max_chunk is not None and N > max_chunk:
            from .stream import StreamResampler
            sr = StreamResampler(self, block_len=int(max_chunk))
            xs = np.asarray(x)
            outs = [sr.process(xs[:, i0 : i0 + max_chunk])
                    for i0 in range(0, N, max_chunk)]
            outs.append(sr.flush(out_len))
            y = jnp.asarray(
                np.concatenate(outs, axis=1)[:, :out_len], dtype=self.dtype)
            return y[0] if squeeze else y
        T = max(N, self.in_len_for_out(out_len))
        if T > N:
            x = jnp.pad(x, ((0, 0), (0, T - N)))
        y = self._jit_chain(x)[:, :out_len]
        return y[0] if squeeze else y


class Resampler16(Resampler):
    """16-bit precision preset, ReqAtten 136.45 dB (CDSPResampler.h:743-748)."""

    def __init__(self, src_rate, dst_rate, trans_band=2.0, dtype=jnp.float32):
        super().__init__(src_rate, dst_rate, trans_band, 136.45, 0, dtype)


class Resampler16IR(Resampler):
    """16-bit impulse-response preset, ReqAtten 109.56 dB
    (CDSPResampler.h:774-779)."""

    def __init__(self, src_rate, dst_rate, trans_band=2.0, dtype=jnp.float32):
        super().__init__(src_rate, dst_rate, trans_band, 109.56, 0, dtype)


class Resampler24(Resampler):
    """24-bit precision preset, ReqAtten 180.15 dB (CDSPResampler.h:804-809)."""

    def __init__(self, src_rate, dst_rate, trans_band=2.0, dtype=jnp.float32):
        super().__init__(src_rate, dst_rate, trans_band, 180.15, 0, dtype)
