"""Whole-array TPU stage executors.

Each planned stage (models/plan.py) gets a batched, shape-static executor:
``apply(x[C, N]) -> y[C, M]`` where M = stage_out_len(spec, N) is resolved at
trace time.  Channels ride the leading batch dimension; time is fully
vectorized — the reference's sample-serial ring buffers
(CDSPHBUpsampler.h:735-747, CDSPFracInterpolator.h:925-938) are replaced by
pure array transforms that XLA tiles onto the VPU/MXU.

Executor designs (reference counterpart -> TPU-native form):

* ConvExec — CDSPBlockConvolver.h:252-354 convolution with built-in
  integer up/down resampling.  Engines (measured on TPU v5e, 1024 ch):
  "toeplitz" (f32 fast default) — the polyphase superkernel as a dense
  matmul against a banded Toeplitz operator via segmented reshape-view
  einsums (2552 Mrops full-chain); "fft" — batched overlap-save
  rfft/irfft, the f64/CPU-parity path and, in precision="high", the df32
  two-float FFT that guarantees the -141 dB class; "direct" — strided
  conv_general_dilated (kept for reference: XLA:TPU lowers it as
  shift-adds, 13x slower than even its FFT).
* HBUpExec / HBDownExec — CDSPHBUpsampler/Downsampler sparse symmetric
  stencils as tap-symmetric shifted slice-adds (the same symmetry the
  reference's genhbc SIMD kernels exploit), fused by XLA into single VPU
  passes.
* FracWholeExec — CDSPFracInterpolator.h whole-stepping mode (:991-1060).
  The bank of out_step phase filters becomes a dense "superkernel" matrix
  [out_step, D]; engine "im2col" (default when windows barely overlap)
  computes it as a framed matmul at stride in_step on the MXU.
* FracPolyExec — polynomial mode (:1069-1179).  Read positions are
  data-independent; they are computed host-side in f64 (matching the
  reference's resettable-counter timing, :907-919) and passed as device
  arrays; the stage is a gather of spline-coefficient rows + fused
  polynomial evaluation and tap-sum.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lengths import frac_positions, stage_out_len
from ..models.plan import ConvStage, FracStage, HBDownStage, HBUpStage, Stage

__all__ = ["ConvExec", "HBUpExec", "HBDownExec", "FracWholeExec",
           "FracPolyExec", "build_exec"]


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _frames(xp: jnp.ndarray, n_blocks: int, hop: int, L_f: int
            ) -> jnp.ndarray:
    """Overlapping frames [C, n_blocks, L_f] at stride ``hop`` via chunked
    reshape+concat (no gather, no conv)."""
    C = xp.shape[0]
    n_seg = -(-L_f // hop)  # segments of length hop covering L_f
    total = (n_blocks + n_seg) * hop
    pad = total - xp.shape[1]
    if pad > 0:
        xp = jnp.pad(xp, ((0, 0), (0, pad)))
    else:
        xp = xp[:, :total]
    chunks = xp.reshape(C, n_blocks + n_seg, hop)
    segs = [chunks[:, e : n_blocks + e, :] for e in range(n_seg)]
    return jnp.concatenate(segs, axis=-1)[:, :, :L_f]


#: MXU precision for residual (lo) operator passes.  The residual operator
#: is ~2^-24 the magnitude of the main term, so its matmul only needs ~8
#: bits of relative accuracy: one bf16 MXU pass (DEFAULT) contributes
#: ~2^-34 relative error to the sum — far below the f32 target — at 1/6th
#: the cost of the 6-pass HIGHEST decomposition.  This is what makes
#: precision="high" ~7/6x (not 2x) the fast path's cost.
RESIDUAL_PRECISION = jax.lax.Precision.DEFAULT


def _df_collapse_input(h, l, n_valid):
    """Collapse a df32 seam pair to a single sliced input for stages
    (or engines) without a carry path: slice both streams to the
    logical prefix and add once — exactly the non-carry seam rounding.
    Shared by every apply_df fallback (round-5 review: six hand-
    maintained copies had already drifted)."""
    hl = h if h.shape[1] == n_valid else h[:, :n_valid]
    if l is not None:
        hl = hl + (l if l.shape[1] == n_valid else l[:, :n_valid])
    return hl


def _framed_matmul(xp: jnp.ndarray, T: jnp.ndarray, n_blocks: int, hop: int,
                   precision=None, T_lo=None) -> jnp.ndarray:
    """out[c, b, k] = sum_l frames[c, b, l] * T[l, k] with
    frames[c, b, l] = xp[c, b*hop + l], WITHOUT materializing the
    overlapping frames: einsum(concat(segs), T) == sum_e einsum(seg_e,
    T_rows_e), and each segment is a pure reshape view of xp — the
    overlap-duplicated HBM round trip disappears.

    T_lo (optional, (row_offset, operator)): TRUNCATED kernel-
    representation residual, applied as a separate cheap-precision
    (RESIDUAL_PRECISION) framed matmul over the shifted window — rows of
    the f64->f32 residual whose magnitude falls below 2^-34 of the main
    operator contribute under the output noise floor and are dropped at
    build time (typically >half the band, so the residual costs well
    under 1/6th of the main matmul)."""
    if precision is None:
        precision = jax.lax.Precision.HIGHEST

    C = xp.shape[0]
    L_f = T.shape[0]
    n_seg = -(-L_f // hop)
    total = (n_blocks + n_seg) * hop
    pad = total - xp.shape[1]
    if pad > 0:
        xpp = jnp.pad(xp, ((0, 0), (0, pad)))
    else:
        xpp = xp[:, :total]
    # NOTE (round 5): a VMEM framed-matmul Pallas kernel for this
    # contraction was built, measured, and DELETED.  The round-4 scout's
    # "Mosaic GEMM 1.28x XLA" compared variants on a MATERIALIZED frames
    # tensor; on the formulation the chain actually runs (reshape-view
    # segmented einsums) XLA measures 24.5 Tflop/s vs Mosaic's best 19.3
    # on the exact conv shape — tools/exp_framed_kernel.py, evidence in
    # NEXT.md "Round-5 framed-kernel autopsy".
    chunks = xpp.reshape(C, n_blocks + n_seg, hop)
    if os.environ.get("R8BT_FRAMED_IM2COL") == "1" and T_lo is None:
        # A/B variant: materialize the overlapping frames once (concat of
        # the same segment views) so the contraction is ONE K=L_f GEMM
        # instead of n_seg K=hop GEMMs — trades an overlap-duplicated
        # HBM round trip for deeper-K MXU pipelining
        frames = jnp.concatenate(
            [chunks[:, e : n_blocks + e, : min(hop, L_f - e * hop)]
             for e in range(n_seg)], axis=2)
        return jnp.einsum("cbl,lk->cbk", frames, T, precision=precision)
    out = None
    for e in range(n_seg):
        w = min(hop, L_f - e * hop)
        seg = chunks[:, e : n_blocks + e, :w]
        Te = jax.lax.slice(T, (e * hop, 0), (e * hop + w, T.shape[1]))
        o = jnp.einsum("cbl,lk->cbk", seg, Te, precision=precision)
        out = o if out is None else out + o
    if T_lo is not None:
        r0, Tl = T_lo
        if Tl.shape[0]:
            # the residual is ~2^-24 of the main term: one bf16 MXU pass
            # keeps its contribution ~2^-32-exact at 1/6th the pass cost.
            # Each residual segment is an offset window into the SAME
            # chunk tensor as the main pass (sliced, not re-framed), so
            # the residual adds no second HBM read of the input — the
            # bf16 convert fuses into the matmul operand read.
            L_lo = Tl.shape[0]
            lo = None
            for e in range(r0 // hop, (r0 + L_lo - 1) // hop + 1):
                a0 = max(r0, e * hop)          # absolute row range of
                a1 = min(r0 + L_lo, e * hop + hop)  # Tl inside segment e
                seg = chunks[:, e : n_blocks + e, a0 - e * hop : a1 - e * hop]
                Te = jax.lax.slice(Tl, (a0 - r0, 0), (a1 - r0, Tl.shape[1]))
                o = jnp.einsum("cbl,lk->cbk", seg.astype(jnp.bfloat16),
                               Te.astype(jnp.bfloat16),
                               precision=RESIDUAL_PRECISION)
                lo = o if lo is None else lo + o
            out = out + lo.astype(out.dtype)
    return out


def truncate_residual(Tlo: np.ndarray, scale: float):
    """(row_offset, contiguous significant rows) of a residual operator:
    rows with max|Tlo| <= scale * 2^-31 contribute below the f32 output
    noise floor.  The bound is linear (worst-case), not statistical: the
    dropped rows' summed L1 mass relative to the main operator measures
    -186 dB for the flagship fused operator (audited in
    tests/test_r2_fixes.py), 40+ dB under the -141 dB class."""
    rn = np.abs(Tlo).max(axis=1)
    idx = np.nonzero(rn > scale * 2.0**-31)[0]
    if idx.size == 0:
        return 0, Tlo[:0]
    r0, r1 = int(idx.min()), int(idx.max()) + 1
    return r0, np.ascontiguousarray(Tlo[r0:r1])


def _conv1d(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
            precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Batched correlation: out[c, f, n] = sum_j k[f, j] x[c, n*stride + j].

    x: [C, L], kernel: [F, D] -> [C, F, n_out].  (XLA convolution is a
    correlation — no kernel flip.)
    """
    lhs = x[:, None, :]  # [C, 1, L]
    rhs = kernel[:, None, :]  # [F, 1, D]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), precision=precision)
    return out  # [C, F, n_out]


class ConvExec:
    """Convolver with integer up/down resampling.

    Content semantics (identical to the oracle's OracleConv):
        u = zero-stuffed input, w = kernel (*) u (causal),
        y[r] = w[r*down + offset],  r in [0, M).

    Engines (auto: f32 fast -> toeplitz; else fft):
      * "toeplitz" — the polyphase superkernel SK[j, d] (for outputs
        r = m*up + j the kernel indices are independent of m) as a dense
        matmul against a banded Toeplitz operator via segmented
        reshape-view einsums; guaranteed MXU lowering.  precision="high"
        adds a kernel-residual matmul pass.
      * "fft" — batched overlap-save rfft/irfft (the reference's execution
        model, CDSPBlockConvolver.h:252-354); float64/CPU-parity path and,
        with precision="high", the df32 two-float FFT (-141 dB class on
        any backend).
      * "pallas" — fused mini-Toeplitz kernel (ops/pallas_frac.py); only
        when the cell stride is 128-aligned, else falls back to toeplitz.
      * "direct" — strided conv_general_dilated; kept for comparison (XLA
        TPU lowers long 1D convs as shift-adds, far slower).
    """

    def __init__(self, spec: ConvStage, dtype=jnp.float32, ext: int = 2,
                 precision: str = "fast", engine: str = "auto"):
        self.spec = spec
        self.dtype = jnp.dtype(dtype)
        self.precision = precision if self.dtype == jnp.float32 else "fast"
        if engine == "auto":
            # f32 (fast AND high): banded-Toeplitz MXU matmul — in high
            # precision it adds a cheap kernel-residual pass and meets the
            # -141 dB class at ~7/6x the fast cost (the df32-FFT stays
            # selectable via engine="fft" as the backend-independent
            # guarantee).  f64 (CPU parity/testing): FFT overlap-save.
            engine = "toeplitz" if self.dtype == jnp.float32 else "fft"
        self.engine = engine
        self.framed5 = False
        self.framed5_poly = False
        k = np.asarray(spec.filt.kernel, dtype=np.float64)
        self.K = k.shape[0]
        if engine in ("pallas_fft", "pallas_fft4", "pallas_fft5"):
            # the VMEM-resident df32-FFT kernels share the fft framing
            self.precision = "high"
        elif engine in ("direct", "toeplitz", "toeplitz_sym", "pallas",
                        "ozaki"):
            self._build_direct(k)
            if engine == "toeplitz":
                self._build_toeplitz()
            elif engine == "ozaki":
                self._build_ozaki()
            elif engine == "toeplitz_sym":
                if not self._build_toeplitz_sym():
                    from ..utils.trace import trace
                    trace("conv_toeplitz_sym_fallback", K=self.K,
                          up=spec.up, down=spec.down)
                    self.engine = "toeplitz"
                    self._build_toeplitz()
            elif engine == "pallas":
                self._build_pallas()
            return
        P = self.K - 1
        nfft = max(128, _next_pow2(max(1, P)) << ext)
        # ensure the saved overlap fits in one hop (frame framing trick)
        while nfft - P < P:
            nfft *= 2
        self.nfft = nfft
        self.hop = nfft - P
        # stored as host numpy: traced into the jitted program as
        # literals (device arrays closed over as jit constants would force
        # a device->host transfer at trace time, unsupported on some
        # remote-TPU backends)
        if self.precision == "high":
            # full complex f64 spectrum with the 1/N inverse scale folded
            # in; consumed hi/lo-split by the df32 FFT convolver
            Hfull = np.fft.fft(k, n=nfft) / nfft
            if engine == "pallas_fft":
                from .pallas_dfft import DfFFTConvPlan
                self.dfft_plan = DfFFTConvPlan(nfft, Hfull)
            elif engine == "pallas_fft4":
                from .pallas_dfft4 import DfFFTConvPlan4
                self.dfft_plan = DfFFTConvPlan4(nfft, Hfull)
            elif engine == "pallas_fft5":
                from .pallas_dfft5 import (DfFFTConvPlan5, framed_supported,
                                           supported_n)
                if spec.up == 2:
                    # polyphase fold: the stuffed up=2 convolution is two
                    # half-rate convolutions of the UNSTUFFED input with
                    # k_even/k_odd — one shared forward FFT at half the
                    # size, the same trick as the reference's UpShift
                    # input-FFT fold (CDSPBlockConvolver.h:62-110)
                    ke, ko = k[0::2], k[1::2]
                    Px = max(ke.shape[0], ko.shape[0]) - 1
                    nx = max(4096, _next_pow2(max(1, Px)) << ext)
                    while Px > nx // 4:
                        nx *= 2
                    if framed_supported(nx):
                        self.dfft_plan = DfFFTConvPlan5(
                            nx, np.fft.fft(ke, n=nx) / nx,
                            np.fft.fft(ko, n=nx) / nx)
                        self.framed5_poly = True
                        self.H_hi = self.H_lo = None
                        return
                if supported_n(nfft):
                    self.dfft_plan = DfFFTConvPlan5(nfft, Hfull)
                    # in-VMEM overlap-save: frames are assembled from
                    # blocked views inside the kernel (hop = 3n/4, head
                    # p_pad = n/4 >= P required for OLS validity)
                    self.framed5 = (framed_supported(nfft)
                                    and P <= nfft // 4)
                    if self.framed5:
                        self.hop = self.dfft_plan.hop
                else:
                    # four-step layout needs n = A*128, A pow2 in [8,128];
                    # out-of-range kernels keep the roll-form v2 engine
                    from ..utils.trace import trace
                    trace("conv_pallas_fft5_fallback", nfft=nfft)
                    from .pallas_dfft4 import DfFFTConvPlan4
                    self.engine = "pallas_fft4"
                    self.dfft_plan = DfFFTConvPlan4(nfft, Hfull)
            else:
                from .dfft import DfFFT
                self.H_re = np.ascontiguousarray(Hfull.real)
                self.H_im = np.ascontiguousarray(Hfull.imag)
                self.dfft_plan = DfFFT(nfft)
            self.H_hi = self.H_lo = None
        elif self.dtype == jnp.float32:
            Hf = np.fft.rfft(k, n=nfft)
            hi = Hf.astype(np.complex64)
            lo = (Hf - hi.astype(np.complex128)).astype(np.complex64)
            self.H_hi = hi
            self.H_lo = lo
        else:
            self.H_hi = np.fft.rfft(k, n=nfft).astype(np.complex128)
            self.H_lo = None

    def _build_direct(self, k: np.ndarray):
        """Polyphase superkernel: SK[j, d] = k[(j*down + off) - (s_min+d)*up]
        so that y[m*up + j] = sum_d SK[j, d] * x[m*down + s_min + d]."""
        spec = self.spec
        up, down, off = spec.up, spec.down, spec.offset
        K = self.K
        s_los, s_his = [], []
        for j in range(up):
            tj = j * down + off
            s_los.append(-(-(tj - K + 1) // up))  # ceil
            s_his.append(tj // up)
        s_min = min(s_los)
        s_max = max(s_his)
        D = s_max - s_min + 1
        sk = np.zeros((up, D), dtype=np.float64)
        for j in range(up):
            tj = j * down + off
            for d in range(D):
                kidx = tj - (s_min + d) * up
                if 0 <= kidx < K:
                    sk[j, d] = k[kidx]
        self._sk64 = sk  # full-precision superkernel (residual source)
        self.sk_direct = sk.astype(self.dtype)
        if self.precision == "high":
            hi = sk.astype(np.float32)
            self.sk_lo = (sk - hi.astype(np.float64)).astype(np.float32)
        self.s_min = s_min
        self.D_direct = D

    def _build_toeplitz(self, B: int = 256):
        """Banded-Toeplitz matmul form of the polyphase superkernel.

        XLA:TPU lowers long stride-1 1D convolutions as shift-and-add VPU
        passes (measured ~13x slower than even its FFT); a dense matmul
        against a banded Toeplitz operator is guaranteed MXU lowering:

            y[(b*B + t)*up + j] = frames[b] . T[:, t*up + j]
            frames[b, l] = x[b*B*down + s_min + l],  l in [0, (B-1)*down + D)
            T[t*down + d, t*up + j] = SK[j, d]

        FLOPs per output = ((B-1)*down + D)/up vs the optimal D/up — the
        waste factor (1 + B*down/D) buys full MXU utilization.

        Default band B=256: on the poly chain (D = 709/306 conv stages)
        the chip measured exec Mrops 2203/2374/2392/2071 at
        B = 512/384/256/128 — the dots run at the ~33 Tflop/s f32-HIGHEST
        roof from 256 columns up, so smaller band waste wins until the
        column count drops under ~512 lanes (B=128).  R8BT_TOEP_B
        overrides for A/B sweeps (plain operator only; the folded sym
        engine is pinned at 256, see _build_toeplitz_sym).
        """
        spec = self.spec
        up, down = spec.up, spec.down
        D = self.D_direct
        env_b = os.environ.get("R8BT_TOEP_B")
        if env_b is not None:
            try:
                B = int(env_b)
            except ValueError as e:
                raise ValueError(f"R8BT_TOEP_B={env_b!r} is not an int") \
                    from e
            if B < 16:
                raise ValueError(f"R8BT_TOEP_B={B} must be >= 16")
        # keep the flop waste (B*down/D) bounded while B stays MXU-friendly
        while B * down > 2 * D and B > 128:
            B //= 2
        # build from the FULL-precision superkernel: deriving the operator
        # from the dtype-rounded sk_direct would make the high-precision
        # residual Tlo identically zero (the values would already be
        # exactly representable)
        sk64 = self._sk64
        # single full-band operator: chunking the tap dimension (fewer
        # MACs: (D + G*B*down)/up vs (B*down + D)/up) was measured SLOWER
        # on TPU v5e (18.2 vs 14.3 ms/iter at 1024 ch) — several smaller
        # matmuls lose more to scheduling than the band zeros cost
        step = D
        self.toep_chunks = []
        for d0 in range(0, D, step):
            dc = min(step, D - d0)
            L_f = (B - 1) * down + dc
            T = np.zeros((L_f, B * up), dtype=np.float64)
            for t in range(B):
                for j in range(up):
                    T[t * down : t * down + dc, t * up + j] = \
                        sk64[j, d0 : d0 + dc]
            Thi = T.astype(self.dtype)
            Tlo = None
            if self.precision == "high":
                # kernel-representation residual: one extra (cheap,
                # row-truncated) matmul pass makes the operator
                # effectively f64-accurate; the remaining error is the
                # backend's f32 accumulation
                lo_full = (T - Thi.astype(np.float64)).astype(self.dtype)
                Tlo = truncate_residual(lo_full, float(np.abs(Thi).max()))
            self.toep_chunks.append((d0, Thi, Tlo))
        self.B_toep = B
        # Column-tiled variant (R8BT_TOEP_COLTILE=<tile cols>, 0=off):
        # the banded operator's nonzeros for a tile of TC output columns
        # span only D + (TC/up - 1)*down of its (B-1)*down + D rows, so
        # row-windowed per-tile matmuls skip the band's zero corners
        # (~18% of the MACs at TC=256, B=256) at the cost of more,
        # narrower einsums + one output concat.  A/B'd on chip.
        tc = int(os.environ.get("R8BT_TOEP_COLTILE", "0") or 0)
        self.toep_tiles = None
        if tc and tc % up == 0 and (B * up) % tc == 0 and tc < B * up:
            tiles = []
            for d0, Thi, _Tlo in self.toep_chunks:
                dc = Thi.shape[0] - (B - 1) * down
                T64 = None
                if self.precision == "high":
                    # rebuild the f64 operator for per-tile residuals
                    T64 = np.zeros(Thi.shape, dtype=np.float64)
                    for t in range(B):
                        for j in range(up):
                            T64[t * down : t * down + dc, t * up + j] = \
                                sk64[j, d0 : d0 + dc]
                per = []
                for c0 in range(0, B * up, tc):
                    t_lo, t_hi = c0 // up, (c0 + tc) // up
                    r0 = t_lo * down
                    r1 = (t_hi - 1) * down + dc
                    Tt = np.ascontiguousarray(Thi[r0:r1, c0 : c0 + tc])
                    Tlo_t = None
                    if T64 is not None:
                        lo = (T64[r0:r1, c0 : c0 + tc]
                              - Tt.astype(np.float64)).astype(self.dtype)
                        Tlo_t = truncate_residual(
                            lo, float(np.abs(Thi).max()))
                    per.append((c0, r0, Tt, Tlo_t))
                tiles.append((d0, per))
            self.toep_tiles = tiles

    def _build_ozaki(self, B: int = 256):
        """Error-free split-operand form of the banded-Toeplitz operator
        (ops/ozaki.py): the backend-independent -141 dB guarantee on the
        MXU — 10 bfloat16 passes per 256-deep chunk with provably exact
        f32 accumulation, replacing the VPU df32-FFT as the default
        guarantee engine.  Same geometry as _build_toeplitz."""
        from .ozaki import split_operator_host

        spec = self.spec
        up, down = spec.up, spec.down
        D = self.D_direct
        env_b = os.environ.get("R8BT_TOEP_B")
        if env_b is not None:
            B = int(env_b)
        while B * down > 2 * D and B > 128:
            B //= 2
        sk64 = self._sk64
        L_f = (B - 1) * down + D
        T = np.zeros((L_f, B * up), dtype=np.float64)
        for t in range(B):
            for j in range(up):
                T[t * down: t * down + D, t * up + j] = sk64[j]
        self.oz_parts, self.oz_scale = split_operator_host(T)
        self.oz_Lf = L_f
        self.B_toep = B

    def _apply_ozaki(self, x: jnp.ndarray, M: int,
                     raw: bool = False, x_lo=None, pair: bool = False):
        from .ozaki import channel_scale, framed_matmul_ozaki
        from .pallas_ozaki import HAVE_PALLAS, choose_ct, ozaki_matmul_pallas

        spec = self.spec
        C, N = x.shape
        up, down = spec.up, spec.down
        B = self.B_toep
        n_cyc = -(-M // up)
        n_blocks = -(-n_cyc // B)
        pad_l = max(0, -self.s_min)
        hop = B * down
        L_f = self.oz_Lf
        n_seg = -(-L_f // hop)
        need = (n_blocks + n_seg) * hop
        pad_r = max(0, need - (N - self.s_min))
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad_l, pad_r)))
        xp = xp[:, self.s_min + pad_l:]
        xl = None
        if x_lo is not None:  # bf16 seam-residual stream: keep its dtype
            xl = jnp.pad(x_lo, ((0, 0), (pad_l, pad_r)))
            xl = xl[:, self.s_min + pad_l:]
        S = -(-L_f // 128) * 128
        Kcols = B * up
        use_pallas = (HAVE_PALLAS and hop % 128 == 0
                      and jax.default_backend() == "tpu"
                      and os.environ.get("R8BT_OZAKI_PALLAS", "1") != "0")
        if use_pallas:
            CT = choose_ct(-(-C // 8) * 8, S, L_f, Kcols)
            if CT:
                C_pad = -(-C // CT) * CT
                span = (n_blocks - 1) * hop + S

                def _fit(a):
                    if a.shape[1] < span:
                        a = jnp.pad(a, ((0, 0), (0, span - a.shape[1])))
                    else:
                        a = a[:, :span]
                    if C_pad != C:
                        a = jnp.pad(a, ((0, C_pad - C), (0, 0)))
                    return a

                xpp = _fit(xp)
                sx = channel_scale(xpp)
                if pair or xl is not None:
                    from .pallas_ozaki import _ozaki_matmul_pallas_var
                    res = _ozaki_matmul_pallas_var(
                        xpp, None if xl is None else
                        _fit(xl).astype(jnp.bfloat16),
                        sx, jnp.asarray(self.oz_parts),
                        L_f, hop, Kcols, CT, emit_pair=pair)
                    if pair:
                        yh, yl = res
                        if raw:
                            return yh[:C].astype(self.dtype), yl[:C]
                        return (yh[:C, :M].astype(self.dtype),
                                yl[:C, :M])
                    y = res[:C] if raw else res[:C, :M]
                    return y.astype(self.dtype)
                y = ozaki_matmul_pallas(
                    xpp, sx, jnp.asarray(self.oz_parts), L_f, hop,
                    Kcols, CT)
                y = y[:C] if raw else y[:C, :M]
                return y.astype(self.dtype)
        out = framed_matmul_ozaki(xp, jnp.asarray(self.oz_parts),
                                  n_blocks, hop, x_lo=xl, pair=pair)
        if pair:
            yh, yl = (o.reshape(C, n_blocks * Kcols) for o in out)
            if raw:
                return yh.astype(self.dtype), yl
            return yh[:, :M].astype(self.dtype), yl[:, :M]
        y = out.reshape(C, n_blocks * Kcols)
        return (y if raw else y[:, :M]).astype(self.dtype)

    def apply_df(self, h: jnp.ndarray, l, n_valid=None,
                 emit_pair: bool = True):
        """df32 inter-stage carry (round 5): consume the previous seam's
        (hi, lo-bfloat16) RAW pair (``l`` may be None — a chain's first
        stage; columns past ``n_valid`` are framing surplus, valid-
        prefix argument identical to apply_v), emit this stage's raw
        pair + logical count when ``emit_pair`` (False for a chain's
        last stage, whose output is collapsed anyway) — the per-seam
        f32 store roundings (the guarantee chain's dominant residual
        error, NEXT.md round-5 #2) AND the per-seam slice/re-pad HBM
        round trips never happen.  Only the ozaki engine carries; other
        engines collapse (one rounding, exactly the non-carry seam).
        Returns (h, l, n_out)."""
        if n_valid is None:
            n_valid = h.shape[1]
        M = self.out_len(n_valid)
        if M <= 0:
            z = jnp.zeros((h.shape[0], 0), dtype=self.dtype)
            return z, None, 0
        if self.engine != "ozaki":
            y = self.apply(_df_collapse_input(h, l, n_valid))
            return y, None, y.shape[1]
        res = self._apply_ozaki(h, M, raw=True, x_lo=l, pair=emit_pair)
        if emit_pair:
            return res[0], res[1], M
        return res, None, M

    def _build_toeplitz_sym(self, B: int = 256) -> bool:
        """Centrosymmetry-folded banded-Toeplitz operators: HALF the MXU
        flops for linear-phase (symmetric) kernels.

        The reference's own kernels are symmetric by construction
        (CDSPSincFilterGen.h:312-395 windowed-sinc band kernels; its HB
        kernels exploit exactly this, CDSPHBUpsampler.inc:5-7) — a full
        MAC per tap leaves a provable 2x on the table.  Per phase j the
        superkernel row SK[j] of a symmetric kernel is palindromic about
        its own support center whenever up | (2*(j*down+off) - (K-1))
        (always for up = 1, and for up = 2 with odd K — every ConvStage
        the planner emits).  The per-phase banded operator
        T[t*down + d, t] = SK_j[d] is then CENTROSYMMETRIC
        (T = flip_rows(flip_cols(T))), so it block-diagonalizes under the
        even/odd fold: with z = fr + flip(fr), w = fr - flip(fr),

            y[t] + y[B-1-t] = z[:Hp] . Te,   Te = T[:H] + flip(T[H:])
            y[t] - y[B-1-t] = w[:Hp] . To,   To = T[:H] - flip(T[H:])

        and both right-hand sides are SYMMETRIC/ANTISYMMETRIC in t, so
        only the first B/2 output columns of each are needed: two
        (L_f/2 x B/2) matmuls replace one (L_f x B) — exactly half the
        MACs at identical band waste.  The fold itself is one flip of
        the stage input plus segment adds that fuse into the matmul
        operand reads; recombination is one half-width column flip.

        Numerics: the f32 fold add rounds at 2^-24 of |z| per element
        (~the f32 input-representation class).  ``sym_comp`` (default on
        for precision="high") applies the EXACT two_sum fold error as
        one cheap bf16 residual matmul per fold, pushing the added noise
        to ~2^-32.

        Returns False (caller falls back to the plain operator) when the
        kernel is not bit-symmetric or any phase row is not palindromic.
        """
        spec = self.spec
        up, down = spec.up, spec.down
        k = np.asarray(spec.filt.kernel, dtype=np.float64)
        if not np.array_equal(k, k[::-1]):
            return False
        sk64 = self._sk64
        # per-phase tight support + palindromicity
        phases = []
        for j in range(up):
            nz = np.nonzero(sk64[j])[0]
            if nz.size == 0:
                return False
            dlo, dhi = int(nz.min()), int(nz.max())
            row = sk64[j, dlo : dhi + 1]
            if not np.array_equal(row, row[::-1]):
                return False
            phases.append((dlo, row))
        # SYMMETRIC extension to a common window origin: padding e zeros
        # on BOTH sides keeps each row palindromic, and with every
        # dlo == dmin the phases share one frame origin — the Pallas
        # kernel then needs no unaligned in-VMEM slices at all
        dmin = min(dlo for dlo, _ in phases)
        phases = [(dmin, np.pad(row, (dlo - dmin, dlo - dmin)))
                  for dlo, row in phases]
        # B is FIXED at 256: the folded dots have B/2 output columns, so
        # any smaller B leaves MXU lanes empty (B=128 -> 64 lanes = half
        # wasted), which costs more than the band-zero waste it saves —
        # unlike the plain operator, which can shrink to B=128
        self.B_sym = B
        self.sym_dmin = dmin
        self.sym_comp = self.precision == "high"
        self.toep_sym = []
        for j, (dlo, row) in enumerate(phases):
            Dj = row.shape[0]
            L_f = (B - 1) * down + Dj
            T = np.zeros((L_f, B), dtype=np.float64)
            for t in range(B):
                T[t * down : t * down + Dj, t] = row
            H = L_f // 2
            Hp = (L_f + 1) // 2
            Bh = B // 2
            Te = np.zeros((Hp, Bh), dtype=np.float64)
            To = np.zeros((Hp, Bh), dtype=np.float64)
            Te[:H] = 0.5 * (T[:H, :Bh] + T[L_f - 1 : L_f - 1 - H : -1, :Bh])
            To[:H] = 0.5 * (T[:H, :Bh] - T[L_f - 1 : L_f - 1 - H : -1, :Bh])
            if L_f % 2:
                Te[Hp - 1] = 0.5 * T[Hp - 1, :Bh]
                # To center row is identically zero (w[center] = 0)
            Te_hi = Te.astype(self.dtype)
            To_hi = To.astype(self.dtype)
            Te_lo = To_lo = None
            if self.precision == "high":
                scale = float(max(np.abs(Te_hi).max(), np.abs(To_hi).max()))

                def _aligned(tr):
                    # 128-align the residual row range so the Pallas
                    # operand slice needs no VMEM relayout (zero rows
                    # ride a cheap bf16 pass)
                    r0, rows = tr
                    if rows.shape[0] == 0:
                        return tr
                    r1 = r0 + rows.shape[0]
                    r0a = (r0 // 128) * 128
                    r1a = min(Hp, -(-r1 // 128) * 128)
                    out = np.zeros((r1a - r0a, rows.shape[1]), rows.dtype)
                    out[r0 - r0a : r1 - r0a] = rows
                    return (r0a, out)

                Te_lo = _aligned(truncate_residual(
                    (Te - Te_hi.astype(np.float64)).astype(self.dtype),
                    scale))
                To_lo = _aligned(truncate_residual(
                    (To - To_hi.astype(np.float64)).astype(self.dtype),
                    scale))
            self.toep_sym.append(
                dict(dlo=dlo, L_f=L_f, Hp=Hp, Te=Te_hi, To=To_hi,
                     Te_lo=Te_lo, To_lo=To_lo))
        return True

    def _use_sym_pallas(self, C: int) -> int:
        """Channel tile for the fused fold kernel, or 0 for the XLA path
        (non-f32 dtypes, CPU backend, or shapes that don't tile)."""
        if self.dtype != jnp.float32:
            return 0
        try:
            from .pallas_symconv import HAVE_PALLAS, choose_ct
        except Exception:  # pragma: no cover
            return 0
        interp = getattr(self, "sym_pallas_interpret", False)
        # the kernel is Mosaic/TPU-only: any non-TPU backend (CPU, GPU)
        # must take the XLA fold path unless interpret mode is forced
        if not HAVE_PALLAS or (jax.devices()[0].platform != "tpu"
                               and not interp):
            return 0
        hop = self.B_sym * self.spec.down
        if hop % 128:  # vacuous while B_sym is pinned at 256; guards the
            return 0   # kernel's DMA alignment if B_sym ever varies
        Hp_max = max(ph["Hp"] for ph in self.toep_sym)
        lo_rows = 0
        if self.precision == "high":
            lo_rows = sum(max(1, ph[k][1].shape[0])
                          for ph in self.toep_sym
                          for k in ("Te_lo", "To_lo"))
        return choose_ct(C, hop, Hp_max, self.B_sym, 8, self.spec.up,
                         lo_rows=lo_rows)

    def _apply_toeplitz_sym(self, x: jnp.ndarray, M: int) -> jnp.ndarray:
        spec = self.spec
        C, N = x.shape
        up, down = spec.up, spec.down
        B = self.B_sym
        Bh = B // 2
        hop = B * down
        n_cyc = -(-M // up)
        nb = -(-n_cyc // B)
        CT = self._use_sym_pallas(C)
        if CT:
            return self._apply_sym_pallas(x, C, M, CT)
        pad_l = max(0, -self.s_min)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (pad_l, 0)))
        xp = xp[:, self.s_min + pad_l :]
        per_phase = []
        for ph in self.toep_sym:
            dlo, L_f, Hp = ph["dlo"], ph["L_f"], ph["Hp"]
            n_seg = -(-Hp // hop)
            buf_len = (nb + n_seg) * hop
            need_f = (nb - 1) * hop + L_f  # meaningful frame extent
            xj = xp[:, dlo:]
            if xj.shape[1] < need_f:
                xj = jnp.pad(xj, ((0, 0), (0, need_f - xj.shape[1])))
            # reversed-frame operand: flip(fr_b)[l] = fr_b[L_f-1-l] is a
            # forward frame of the REVERSED meaningful prefix (prefix
            # slicing is free; one flip pass per phase)
            xr = jnp.flip(xj[:, :need_f], axis=-1)
            xf_buf = (jnp.pad(xj[:, :buf_len],
                              ((0, 0), (0, max(0, buf_len - xj.shape[1]))))
                      if xj.shape[1] < buf_len else xj[:, :buf_len])
            xr_buf = (jnp.pad(xr, ((0, 0), (0, buf_len - need_f)))
                      if need_f < buf_len else xr[:, :buf_len])
            cf = xf_buf.reshape(C, nb + n_seg, hop)
            cr = xr_buf.reshape(C, nb + n_seg, hop)
            Te = jnp.asarray(ph["Te"])
            To = jnp.asarray(ph["To"])
            out_e = out_o = None
            comp_e = comp_o = None
            for e in range(n_seg):
                w = min(hop, Hp - e * hop)
                a = cf[:, e : nb + e, :w]
                # chunks of the reversed prefix hold the flipped frames in
                # REVERSED block order (frame beta of xr == block nb-1-beta
                # of the forward framing): flip the block (sublane) axis
                b = jnp.flip(cr[:, e : nb + e, :w], axis=1)
                z = a + b
                wseg = a - b
                Te_e = jax.lax.slice(Te, (e * hop, 0), (e * hop + w, Bh))
                To_e = jax.lax.slice(To, (e * hop, 0), (e * hop + w, Bh))
                oe = jnp.einsum("cbl,lk->cbk", z, Te_e,
                                precision=jax.lax.Precision.HIGHEST)
                oo = jnp.einsum("cbl,lk->cbk", wseg, To_e,
                                precision=jax.lax.Precision.HIGHEST)
                out_e = oe if out_e is None else out_e + oe
                out_o = oo if out_o is None else out_o + oo
                if self.sym_comp:
                    # exact fold-rounding compensation (two_sum error of
                    # a+b and a-b), applied at RESIDUAL_PRECISION: the
                    # error operand is ~2^-24 of z, so one bf16 pass
                    # leaves ~2^-32 — below even the high path's floor
                    bz = z - a
                    z_err = (a - (z - bz)) + (b - bz)
                    bv = wseg - a
                    w_err = (a - (wseg - bv)) - (b + bv)
                    ce = jnp.einsum("cbl,lk->cbk",
                                    z_err.astype(jnp.bfloat16),
                                    Te_e.astype(jnp.bfloat16),
                                    precision=RESIDUAL_PRECISION)
                    co = jnp.einsum("cbl,lk->cbk",
                                    w_err.astype(jnp.bfloat16),
                                    To_e.astype(jnp.bfloat16),
                                    precision=RESIDUAL_PRECISION)
                    comp_e = ce if comp_e is None else comp_e + ce
                    comp_o = co if comp_o is None else comp_o + co
            # kernel-representation residual (precision="high"): one
            # bf16 pass over the truncated row block of each operator
            if self.precision == "high":
                for lo, ops in ((ph["Te_lo"], "e"), (ph["To_lo"], "o")):
                    r0, Tl = lo
                    if not Tl.shape[0]:
                        continue
                    L_lo = Tl.shape[0]
                    acc = None
                    for e in range(r0 // hop, (r0 + L_lo - 1) // hop + 1):
                        a0 = max(r0, e * hop)
                        a1 = min(r0 + L_lo, e * hop + hop)
                        a = cf[:, e : nb + e, a0 - e * hop : a1 - e * hop]
                        b = jnp.flip(
                            cr[:, e : nb + e, a0 - e * hop : a1 - e * hop],
                            axis=1)
                        seg = (a + b) if ops == "e" else (a - b)
                        Tle = jax.lax.slice(jnp.asarray(Tl), (a0 - r0, 0),
                                            (a1 - r0, Bh))
                        o = jnp.einsum("cbl,lk->cbk",
                                       seg.astype(jnp.bfloat16),
                                       Tle.astype(jnp.bfloat16),
                                       precision=RESIDUAL_PRECISION)
                        acc = o if acc is None else acc + o
                    if acc is not None:
                        if ops == "e":
                            out_e = out_e + acc.astype(out_e.dtype)
                        else:
                            out_o = out_o + acc.astype(out_o.dtype)
            if comp_e is not None:
                out_e = out_e + comp_e.astype(out_e.dtype)
                out_o = out_o + comp_o.astype(out_o.dtype)
            # recombine: y[t] = e+o (t < B/2), y[B-1-t] = e-o
            y_first = out_e + out_o
            y_second = jnp.flip(out_e - out_o, axis=-1)
            yj = jnp.concatenate([y_first, y_second], axis=-1)
            per_phase.append(yj.reshape(C, nb * B))
        if up == 1:
            y = per_phase[0]
        else:
            y = jnp.stack(per_phase, axis=-1).reshape(C, nb * B * up)
        return y[:, :M]

    def _apply_sym_pallas(self, x: jnp.ndarray, C: int, M: int,
                          CT: int) -> jnp.ndarray:
        """Folded convolver via the fused stage kernel: fold in VMEM,
        frame-order reversal absorbed into the DMA index (the XLA fold
        path materializes every rev/pad/slice — measured 65% of device
        time).  One kernel call per stage: all phases share the forward
        window DMA and a common frame origin (x[s_min + dmin + b*hop]),
        so no unaligned in-VMEM slices exist."""
        from .pallas_symconv import sym_conv_stage_pallas

        spec = self.spec
        up, down = spec.up, spec.down
        B = self.B_sym
        hop = B * down
        n_cyc = -(-M // up)
        nb = -(-n_cyc // B)
        Q = min(8, nb)
        nbp_pad = -(-nb // Q) * Q
        start0 = self.s_min + self.sym_dmin
        pad_l = max(0, -start0)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (pad_l, 0)))
        xp = xp[:, start0 + pad_l :]
        P_max = (nbp_pad - 1) * hop + max(ph["L_f"] for ph in self.toep_sym)
        if xp.shape[1] < P_max:
            xp = jnp.pad(xp, ((0, 0), (0, P_max - xp.shape[1])))
        xrs, tes_tos, los, r0s, Hps = [], [], [], [], []
        for ph in self.toep_sym:
            L_f, Hp = ph["L_f"], ph["Hp"]
            Hps.append(Hp)
            # rev row l of frame b = xp[b*hop + L_f-1-l]
            #                      = flip(xp[:, :P])[(nbp-1-b)*hop + l]
            P = (nbp_pad - 1) * hop + L_f
            xrs.append(jnp.flip(jax.lax.slice(xp, (0, 0), (C, P)),
                                axis=-1))
            tes_tos += [jnp.asarray(ph["Te"]), jnp.asarray(ph["To"])]
            if self.precision == "high":
                pr0 = []
                for r0, rows in (ph["Te_lo"], ph["To_lo"]):
                    if rows.shape[0] == 0:
                        r0, rows = 0, np.zeros((1, B // 2), self.dtype)
                    los.append(jnp.asarray(rows))
                    pr0.append(r0)
                r0s.append(tuple(pr0))
        kw = {}
        if self.precision == "high":
            kw = dict(los=tuple(los), r0s=tuple(r0s), comp=self.sym_comp)
        if getattr(self, "sym_pallas_interpret", False):
            kw["interpret"] = True
        out = sym_conv_stage_pallas(xp, tuple(xrs), tuple(tes_tos), nb, up,
                                    Q, hop, tuple(Hps), B, CT, **kw)
        # single assembly pass: flip the anti-palindromic half, restore
        # t-major order, interleave phases
        v = out.reshape(C, nbp_pad, up, 2, B // 2)
        y4 = jnp.concatenate([v[..., 0, :], jnp.flip(v[..., 1, :], -1)],
                             axis=-1)  # [C, nb, up, B]
        y = jnp.swapaxes(y4, 2, 3).reshape(C, nbp_pad * B * up)
        return y[:, :M]

    def _build_pallas(self, B: int = 64):
        """Mini-Toeplitz for the fused Pallas kernel: with the window
        resident in VMEM, a small block B costs no extra HBM traffic, so
        the band waste drops to (B*down + D)/D ~ 1.1x (B=64) instead of
        the ~1.7x the XLA path needs to amortize frame duplication.
        MACs/output: (B*down + D)/(B*up) * B = (B*down + D)/up."""
        spec = self.spec
        up, down = spec.up, spec.down
        D = self.D_direct
        sk64 = self._sk64
        L_f = (B - 1) * down + D
        T = np.zeros((L_f, B * up), dtype=np.float64)
        for t in range(B):
            for j in range(up):
                T[t * down : t * down + D, t * up + j] = sk64[j]
        self.T_pallas = T.astype(np.float32)
        # kernel-representation residual for precision="high": fused into
        # the same Pallas kernel as a second (cheap-precision) dot so the
        # pallas engine delivers the same accuracy class as toeplitz
        self.T_pallas_lo = (
            (T - self.T_pallas.astype(np.float64)).astype(np.float32)
            if self.precision == "high" else None)
        self.B_pallas = B
        self.Lf_pallas = L_f

    def _apply_pallas(self, x: jnp.ndarray, M: int) -> jnp.ndarray:
        from .pallas_frac import choose_tiles, frac_whole_pallas
        spec = self.spec
        C, N = x.shape
        up, down = spec.up, spec.down
        B, L_f = self.B_pallas, self.Lf_pallas
        Q, CT = choose_tiles(B * down, L_f, B * up, C,
                             has_lo=self.precision == "high")
        if CT == 0:
            from ..utils.trace import trace
            trace("conv_pallas_fallback", reason="channel-tile/stride "
                  "alignment", C=C, cell_stride=B * down * Q,
                  fallback="toeplitz")
            if not hasattr(self, "toep_chunks"):
                self._build_toeplitz()
            return self._apply_toeplitz(x, M)
        n_cyc = -(-M // up)
        n_grp = -(-n_cyc // B)
        n_blocks = -(-n_grp // Q)
        pad_l = max(0, -self.s_min)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (pad_l, 0)))
        xp = xp[:, self.s_min + pad_l :]
        span_need = (n_blocks * Q - 1) * B * down + L_f
        if xp.shape[1] < span_need:
            xp = jnp.pad(xp, ((0, 0), (0, span_need - xp.shape[1])))
        lo = (jnp.asarray(self.T_pallas_lo)
              if self.T_pallas_lo is not None else None)
        y = frac_whole_pallas(xp, jnp.asarray(self.T_pallas), Q, B * down,
                              L_f, B * up, CT=CT, skT_lo=lo)
        return y[:, :M]

    def _apply_toeplitz(self, x: jnp.ndarray, M: int,
                        raw: bool = False, min_out=None) -> jnp.ndarray:
        spec = self.spec
        C, N = x.shape
        up, down = spec.up, spec.down
        B = self.B_toep
        n_cyc = -(-M // up)
        n_blocks = -(-n_cyc // B)
        if min_out is not None:
            # overproduce whole blocks so the seam consumer's framing
            # right-pad (one full-array HBM copy) vanishes
            n_blocks = max(n_blocks, -(-(-(-min_out // up)) // B))
        pad_l = max(0, -self.s_min)
        # ONE pad covering both the left window extension and every
        # chunk's framed-matmul buffer ((n_blocks + n_seg)*hop from its
        # d0 offset): _framed_matmul skips its own pad when the input is
        # already long enough, so the second full-array pad pass (XLA pad
        # = whole-array copy) never runs
        hop = B * down
        need = 0
        for d0, T, _ in self.toep_chunks:
            n_seg = -(-T.shape[0] // hop)
            need = max(need, d0 + (n_blocks + n_seg) * hop)
        if self.toep_tiles is not None:
            for d0, per in self.toep_tiles:
                for c0, r0, Tt, _lo in per:
                    n_seg = -(-Tt.shape[0] // hop)
                    need = max(need,
                               d0 + r0 + (n_blocks + n_seg) * hop)
        pad_r = max(0, need - (N - self.s_min))
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (pad_l, pad_r)))
        xp = xp[:, self.s_min + pad_l :]
        out = None
        if self.toep_tiles is not None:
            # row-windowed column tiles: skip the band's zero corners
            for d0, per in self.toep_tiles:
                parts = [
                    _framed_matmul(
                        xp[:, d0 + r0 :], jnp.asarray(Tt), n_blocks, hop,
                        T_lo=None if Tlo_t is None else
                        (Tlo_t[0], jnp.asarray(Tlo_t[1])))
                    for c0, r0, Tt, Tlo_t in per]
                o = jnp.concatenate(parts, axis=2)
                out = o if out is None else out + o
        else:
            for d0, T, Tlo in self.toep_chunks:
                o = _framed_matmul(
                    xp[:, d0:], jnp.asarray(T), n_blocks, B * down,
                    T_lo=None if Tlo is None else (Tlo[0],
                                                   jnp.asarray(Tlo[1])))
                out = o if out is None else out + o
        y = out.reshape(C, n_blocks * B * up)
        return y if raw else y[:, :M]

    def _apply_direct(self, x: jnp.ndarray, M: int) -> jnp.ndarray:
        spec = self.spec
        C, N = x.shape
        up, down = spec.up, spec.down
        n_cyc = -(-M // up)
        pad_l = max(0, -self.s_min)
        need = (n_cyc - 1) * down + self.s_min + self.D_direct
        pad_r = max(0, need - N)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (pad_l, pad_r)))
        xp = xp[:, self.s_min + pad_l :]
        if self.precision == "high":
            # Chunk the tap dimension so each MXU pass accumulates at most
            # CHUNK products in f32, then combine the per-chunk partials
            # with compensated (two-float) additions; apply the f64 kernel's
            # f32 residual as one extra pass.  Kills both the long-
            # accumulation roundoff and the kernel representation error at
            # ~2x the fast path's cost (vs ~10x for a df32 FFT).
            from .dfloat import df_add, quick_two_sum, two_sum
            CHUNK = 128
            D = self.D_direct
            G = -(-D // CHUNK)
            s_hi = None
            for g in range(G):
                kg = self.sk_direct[:, g * CHUNK : (g + 1) * CHUNK]
                og = _conv1d(xp[:, g * CHUNK :], kg,
                             stride=down)[:, :, :n_cyc]
                if s_hi is None:
                    s_hi, s_lo = og, jnp.zeros_like(og)
                else:
                    s_hi, s_lo = df_add((s_hi, s_lo), (og, jnp.zeros_like(og)))
            lo = _conv1d(xp, self.sk_lo, stride=down,
                         precision=RESIDUAL_PRECISION)[:, :, :n_cyc]
            out = s_hi + (s_lo + lo)
        else:
            out = _conv1d(xp, self.sk_direct, stride=down)[:, :, :n_cyc]
        y = jnp.swapaxes(out, 1, 2).reshape(C, n_cyc * up)
        return y[:, :M]

    def out_len(self, n_in: int) -> int:
        return stage_out_len(self.spec, n_in)

    def apply_v(self, x: jnp.ndarray, n_valid: int, min_out=None):
        """Valid-prefix seam protocol: ``x[:, :n_valid]`` is the logical
        input, columns beyond it are a previous stage's raw (unsliced)
        framing surplus.  Returns ``(buf, m)`` with the logical output in
        ``buf[:, :m]`` and framing surplus beyond — bit-identical to
        ``apply(x[:, :n_valid])[:, :m]`` because the banded operator's
        nonzero rows for every kept output read only the valid prefix
        (stage output counts are defined by stream availability,
        CDSPProcessor.h:64-127); surplus columns feed only outputs the
        next seam discards.  Skipping the prefix slice and shrinking the
        right pad saves one full-array HBM round trip per stage seam."""
        M = self.out_len(n_valid)
        if M > 0 and self.engine == "toeplitz":
            return self._apply_toeplitz(x, M, raw=True,
                                        min_out=min_out), M
        if M > 0 and self.engine == "ozaki":
            return self._apply_ozaki(x, M, raw=True), M
        xl = x if x.shape[1] == n_valid else x[:, :n_valid]
        y = self.apply(xl)
        return y, y.shape[1]

    def phys_in_need(self, n_valid: int, min_out=None):
        """Physical input columns that make the toeplitz framing
        right-pad vanish under the seam protocol, or None when a left
        extension (s_min != 0) forces a pad/slice regardless.  Mirrors
        _apply_toeplitz's need computation exactly."""
        if self.engine != "toeplitz" or self.s_min != 0:
            return None
        M = self.out_len(n_valid)
        if M <= 0:
            return None
        up, down, B = self.spec.up, self.spec.down, self.B_toep
        n_blocks = -(-(-(-M // up)) // B)
        if min_out is not None:
            n_blocks = max(n_blocks, -(-(-(-min_out // up)) // B))
        hop = B * down
        need = 0
        for d0, T, _ in self.toep_chunks:
            n_seg = -(-T.shape[0] // hop)
            need = max(need, d0 + (n_blocks + n_seg) * hop)
        if self.toep_tiles is not None:
            # the column-tiled variant's row-windowed operators start at
            # d0 + r0, so their framing buffers can reach further
            for d0, per in self.toep_tiles:
                for c0, r0, Tt, _lo in per:
                    n_seg = -(-Tt.shape[0] // hop)
                    need = max(need,
                               d0 + r0 + (n_blocks + n_seg) * hop)
        return need + self.s_min

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        C, N = x.shape
        M = self.out_len(N)
        if M <= 0:
            return jnp.zeros((C, 0), dtype=self.dtype)
        if self.engine == "toeplitz":
            return self._apply_toeplitz(x, M)
        if self.engine == "ozaki":
            return self._apply_ozaki(x, M)
        if self.engine == "toeplitz_sym":
            return self._apply_toeplitz_sym(x, M)
        if self.engine == "pallas":
            return self._apply_pallas(x, M)
        if self.engine == "direct":
            return self._apply_direct(x, M)
        up, down, off = spec.up, spec.down, spec.offset
        P, hop, nfft = self.K - 1, self.hop, self.nfft

        if self.framed5_poly:
            # polyphase up=2: convolve the UNSTUFFED signal against the
            # even/odd kernel halves in one shared-forward kernel pass,
            # then interleave — the stuffed signal never exists
            from .pallas_dfft5 import df_ols_convolve_pallas5_framed_poly
            plan = self.dfft_plan
            t_needed = (M - 1) * down + off + 1
            s_needed = (t_needed + 1) // 2  # stuffed -> unstuffed length
            n_frames = -(-s_needed // plan.hop)
            x_p = jnp.pad(x.astype(self.dtype),
                          ((0, 0), (plan.p_pad, 0)))
            wp = df_ols_convolve_pallas5_framed_poly(x_p, plan, n_frames)
            w = jnp.swapaxes(wp, 1, 2).reshape(C, -1)
            return jax.lax.slice(w, (0, off),
                                 (C, off + (M - 1) * down + 1), (1, down))

        # zero-stuff to the upsampled grid
        if up > 1:
            u = jnp.zeros((C, N * up), dtype=self.dtype)
            u = u.at[:, ::up].set(x.astype(self.dtype))
        else:
            u = x.astype(self.dtype)

        t_needed = (M - 1) * down + off + 1  # w positions [0, t_needed)
        n_frames = -(-t_needed // hop)
        if self.engine == "pallas_fft5" and self.framed5:
            # in-VMEM overlap-save: no frame tensor in HBM at all
            from .pallas_dfft5 import df_ols_convolve_pallas5_framed
            u_p = jnp.pad(u, ((0, 0), (self.dfft_plan.p_pad, 0)))
            w = df_ols_convolve_pallas5_framed(u_p, self.dfft_plan,
                                               n_frames)
            return jax.lax.slice(w, (0, off),
                                 (C, off + (M - 1) * down + 1), (1, down))
        # u_p = [zeros(P), u, zeros(pad_r)] of length (n_frames + 1) * hop
        total = (n_frames + 1) * hop
        pad_r = total - P - u.shape[1]
        if pad_r < 0:
            u = u[:, : u.shape[1] + pad_r]
            pad_r = 0
        u_p = jnp.pad(u, ((0, 0), (P, pad_r)))
        chunks = u_p.reshape(C, n_frames + 1, hop)
        frames = jnp.concatenate(
            [chunks[:, :n_frames, :], chunks[:, 1:, :P]], axis=-1)

        if self.engine == "pallas_fft":
            from .pallas_dfft import df_ols_convolve_pallas
            W = df_ols_convolve_pallas(frames, self.dfft_plan)
        elif self.engine == "pallas_fft4":
            from .pallas_dfft4 import df_ols_convolve_pallas4
            W = df_ols_convolve_pallas4(frames, self.dfft_plan)
        elif self.engine == "pallas_fft5":
            from .pallas_dfft5 import df_ols_convolve_pallas5
            W = df_ols_convolve_pallas5(frames, self.dfft_plan)
        elif self.precision == "high":
            from .dfft import df_ols_convolve
            W = df_ols_convolve(frames, self.H_re, self.H_im, self.dfft_plan)
        else:
            X = jnp.fft.rfft(frames, axis=-1)
            if self.H_lo is not None:
                Y = X * self.H_hi + X * self.H_lo
            else:
                Y = X * self.H_hi
            W = jnp.fft.irfft(Y, n=nfft, axis=-1).astype(self.dtype)
        w = W[:, :, P:].reshape(C, n_frames * hop)
        return jax.lax.slice(w, (0, off), (C, off + (M - 1) * down + 1),
                             (1, down))


class HBUpExec:
    """Half-band 2X upsampler: y[2n] = x[n]; y[2n+1] = symmetric stencil.

    Engines (same rationale as HBDownExec):
    * "matmul" (f32 default) — framed matmul against a [B + 2*nt, 2*B]
      operator whose even columns are the identity and odd columns the
      symmetric stencil.  The matmul writes the INTERLEAVED pair stream
      directly, so the per-stage even/odd interleave relayout (a lane
      shuffle as slow as the decimator's deinterleave on TPU) never
      executes.
    * "stencil" (f64 / reference form) — shifted-add + stack interleave,
      bit-matching the oracle (CDSPHBUpsampler.inc:5-7 symmetry).
    """

    def __init__(self, spec: HBUpStage, dtype=jnp.float32,
                 engine: str = "auto", block: int = 128,
                 precision: str = "fast"):
        self.spec = spec
        self.dtype = jnp.dtype(dtype)
        self.taps = np.asarray(spec.hb.taps, dtype=np.float64).astype(dtype)
        self.nt = spec.hb.num_taps
        if engine == "auto":
            engine = "matmul" if self.dtype == jnp.float32 else "stencil"
        if engine == "ozaki" and self.dtype != jnp.float32:
            engine = "stencil"  # guarantee splitting is an f32-path tool
        self.engine = engine
        self.precision = (precision if self.dtype == jnp.float32
                          and engine in ("matmul", "ozaki") else "fast")
        self.B = block
        if engine in ("matmul", "ozaki"):
            nt, B = self.nt, self.B
            t64 = np.asarray(spec.hb.taps, dtype=np.float64)
            L_f = B + 2 * nt
            T = np.zeros((L_f, 2 * B), dtype=np.float64)
            for j in range(B):
                T[j + nt, 2 * j] = 1.0  # even output: center sample
                for i in range(nt):
                    T[j + nt + 1 + i, 2 * j + 1] += t64[i]
                    T[j + nt - i, 2 * j + 1] += t64[i]
            self.T = T.astype(self.dtype)
            self.L_f = L_f
            self.T_lo = None
            if engine == "ozaki":
                # error-free split-operand HB pass (ops/ozaki.py): a deep
                # HB cascade under plain f32 accumulation drifts to
                # ~-140 dB vs the oracle — past the -141 dB class the
                # guarantee engine owns on any backend (found by the
                # unified differential fuzzer,
                # tests/test_differential_slow.py, 8x-down family)
                from .ozaki import split_operator_host
                self.oz_parts, _ = split_operator_host(T)
            elif self.precision == "high":
                # kernel-representation residual for the default high
                # mode (identity columns are exact; only tap rounding
                # survives)
                lo = (T - self.T.astype(np.float64)).astype(np.float32)
                self.T_lo = truncate_residual(lo, float(np.abs(T).max()))

    def out_len(self, n_in: int) -> int:
        return stage_out_len(self.spec, n_in)

    def apply_df(self, h: jnp.ndarray, l, n_valid=None,
                 emit_pair: bool = True):
        """df32 inter-stage carry: see ConvExec.apply_df.  Pair/block
        counts come from ``n_valid`` (stream availability); window
        reads past it land only in outputs past M, which stay inside
        this stage's own framing surplus (the output IS sliced at the
        latency offset, so the emitted buffer is exact-length)."""
        C, N = h.shape
        if n_valid is None:
            n_valid = N
        M = self.out_len(n_valid)
        if M <= 0:
            z = jnp.zeros((C, 0), dtype=self.dtype)
            return z, None, 0
        if self.engine != "ozaki":
            y = self.apply(_df_collapse_input(h, l, n_valid))
            return y, None, y.shape[1]
        from .ozaki import framed_matmul_ozaki
        nt, lat = self.nt, self.spec.out_latency
        B, L_f = self.B, self.L_f
        n_pairs = n_valid - nt
        n_blocks = -(-n_pairs // B)
        need = (n_blocks - 1) * B + L_f - nt
        pad_r = max(0, need - N)
        xp = jnp.pad(h.astype(self.dtype), ((0, 0), (nt, pad_r)))
        xl = None if l is None else jnp.pad(l, ((0, 0), (nt, pad_r)))
        res = framed_matmul_ozaki(xp, jnp.asarray(self.oz_parts),
                                  n_blocks, B, x_lo=xl, pair=emit_pair)
        if emit_pair:
            yh3, yl3 = res
            return (yh3.reshape(C, n_blocks * 2 * B)[:, lat : lat + M],
                    yl3.reshape(C, n_blocks * 2 * B)[:, lat : lat + M],
                    M)
        return (res.reshape(C, n_blocks * 2 * B)[:, lat : lat + M],
                None, M)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        C, N = x.shape
        M = self.out_len(N)
        if M <= 0:
            return jnp.zeros((C, 0), dtype=self.dtype)
        nt, lat = self.nt, self.spec.out_latency
        x = x.astype(self.dtype)
        n_pairs = N - nt
        if self.engine in ("matmul", "ozaki"):
            B, L_f = self.B, self.L_f
            n_blocks = -(-n_pairs // B)
            # pair n reads x[n - nt + l], l in [1, 2*nt]; xp[k] = x[k - nt]
            need = (n_blocks - 1) * B + L_f - nt
            pad_r = max(0, need - N)
            xp = jnp.pad(x, ((0, 0), (nt, pad_r)))
            if self.engine == "ozaki":
                from .ozaki import framed_matmul_ozaki
                y3 = framed_matmul_ozaki(xp, jnp.asarray(self.oz_parts),
                                         n_blocks, B)
            else:
                y3 = _framed_matmul(xp, jnp.asarray(self.T), n_blocks, B,
                                    T_lo=self.T_lo)
            pre = y3.reshape(C, n_blocks * 2 * B)
            return pre[:, lat : lat + M]
        # stencil: symmetric shifted-add (half the multiplies, the same
        # exploitation of tap symmetry as the reference's genhbc kernels,
        # CDSPHBUpsampler.inc:5-7); XLA fuses the nt slice-adds into one
        # VPU pass — no convolution lowering involved
        xp = jnp.pad(x, ((0, 0), (nt, 0)))  # xp[k] = x[k - nt]
        odd = jnp.zeros((C, n_pairs), dtype=self.dtype)
        for i in range(nt):
            a = jax.lax.dynamic_slice_in_dim(xp, nt + 1 + i, n_pairs, 1)
            b = jax.lax.dynamic_slice_in_dim(xp, nt - i, n_pairs, 1)
            odd = odd + self.taps[i] * (a + b)
        even = x[:, :n_pairs]
        pre = jnp.stack([even, odd], axis=-1).reshape(C, 2 * n_pairs)
        return pre[:, lat : lat + M]


class HBDownExec:
    """Half-band 2X decimator (gain 2): y[n] = x[2n] + symmetric stencil.

    Engines:
    * "matmul" (f32 default) — stride-2 Toeplitz framed matmul: frames of
      the input at hop 2*B are pure reshape views, contracted against a
      [2*B + 4*nt - 2, B] banded operator holding the half-band kernel at
      stride-2 column offsets.  No stride-2 minor-dim slice ever executes:
      on TPU those are lane relayouts so slow that even ONE deinterleave
      pass per stage dominated the DSD chain (measured 36 of 40 ms; the
      naive 2*nt+1-slice form was 95% of device time).  The MXU waste
      (~2*B/(2*nt+2) duplication) is ~40x cheaper than the relayout.
    * "stencil" (f64 / reference form) — deinterleaved symmetric
      shifted-add, bit-matching the oracle's summation order
      (CDSPHBDownsampler.inc:5-7, even/odd Buf1/Buf2 split as
      CDSPHBDownsampler.h:143-206).
    """

    def __init__(self, spec: HBDownStage, dtype=jnp.float32,
                 engine: str = "auto", block: int = 128,
                 precision: str = "fast"):
        self.spec = spec
        self.dtype = jnp.dtype(dtype)
        self.taps = np.asarray(spec.hb.taps, dtype=np.float64).astype(dtype)
        self.nt = spec.hb.num_taps
        if engine == "auto":
            engine = "matmul" if self.dtype == jnp.float32 else "stencil"
        if engine == "ozaki" and self.dtype != jnp.float32:
            engine = "stencil"  # guarantee splitting is an f32-path tool
        self.engine = engine
        self.precision = (precision if self.dtype == jnp.float32
                          and engine in ("matmul", "ozaki") else "fast")
        self.B = block
        if engine in ("matmul", "ozaki"):
            nt = self.nt
            h = np.zeros(4 * nt - 1, dtype=np.float64)
            h[2 * nt - 1] = 1.0  # center sample x[2n]
            t64 = np.asarray(spec.hb.taps, dtype=np.float64)
            for i in range(nt):
                h[2 * nt - 1 + 1 + 2 * i] = t64[i]
                h[2 * nt - 1 - 1 - 2 * i] = t64[i]
            B = self.B
            L_f = 2 * B + h.shape[0] - 1
            T = np.zeros((L_f, B), dtype=np.float64)
            for b in range(B):
                T[2 * b : 2 * b + h.shape[0], b] = h
            self.T = T.astype(self.dtype)
            self.L_f = L_f
            self.T_lo = None
            if engine == "ozaki":
                # error-free split-operand HB pass; see HBUpExec.__init__
                from .ozaki import split_operator_host
                self.oz_parts, _ = split_operator_host(T)
            elif self.precision == "high":
                # tap-rounding residual pass; see HBUpExec.__init__
                lo = (T - self.T.astype(np.float64)).astype(np.float32)
                self.T_lo = truncate_residual(lo, float(np.abs(T).max()))

    def out_len(self, n_in: int) -> int:
        return stage_out_len(self.spec, n_in)

    def apply_df(self, h: jnp.ndarray, l, n_valid=None,
                 emit_pair: bool = True):
        """df32 inter-stage carry: see ConvExec.apply_df and
        HBUpExec.apply_df (kept outputs read at most x[n_valid - 1])."""
        C, N = h.shape
        if n_valid is None:
            n_valid = N
        M = self.out_len(n_valid)
        if M <= 0:
            z = jnp.zeros((C, 0), dtype=self.dtype)
            return z, None, 0
        if self.engine != "ozaki":
            y = self.apply(_df_collapse_input(h, l, n_valid))
            return y, None, y.shape[1]
        from .ozaki import framed_matmul_ozaki
        nt, lat = self.nt, self.spec.out_latency
        cnt = (n_valid - 2 * nt) // 2 + 1
        B = self.B
        n_blocks = -(-cnt // B)
        hop = 2 * B
        need = (n_blocks * B - 1) * 2 + 2 * nt
        pad_r = max(0, need - N)
        xp = jnp.pad(h.astype(self.dtype), ((0, 0), (2 * nt - 1, pad_r)))
        xl = None if l is None else \
            jnp.pad(l, ((0, 0), (2 * nt - 1, pad_r)))
        res = framed_matmul_ozaki(xp, jnp.asarray(self.oz_parts),
                                  n_blocks, hop, x_lo=xl, pair=emit_pair)
        if emit_pair:
            yh3, yl3 = res
            return (yh3.reshape(C, n_blocks * B)[:, lat : lat + M],
                    yl3.reshape(C, n_blocks * B)[:, lat : lat + M], M)
        return res.reshape(C, n_blocks * B)[:, lat : lat + M], None, M

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        C, N = x.shape
        M = self.out_len(N)
        if M <= 0:
            return jnp.zeros((C, 0), dtype=self.dtype)
        nt, lat = self.nt, self.spec.out_latency
        cnt = (N - 2 * nt) // 2 + 1
        x = x.astype(self.dtype)
        if self.engine in ("matmul", "ozaki"):
            B, L_f = self.B, self.L_f
            n_blocks = -(-cnt // B)
            hop = 2 * B
            # y[n] reads x[2n + d - (2nt-1)], d in [0, 4nt-1)
            need = (n_blocks * B - 1) * 2 + 2 * nt
            pad_r = max(0, need - N)
            xp = jnp.pad(x, ((0, 0), (2 * nt - 1, pad_r)))
            if self.engine == "ozaki":
                from .ozaki import framed_matmul_ozaki
                y3 = framed_matmul_ozaki(xp, jnp.asarray(self.oz_parts),
                                         n_blocks, hop)
            else:
                y3 = _framed_matmul(xp, jnp.asarray(self.T), n_blocks, hop,
                                    T_lo=self.T_lo)
            y = y3.reshape(C, n_blocks * B)
            return y[:, lat : lat + M]
        # stencil: y[n] = x[2n] + sum_i taps[i]*(xo[n+i] + xo[n-1-i])
        if N % 2:
            x = jnp.pad(x, ((0, 0), (0, 1)))
        half = x.shape[1] // 2
        xe = jax.lax.slice(x, (0, 0), (C, 2 * half - 1), (1, 2))  # x[2k]
        xo = jax.lax.slice(x, (0, 1), (C, 2 * half), (1, 2))      # x[2k+1]
        xo = jnp.pad(xo, ((0, 0), (nt, nt)))  # xo_p[k] = x[2(k-nt)+1]
        y = xe[:, :cnt]
        for i in range(nt):
            a = jax.lax.dynamic_slice_in_dim(xo, nt + i, cnt, 1)
            b = jax.lax.dynamic_slice_in_dim(xo, nt - 1 - i, cnt, 1)
            y = y + self.taps[i] * (a + b)
        return y[:, lat : lat + M]


class FracWholeExec:
    """Whole-stepping fractional interpolator as one strided MXU matmul.

    For output n = m*O + j (O = out_step, I = in_step):
        g_j = W0 + j*I;  f_j = g_j mod O;  s_j = g_j // O
        y[n] = sum_i bank[f_j][i] * x[s_j + m*I - (fl2 - 1) + i]
    Rows of the superkernel SK[j] hold bank[f_j] placed at offset
    s_j - s_0, so y[:, m*O + j] = sum_d SK[j, d] * x[m*I + a0 + d]: a
    standard stride-I convolution with O output features.
    """

    def __init__(self, spec: FracStage, dtype=jnp.float32,
                 precision: str = "fast", engine: str = "auto"):
        assert spec.is_whole
        self.spec = spec
        self.dtype = jnp.dtype(dtype)
        self.precision = precision if self.dtype == jnp.float32 else "fast"
        self.engine = engine
        O, I, W0 = spec.out_step, spec.in_step, spec.init_frac_pos_w
        fl = spec.filter_len
        fll = fl // 2 - 1
        j = np.arange(O, dtype=np.int64)
        g = W0 + j * I
        f = g % O
        s = g // O
        a = s - fll  # window start (absolute input index) for phase j at m=0
        self.a0 = int(a[0])
        D = int(a[-1] - a[0]) + fl
        table = np.asarray(spec.bank.table, dtype=np.float64)  # [O, fl]
        sk = np.zeros((O, D), dtype=np.float64)
        rows = np.arange(O)[:, None]
        cols = (a - a[0])[:, None] + np.arange(fl)[None, :]
        sk[rows, cols] = table[f]
        if engine == "ozaki":
            self._sk64_t = np.ascontiguousarray(sk.T)  # f64 for splitting
        self.sk = sk.astype(dtype)
        if self.precision == "high":
            hi = sk.astype(np.float32)
            self.sk_lo = (sk - hi.astype(np.float64)).astype(np.float32)
            self.lo_r0, self.sk_lo_t = truncate_residual(
                self.sk_lo.T, float(np.abs(hi).max()))
        self.D = D
        self.pad_l = max(0, -self.a0)
        if self.engine == "auto":
            # im2col+matmul when windows barely overlap (the common case:
            # in_step ~ filter span): guaranteed MXU lowering with a small
            # duplication factor D/I.  Strided conv otherwise.
            self.engine = ("im2col"
                           if self.dtype == jnp.float32
                           and self.D <= 4 * spec.in_step else "conv")

    def out_len(self, n_in: int) -> int:
        return stage_out_len(self.spec, n_in)

    def apply_v(self, x: jnp.ndarray, n_valid: int, min_out=None):
        """Valid-prefix seam protocol (see ConvExec.apply_v): consume a
        raw framing buffer from the previous stage without the prefix
        slice; window reads for kept outputs stay inside the valid
        prefix, and the physical surplus only shrinks this stage's
        right pad.  Falls back to the sliced path for latency-shifted
        specs (in_latency folds into ring positions there)."""
        spec = self.spec
        M = stage_out_len(spec, n_valid)
        if spec.in_latency or M <= 0:
            xl = x if x.shape[1] == n_valid else x[:, :n_valid]
            y = self.apply(xl)
            return y, y.shape[1]
        return self._run(x, M), M

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        C, N = x.shape
        if spec.in_latency:
            x = x[:, spec.in_latency :]
            N -= spec.in_latency
        M = stage_out_len(spec, N + spec.in_latency)
        if M <= 0:
            return jnp.zeros((C, 0), dtype=self.dtype)
        return self._run(x, M)

    def apply_df(self, h: jnp.ndarray, l, n_valid=None,
                 emit_pair: bool = True):
        """df32 inter-stage carry: see ConvExec.apply_df.  Mirrors
        apply's in_latency slice (latency-shifted specs slice to
        n_valid first, as apply_v does) and _run's ozaki framing with
        raw (valid-prefix) buffers; the seam residual is consumed by
        ONE segmented reshape-view bf16 einsum (ops/ozaki.framed_cheap)
        — never framed into a second dense operand (that duplication
        measured ~7 ms/iter of HBM pads and copies on the flagship
        chain).  This stage is last in every plan the planner emits, so
        emit_pair=False is the hot path (the dense VMEM kernel runs on
        the main stream); emit_pair=True falls back to the XLA pair
        composition."""
        spec = self.spec
        C, N = h.shape
        if n_valid is None:
            n_valid = N
        M = stage_out_len(spec, n_valid)
        if spec.in_latency:
            # latency fold into raw buffers is unsound (see apply_v):
            # slice to the logical prefix first
            h = h[:, spec.in_latency : n_valid]
            l = None if l is None else l[:, spec.in_latency : n_valid]
            N = n_valid - spec.in_latency
        if M <= 0:
            z = jnp.zeros((C, 0), dtype=self.dtype)
            return z, None, 0
        if self.engine != "ozaki":
            # after an in_latency slice, h/l are already the logical
            # prefix; otherwise slice to n_valid
            nv = h.shape[1] if spec.in_latency else n_valid
            y = self._run(_df_collapse_input(h, l, nv), M)
            return y, None, y.shape[1]
        from .ozaki import framed_cheap, framed_matmul_ozaki, \
            split_operator_host
        if not hasattr(self, "oz_parts"):
            self.oz_parts, self.oz_scale = \
                split_operator_host(self._sk64_t)
        O, I = spec.out_step, spec.in_step
        n_cyc = -(-M // O)
        n_seg = -(-self.D // I)
        need = self.a0 + (n_cyc + n_seg) * I
        pad_r = max(0, need - N)
        xp = jnp.pad(h.astype(self.dtype), ((0, 0), (self.pad_l, pad_r)))
        start = self.a0 + self.pad_l
        xp32 = xp[:, start:].astype(jnp.float32)
        xl32 = None
        if l is not None:
            xl = jnp.pad(l, ((0, 0), (self.pad_l, pad_r)))
            xl32 = xl[:, start:]
        if not emit_pair:
            if xl32 is None:
                return self._run(h, M), None, M
            # residual: one cheap reshape-view bf16 pass; the main pass
            # must expose its (hi, lo) so the collapse rounds ONCE
            # (y_run + cheap would round twice — measured -149.5 vs
            # -151.9 dB on the flagship)
            from .pallas_ozaki import HAVE_PALLAS, ozaki_dense_pallas_pair
            use_pallas = (HAVE_PALLAS and jax.default_backend() == "tpu"
                          and os.environ.get("R8BT_OZAKI_PALLAS", "1")
                          != "0")
            if use_pallas:
                cheap = framed_cheap(
                    xl32, jnp.asarray(self.oz_parts[0]), n_cyc, I)
                fr, sx, pp, R, RT = self._oz_dense_operands(xp32, n_cyc)
                yh2, yl2 = ozaki_dense_pallas_pair(
                    fr, sx, pp, self.D, O, RT)
                # NOTE: combining in the kernel's [R, O] row layout
                # (pad cheap + add there) measured SLOWER (45.4 vs 40.7
                # ms/iter) — the [C, n_cyc, O] einsum output relayouts
                # expensively into kernel rows; reshape-then-add stands
                yh = yh2[:R].reshape(C, n_cyc * O)
                yl = yl2[:R].reshape(C, n_cyc * O)
                y = yh + (yl.astype(jnp.float32)
                          + cheap.reshape(C, n_cyc * O))
                return y[:, :M].astype(self.dtype), None, M
            y = framed_matmul_ozaki(xp32, jnp.asarray(self.oz_parts),
                                    n_cyc, I, x_lo=xl32)
            return (y.reshape(C, n_cyc * O)[:, :M].astype(self.dtype),
                    None, M)
        res = framed_matmul_ozaki(
            xp32, jnp.asarray(self.oz_parts), n_cyc, I,
            x_lo=xl32, pair=True)
        yh3, yl3 = res
        yh = yh3.reshape(C, n_cyc * O)[:, :M].astype(self.dtype)
        yl = yl3.reshape(C, n_cyc * O)[:, :M]
        return yh, yl, M

    def _oz_dense_operands(self, xp32, n_cyc: int):
        """Shared framing for the dense ozaki VMEM kernel (plain and
        pair callers — round-5 review: two hand-maintained copies):
        im2col frames padded to the kernel grid, per-row pow2 scales
        broadcast from per-channel, and the zero-row-padded operator
        slices (cached).  Returns (fr, sx, parts_pad, R, RT)."""
        from .ozaki import channel_scale
        C = xp32.shape[0]
        D, O = self.D, self.spec.out_step
        Kpad = -(-D // 128) * 128
        RT = 256
        fr = _frames(xp32, n_cyc, I := self.spec.in_step, D).reshape(
            C * n_cyc, D)
        if Kpad != D:
            fr = jnp.pad(fr, ((0, 0), (0, Kpad - D)))
        R = fr.shape[0]
        R_pad = -(-R // RT) * RT
        if R_pad != R:
            fr = jnp.pad(fr, ((0, R_pad - R), (0, 0)))
        # per-CHANNEL scales broadcast to frame rows: one reduce over
        # the input instead of the (D/I-times larger) framed tensor;
        # rows of a channel share the grid, exactness and the
        # crest-level quantization class are unchanged
        sxc = channel_scale(xp32)
        sx = jnp.broadcast_to(sxc[:, None, :],
                              (C, n_cyc, 1)).reshape(R, 1)
        if R_pad != R:
            sx = jnp.pad(sx, ((0, R_pad - R), (0, 0)),
                         constant_values=1.0)
        if not hasattr(self, "oz_parts_pad"):
            pp = np.zeros((self.oz_parts.shape[0], Kpad, O),
                          dtype=self.oz_parts.dtype)
            pp[:, :D, :] = self.oz_parts
            self.oz_parts_pad = pp
        return fr, sx, jnp.asarray(self.oz_parts_pad), R, RT

    def _run(self, x: jnp.ndarray, M: int) -> jnp.ndarray:
        spec = self.spec
        C, N = x.shape
        O, I = spec.out_step, spec.in_step
        n_cyc = -(-M // O)
        x = x.astype(self.dtype)
        # window for cycle m, phase j: x[m*I + a0 + d], d in [0, D).
        # Pad ONCE through to the framed-matmul buffer length
        # ((n_cyc + n_seg)*I past a0) so its internal pad never copies.
        n_seg = -(-self.D // I)
        need = self.a0 + (n_cyc + n_seg) * I
        pad_r = max(0, need - N)
        xp = jnp.pad(x, ((0, 0), (self.pad_l, pad_r)))
        start = self.a0 + self.pad_l
        xp = xp[:, start:]
        if self.engine == "pallas":
            from .pallas_frac import choose_tiles, frac_whole_pallas
            # adaptive Q makes ANY stride lane-aligned (Q*I % 128 == 0);
            # CT=0 only when channels don't tile or VMEM would overflow
            Q, CT = choose_tiles(I, self.D, O, C,
                                 has_lo=self.precision == "high")
            if CT:
                n_blocks = -(-n_cyc // Q)
                span_need = (n_blocks * Q - 1) * I + self.D
                if xp.shape[1] < span_need:
                    xp = jnp.pad(xp, ((0, 0), (0, span_need - xp.shape[1])))
                lo = (jnp.asarray(self.sk_lo.T)
                      if self.precision == "high" else None)
                y = frac_whole_pallas(xp, jnp.asarray(self.sk.T), Q, I,
                                      self.D, O, CT=CT, skT_lo=lo)
                return y[:, :M]
            # fall through to im2col when channels/stride don't tile
            from ..utils.trace import trace
            trace("frac_pallas_fallback", reason="channel-tile/stride "
                  "alignment", C=C, cell_stride=Q * I, fallback="im2col")
        if self.engine == "ozaki":
            # error-free split-operand form (ops/ozaki.py): the
            # backend-independent -141 dB class on the MXU
            from .ozaki import channel_scale, framed_matmul_ozaki, \
                split_operator_host
            from .pallas_ozaki import HAVE_PALLAS, ozaki_dense_pallas
            if not hasattr(self, "oz_parts"):
                self.oz_parts, self.oz_scale = \
                    split_operator_host(self._sk64_t)
            xp32 = xp.astype(jnp.float32)
            use_pallas = (HAVE_PALLAS and jax.default_backend() == "tpu"
                          and os.environ.get("R8BT_OZAKI_PALLAS", "1")
                          != "0")
            if use_pallas:
                # the window stride I is rarely 128-aligned, so frames
                # are materialized XLA-side (reshape-view concat, one
                # cheap pass over ~D/I x the input bytes) and the dense
                # VMEM kernel runs over the framed rows
                fr, sx, pp, R, RT = self._oz_dense_operands(xp32, n_cyc)
                yk = ozaki_dense_pallas(fr, sx, pp, self.D, O, RT)
                y = yk[:R].reshape(C, n_cyc * O)
                return y[:, :M].astype(self.dtype)
            out = framed_matmul_ozaki(xp32, jnp.asarray(self.oz_parts),
                                      n_cyc, I)
            y = out.reshape(C, n_cyc * O)
            return y[:, :M].astype(self.dtype)
        if self.engine in ("im2col", "pallas"):
            skT = jnp.asarray(self.sk.T)  # [D, O]
            lo = None
            if self.precision == "high":
                lo = (self.lo_r0, jnp.asarray(self.sk_lo_t))
            out = _framed_matmul(xp, skT, n_cyc, I, T_lo=lo)
            y = out.reshape(C, n_cyc * O)
            return y[:, :M]
        if self.precision == "high":
            from .dfloat import df_add
            CHUNK = 128
            G = -(-self.D // CHUNK)
            s_hi = None
            for g in range(G):
                kg = self.sk[:, g * CHUNK : (g + 1) * CHUNK]
                og = _conv1d(xp[:, g * CHUNK :], kg, stride=I)[:, :, :n_cyc]
                if s_hi is None:
                    s_hi, s_lo = og, jnp.zeros_like(og)
                else:
                    s_hi, s_lo = df_add((s_hi, s_lo),
                                        (og, jnp.zeros_like(og)))
            lo = _conv1d(xp, self.sk_lo, stride=I,
                         precision=RESIDUAL_PRECISION)[:, :, :n_cyc]
            out = s_hi + (s_lo + lo)
        else:
            out = _conv1d(xp, self.sk, stride=I)[:, :, :n_cyc]
        y = jnp.swapaxes(out, 1, 2).reshape(C, n_cyc * O)
        return y[:, :M]


def chunk_drift_groups(sg: np.ndarray, vals: np.ndarray, scale: int,
                       S: int, fl: int, budget: int, ngrp_max: int,
                       W: int):
    """Chunk [n_grp, G] output groups for banded-matmul evaluation
    (shared by FracPolyExec._apply_banded and poly_fused.FusedPolyExec).

    Frames are read at uniform stride ``S``; a chunk of ``nloc`` groups
    starting at ``g0`` is anchored at ``A = min over rows m of
    (sg[g0+m].min() - m*S)`` and its group-local window offsets are
    ``off = vals[g0:g0+nloc] - scale*(A + m*S)`` (``scale`` maps the
    frame grid to the grid ``vals`` lives on: 1 for the plain banded
    interpolator, ``up`` for the composite whose band indices live on
    the zero-stuffed grid).  A chunk is accepted when
    ``off.max() + fl <= budget`` and halved otherwise; a single group
    must always fit (asserted).

    Returns ``(chunks, need_len, shift)``: ``chunks`` is a list of
    ``(g0, nloc, A, off[int32])`` with every ``A >= 0`` after shifting
    the frame origin right by ``shift`` samples (a chunk base can dip
    below 0 when negative drift pulls it under the earliest window
    start, and a negative ``A`` would silently slice from the array
    END); ``need_len`` is the frame samples required from the shifted
    origin.
    """
    n_grp = sg.shape[0]
    chunks = []  # (g0, nloc, A, off[nloc, G])
    need_len = 0
    g0 = 0
    while g0 < n_grp:
        nloc = min(ngrp_max, n_grp - g0)
        while True:
            m = np.arange(nloc)
            base0 = sg[g0 : g0 + nloc].min(axis=1) - m * S
            A = int(base0.min())
            off = vals[g0 : g0 + nloc] - scale * (A + m * S)[:, None]
            assert off.min() >= 0
            if off.max() + fl <= budget or nloc == 1:
                break
            nloc //= 2  # drift exceeded the operator budget: split
        assert off.max() + fl <= budget, "drift budget exceeded"
        chunks.append((g0, nloc, A, off.astype(np.int32)))
        need_len = max(need_len, A + (nloc - 1) * S + W)
        g0 += nloc
    shift = max(0, -min(a for _, _, a, _ in chunks))
    if shift:
        need_len += shift
        chunks = [(g_, n_, a_ + shift, o_) for g_, n_, a_, o_ in chunks]
    return chunks, need_len, shift


def banded_contract(xc: jnp.ndarray, R: jnp.ndarray, nloc: int, S: int,
                    W: int, precision) -> jnp.ndarray:
    """sum_w frames[c, m, w] * R[m, w, g] with the [C, nloc, W] frames at
    uniform stride S read as reshape VIEWS of ``xc`` (no gather): frame m
    covers xc[:, m*S : m*S + W], evaluated in ceil(W/S) shifted segments
    of the same [C, nloc + n_seg, S] reshape.  Returns [C, nloc, G]."""
    C = xc.shape[0]
    n_seg = -(-W // S)
    total = (nloc + n_seg) * S
    if xc.shape[1] < total:
        xc = jnp.pad(xc, ((0, 0), (0, total - xc.shape[1])))
    else:
        xc = xc[:, :total]
    ch3 = xc.reshape(C, nloc + n_seg, S)
    o = None
    for e in range(n_seg):
        w_e = min(S, W - e * S)
        seg = ch3[:, e : nloc + e, :w_e]
        Re = R[:, e * S : e * S + w_e, :]
        oe = jnp.einsum("cml,mlg->cmg", seg, Re, precision=precision)
        o = oe if o is None else o + oe
    return o


def banded_contract_ozaki(xc: jnp.ndarray, R_parts, nloc: int, S: int,
                          W: int, x_lo=None, pair: bool = False):
    """banded_contract in the error-free split-operand form (ops/ozaki.py
    exactness lemma, applied per (channel, m, g) output cell): slice-pair
    products are integers < 2^16 on a per-(c, m, g) power-of-two grid and
    every <= K0-deep f32 accumulation of them is exact on any backend.
    This is what takes the poly stage past the banded HIGHEST einsum's
    ~-142 dB product-rounding floor (measured round 5: the f32 products
    themselves, not the seams, pin the stage class).

    R_parts: [N_PARTS, nloc, W, G] bfloat16 (split_operator_host_batched,
    scales folded).  x_lo: previous seam's df32 residual stream — one
    cheap bf16 pass against the top operator slice.  pair=True returns
    the two_sum-normalized (hi, lo)."""
    from .dfloat import two_sum
    from .ozaki import K0, N_DIAG, N_PARTS, split_input

    C = xc.shape[0]
    n_seg = -(-W // S)
    total = (nloc + n_seg) * S

    def _padto(a):
        if a.shape[1] < total:
            return jnp.pad(a, ((0, 0), (0, total - a.shape[1])))
        return a[:, :total]

    xparts, x_scale = split_input(_padto(xc))
    ch = [xparts[p].reshape(C, nloc + n_seg, S) for p in range(N_PARTS)]
    chl = None
    if x_lo is not None:
        chl = _padto(x_lo).astype(
            jnp.bfloat16).reshape(C, nloc + n_seg, S)

    hi = lo = None
    rest = None
    cheap = None
    for e in range(n_seg):
        w_e = min(S, W - e * S)
        for c0 in range(0, w_e, K0):
            a0 = e * S + c0
            a1 = min(e * S + w_e, a0 + K0)
            d0 = None
            small = None
            for p in range(N_PARTS):
                for q in range(N_PARTS):
                    d = p + q
                    if d >= N_DIAG:
                        continue
                    seg = ch[p][:, e : nloc + e, a0 - e * S : a1 - e * S]
                    Re = jax.lax.slice(
                        R_parts[q], (0, a0, 0),
                        (nloc, a1, R_parts.shape[3]))
                    o = jnp.einsum("cml,mlg->cmg", seg, Re,
                                   preferred_element_type=jnp.float32)
                    if d == 0:
                        d0 = o
                    else:
                        small = o if small is None else small + o
            if hi is None:
                hi, lo = d0, jnp.zeros_like(d0)
            else:
                s_, err = two_sum(hi, d0)
                hi, lo = s_, lo + err
            if small is not None:
                rest = small if rest is None else rest + small
            if chl is not None:
                seg = chl[:, e : nloc + e, a0 - e * S : a1 - e * S]
                Re = jax.lax.slice(
                    R_parts[0], (0, a0, 0),
                    (nloc, a1, R_parts.shape[3]))
                o = jnp.einsum("cml,mlg->cmg", seg, Re,
                               preferred_element_type=jnp.float32)
                cheap = o if cheap is None else cheap + o
    small_all = lo + (rest if rest is not None else jnp.float32(0))
    sc = x_scale[:, None, :]
    y_hi = hi * sc
    y_small = small_all * sc
    if cheap is not None:
        y_small = y_small + cheap
    if not pair:
        return y_hi + y_small
    H, L = two_sum(y_hi, y_small)
    return H, L.astype(jnp.bfloat16)


class FracPolyExec:
    """Polynomial-mode fractional interpolator.

    Host computes exact f64 read positions (data-independent); the spline
    filter for output n is  flt_n = c0[f_n] + c1[f_n]*t_n + c2[f_n]*t_n^2
    (CDSPFracInterpolator.h:1069-1179 convolve2).  Engines:

    * "banded" (f32 default) — MXU formulation with NO data gather: pick a
      rational convergent S/G of the resample ratio (G outputs advance the
      read position by almost exactly S inputs); frames of width W at the
      UNIFORM stride S are pure reshape views of the input (same segmented-
      einsum trick as _framed_matmul), and each group's outputs become one
      [W] x [W, G] matmul against a banded operator R_m holding flt_n at
      the group-local offset.  The offsets drift by |G*r - S| per group, so
      work is chunked to a drift budget and R is (re)built ON DEVICE from
      small host index arrays by fl one-hot accumulations — no [M, W]
      host-side operator literal, no [C, M, fl] gather.
    * "gather" (f64 / reference) — per-tap jnp.take with fused polynomial
      evaluation; bit-matches the oracle's summation order.
    """

    def __init__(self, spec: FracStage, dtype=jnp.float32,
                 engine: str = "auto", precision: str = "fast",
                 oz_products: bool = False):
        assert not spec.is_whole
        self.spec = spec
        self.dtype = jnp.dtype(dtype)
        self.precision = precision if jnp.dtype(dtype) == jnp.float32 \
            else "fast"
        #: guarantee-chain mode (frac_engine="ozaki"): the banded
        #: operator is host-split into bf16 slices and contracted in the
        #: error-free split-operand form — the HIGHEST einsum's f32
        #: product rounding (~-142 dB stage floor, measured round 5) is
        #: replaced by the ozaki exactness lemma.  Falls back to the
        #: residual-corrected HIGHEST path above the host-literal cap.
        self.oz_products = bool(oz_products) and self.precision == "high"
        tab = np.asarray(spec.bank.table, dtype=np.float64)  # [rows, fl, 3]
        self.tab64 = tab  # host f64 spline planes (banded flt build)
        self.c0 = tab[:, :, 0].astype(dtype)
        self.c1 = tab[:, :, 1].astype(dtype)
        self.c2 = tab[:, :, 2].astype(dtype)
        self.fracs = spec.bank.fracs
        self.fl = spec.filter_len
        self.fll = self.fl // 2 - 1
        if engine == "auto":
            engine = "banded" if self.dtype == jnp.float32 else "gather"
        self.engine = engine
        if engine == "banded":
            self._prep_banded()

    def _prep_banded(self, g_max: int = 256):
        """Pick the (S, G) frame-stride/group-size pair (G outputs advance
        the read position by almost exactly S inputs) minimizing the
        EFFECTIVE MXU cost per output:

            eff = W * ceil(G/128)*128/G,   W ~ S + fl + slack

        The W factor is the real MAC count per output column (each of the
        G columns multiplies the full W-wide window, of which only fl taps
        are nonzero — the banded waste grows with S ~ G*r); the second
        factor is MXU lane padding (the output minor dim G is processed in
        128-lane tiles, so e.g. G=160 runs at 160/256 utilization).  A
        rational-convergent multiple minimizes drift (fewer, larger
        chunks); non-convergent G=128-style candidates trade drift for
        exact lane fit — both are scored, with a mild per-chunk
        amortization penalty (0.5/ngrp_max).  Measured on chip (poly
        44100->96001, v5e): G=160 (the old convergent-toward-128 pick,
        eff 525) -> G=128 (eff 272) is worth ~4% end-to-end."""
        from fractions import Fraction
        r = self.spec.src_rate / self.spec.dst_rate
        fr = Fraction(r).limit_denominator(g_max)
        cands = []
        if 8 <= fr.denominator <= g_max:
            for k in range(1, g_max // fr.denominator + 1):
                cands.append((fr.numerator * k, fr.denominator * k))
        for G in (64, 96, 128, 160, 192, 256):
            S = int(round(G * r))
            if S >= 1:
                cands.append((S, G))
        slack = 6
        best = None
        for S, G in cands:
            drift = abs(G * r - S)
            if drift > slack:  # a single group must fit the budget
                continue
            W = -(-(S + self.fl + slack + 2) // 8) * 8
            lane_pad = (-(-G // 128) * 128) / G
            ngrp_max = max(8, int(slack / max(drift, 1e-12)))
            eff = W * lane_pad * (1.0 + 0.5 / ngrp_max)
            if best is None or eff < best[0]:
                best = (eff, S, G, drift, ngrp_max, W)
        _, self.S, self.G, self.drift, self.ngrp_max, self.W = best
        self.slack = slack

    def out_len(self, n_in: int) -> int:
        return stage_out_len(self.spec, n_in)

    def host_positions(self, M: int):
        """(window_start[int32], frac_index[int32], poly_t[f64]) for outputs
        [0, M), computed host-side in f64 (callers cast t where needed)."""
        s, f = frac_positions(self.spec, 0, M)
        fr = f * self.fracs
        fti = np.floor(fr).astype(np.int64)
        t = (fr - fti).astype(np.float64)
        start = s - self.fll
        return start.astype(np.int32), fti.astype(np.int32), t

    def apply_v(self, x: jnp.ndarray, n_valid: int, min_out=None):
        """Valid-prefix seam protocol (see ConvExec.apply_v): consumes a
        raw framing buffer and returns its own raw group buffer + the
        logical output count.  Bit-identical to the sliced path: the
        banded operator places filter taps only at offsets inside the
        valid prefix for kept outputs; surplus columns (closed-form
        positions past the logical end) are discarded by the consumer
        seam.  Falls back to the sliced path for latency-shifted specs:
        folding in_latency into the window starts would read REAL
        samples from the latency prefix where apply()'s left pad reads
        zeros (window starts reach -fll at the stream head), exactly as
        FracWholeExec.apply_v falls back.  ``min_out``: produce at least
        this many physical columns (a handful of extra groups) so the
        consumer's framing right-pad — one more full-array HBM copy —
        vanishes."""
        spec = self.spec
        M = stage_out_len(spec, n_valid)
        if self.engine != "banded" or M <= 0 or spec.in_latency:
            xl = x if x.shape[1] == n_valid else x[:, :n_valid]
            y = self.apply(xl)
            return y, y.shape[1]
        G = self.G
        n_grp = -(-M // G)
        if min_out is not None:
            n_grp = max(n_grp, -(-min_out // G))
        Mp = n_grp * G
        # positions are closed-form in the absolute output index
        # (CDSPFracInterpolator.h:907-919), so surplus positions are real
        start_np, fti_np, t_np = self.host_positions(Mp)
        buf = self._apply_banded(x, x.shape[1], Mp, start_np, fti_np,
                                 t_np, raw=True)
        return buf, M

    def phys_in_need(self, n_valid: int, min_out=None):
        """Physical input columns that make this stage's framing
        right-pad vanish under the seam protocol, or None when a left
        extension makes the pad unavoidable.  Must stay geometry-
        consistent with apply_v/_apply_banded (shared _banded_geom)."""
        if self.engine != "banded" or self.spec.in_latency:
            return None  # apply_v falls back to the sliced path there
        M = stage_out_len(self.spec, n_valid)
        if M <= 0:
            return None
        G = self.G
        n_grp = -(-M // G)
        if min_out is not None:
            n_grp = max(n_grp, -(-min_out // G))
        start_np, _f, _t = self.host_positions(n_grp * G)
        _chunks, need_len, pad_l, _W = self._banded_geom(n_grp * G,
                                                         start_np)
        return need_len if pad_l == 0 else None

    def apply_df(self, h: jnp.ndarray, l, n_valid=None,
                 emit_pair: bool = True):
        """df32 inter-stage carry: see ConvExec.apply_df.  The banded
        engine emits (main contraction, spline-residual + seam-residual
        corrections) as a two_sum pair on raw group buffers (positions
        are closed-form, surplus positions are real — the apply_v
        argument); latency-shifted specs and other engines slice and
        collapse."""
        spec = self.spec
        C, N = h.shape
        if n_valid is None:
            n_valid = N
        M = stage_out_len(spec, n_valid)
        if self.engine != "banded" or spec.in_latency or M <= 0:
            y = self.apply(_df_collapse_input(h, l, n_valid))
            return y, None, y.shape[1]
        G = self.G
        Mp = -(-M // G) * G
        start_np, fti_np, t_np = self.host_positions(Mp)
        res = self._apply_banded(h, N, Mp, start_np, fti_np, t_np,
                                 raw=True, x_lo=l, pair=emit_pair)
        if emit_pair:
            return res[0], res[1], M
        return res, None, M

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        C, N = x.shape
        if spec.in_latency:
            x = x[:, spec.in_latency :]
            N -= spec.in_latency
        M = stage_out_len(spec, N + spec.in_latency)
        if M <= 0:
            return jnp.zeros((C, 0), dtype=self.dtype)
        start_np, fti_np, t_np = self.host_positions(M)
        if self.engine == "banded":
            return self._apply_banded(x, N, M, start_np, fti_np, t_np)
        pad_l = max(0, -int(start_np.min()))
        pad_r = max(0, int(start_np.max()) + self.fl - N)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (pad_l, pad_r)))
        start = jnp.asarray(start_np + pad_l)
        fti = jnp.asarray(fti_np)
        t = jnp.asarray(t_np.astype(self.dtype))
        c0 = jnp.asarray(self.c0)[fti]  # [M, fl] (device gather)
        c1 = jnp.asarray(self.c1)[fti]
        c2 = jnp.asarray(self.c2)[fti]
        flt = c0 + (c1 + c2 * t[:, None]) * t[:, None]  # [M, fl]
        y = jnp.zeros((C, M), dtype=self.dtype)
        for i in range(self.fl):
            y = y + flt[None, :, i] * jnp.take(xp, start + i, axis=1)
        return y

    def _banded_geom(self, Mp: int, start_np: np.ndarray):
        """Framing geometry shared by _apply_banded and phys_in_need:
        (chunks, need_len, pad_l, W) for full-length (n_grp*G) window
        starts."""
        G, S, W, fl = self.G, self.S, self.W, self.fl
        n_grp = Mp // G
        pad_l = max(0, -int(start_np.min()))
        sg = (start_np + pad_l).reshape(n_grp, G)  # window starts per grp

        # single-chunk widening: a modestly wider band W that absorbs the
        # WHOLE drift span turns the 10+ drift chunks into one — no
        # per-chunk frame trim (each a near-full-input HBM copy), no
        # output concat, one operator upload.  Adopted only when the
        # extra band MACs stay bounded (<= 1.45x) and the host operator
        # literal stays under the embedding cap; otherwise the drift
        # chunking below is unchanged.
        m_i = np.arange(n_grp, dtype=np.int64)[:, None]
        rel = sg - m_i * S  # group-local window starts
        A1 = int(rel.min())
        W1 = -(-(int(rel.max()) - A1 + fl) // 8) * 8
        # DEFAULT OFF: interleaved chip A/B (tools/ab_poly.py, round 4)
        # measured widening at -3..-5% — the extra band MACs cost more
        # than the per-chunk trims, which XLA overlaps with MXU work
        wide = (W1 <= int(1.45 * W) + 8
                and n_grp * W1 * G <= 16_000_000
                and os.environ.get("R8BT_POLY_WIDE", "0") == "1")
        if wide:
            W = W1
        # ngrp_max was sized to the nominal slack; the REAL drift budget
        # is W - fl - spread, which usually admits ~2-3x larger chunks.
        # chunk_drift_groups halves on violation, so the budget governs
        # by DEFAULT (measured +1% on chip, tools/ab_poly.py round 4:
        # 2864 vs 2837 exec Mrops — fewer trims/concat pieces at zero
        # extra MACs); R8BT_POLY_NGRPMAX=nominal restores the old cap.
        ngrp_max = (self.ngrp_max if (not wide and os.environ.get(
            "R8BT_POLY_NGRPMAX") == "nominal") else n_grp)
        chunks, need_len, shift = chunk_drift_groups(
            sg, sg, 1, S, fl, W, ngrp_max, W)
        return chunks, need_len, pad_l + shift, W

    def _apply_banded(self, x, N, M, start_np, fti_np, t_np,
                      raw: bool = False, x_lo=None, pair: bool = False):
        C = x.shape[0]
        G, S, fl = self.G, self.S, self.fl
        n_grp = -(-M // G)
        Mp = n_grp * G
        if Mp > M:  # non-seam caller: edge-extend the last partial group
            ext = Mp - M
            start_np = np.concatenate([start_np,
                                       np.repeat(start_np[-1], ext)])
            fti_np = np.concatenate([fti_np, np.repeat(fti_np[-1], ext)])
            t_np = np.concatenate([t_np, np.repeat(t_np[-1], ext)])
        chunks, need_len, pad_l, W = self._banded_geom(Mp, start_np)

        pad_r = max(0, need_len - (N + pad_l))
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (pad_l, pad_r)))
        xlp = None
        if x_lo is not None:  # bf16 seam-residual stream: keep dtype
            xlp = jnp.pad(x_lo, ((0, 0), (pad_l, pad_r)))
        iota_w = jnp.arange(W, dtype=jnp.int32)
        fti2 = fti_np.reshape(n_grp, G)
        t2 = t_np.reshape(n_grp, G)
        tb = self.tab64
        # the spline filter values are data-INDEPENDENT (positions are
        # host f64), so evaluate them on host in f64 and embed as a
        # program literal — the device table gathers (TPU gathers run
        # ~10x under DMA bandwidth) and the per-call polynomial eval
        # disappear, and the literal is exactly the f64 value rounded
        # once to the compute dtype.  Tiered by literal size (~64 MB cap
        # either way, keeping the HLO bounded for very long one-shots):
        #   host_R   — embed the WHOLE banded operator R ([sum nloc, W, G]
        #              f32): the per-call one-hot placement passes (fl
        #              sweeps over O(M*W) elements, ~2.4 ms/iter of the
        #              poly chain's 18.7 in the round-3 profile —
        #              XLA:TPU does NOT hoist them out of a fori_loop
        #              nor constant-fold tensors this large) disappear;
        #              the values are identical, placement is exact.
        #   host_flt — embed only the [M, fl] filter values and place
        #              them on device (R would bloat the program).
        #   else     — device table gather fallback.
        host_R = (Mp * W <= 16_000_000
                  and os.environ.get("R8BT_POLY_HOSTR", "1") != "0")
        host_flt = Mp * fl <= 16_000_000
        if not host_flt:
            c0t = jnp.asarray(self.c0)
            c1t = jnp.asarray(self.c1)
            c2t = jnp.asarray(self.c2)
        outs = []
        for g0, nloc, A, off in chunks:
            if host_flt:
                fc = fti2[g0 : g0 + nloc]
                tc = t2[g0 : g0 + nloc][..., None]
                flt_np = (tb[fc, :, 0]
                          + (tb[fc, :, 1] + tb[fc, :, 2] * tc) * tc)
                if not host_R:
                    flt = jnp.asarray(flt_np.astype(self.dtype))
            else:
                fti_c = jnp.asarray(fti2[g0 : g0 + nloc])
                t_c = jnp.asarray(
                    t2[g0 : g0 + nloc].astype(self.dtype))[..., None]
                flt = c0t[fti_c] + (c1t[fti_c] + c2t[fti_c] * t_c) * t_c
            if host_flt and self.oz_products:
                # guarantee path: exact f64 operator values host-split
                # into bf16 slices, contracted with the ozaki exactness
                # lemma (banded_contract_ozaki) — no R_lo residual
                # needed, the slices carry the full f64 operator to 32
                # bits.  Below the host_R cap the whole split operator
                # embeds as literals; above it (real audio lengths —
                # the cap is ~0.6 s of poly output per call) only the
                # [Mp, fl] flt SLICES embed and each R_q is one-hot
                # placed ON DEVICE (exact: bf16-grid values times 0/1
                # masks, disjoint adds), so the -150 dB class holds up
                # to the flt cap (~10 s per call) instead of silently
                # collapsing to the uncorrected f32 form (round-5
                # review finding: -140.8 dB above the old gate).
                from .ozaki import (N_PARTS, split_operator_host_batched)
                if host_R:
                    m_i = np.arange(nloc)[:, None]
                    g_i = np.arange(G)[None, :]
                    R64 = np.zeros((nloc, W, G), dtype=np.float64)
                    for i in range(fl):
                        R64[m_i, off + i, g_i] = flt_np[..., i]
                    R_oz = jnp.asarray(split_operator_host_batched(R64))
                else:
                    fps = jnp.asarray(
                        split_operator_host_batched(flt_np, axis=-1))
                    off_d = jnp.asarray(off)
                    parts = []
                    for q in range(N_PARTS):
                        fq = fps[q].astype(jnp.float32)
                        Rq = jnp.zeros((nloc, G, W), jnp.float32)
                        for i in range(fl):
                            Rq = Rq + fq[..., i : i + 1] * (
                                iota_w[None, None, :]
                                == (off_d + i)[..., None])
                        parts.append(jnp.swapaxes(Rq, 1, 2)
                                     .astype(jnp.bfloat16))
                    R_oz = jnp.stack(parts)
                res = banded_contract_ozaki(
                    xp[:, A:], R_oz, nloc, S, W,
                    x_lo=None if xlp is None else xlp[:, A:], pair=pair)
                if pair:
                    outs.append((res[0].reshape(C, nloc * G),
                                 res[1].reshape(C, nloc * G)))
                else:
                    outs.append((res.reshape(C, nloc * G), None))
                continue
            if self.oz_products and not host_flt:
                # beyond the flt literal cap (~10 s of poly output per
                # call) the guarantee products fall back to the
                # residual-corrected HIGHEST form below — make the
                # class change loud instead of silent
                from ..utils.trace import trace
                trace("poly_oz_flt_cap", Mp=Mp, fl=fl,
                      detail="guarantee products above the flt literal "
                             "cap: falling back to residual-corrected "
                             "HIGHEST (~-143 dB class); split long "
                             "signals (oneshot max_chunk) to keep the "
                             "-150 class")
            if host_R:
                # build R[m, w, g] on host: each one-hot placement writes
                # a distinct w per (m, g, i), so scatter-assign is exact
                # and bit-identical to the device build (values rounded
                # once to the compute dtype, placement adds nothing).
                flt_c = flt_np.astype(self.dtype)
                R_np = np.zeros((nloc, W, G), dtype=self.dtype)
                m_i = np.arange(nloc)[:, None]
                g_i = np.arange(G)[None, :]
                for i in range(fl):
                    R_np[m_i, off + i, g_i] = flt_c[..., i]
                R = jnp.asarray(R_np)
                if self.precision == "high":
                    # spline-operator representation residual: the f64
                    # filter values' f32 rounding is the poly stage's
                    # dominant error term (the differential fuzzer
                    # measured the guarantee chain at -142.3 dB worst,
                    # 1.3 dB over the class bound); one cheap
                    # RESIDUAL_PRECISION banded pass restores ~30 dB of
                    # margin.  Only on the host-literal branch — above
                    # the embedding cap the device build keeps the fast
                    # form (documented, R8B_TRACE visible).
                    R_lo = np.zeros((nloc, W, G), dtype=np.float64)
                    for i in range(fl):
                        R_lo[m_i, off + i, g_i] = flt_np[..., i]
                    R_lo = (R_lo - R_np.astype(np.float64)).astype(
                        np.float32)
                    R_lo_d = jnp.asarray(R_lo)
            else:
                off_d = jnp.asarray(off)  # [nloc, G]
                # banded operator R[m, w, g]: flt rows one-hot-placed at
                # off
                R = jnp.zeros((nloc, G, W), dtype=self.dtype)
                for i in range(fl):
                    R = R + flt[..., i : i + 1] * (
                        iota_w[None, None, :] == (off_d + i)[..., None])
                R = jnp.swapaxes(R, 1, 2)  # [nloc, W, G]
                R_lo_d = None
                if host_flt and self.precision == "high":
                    # spline-residual correction above the host_R cap
                    # (round-5 review finding: without it the high
                    # class dropped to -140.8 dB past ~0.6 s of poly
                    # output per call): the f64-f32 residual of the flt
                    # literal is one-hot placed on device and applied
                    # as the same cheap RESIDUAL pass as the host_R
                    # branch
                    flt_lo = jnp.asarray(
                        (flt_np - flt_np.astype(np.float32)
                         ).astype(np.float32))
                    Rl = jnp.zeros((nloc, G, W), dtype=self.dtype)
                    for i in range(fl):
                        Rl = Rl + flt_lo[..., i : i + 1] * (
                            iota_w[None, None, :]
                            == (off_d + i)[..., None])
                    R_lo_d = jnp.swapaxes(Rl, 1, 2)
            o = banded_contract(xp[:, A:], R, nloc, S, W,
                                jax.lax.Precision.HIGHEST)
            small = None
            if self.precision == "high" and (
                    host_R or (host_flt and R_lo_d is not None)):
                small = banded_contract(xp[:, A:], R_lo_d, nloc, S, W,
                                        RESIDUAL_PRECISION)
            if xlp is not None:
                # df32 seam carry: the previous seam's residual stream
                # needs only ~8 relative bits (|x_lo| <= 2^-24 |x|) —
                # one cheap-precision banded pass lands it at ~2^-32
                c = banded_contract(xlp[:, A:], R, nloc, S, W,
                                    RESIDUAL_PRECISION)
                small = c if small is None else small + c
            if not pair and small is not None:
                o = o + small
            outs.append((o.reshape(C, nloc * G),
                         None if small is None or not pair
                         else small.reshape(C, nloc * G)))
        if pair:
            y = (jnp.concatenate([a for a, _ in outs], axis=1)
                 if len(outs) > 1 else outs[0][0])
            ls = [b.astype(jnp.float32) if b is not None
                  else jnp.zeros_like(a) for a, b in outs]
            yl = jnp.concatenate(ls, axis=1) if len(ls) > 1 else ls[0]
            if not raw:
                y, yl = y[:, :M], yl[:, :M]
            from .dfloat import two_sum
            H, L = two_sum(y, yl)
            return H, L.astype(jnp.bfloat16)
        y = (jnp.concatenate([a for a, _ in outs], axis=1)
             if len(outs) > 1 else outs[0][0])
        return y if raw else y[:, :M]


def build_exec(spec: Stage, dtype=jnp.float32, precision: str = "fast",
               conv_engine: str = "auto", frac_engine: str = "auto"):
    if isinstance(spec, ConvStage):
        return ConvExec(spec, dtype, precision=precision, engine=conv_engine)
    hb_engine = "ozaki" if conv_engine == "ozaki" else "auto"
    if isinstance(spec, HBUpStage):
        return HBUpExec(spec, dtype, precision=precision, engine=hb_engine)
    if isinstance(spec, HBDownStage):
        return HBDownExec(spec, dtype, precision=precision, engine=hb_engine)
    if isinstance(spec, FracStage):
        if spec.is_whole:
            return FracWholeExec(spec, dtype, precision=precision,
                                 engine=frac_engine)
        poly_engine = frac_engine if frac_engine in ("auto", "banded",
                                                     "gather") else "auto"
        return FracPolyExec(spec, dtype, engine=poly_engine,
                            precision=("high" if frac_engine == "ozaki"
                                       else precision),
                            oz_products=frac_engine == "ozaki")
    raise TypeError(spec)
