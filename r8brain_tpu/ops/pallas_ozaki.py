"""Pallas TPU kernel for the error-free split-operand (Ozaki) matmul.

The XLA composition of ops/ozaki.py is memory-bound: each of the 10
slice-pair partials materializes a full [C, n_blocks, Kcols] f32 tensor in
HBM (measured on chip: 119x baseline at 1 kept diagonal, 46x at 3
partials, 21x at 10 — time linear in partial count, not MACs).  This
kernel keeps the whole pipeline in VMEM: one DMA of the f32 input span
per grid cell, the 4-way 8-bit fixed-point split computed on the VPU, the
10 bfloat16 MXU dots accumulated in VMEM registers with a two_sum
compensation on the dominant diagonal, and ONE f32 output write.

Exactness story is identical to ops/ozaki.py (module docstring there):
slice products are integers < 2^16 on a per-(channel, column)
power-of-two grid, accumulated <= 256 at a time, so every f32 add is
exact on any backend; the kernel merely removes the HBM round trips.

Validated in interpreter mode against the XLA composition bit-for-bit
(tests/test_ozaki.py).
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

from .dfloat import two_sum
from .ozaki import K0, N_DIAG, N_PARTS

__all__ = ["HAVE_PALLAS", "ozaki_matmul_pallas",
           "_ozaki_matmul_pallas_var", "ozaki_dense_pallas", "choose_ct"]


def choose_ct(C: int, S: int, L_f: int, Kcols: int,
              vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Largest channel tile fitting the VMEM budget (0 = infeasible).

    Budget: f32 input window CT*S*4, four bf16 split parts CT*S*2*4,
    T parts N_PARTS*L_f*Kcols*2 (resident), three f32 accumulators
    CT*Kcols*4, double-buffered output 2*CT*Kcols*4.
    """
    t_bytes = N_PARTS * L_f * Kcols * 2
    for CT in (128, 64, 32, 16, 8):
        if C % CT:
            continue
        vmem = (CT * S * 4 + N_PARTS * CT * S * 2 + t_bytes
                + 5 * CT * Kcols * 4)
        if vmem <= vmem_budget:
            return CT
    return 0


def _make_kernel(L_f: int, hop: int, Kcols: int, CT: int, S: int,
                 has_lo: bool = False, emit_pair: bool = False):
    """Kernel variants for the df32 inter-stage carry (round 5):
    ``has_lo`` consumes the previous seam's bfloat16 residual window
    (one extra bf16 pass per chunk vs the top operator slice);
    ``emit_pair`` writes the two_sum-normalized (hi f32, lo bfloat16)
    pair instead of collapsing.  A chain's first stage emits only, its
    last consumes only — each combination pays just its own cost."""
    n_chunks = -(-L_f // K0)

    def kernel(sx_ref, x_hbm, *refs):
        if has_lo:
            xl_hbm = refs[0]
            refs = refs[1:]
        T_ref = refs[0]
        refs = refs[1:]
        if emit_pair:
            o_ref, ol_ref = refs[0], refs[1]
            refs = refs[2:]
        else:
            o_ref = refs[0]
            refs = refs[1:]
        if has_lo:
            xwin, xlwin, sem, seml = refs
        else:
            xwin, sem = refs
        c = pl.program_id(0)
        b = pl.program_id(1)
        start = b * hop  # hop is a multiple of 128 (B >= 128, integer down)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * CT, CT),
                     pl.ds(pl.multiple_of(start, 128), S)],
            xwin, sem)
        cp.start()
        if has_lo:
            cpl = pltpu.make_async_copy(
                xl_hbm.at[pl.ds(c * CT, CT),
                          pl.ds(pl.multiple_of(start, 128), S)],
                xlwin, seml)
            cpl.start()
        cp.wait()
        sx = sx_ref[:]                     # [CT, 1] power-of-two scale
        xs = xwin[:] * (1.0 / sx)          # exact: pow2 reciprocal+mul
        parts = []
        r = xs
        for p in range(N_PARTS):
            step = np.float32(2.0 ** (-8 * (p + 1)))
            q = jnp.round(r * np.float32(1.0 / step)) * step
            parts.append(q.astype(jnp.bfloat16))
            r = r - q                      # exact residual
        if has_lo:
            cpl.wait()
            xlb = xlwin[:]                 # bf16 seam residual window
        hi = jnp.zeros((CT, Kcols), jnp.float32)
        lo = jnp.zeros((CT, Kcols), jnp.float32)
        rest = jnp.zeros((CT, Kcols), jnp.float32)
        cheap = jnp.zeros((CT, Kcols), jnp.float32) if has_lo else None
        for e in range(n_chunks):
            a0 = e * K0
            a1 = min(L_f, a0 + K0)
            for p in range(N_PARTS):
                for q_ in range(N_PARTS):
                    d = p + q_
                    if d >= N_DIAG:
                        continue
                    w = parts[p][:, a0:a1]
                    Tq = T_ref[q_, a0:a1, :]
                    o = jnp.dot(w, Tq,
                                preferred_element_type=jnp.float32)
                    if d == 0:
                        s, err = two_sum(hi, o)
                        hi, lo = s, lo + err
                    else:
                        rest = rest + o
            if has_lo:
                cheap = cheap + jnp.dot(
                    xlb[:, a0:a1], T_ref[0, a0:a1, :],
                    preferred_element_type=jnp.float32)
        if not emit_pair:
            if has_lo:
                # single final rounding: small terms combine first
                o_ref[:] = hi * sx + ((lo + rest) * sx + cheap)
            else:
                o_ref[:] = (hi + (lo + rest)) * sx
            return
        small = (lo + rest) * sx
        if has_lo:
            small = small + cheap
        # identical combine to the XLA pair path (ops/ozaki.py)
        H, L = two_sum(hi * sx, small)
        o_ref[:] = H
        ol_ref[:] = L.astype(jnp.bfloat16)

    return kernel


def _make_dense_kernel(Kpad: int, D: int, G: int, RT: int,
                       emit_pair: bool = False):
    n_chunks = -(-D // K0)

    def kernel(a_ref, sx_ref, T_ref, o_ref, *maybe_ol):
        sx = sx_ref[:]                      # [RT, 1] pow2 row scales
        xs = a_ref[:] * (1.0 / sx)
        parts = []
        r = xs
        for p in range(N_PARTS):
            step = np.float32(2.0 ** (-8 * (p + 1)))
            q = jnp.round(r * np.float32(1.0 / step)) * step
            parts.append(q.astype(jnp.bfloat16))
            r = r - q
        hi = jnp.zeros((RT, G), jnp.float32)
        lo = jnp.zeros((RT, G), jnp.float32)
        rest = jnp.zeros((RT, G), jnp.float32)
        for e in range(n_chunks):
            a0 = e * K0
            a1 = min(D, a0 + K0)
            for p in range(N_PARTS):
                for q_ in range(N_PARTS):
                    d = p + q_
                    if d >= N_DIAG:
                        continue
                    w = parts[p][:, a0:a1]
                    Tq = T_ref[q_, a0:a1, :]
                    o = jnp.dot(w, Tq,
                                preferred_element_type=jnp.float32)
                    if d == 0:
                        s, err = two_sum(hi, o)
                        hi, lo = s, lo + err
                    else:
                        rest = rest + o
        if emit_pair:
            # (hi f32, lo bfloat16) pair for the df32 carry: the caller
            # folds the seam-residual contribution into lo and collapses
            # with a SINGLE final rounding
            H, L = two_sum(hi * sx, (lo + rest) * sx)
            o_ref[:] = H
            maybe_ol[0][:] = L.astype(jnp.bfloat16)
        else:
            o_ref[:] = (hi + (lo + rest)) * sx

    return kernel


@functools.partial(jax.jit, static_argnames=("D", "G", "RT", "interpret"))
def ozaki_dense_pallas_pair(frames: jnp.ndarray, sx: jnp.ndarray,
                            T_parts: jnp.ndarray, D: int, G: int,
                            RT: int = 256, interpret: bool = False):
    """ozaki_dense_pallas emitting the (hi f32, lo bfloat16) pair for
    the df32 inter-stage carry — same contraction, one extra bf16
    output write."""
    R, Kpad = frames.shape
    kernel = _make_dense_kernel(Kpad, D, G, RT, emit_pair=True)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((R, G), jnp.float32),
                   jax.ShapeDtypeStruct((R, G), jnp.bfloat16)),
        grid=(R // RT,),
        in_specs=[
            pl.BlockSpec((RT, Kpad), lambda r: (r, 0)),
            pl.BlockSpec((RT, 1), lambda r: (r, 0)),
            pl.BlockSpec((N_PARTS, Kpad, G), lambda r: (0, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((RT, G), lambda r: (r, 0)),
                   pl.BlockSpec((RT, G), lambda r: (r, 0))),
        interpret=interpret,
    )(frames, sx, T_parts)


@functools.partial(jax.jit, static_argnames=("D", "G", "RT", "interpret"))
def ozaki_dense_pallas(frames: jnp.ndarray, sx: jnp.ndarray,
                       T_parts: jnp.ndarray, D: int, G: int,
                       RT: int = 256, interpret: bool = False
                       ) -> jnp.ndarray:
    """Dense split-operand matmul out[r, k] = sum_l frames[r, l] * T[l, k]
    for PRE-FRAMED rows (the frac stage's im2col windows, built XLA-side
    by the ops/stages._frames reshape trick — framing at an unaligned
    stride cannot be DMA'd directly, Mosaic requires 128-aligned starts).

    frames: [R, Kpad] f32 with R % RT == 0 and the tail columns [D, Kpad)
    zero; sx: [R, 1] power-of-two row scales; T_parts:
    [N_PARTS, Kpad, G] bfloat16 (host-split, zero rows past D).
    """
    R, Kpad = frames.shape
    kernel = _make_dense_kernel(Kpad, D, G, RT)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, G), jnp.float32),
        grid=(R // RT,),
        in_specs=[
            pl.BlockSpec((RT, Kpad), lambda r: (r, 0)),
            pl.BlockSpec((RT, 1), lambda r: (r, 0)),
            pl.BlockSpec((N_PARTS, Kpad, G), lambda r: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((RT, G), lambda r: (r, 0)),
        interpret=interpret,
    )(frames, sx, T_parts)


@functools.partial(jax.jit, static_argnames=(
    "L_f", "hop", "Kcols", "CT", "emit_pair", "interpret"))
def _ozaki_matmul_pallas_var(xp, xl, sx, T_parts, L_f: int, hop: int,
                             Kcols: int, CT: int, emit_pair: bool,
                             interpret: bool = False):
    """df32-carry kernel launcher: ``xl`` (bfloat16 seam residual, may
    be None) is consumed with one extra bf16 pass; ``emit_pair`` writes
    the (hi f32, lo bfloat16) pair — combine identical to
    ops/ozaki.framed_matmul_ozaki's pair path."""
    C, N = xp.shape
    S = -(-L_f // 128) * 128
    n_blocks = (N - S) // hop + 1
    assert n_blocks >= 1
    has_lo = xl is not None
    kernel = _make_kernel(L_f, hop, Kcols, CT, S, has_lo=has_lo,
                          emit_pair=emit_pair)
    grid = (C // CT, n_blocks)
    any_space = getattr(pl, "ANY", None) or pltpu.ANY
    in_specs = [pl.BlockSpec((CT, 1), lambda c, b: (c, 0)),
                pl.BlockSpec(memory_space=any_space)]   # manual DMA (x)
    args = [sx, xp]
    scratch = [pltpu.VMEM((CT, S), jnp.float32)]
    if has_lo:
        in_specs.append(pl.BlockSpec(memory_space=any_space))  # x_lo
        args.append(xl)
        scratch.append(pltpu.VMEM((CT, S), jnp.bfloat16))
    in_specs.append(pl.BlockSpec((N_PARTS, L_f, Kcols),
                                 lambda c, b: (0, 0, 0)))
    args.append(T_parts)
    scratch.append(pltpu.SemaphoreType.DMA)
    if has_lo:
        scratch.append(pltpu.SemaphoreType.DMA)
    out_spec = pl.BlockSpec((CT, Kcols), lambda c, b: (c, b))
    if emit_pair:
        out_shape = (jax.ShapeDtypeStruct((C, n_blocks * Kcols),
                                          jnp.float32),
                     jax.ShapeDtypeStruct((C, n_blocks * Kcols),
                                          jnp.bfloat16))
        out_specs = (out_spec, out_spec)
    else:
        out_shape = jax.ShapeDtypeStruct((C, n_blocks * Kcols),
                                         jnp.float32)
        out_specs = out_spec
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=(
    "L_f", "hop", "Kcols", "CT", "interpret"))
def ozaki_matmul_pallas(xp: jnp.ndarray, sx: jnp.ndarray,
                        T_parts: jnp.ndarray, L_f: int, hop: int,
                        Kcols: int, CT: int,
                        interpret: bool = False) -> jnp.ndarray:
    """out[c, b*Kcols + k] = sum_l xp[c, b*hop + l] * T[l, k] in the
    backend-independent split-operand form.

    xp: [C, N] f32 with C % CT == 0 and N >= (n_blocks-1)*hop + S
    (S = L_f rounded up to 128); sx: [C, 1] f32 per-channel power-of-two
    scales (from ops.ozaki.split_input's normalization); T_parts:
    [N_PARTS, L_f, Kcols] bfloat16 host-split slices with the per-column
    scale folded in (exponent shift keeps bf16 exactness).
    """
    C, N = xp.shape
    S = -(-L_f // 128) * 128
    n_blocks = (N - S) // hop + 1
    assert n_blocks >= 1
    kernel = _make_kernel(L_f, hop, Kcols, CT, S)
    grid = (C // CT, n_blocks)
    any_space = getattr(pl, "ANY", None) or pltpu.ANY
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, n_blocks * Kcols), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((CT, 1), lambda c, b: (c, 0)),
            pl.BlockSpec(memory_space=any_space),   # manual DMA
            pl.BlockSpec((N_PARTS, L_f, Kcols), lambda c, b: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((CT, Kcols), lambda c, b: (c, b)),
        scratch_shapes=[
            pltpu.VMEM((CT, S), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sx, xp, T_parts)
