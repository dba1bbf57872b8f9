"""Pallas TPU kernel for the whole-stepping fractional interpolator.

The XLA im2col formulation (ops/stages.py FracWholeExec) re-reads the
overlapping windows through segmented einsums; this kernel fuses window
extraction and the phase-bank matmul in VMEM.  Each grid cell manually DMAs
one contiguous input span x[c_tile, b*Q*I : b*Q*I + (Q-1)*I + D] (windows
OVERLAP across cells by D - I samples, which blocked BlockSpecs cannot
express), takes Q static strided slices, and runs Q MXU matmuls against the
VMEM-resident [D, out_step] bank — no duplicated HBM traffic, no wasted
MACs.

Used by FracWholeExec(engine="pallas"); validated in interpreter mode on
CPU against the im2col engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

__all__ = ["HAVE_PALLAS", "frac_whole_pallas", "choose_tiles"]


def choose_tiles(I: int, D: int, O: int, C: int,
                 vmem_budget: int = 8 * 1024 * 1024,
                 has_lo: bool = False):
    """(Q, CT) for frac_whole_pallas, or (0, 0) when infeasible.

    Q (windows per grid cell) is the smallest multiple of
    128/gcd(I, 128) — making the per-cell start Q*I lane-aligned for ANY
    stride I (the round-1 kernel fixed Q=8 and so only ran for
    128-aligned strides); CT is the largest channel tile fitting the
    input span + output tile + bank in the VMEM budget.  The budget
    accounts for Mosaic's block double-buffering (2x on the output block
    and window scratch) against the 16 MB scoped-vmem limit.  has_lo
    budgets the second [D, O] kernel-residual bank that precision="high"
    passes into the kernel (skT_lo).
    """
    import math
    q0 = 128 // math.gcd(I, 128)
    Q = q0 * max(1, -(-8 // q0))  # at least ~8 windows per DMA
    span = (Q - 1) * I + D
    S = -(-(span + 127) // 128) * 128
    banks = 2 if has_lo else 1
    for CT in (128, 64, 32, 16, 8):
        if C % CT:
            continue
        vmem = 4 * (2 * CT * S + 2 * CT * Q * O + banks * D * O)
        if vmem <= vmem_budget:
            return Q, CT
    return 0, 0


def _make_kernel(Q: int, I: int, D: int, O: int, CT: int, has_lo: bool):
    span = (Q - 1) * I + D
    # Mosaic requires HBM DMA slices 128-aligned in the minor dim: copy an
    # aligned superset and index the residual offset inside VMEM.
    S = -(-(span + 127) // 128) * 128
    aligned = (Q * I) % 128 == 0  # per-cell start is always 128-aligned

    def kernel(x_hbm, sk_ref, *rest):
        if has_lo:
            sk_lo_ref, o_ref, xwin, sem = rest
        else:
            o_ref, xwin, sem = rest
        c = pl.program_id(0)
        b = pl.program_id(1)
        start = b * (Q * I)
        start_al = (start // 128) * 128
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * CT, CT), pl.ds(pl.multiple_of(start_al, 128),
                                              S)],
            xwin, sem)
        cp.start()
        cp.wait()
        sk = sk_ref[:]
        off = None if aligned else start - start_al
        for q in range(Q):
            # static window starts when the cell stride is 128-aligned
            # (Mosaic relayouts static unaligned slices; dynamic unaligned
            # vector loads are rejected)
            w = (xwin[:, q * I : q * I + D] if aligned
                 else xwin[:, pl.ds(off + q * I, D)])
            # HIGHEST: 6-pass bf16 decomposition == f32 accuracy; the MXU
            # default single pass is bf16-only (~2e-3 relative error)
            o = jnp.dot(w, sk, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            if has_lo:
                # kernel-representation residual (precision="high"): the
                # lo operator is ~2^-24 the main term, so one default-
                # precision bf16 pass suffices (~2^-34 relative)
                o = o + jnp.dot(w, sk_lo_ref[:],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
            o_ref[:, q * O : (q + 1) * O] = o

    return kernel, span, S


@functools.partial(jax.jit, static_argnames=("Q", "I", "D", "O", "CT",
                                             "interpret"))
def frac_whole_pallas(xp: jnp.ndarray, skT: jnp.ndarray, Q: int, I: int,
                      D: int, O: int, CT: int = 128,
                      interpret: bool = False,
                      skT_lo=None) -> jnp.ndarray:
    """xp: [C, L] float32 with C % CT == 0 and
    L >= (n_blocks*Q - 1)*I + D; skT: [D, O].
    Returns y [C, n_blocks*Q*O]: y[c, (b*Q+q)*O + j] = window(b*Q+q) . skT.

    skT_lo (optional, [D, O]): f64->f32 kernel-representation residual for
    the precision="high" class; fused into the same kernel as a second
    cheap-precision dot (no extra input DMA).
    """
    C, L = xp.shape
    assert C % CT == 0, (C, CT)
    has_lo = skT_lo is not None
    kernel, span, S = _make_kernel(Q, I, D, O, CT, has_lo)
    n_blocks = (L - span) // (Q * I) + 1
    assert n_blocks >= 1
    # every cell's aligned DMA superset must stay in bounds
    need = ((n_blocks - 1) * Q * I // 128) * 128 + S
    if L < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - L)))
    grid = (C // CT, n_blocks)
    bank_spec = pl.BlockSpec((skT.shape[0], O), lambda c, b: (0, 0))
    any_space = getattr(pl, "ANY", None) or pltpu.ANY
    in_specs = [pl.BlockSpec(memory_space=any_space), bank_spec]
    operands = [xp, skT]
    if has_lo:
        in_specs.append(bank_spec)
        operands.append(skT_lo)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, n_blocks * Q * O), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((CT, Q * O), lambda c, b: (c, b)),
        scratch_shapes=[
            pltpu.VMEM((CT, S), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*operands)
