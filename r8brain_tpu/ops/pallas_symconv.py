"""Pallas TPU kernel for the centrosymmetry-folded banded-Toeplitz
convolver (linear-phase kernels — half the MXU flops).

Why a kernel: the XLA formulation of the fold (ops/stages.py
_apply_toeplitz_sym) must materialize every folded operand — XLA:TPU does
not fuse elementwise adds/reverses into dot operand reads — and the
resulting rev/pad/slice traffic measured 65% of device time (2.2x SLOWER
than the unfolded matmul despite half the MACs).  Here the fold is VMEM-
local and ONE kernel call serves a whole stage (all ``up`` phases share
the forward window DMA):

* the FORWARD window of frame b is DMA'd from x at b*hop (all phases
  share origin: _build_toeplitz_sym symmetric-extends each phase support
  so every in-VMEM offset is 0 — no unaligned slices, no relayouts);
* the REVERSED window of each phase comes from a once-flipped, pre-
  shifted copy of the stage input (one XLA rev pass per phase), read at
  (nbp-1-b)*hop — the frame-order reversal that poisoned the XLA path is
  absorbed into the DMA INDEX, costing nothing;
* z = fwd + rev and w = fwd - rev are VPU adds on VMEM tiles feeding two
  half-size MXU dots per phase against the resident folded operators
  Te / To (stages.py _build_toeplitz_sym);
* outputs emit as [e+o | e-o] blocks (both natural order — Mosaic cannot
  reverse lanes); the caller's single assembly pass flips the
  anti-palindromic half and interleaves phases.

precision="high" support mirrors the XLA path: row-truncated (and here
128-aligned) kernel-representation residual dots plus the exact two_sum
fold-error compensation, all at cheap single-pass-bf16 precision.

Reference for the symmetry exploited: CDSPSincFilterGen.h:312-395
(windowed-sinc band kernels are symmetric), CDSPHBUpsampler.inc:5-7 (the
reference's own half-band kernels fold taps the same way).
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

__all__ = ["HAVE_PALLAS", "sym_conv_stage_pallas", "choose_ct"]


def choose_ct(C: int, hop: int, Hp_max: int, B: int, Q: int, up: int,
              lo_rows: int = 0,
              vmem_budget: int = 11 * 1024 * 1024) -> int:
    """Largest channel tile whose VMEM footprint fits, or 0 if none.

    lo_rows: total resident residual-operator rows across phases
    (precision="high" keeps up*2 row-truncated Te_lo/To_lo blocks in VMEM
    alongside the main operators)."""
    S = -(-((Q - 1) * hop + Hp_max) // 128) * 128
    ops = (up * 2 * Hp_max + lo_rows) * (B // 2) * 4  # resident operators
    for CT in (128, 64, 32, 16, 8):
        if C % CT:
            continue
        vmem = 4 * CT * S * (1 + up) + ops + 2 * 4 * CT * Q * B * up
        if vmem <= vmem_budget:
            return CT
    return 0


def _make_kernel(up: int, Q: int, hop: int, Hps, B: int, CT: int,
                 has_lo: bool, r0s, comp: bool, nbp: int):
    Bh = B // 2
    Hp_max = max(Hps)
    # forward reads run one sub-128 offset past Hp on the widest phase;
    # the reverse span never needs more than the frame extent itself
    S = -(-((Q - 1) * hop + Hp_max) // 128) * 128

    def kernel(*refs):
        xf_hbm = refs[0]
        xr_hbm = refs[1 : 1 + up]
        pos = 1 + up
        ops = []
        for j in range(up):
            te, to = refs[pos], refs[pos + 1]
            pos += 2
            lo = None
            if has_lo:
                lo = (refs[pos], refs[pos + 1])
                pos += 2
            ops.append((te, to, lo))
        o_ref = refs[pos]
        xf_win = refs[pos + 1]
        xr_wins = refs[pos + 2 : pos + 2 + up]
        sems = refs[pos + 2 + up :]
        c = pl.program_id(0)
        bg = pl.program_id(1)
        b0 = bg * Q
        cps = [pltpu.make_async_copy(
            xf_hbm.at[pl.ds(c * CT, CT),
                      pl.ds(pl.multiple_of(b0 * hop, 128), S)],
            xf_win, sems[0])]
        rstart = (nbp - Q - b0) * hop
        for j in range(up):
            cps.append(pltpu.make_async_copy(
                xr_hbm[j].at[pl.ds(c * CT, CT),
                             pl.ds(pl.multiple_of(rstart, 128), S)],
                xr_wins[j], sems[1 + j]))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        for q in range(Q):
            for j in range(up):
                Hp = Hps[j]
                te, to, lo = ops[j]
                a = xf_win[:, q * hop : q * hop + Hp]
                r = xr_wins[j][:, (Q - 1 - q) * hop
                               : (Q - 1 - q) * hop + Hp]
                z = a + r
                w = a - r
                oe = jnp.dot(z, te[:], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                oo = jnp.dot(w, to[:], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                if lo is not None:
                    # kernel-representation residual: ~2^-24 of the main
                    # term; one default-precision (bf16) pass suffices.
                    # Row ranges are 128-aligned at build time so the
                    # operand slices need no VMEM relayout.
                    (r0e, r0o) = r0s[j]
                    te_lo, to_lo = lo
                    Le, Lo = te_lo.shape[0], to_lo.shape[0]
                    if Le:
                        oe = oe + jnp.dot(
                            z[:, r0e : r0e + Le], te_lo[:],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                    if Lo:
                        oo = oo + jnp.dot(
                            w[:, r0o : r0o + Lo], to_lo[:],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                if comp:
                    # exact two_sum fold-rounding compensation (~2^-24 of
                    # z): cheap dots push the fold noise to ~2^-32
                    bz = z - a
                    z_err = (a - (z - bz)) + (r - bz)
                    bv = w - a
                    w_err = (a - (w - bv)) - (r + bv)
                    oe = oe + jnp.dot(z_err, te[:],
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.DEFAULT)
                    oo = oo + jnp.dot(w_err, to[:],
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.DEFAULT)
                base = (q * up + j) * B
                o_ref[:, base : base + Bh] = oe + oo
                o_ref[:, base + Bh : base + B] = oe - oo

    return kernel, S


@functools.partial(jax.jit, static_argnames=(
    "up", "nbp", "Q", "hop", "Hps", "B", "CT", "r0s", "comp", "interpret"))
def sym_conv_stage_pallas(xf: jnp.ndarray, xrs, tes_tos, nbp: int, up: int,
                          Q: int, hop: int, Hps, B: int, CT: int,
                          los=None, r0s=None, comp: bool = False,
                          interpret: bool = False) -> jnp.ndarray:
    """All phases of one folded banded-Toeplitz conv stage.

    xf: [C, Lf] stage input (shared frame origin; frame b fold row l of
        every phase reads xf[b*hop + l]).
    xrs: per-phase pre-reversed operands; rev row l of frame b reads
        xrs[j][(nbp_pad-1-b)*hop + l].
    tes_tos: flat tuple (Te_0, To_0, Te_1, To_1, ...), each [Hp_j, B//2].
    los: optional flat tuple of residual row blocks (Te_lo_0, To_lo_0,
        ...) with 128-aligned row offsets r0s = ((r0e_0, r0o_0), ...).
    Returns out [C, nbp_pad*up*B]: block (b, q... ) layout
    [phase0: e+o | e-o][phase1: ...] per frame, both halves natural order
    (caller flips the anti-palindromic half and interleaves phases in one
    assembly pass).
    """
    C = xf.shape[0]
    assert C % CT == 0, (C, CT)
    assert hop % 128 == 0 and B % 2 == 0
    has_lo = los is not None
    if r0s is None:
        r0s = tuple((0, 0) for _ in range(up))
    nbg = -(-nbp // Q)
    nbp_pad = nbg * Q
    kernel, S = _make_kernel(up, Q, hop, tuple(Hps), B, CT, has_lo,
                             tuple(r0s), comp, nbp_pad)
    # callers size the operands so no pad (= full-array copy) runs here:
    # every DMA superset [b0*hop, b0*hop + S) and its reverse twin stay in
    # bounds because L_f >= Hp + 128 for all stage shapes
    need = (nbp_pad - Q) * hop + S
    assert xf.shape[1] >= need, (xf.shape, need)
    for xr in xrs:
        assert xr.shape[1] >= need, (xr.shape, need)
    grid = (C // CT, nbg)
    any_space = getattr(pl, "ANY", None) or pltpu.ANY
    in_specs = [pl.BlockSpec(memory_space=any_space)]
    operands = [xf]
    for xr in xrs:
        in_specs.append(pl.BlockSpec(memory_space=any_space))
        operands.append(xr)
    for j in range(up):
        te, to = tes_tos[2 * j], tes_tos[2 * j + 1]
        for op in (te, to):
            in_specs.append(pl.BlockSpec(op.shape, lambda c, b: (0, 0)))
            operands.append(op)
        if has_lo:
            for op in (los[2 * j], los[2 * j + 1]):
                in_specs.append(pl.BlockSpec(op.shape, lambda c, b: (0, 0)))
                operands.append(op)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, nbp_pad * up * B), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((CT, Q * up * B), lambda c, b: (c, b)),
        scratch_shapes=(
            [pltpu.VMEM((CT, S), jnp.float32)]
            + [pltpu.VMEM((CT, S), jnp.float32) for _ in range(up)]
            + [pltpu.SemaphoreType.DMA for _ in range(1 + up)]),
        interpret=interpret,
    )(*operands)
