"""VMEM framed matmul: the toeplitz convolver's segmented contraction
as one Pallas kernel.

The XLA form (ops/stages._framed_matmul) contracts hop-sized
reshape-view segments with three batch einsums; tools/exp_pallas_gemm.py
measured Mosaic's plain GEMM at ~1.28x XLA's batch-einsum rate on the
exact conv shape (19.9 vs 15.6 Tflop/s logical, f32-HIGHEST), so this
kernel does the SAME segment accumulation inside VMEM:

  out[c, b, k] = sum_e win[b + e, :w_e] . T[e*hop : e*hop + w_e, k]

with the window rows delivered by TWO blocked views of the same padded
[C, n_chunks, hop] array (main tile + overlap tail — the dfft5 trick,
ops/pallas_dfft5.py), the operator resident in VMEM (constant block
index -> fetched once), and the whole [BT, L_f] x [L_f, K] contraction
issued as per-segment jnp.dot calls so no frame tensor is ever
materialized anywhere.

Opt-in via R8BT_FRAMED_PALLAS=1 (round-4 scouting; see NEXT.md round-5
#1 for the measured motivation).  Falls back for geometries the block
specs can't express.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

try:  # pragma: no cover - exercised via interpret mode in CI
    from jax.experimental import pallas as pl

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

__all__ = ["HAVE_PALLAS", "framed_matmul_pallas", "supported"]

#: VMEM budget (bytes) for resident operands + window tile + output
_VMEM_CAP = 100 * 2**20 // 8  # conservative ~12.5 MB


def supported(L_f: int, hop: int, Kcols: int, n_blocks: int) -> bool:
    """Geometry gate: lane-aligned chunks and a VMEM-fitting tile."""
    if not HAVE_PALLAS or hop % 128 != 0:
        return False
    n_seg = -(-L_f // hop)
    bt = min(n_blocks, max(8, 4096 // max(1, hop // 128)))
    vmem = 4 * ((bt + 8) * hop + L_f * Kcols + bt * Kcols)
    return vmem <= _VMEM_CAP


def _kernel(n_seg, hop, L_f, bt, xm_ref, xt_ref, t_ref, o_ref):
    # tail view is an 8-row block (Mosaic sublane alignment); only the
    # first n_seg rows are window continuation
    win = jnp.concatenate([xm_ref[0], xt_ref[0][:n_seg]])
    acc = None
    for e in range(n_seg):
        w = min(hop, L_f - e * hop)
        seg = win[e : bt + e, :w]
        te = t_ref[e * hop : e * hop + w, :]
        o = jnp.dot(seg, te, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        acc = o if acc is None else acc + o
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("n_blocks", "hop", "bt",
                                             "interpret"))
def _call(xc, T, n_blocks, hop, bt, interpret):
    C = xc.shape[0]
    L_f = T.shape[0]
    Kcols = T.shape[1]
    n_seg = -(-L_f // hop)
    n_tiles = n_blocks // bt
    kern = functools.partial(_kernel, n_seg, hop, L_f, bt)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, n_blocks, Kcols), jnp.float32),
        grid=(C, n_tiles),
        in_specs=[
            pl.BlockSpec((1, bt, hop), lambda c, t: (c, t, 0)),
            # overlap tail: the NEXT chunks after the main tile, as an
            # 8-row block (sublane-aligned).  Element offset (t+1)*bt is
            # a multiple of 8 by the bt choice in framed_matmul_pallas.
            pl.BlockSpec((1, 8, hop),
                         lambda c, t: (c, (t + 1) * (bt // 8), 0)),
            pl.BlockSpec((L_f, Kcols), lambda c, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, Kcols), lambda c, t: (c, t, 0)),
        interpret=interpret,
    )(xc, xc, T)
    return out


def framed_matmul_pallas(xp: jnp.ndarray, T: jnp.ndarray, n_blocks: int,
                         hop: int, interpret: bool = False):
    """out[c, b, k] = sum_l xp[c, b*hop + l] * T[l, k] — drop-in for the
    plain-precision path of ops/stages._framed_matmul.  Returns None
    when the geometry gate rejects (caller falls back to XLA)."""
    C = xp.shape[0]
    L_f = int(T.shape[0])
    Kcols = int(T.shape[1])
    if not supported(L_f, hop, Kcols, n_blocks):
        return None
    n_seg = -(-L_f // hop)
    if n_seg > 8:
        return None  # tail view carries at most one 8-row block
    # tile size: multiple of 8 (tail-view offset granularity + sublane
    # alignment), chosen to MINIMIZE the padded block count — bt as the
    # round-up of an even tile split, so nb_pad overshoots n_blocks by
    # at most 7 rows per tile (a first cut of bt=cap doubled the dot
    # work via nb_pad = 2*n_blocks and measured 2x slower end-to-end)
    cap = max(8, (4096 // max(1, hop // 128)) // 8 * 8)
    n_tiles = -(-n_blocks // cap)
    bt = -(-(-(-n_blocks // n_tiles)) // 8) * 8
    nb_pad = n_tiles * bt
    total = (nb_pad + 8) * hop
    if xp.shape[1] < total:
        xp = jnp.pad(xp, ((0, 0), (0, total - xp.shape[1])))
    else:
        xp = xp[:, :total]
    xc = xp.reshape(C, nb_pad + 8, hop)
    out = _call(xc, T.astype(jnp.float32), nb_pad, hop, bt, interpret)
    return out[:, :n_blocks]
