"""VMEM framed matmul: the toeplitz convolver's segmented contraction
as one Pallas kernel, with channels FOLDED into the dot's M dimension.

The XLA form (ops/stages._framed_matmul) contracts hop-sized
reshape-view segments with three batch einsums; tools/exp_pallas_gemm.py
measured Mosaic's plain GEMM at ~1.28x XLA's batch-einsum rate on the
exact conv shape (19.9 vs 15.6 Tflop/s logical, f32-HIGHEST) — but the
scout's winning dot had M=512 contiguous rows, while a per-channel
kernel only gets M = n_blocks (~176) rows per tile.  This kernel
therefore folds `cpb` channels into each grid block so the dot runs at
M = cpb * bt ≈ 512+ rows:

  out[c, b, k] = sum_e win[c, b + e, :w_e] . T[e*hop : e*hop + w_e, k]

with the window rows delivered by TWO blocked views of the same padded
[C, n_chunks, hop] array (main tile + 8-row overlap tail — the dfft5
trick), the operator resident in VMEM (constant block index -> fetched
once), and the contraction issued either as per-segment dots over the
merged (channel, block) rows (mode="seg") or as ONE K = n_seg*hop dot
against a zero-row-padded operator after an in-VMEM im2col assembly
(mode="im2col") — no frame tensor ever exists in HBM either way.

Knobs (read per call; see docs/API.md):
  R8BT_FRAMED_PALLAS=1   opt-in gate (checked by ops/stages.py)
  R8BT_FRAMED_MODE       "seg" (default) | "im2col"
  R8BT_FRAMED_CPB        channels per grid block (default: auto toward
                         M ~ R8BT_FRAMED_MT rows)
  R8BT_FRAMED_MT         target M rows per dot (default 512)

Replaces the reference's scalar conv hot loops
(/root/reference/CDSPBlockConvolver.h:252-354,
/root/reference/CDSPFracInterpolator.h:1069-1179) on their MXU form.
"""

from __future__ import annotations

import functools
import os

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


def _geometry(C: int, L_f: int, hop: int, Kcols: int, n_blocks: int):
    """Pick (cpb, bt, n_tiles) or None when the gate rejects.

    bt is a multiple of 8 (tail-view offset granularity + sublane
    alignment); cpb * bt aims at the target M (the scout's winning dot
    shape).  When one channel's blocks fall short of the target, fold
    whole channels (n_tiles = 1); when they exceed it, tile within the
    channel exactly as the round-4 kernel did (cpb = 1)."""
    if not HAVE_PALLAS or hop % 128 != 0:
        return None
    n_seg = -(-L_f // hop)
    if n_seg > 8:
        return None  # tail view carries at most one 8-row block
    try:
        target = int(os.environ.get("R8BT_FRAMED_MT", "512") or 512)
    except ValueError:
        target = 512
    target = max(8, target)
    nb8 = -(-n_blocks // 8) * 8
    env_cpb = os.environ.get("R8BT_FRAMED_CPB")
    if env_cpb:
        cpb = max(1, int(env_cpb))
    elif nb8 >= target:
        cpb = 1
    else:
        cpb = max(1, min(C, round(target / nb8)))
    if cpb > 1:
        n_tiles = 1
        bt = nb8
    else:
        cap = max(8, (target // 8) * 8)
        n_tiles = -(-n_blocks // cap)
        bt = -(-(-(-n_blocks // n_tiles)) // 8) * 8
    mode = os.environ.get("R8BT_FRAMED_MODE", "seg") or "seg"
    S = n_seg * hop
    vmem = 4 * (cpb * (bt + 8) * hop + S * Kcols + cpb * bt * Kcols)
    if mode == "im2col":
        vmem += 4 * cpb * bt * S  # the in-VMEM frame tensor
    if vmem > _VMEM_CAP:
        if cpb > 1:  # retry at the round-4 per-channel shape
            cap = max(8, (target // 8) * 8)
            n_tiles = -(-n_blocks // cap)
            bt = -(-(-(-n_blocks // n_tiles)) // 8) * 8
            cpb = 1
            vmem = 4 * ((bt + 8) * hop + S * Kcols + bt * Kcols)
            if mode == "im2col":
                vmem += 4 * bt * S
            if vmem > _VMEM_CAP:
                return None
        else:
            return None
    return cpb, bt, n_tiles, mode


def supported(L_f: int, hop: int, Kcols: int, n_blocks: int,
              C: int = 1) -> bool:
    """Geometry gate: lane-aligned chunks and a VMEM-fitting tile."""
    return _geometry(C, L_f, hop, Kcols, n_blocks) is not None


def _kernel(n_seg, hop, L_f, bt, cpb, mode, xm_ref, xt_ref, t_ref, o_ref):
    # tail view is an 8-row block (Mosaic sublane alignment); only the
    # first n_seg rows are window continuation
    win = jnp.concatenate([xm_ref[...], xt_ref[:, :n_seg, :]], axis=1)
    Kcols = o_ref.shape[-1]
    if mode == "im2col":
        # assemble the overlapping frames IN VMEM (overlap duplication
        # never touches HBM) and contract in ONE deep-K dot against the
        # zero-row-padded operator
        wcat = jnp.concatenate([win[:, e : bt + e, :]
                                for e in range(n_seg)], axis=2)
        fr = wcat.reshape(cpb * bt, n_seg * hop)
        acc = jnp.dot(fr, t_ref[...],
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    else:
        acc = None
        for e in range(n_seg):
            w = min(hop, L_f - e * hop)
            seg = win[:, e : bt + e, :w].reshape(cpb * bt, w)
            te = t_ref[e * hop : e * hop + w, :]
            o = jnp.dot(seg, te, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
    o_ref[...] = acc.reshape(cpb, bt, Kcols)


@functools.partial(jax.jit, static_argnames=("n_blocks", "hop", "bt",
                                             "cpb", "mode", "interpret"))
def _call(xc, T, n_blocks, hop, bt, cpb, mode, interpret):
    C = xc.shape[0]
    L_f_log = T.shape[0]
    Kcols = T.shape[1]
    n_seg = -(-L_f_log // hop)
    n_tiles = n_blocks // bt
    if mode == "im2col":
        S = n_seg * hop
        T = jnp.pad(T, ((0, S - L_f_log), (0, 0)))
    kern = functools.partial(_kernel, n_seg, hop, L_f_log, bt, cpb, mode)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, n_blocks, Kcols), jnp.float32),
        grid=(C // cpb, n_tiles),
        in_specs=[
            pl.BlockSpec((cpb, bt, hop), lambda c, t: (c, t, 0)),
            # overlap tail: the NEXT chunks after the main tile, as an
            # 8-row block (sublane-aligned).  Element offset (t+1)*bt is
            # a multiple of 8 by the bt choice in _geometry.
            pl.BlockSpec((cpb, 8, hop),
                         lambda c, t: (c, (t + 1) * (bt // 8), 0)),
            pl.BlockSpec(T.shape, lambda c, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((cpb, bt, Kcols), lambda c, t: (c, t, 0)),
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
    geo = _geometry(C, L_f, hop, Kcols, n_blocks)
    if geo is None:
        return None
    cpb, bt, n_tiles, mode = geo
    nb_pad = n_tiles * bt
    total = (nb_pad + 8) * hop
    if xp.shape[1] < total:
        xp = jnp.pad(xp, ((0, 0), (0, total - xp.shape[1])))
    else:
        xp = xp[:, :total]
    C_pad = -(-C // cpb) * cpb
    if C_pad != C:
        xp = jnp.pad(xp, ((0, C_pad - C), (0, 0)))
    xc = xp.reshape(C_pad, nb_pad + 8, hop)
    out = _call(xc, T.astype(jnp.float32), nb_pad, hop, bt, cpb, mode,
                interpret)
    return out[:C, :n_blocks]
