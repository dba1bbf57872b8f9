"""Fused half-band upsampler cascade: a run of m >= 2 consecutive 2X
half-band stages as ONE polyphase framed matmul.

Motivation (measured, NEXT.md round-3): the PCM->DSD64 chain
(44100 -> 2822400 = steep 2X convolver + five HBUpExec stages,
CDSPResampler.h:174-216) is HBM-bound — every x2 stage materializes its
full intermediate stream plus framing fusions, layout copies (~330 GB/s)
and pad/reshape passes, and each successive stage doubles the data.  The
cascade is LTI, so it composes exactly: with each stage written as

    x_k[j] = conv(G_k, up2(x_{k-1}))[j + s_k],
    s_k = (2*nt_k - 1) + out_latency_k

(G_k = the half-band kernel of length 4*nt_k - 1: center tap 1 at index
2*nt_k - 1, taps flt[i] at even indices 2*nt_k - 2 - 2*i and
2*nt_k + 2*i — the same symmetric stencil the reference's genhbc kernels
exploit, CDSPHBUpsampler.inc:5-7), induction gives the whole run as

    x_m[j] = conv(Gc, upU(x_0))[j + S],   U = 2^m,
    Gc_{t+1} = conv(G_{t+1}, up2(Gc_t)),  S_{t+1} = s_{t+1} + 2*S_t.

Polyphase form: output phase p in [0, U) reads the INPUT grid only,

    x_m[U*n + p] = sum_j h_p[j] * x_0[n + c_p - j],
    e = p + S,  c_p = e // U,  h_p[j] = Gc[U*j + (e % U)],

so one framed matmul against a [L_f, U*B] operator writes the final
U-times-rate stream directly — no intermediate stream, one output pass.

Left-edge truncation: each inner stage zero-pads its TRIMMED input
stream (x_k[j < 0] := 0, the explicit left pad in HBUpExec.apply),
while the LTI composite sees the virtual pre-trim values there, so the
first few outputs differ.  The affected range E is bounded by
propagating each stage's edge width 2*nt-2 through the remaining
upsamplers (a <- 2a + 2*nt - 1); the fix is a host-built [P, E] f64
correction matrix C (cascade minus composite on unit impulses — both
functionals are linear, and outputs < E depend only on the first P
inputs), added to the first E outputs as one tiny matmul.  Outputs
>= E are EXACT vs the per-stage cascade in exact arithmetic, and the
corrected edge makes the whole stream exact (pinned to ~1e-13 in f64
by tests/test_hb_cascade.py); in f32 the composite is a different
(shorter) rounding chain than m sequential stages, held to the same
oracle bound by the chip-accuracy tests.

MAC cost: L_f ~ B + composite-band per output sample (vs nt per output
in a lone stage) — pure MXU food, ~25x less HBM traffic than the
cascade for m = 5.  Applies to f32 matmul engines; f64 keeps the
reference-form per-stage stencils.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..models.lengths import stage_in_for_out, stage_out_len
from ..models.plan import HBUpStage
from .stages import _framed_matmul

__all__ = ["HBUpCascadeExec", "hb_up_run_fusable"]


def hb_up_run_fusable(stages, i, dtype, engine) -> int:
    """Length of the fusable HBUpStage run starting at stages[i] (0 if < 2).

    f32 matmul engines only — f64 keeps the bit-exact per-stage stencil
    chain (the oracle form), mirroring _poly_pair_fusable's gating.
    """
    if jnp.dtype(dtype) != jnp.float32:
        return 0
    if engine not in ("auto", "toeplitz", "matmul"):
        return 0
    n = 0
    while i + n < len(stages) and isinstance(stages[i + n], HBUpStage):
        n += 1
    return n if n >= 2 else 0


def _hb_full_kernel(spec: HBUpStage) -> np.ndarray:
    """Half-band stage as a full FIR over the zero-stuffed grid (f64)."""
    nt = spec.hb.num_taps
    t = np.asarray(spec.hb.taps, dtype=np.float64)
    g = np.zeros(4 * nt - 1, dtype=np.float64)
    g[2 * nt - 1] = 1.0
    for i in range(nt):
        g[2 * nt - 2 - 2 * i] = t[i]
        g[2 * nt + 2 * i] = t[i]
    return g


def _up2(g: np.ndarray) -> np.ndarray:
    u = np.zeros(2 * g.shape[0] - 1, dtype=np.float64)
    u[::2] = g
    return u


def compose_run(specs) -> tuple[np.ndarray, int, int]:
    """(Gc, S, U) for the run: x_m[j] = conv(Gc, upU(x0))[j + S]."""
    Gc = None
    S = 0
    U = 1
    for sp in specs:
        g = _hb_full_kernel(sp)
        s_k = (2 * sp.hb.num_taps - 1) + sp.out_latency
        if Gc is None:
            Gc, S = g, s_k
        else:
            Gc = np.convolve(g, _up2(Gc))
            S = s_k + 2 * S
        U *= 2
    return Gc, S, U


def _cascade_ref(x: np.ndarray, specs) -> np.ndarray:
    """Per-stage cascade on a 1-D f64 signal, exact HBUpExec semantics:
    y[2n] = x[n]; y[2n+1] = sum_i flt[i]*(x[n+1+i] + x[n-i]) with x
    zero-extended on the LEFT only; then trim [lat : lat+M]."""
    for sp in specs:
        nt = sp.hb.num_taps
        t = np.asarray(sp.hb.taps, dtype=np.float64)
        N = x.shape[0]
        npair = N - nt
        M = max(0, 2 * npair - sp.out_latency)
        if M <= 0:
            return np.zeros(0, dtype=np.float64)
        xp = np.pad(x, (nt, nt))  # right pad only eases slicing; reads
        odd = np.zeros(npair)     # beyond N never occur for n < npair
        for i in range(nt):
            odd += t[i] * (xp[nt + 1 + i : nt + 1 + i + npair]
                           + xp[nt - i : nt - i + npair])
        y = np.empty(2 * npair)
        y[0::2] = x[:npair]
        y[1::2] = odd
        x = y[sp.out_latency : sp.out_latency + M]
    return x


class HBUpCascadeExec:
    """One polyphase matmul for a run of >= 2 consecutive HBUpStages."""

    engine = "matmul"

    def __init__(self, specs, dtype=jnp.float32, block: int | None = None):
        assert len(specs) >= 2 and all(isinstance(s, HBUpStage)
                                       for s in specs)
        self.specs = tuple(specs)
        self.dtype = jnp.dtype(dtype)
        if block is None:
            block = int(os.environ.get("R8BT_HBCASC_B", "128"))
        B = self.B = max(8, block)

        Gc, S, U = compose_run(specs)
        self.U = U

        # per-phase filters over the input grid, zero-trimmed
        phases = []  # (c_p_adjusted, taps)
        for p in range(U):
            e = p + S
            c_p, r = divmod(e, U)
            h = Gc[r::U]
            nz = np.nonzero(h)[0]
            assert nz.size, "half-band composite phase cannot be empty"
            j0, j1 = int(nz[0]), int(nz[-1])
            phases.append((c_p - j0, h[j0 : j1 + 1]))
        # read offsets of phase p: d = c'_p - j', j' in [0, len(h))
        minr = min(c - (len(h) - 1) for c, h in phases)
        maxr = max(c for c, h in phases)
        self.minr = minr
        L_f = self.L_f = B + (maxr - minr)

        T = np.zeros((L_f, U * B), dtype=np.float64)
        for p, (c, h) in enumerate(phases):
            for j, v in enumerate(h):
                row0 = c - j - minr  # row for j_blk = 0
                T[row0 : row0 + B, p :: U][np.arange(B), np.arange(B)] = v
        self.T = T.astype(self.dtype)

        # left-edge truncation correction (module docstring): outputs
        # j < E of the per-stage cascade differ from the LTI composite
        # because inner stages zero their trimmed streams at j < 0.
        # Propagate each inner stage's edge width through the rest:
        m = len(specs)
        a_max = 0
        for t in range(1, m):
            a = 2 * specs[t].hb.num_taps - 2
            for s in range(t + 1, m):
                a = 2 * a + 2 * specs[s].hb.num_taps - 1
            a_max = max(a_max, a)
        E = a_max  # affected output indices are < E (conservative)
        # input prefix that fully determines outputs < E in BOTH forms
        P = 0
        if E > 0:
            P = E
            for sp in reversed(specs):
                P = stage_in_for_out(sp, P)
            P = max(P, (E - 1) // U + maxr + 1)
        self.E, self.P = E, P
        if E > 0:
            D = np.zeros((P, E), dtype=np.float64)   # cascade responses
            Cm = np.zeros((P, E), dtype=np.float64)  # cascade - composite
            LG = Gc.shape[0]
            for i in range(P):
                imp = np.zeros(P)
                imp[i] = 1.0
                casc = _cascade_ref(imp, specs)
                assert casc.shape[0] >= E  # P = chain_in_for_out(E)
                D[i] = casc[:E]
                # composite response to the impulse: Gc shifted by U*i
                lo = S - U * i  # comp[j] = Gc[j + lo]
                j0, j1 = max(0, -lo), min(E, LG - lo)
                Cm[i] = D[i]
                if j1 > j0:
                    Cm[i, j0:j1] -= Gc[lo + j0 : lo + j1]
            self.C = Cm.astype(self.dtype)
            self.D = D.astype(self.dtype)
        else:
            self.C = None
            self.D = None

    def out_len(self, n_in: int) -> int:
        n = n_in
        for sp in self.specs:
            n = stage_out_len(sp, n)
        return n

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        C, N = x.shape
        M = self.out_len(N)
        if M <= 0:
            return jnp.zeros((C, 0), dtype=self.dtype)
        x = x.astype(self.dtype)
        B, U, minr = self.B, self.U, self.minr
        if self.D is not None and M <= self.E:
            # tiny input: every output is inside the edge region — the
            # dense cascade-response operator IS the exact functional
            xh = x[:, : self.P]
            if xh.shape[1] < self.P:
                xh = jnp.pad(xh, ((0, 0), (0, self.P - xh.shape[1])))
            return xh @ jnp.asarray(self.D[:, :M])
        # frame b reads xb[b*B + l], l in [0, L_f) with xb[i] = x[i + minr];
        # zero-weight frame cells may fall outside x's support — pad with
        # zeros (exact: every NONZERO composite weight of an emitted output
        # reads inside x by composition of the per-stage interior reads)
        if minr >= 0:
            xb = x[:, minr:] if minr < N else jnp.zeros(
                (C, 0), dtype=self.dtype)
        else:
            xb = jnp.pad(x, ((0, 0), (-minr, 0)))
        n_pos = -(-M // U)          # output block positions n
        n_blocks = -(-n_pos // B)
        y3 = _framed_matmul(xb, jnp.asarray(self.T), n_blocks, B)
        y = y3.reshape(C, n_blocks * U * B)[:, :M]
        if self.C is not None:
            # left-edge truncation correction on the first E outputs
            E = min(self.E, M)
            xh = x[:, : self.P]
            if xh.shape[1] < self.P:
                xh = jnp.pad(xh, ((0, 0), (0, self.P - xh.shape[1])))
            corr = xh @ jnp.asarray(self.C[:, :E])
            y = jnp.concatenate([y[:, :E] + corr, y[:, E:]], axis=1)
        return y
