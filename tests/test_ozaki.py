"""Error-free split-operand (Ozaki-style) MXU guarantee engine.

Checks both the exactness LEMMA the engine's backend-independence rests
on (every f32 accumulation of bf16 slice-pair products on a common
power-of-two grid is exact for K <= 256) and the end-to-end -141 dB
golden class vs the f64 oracle (the same bound the df32-FFT guarantee
engines are held to, bench/README.md:9-11).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r8brain_tpu.models.oracle import OracleResampler
from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.ops.ozaki import (K0, N_PARTS, framed_matmul_ozaki,
                                   split_input, split_operator_host)

from .helpers import lcg_uniform, rms_db


def test_split_operator_bf16_exact_and_reconstructs():
    rng = np.random.default_rng(0)
    K, G = 700, 256
    t = np.arange(K)[:, None] - K / 2
    T = np.sinc((t - rng.standard_normal((1, G)) * 4) / 8) \
        * np.hanning(K)[:, None]          # high-crest sinc-like operator
    parts, scale = split_operator_host(T)
    assert parts.shape == (N_PARTS, K, G)
    # scales are powers of two
    assert np.array_equal(scale, np.exp2(np.round(np.log2(scale))))
    # reconstruction error bounded by the dropped 2^-32 slice (the column
    # scale is folded into the slices)
    rec = np.asarray(parts, dtype=np.float64).sum(axis=0)
    assert np.abs(rec - T).max() <= np.abs(T).max(axis=0).max() * 2.0**-32


def test_split_input_exact_ops():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 500)) * 7.3, jnp.float32)
    parts, s = jax.jit(split_input)(x)
    s = np.asarray(s, dtype=np.float64)
    assert np.array_equal(s, np.exp2(np.round(np.log2(s))))
    rec = np.asarray(parts, dtype=np.float64).sum(axis=0) * s
    err = np.abs(rec - np.asarray(x, dtype=np.float64))
    assert err.max() <= s.max() * 2.0**-32


def test_accumulation_exactness_lemma():
    """A K0-deep f32 dot of bf16 slice-pair products equals the f64 dot
    EXACTLY — the property that makes the engine backend-independent."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, K0)), jnp.float32)
    T = rng.standard_normal((K0, 128))
    xparts, xs = split_input(x)
    Tparts, Ts = split_operator_host(T)
    for p in range(N_PARTS):
        for q in range(N_PARTS):
            if p + q >= 4:
                continue
            a = xparts[p]
            b = jnp.asarray(Tparts[q])
            got = jnp.einsum("ck,kg->cg", a, b,
                             preferred_element_type=jnp.float32)
            ref = np.einsum(
                "ck,kg->cg",
                np.asarray(a, dtype=np.float64),
                np.asarray(b, dtype=np.float64))
            assert np.array_equal(np.asarray(got, dtype=np.float64), ref), \
                f"inexact accumulation at slice pair ({p}, {q})"


def test_framed_matmul_ozaki_accuracy():
    rng = np.random.default_rng(3)
    C, n_blocks, hop = 3, 7, 300
    L_f, G = 900, 256
    xp = jnp.asarray(rng.standard_normal((C, (n_blocks + 3) * hop)) * 2.1,
                     jnp.float32)
    t = np.arange(L_f)[:, None] - L_f / 2
    T = np.sinc((t - rng.standard_normal((1, G)) * 4) / 8) \
        * np.hanning(L_f)[:, None]
    Tparts, _ = split_operator_host(T)
    y = np.asarray(framed_matmul_ozaki(xp, jnp.asarray(Tparts),
                                       n_blocks, hop), dtype=np.float64)
    x64 = np.asarray(xp, dtype=np.float64)
    ref = np.stack([
        np.stack([x64[c, b * hop: b * hop + L_f] @ T
                  for b in range(n_blocks)]) for c in range(C)])
    d = rms_db(y - ref) - rms_db(ref)
    assert d < -150.0, d


def test_pallas_kernel_matches_xla_composition():
    """The VMEM-resident kernel (ops/pallas_ozaki.py) computes the same
    split/dot/compensate pipeline as the XLA composition (interpreter
    mode).  The exact d0 chain agrees bit-for-bit (verified separately
    with N_DIAG=1); with all diagonals the d>=2 `rest` accumulation
    associates differently, so outputs may differ by 1 ulp where the
    final add sits on a rounding boundary — the bound, not bit-parity,
    is the contract."""
    from r8brain_tpu.ops.pallas_ozaki import (HAVE_PALLAS, choose_ct,
                                              ozaki_matmul_pallas)

    if not HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(4)
    C, n_blocks, hop = 8, 3, 256
    L_f, G = 700, 256
    S = -(-L_f // 128) * 128
    N = (n_blocks - 1) * hop + S
    xp = jnp.asarray(rng.standard_normal((C, N)) * 1.7, jnp.float32)
    t = np.arange(L_f)[:, None] - L_f / 2
    T = np.sinc((t - rng.standard_normal((1, G)) * 4) / 8) \
        * np.hanning(L_f)[:, None]
    Tparts, _ = split_operator_host(T)
    from r8brain_tpu.ops.ozaki import channel_scale
    sx = channel_scale(xp)
    CT = choose_ct(C, S, L_f, G)
    assert CT
    y_k = np.asarray(ozaki_matmul_pallas(
        xp, sx, jnp.asarray(Tparts), L_f, hop, G, CT, interpret=True),
        dtype=np.float64)
    y_x = np.asarray(framed_matmul_ozaki(xp, jnp.asarray(Tparts),
                                         n_blocks, hop),
                     dtype=np.float64).reshape(C, n_blocks * G)
    d = rms_db(y_k - y_x) - rms_db(y_x)
    assert d < -150.0, d


def test_dense_pallas_kernel_accuracy():
    """ozaki_dense_pallas (pre-framed rows, the frac-stage form) meets
    the engine's accuracy class vs f64 (interpreter mode)."""
    from r8brain_tpu.ops.ozaki import channel_scale
    from r8brain_tpu.ops.pallas_ozaki import (HAVE_PALLAS,
                                              ozaki_dense_pallas)

    if not HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(5)
    R, D, G = 512, 300, 256
    Kpad = -(-D // 128) * 128
    fr = rng.standard_normal((R, D)) * 1.3
    t = np.arange(D)[:, None] - D / 2
    T = np.sinc((t - rng.standard_normal((1, G)) * 3) / 6) \
        * np.hanning(D)[:, None]
    Tparts, _ = split_operator_host(T)
    pp = np.zeros((Tparts.shape[0], Kpad, G), dtype=Tparts.dtype)
    pp[:, :D, :] = Tparts
    frp = jnp.asarray(np.pad(fr, ((0, 0), (0, Kpad - D))), jnp.float32)
    sx = channel_scale(frp)
    y = np.asarray(ozaki_dense_pallas(frp, sx, jnp.asarray(pp), D, G,
                                      RT=256, interpret=True),
                   dtype=np.float64)
    ref = np.asarray(frp, dtype=np.float64)[:, :D] @ T
    d = rms_db(y - ref) - rms_db(ref)
    assert d < -150.0, d


OZ_CONFIGS = [
    ("up_44k_96k", 44100, 96000, 180.15),
    ("up_44k_48k", 44100, 48000, 180.15),
    ("down_96k_44k", 96000, 44100, 180.15),
    ("preset_def", 44100, 96000, 206.91),
]


@pytest.mark.parametrize("cfg", OZ_CONFIGS, ids=[c[0] for c in OZ_CONFIGS])
def test_ozaki_chain_meets_golden_class(cfg):
    """conv_engine=frac_engine="ozaki" under precision="high" must meet
    the -141 dB golden class vs the f64 oracle on ANY backend (VERDICT r3
    next #3; role matched: /root/reference/fft/pffft_double.c)."""
    label, src, dst, atten = cfg
    n = 12000
    x = lcg_uniform(101, n).astype(np.float32)
    orc = OracleResampler(src, dst, 4096, 2.0, atten, 0)
    out_len = int(np.floor(n * dst / src))
    ref = orc.oneshot(x.astype(np.float64), out_len)
    rs = Resampler(src, dst, 2.0, atten, 0, dtype="float32",
                   plan=orc.plan, precision="high", fused=False,
                   conv_engine="ozaki", frac_engine="ozaki")
    y = np.asarray(rs.oneshot(x, out_len), dtype=np.float64)
    d = rms_db(y - ref) - rms_db(ref)
    assert d < -141.0, f"{label}: {d:.1f} dB"


def test_pallas_df_kernels_match_pair_class():
    """The df32-carry kernel variants (_ozaki_matmul_pallas_var,
    ozaki_dense_pallas_pair) compute the XLA pair path's result to the
    engine class (like the plain kernels, the d>=2 `rest` and cheap
    accumulations associate differently — bound, not bit-parity), and
    the collapsed pair meets the class vs the exact f64 product
    including the x_lo contribution."""
    from r8brain_tpu.ops.ozaki import channel_scale
    from r8brain_tpu.ops.pallas_ozaki import (HAVE_PALLAS,
                                              _ozaki_matmul_pallas_var,
                                              ozaki_dense_pallas_pair)

    if not HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(6)
    C, n_blocks, hop = 8, 3, 256
    L_f, G = 700, 256
    S = -(-L_f // 128) * 128
    N = (n_blocks - 1) * hop + S
    xp = jnp.asarray(rng.standard_normal((C, N)) * 1.7, jnp.float32)
    xl = jnp.asarray(rng.standard_normal((C, N)) * 1e-7, jnp.float32)
    t = np.arange(L_f)[:, None] - L_f / 2
    T = np.sinc((t - rng.standard_normal((1, G)) * 4) / 8) \
        * np.hanning(L_f)[:, None]
    Tparts, _ = split_operator_host(T)
    sx = channel_scale(xp)
    yh, yl = _ozaki_matmul_pallas_var(
        xp, xl.astype(jnp.bfloat16), sx, jnp.asarray(Tparts),
        L_f, hop, G, CT=8, emit_pair=True, interpret=True)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    # exact frames product incl. the residual stream
    v = np.asarray(xp, np.float64) + np.asarray(xl, np.float64)
    fr = np.stack([v[:, b * hop : b * hop + L_f]
                   for b in range(n_blocks)], axis=1)
    ref = (fr @ T).reshape(C, n_blocks * G)
    d = rms_db(y - ref) - rms_db(ref)
    assert d < -150.0, d
    # XLA pair path agrees to the same class
    rh, rl = framed_matmul_ozaki(xp, jnp.asarray(Tparts), n_blocks, hop,
                                 x_lo=xl, pair=True)
    rx = (np.asarray(rh, np.float64)
          + np.asarray(rl, np.float64)).reshape(C, n_blocks * G)
    d2 = rms_db(y - rx) - rms_db(rx)
    assert d2 < -150.0, d2

    # dense form
    R, D = 512, 300
    Kpad = -(-D // 128) * 128
    fr2 = rng.standard_normal((R, D)) * 1.3
    fl2 = rng.standard_normal((R, D)) * 1e-7
    t = np.arange(D)[:, None] - D / 2
    T2 = np.sinc((t - rng.standard_normal((1, G)) * 3) / 6) \
        * np.hanning(D)[:, None]
    Tp2, _ = split_operator_host(T2)
    pp = np.zeros((Tp2.shape[0], Kpad, G), dtype=Tp2.dtype)
    pp[:, :D, :] = Tp2
    frp = jnp.asarray(np.pad(fr2, ((0, 0), (0, Kpad - D))), jnp.float32)
    flp = jnp.asarray(np.pad(fl2, ((0, 0), (0, Kpad - D))), jnp.float32)
    sx2 = channel_scale(frp)
    from r8brain_tpu.ops.ozaki import framed_cheap
    dh, dl = ozaki_dense_pallas_pair(frp, sx2, jnp.asarray(pp), D, G,
                                     RT=256, interpret=True)
    # the caller folds the residual in via the cheap pass: emulate with
    # the exact residual product (the cheap pass itself is pinned by
    # the chain-level test below)
    # kernel pair (main-stream product) + the exact residual product
    # the caller's cheap pass contributes
    y2 = (np.asarray(dh, np.float64) + np.asarray(dl, np.float64)
          + np.asarray(flp, np.float64)[:, :D] @ T2)
    v2 = (np.asarray(frp, np.float64)[:, :D]
          + np.asarray(flp, np.float64)[:, :D])
    ref2 = v2 @ T2
    d3 = rms_db(y2 - ref2) - rms_db(ref2)
    assert d3 < -150.0, d3


def test_df_carry_chain_class():
    """The guarantee chain with the round-5 df32 inter-stage carry +
    ozaki-product poly operator holds a -150 dB class vs the f64 oracle
    (was -142.4 dB worst pre-carry, dominated by per-seam f32 store
    roundings); with the carry disabled it must still hold the -141
    class it held before."""
    import os

    from r8brain_tpu.models.oracle import OracleResampler
    from r8brain_tpu.models.resampler import Resampler

    for (src, dst, atten) in [(44100.0, 96001.0, 180.15),
                              (431181.83, 44100.0, 139.53)]:
        n = 4000
        x32 = lcg_uniform(17, n).astype(np.float32)
        out_len = int(np.floor(n * dst / src))
        orc = OracleResampler(src, dst, 4096, 2.0, atten, 0).oneshot(
            x32.astype(np.float64), out_len)
        old = os.environ.get("R8BT_DF_CARRY")
        try:
            for carry, bound in (("1", -150.0), ("0", -141.0)):
                os.environ["R8BT_DF_CARRY"] = carry
                rs = Resampler(src, dst, 2.0, atten, 0, dtype="float32",
                               precision="high", fused=False,
                               conv_engine="ozaki", frac_engine="ozaki")
                assert rs.df_carry == (carry == "1")
                y = np.asarray(rs.oneshot(x32, out_len), np.float64)
                d = rms_db(y - orc) - rms_db(orc)
                assert d < bound, (src, dst, carry, d)
        finally:
            if old is None:
                os.environ.pop("R8BT_DF_CARRY", None)
            else:
                os.environ["R8BT_DF_CARRY"] = old


@pytest.mark.slow
def test_poly_oz_products_above_host_literal_cap():
    """Round-5 review finding: above the host_R literal cap (Mp*W >
    16e6 — only ~0.6 s of poly output per call) the guarantee products
    used to silently fall back to the uncorrected f32 operator
    (-140.8 dB measured).  The fix one-hot places bf16 flt SLICES on
    device, so the error-free contraction holds to the flt cap
    (~10 s per call); pin the class above the host_R cap, both
    collapsed and as a pair."""
    import jax

    from r8brain_tpu.models.plan import make_plan
    from r8brain_tpu.ops.stages import FracPolyExec

    plan = make_plan(44100, 96001, 2.0, 180.15, 0)
    fr = [s for s in plan.stages if s.kind == "frac"
          and not s.is_whole][0]
    n = 130000
    x32 = lcg_uniform(5, n).astype(np.float32)
    ref = np.asarray(FracPolyExec(fr, jnp.float64, engine="gather")
                     .apply(jnp.asarray(x32.astype(np.float64))[None]),
                     np.float64)
    M = ref.shape[1]
    ex = FracPolyExec(fr, jnp.float32, engine="banded",
                      precision="high", oz_products=True)
    assert M * ex.W > 16_000_000, "config no longer crosses the cap"
    assert M * ex.fl <= 16_000_000
    yo = np.asarray(ex.apply(jnp.asarray(x32)[None]), np.float64)
    d = rms_db(yo - ref) - rms_db(ref)
    assert d < -150.0, d
    h, l, m = ex.apply_df(jnp.asarray(x32)[None], None)
    yp = (np.asarray(h, np.float64)
          + np.asarray(l, np.float64))[:, :m]
    d2 = rms_db(yp - ref[:, :m]) - rms_db(ref[:, :m])
    assert d2 < -150.0, d2
    # plain high keeps its documented class (the residual pass now
    # engages above the host_R cap too; was -140.8 without it)
    exh = FracPolyExec(fr, jnp.float32, engine="banded",
                       precision="high")
    yh = np.asarray(exh.apply(jnp.asarray(x32)[None]), np.float64)
    d3 = rms_db(yh - ref) - rms_db(ref)
    assert d3 < -139.0, d3
