"""Valid-prefix seam protocol (ops/stages.py apply_v) bit-exactness.

The jitted chain hands RAW (unsliced) framing buffers between stages
(models/resampler.py _chain); the claim is not "close" but BIT-IDENTICAL
to the sliced per-stage chain: a banded operator's nonzero rows for
every kept output read only the valid prefix, so surplus columns feed
only outputs the next seam discards.  Pinned here over every plan shape
the protocol touches (conv->poly->conv, conv->frac, HB cascades,
downsampling) and both the default and the env-gated variants.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from r8brain_tpu.models.resampler import Resampler

from .helpers import lcg_uniform

PLANS = [
    ("poly_96001", 44100, 96001, 180.15),
    ("flagship", 44100, 96000, 180.15),
    ("down_96k", 96000, 44100, 180.15),
    ("up_48k", 44100, 48000, 140.0),
    ("x8_down_hb", 352800, 44100, 136.1),
    ("poly_108001", 44100, 108001, 160.0),
]


def _run_pair(src, dst, atten, env=None):
    old = {}
    env = env or {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        rs = Resampler(src, dst, 2.0, atten, 0, dtype="float32",
                       fused=False)
        n = 6000
        x = jnp.asarray(lcg_uniform(3, n).astype(np.float32))[None, :]
        out_len = int(np.floor(n * dst / src))
        T = max(n, rs.in_len_for_out(out_len))
        xp = jnp.pad(x, ((0, 0), (0, T - n)))
        y_seam = np.asarray(rs._chain(xp))[:, :out_len]
        z = xp
        for e in rs.execs:
            z = e.apply(z)
        y_plain = np.asarray(z)[:, :out_len]
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return y_seam, y_plain


@pytest.mark.parametrize("cfg", PLANS, ids=[c[0] for c in PLANS])
def test_seam_chain_bit_identical(cfg):
    _label, src, dst, atten = cfg
    y_seam, y_plain = _run_pair(src, dst, atten)
    assert np.array_equal(y_seam, y_plain)


@pytest.mark.parametrize("env", [
    {"R8BT_SEAM_MINOUT": "1"},
    {"R8BT_POLY_WIDE": "1"},
    {"R8BT_SEAM_MINOUT": "1", "R8BT_POLY_WIDE": "1"},
    {"R8BT_TOEP_COLTILE": "256"},
    {"R8BT_FRAMED_IM2COL": "1"},
    {"R8BT_TOEP_COLTILE": "256", "R8BT_SEAM_MINOUT": "1"},
], ids=["minout", "wide", "minout_wide", "coltile", "im2col",
        "coltile_minout"])
def test_seam_env_variants_bit_identical(env):
    """The env-gated (measured-null, kept for future hardware) variants
    must stay bit-exact too: overproduced blocks/groups, widened bands,
    column tiles and frame materialization only change HOW the same
    engine computes — seam vs sliced runs the identical program."""
    y_seam, y_plain = _run_pair(44100, 96001, 180.15, env)
    assert np.array_equal(y_seam, y_plain)


@pytest.mark.parametrize("env", [
    {"R8BT_TOEP_COLTILE": "256"},
    {"R8BT_FRAMED_IM2COL": "1"},
], ids=["coltile", "im2col"])
def test_seam_env_variants_class_bounded_vs_default(env):
    """Column tiling / im2col reassociate the f32 contraction, so their
    output is NOT bit-equal to the default segmented path — pin the
    deviation at the engine's own rounding class instead (the docs/API.md
    'bit-exact or class-bounded' claim for these knobs)."""
    y_def, _ = _run_pair(44100, 96001, 180.15, {})
    y_var, _ = _run_pair(44100, 96001, 180.15, env)
    err = np.abs(y_var.astype(np.float64) - y_def.astype(np.float64))
    ref = max(1e-12, float(np.abs(y_def).max()))
    db = 20 * np.log10(err.max() / ref) if err.max() else -400.0
    assert db <= -120.0, (env, db)


def test_framed_matmul_matches_f64_oracle():
    """_framed_matmul (the toeplitz stages' segmented reshape-view
    contraction) pinned against the exact f64 frames product.  (The
    opt-in VMEM Pallas twin of this contraction was deleted in round 5:
    on the formulation the chain actually runs, XLA's segmented einsum
    measures 24.5 Tflop/s vs Mosaic's best 19.3 on the exact conv shape
    — tools/exp_framed_kernel.py, NEXT.md round-5 autopsy.)"""
    from r8brain_tpu.ops.stages import _framed_matmul

    rng = np.random.default_rng(0)
    for (C, nb, hop, L_f, K) in [(3, 7, 128, 300, 256),
                                 (2, 5, 256, 704, 512),
                                 (7, 12, 384, 900, 256),
                                 (4, 171, 256, 704, 512)]:
        xp = jnp.asarray(rng.standard_normal((C, (nb + 16) * hop)),
                         dtype=jnp.float32)
        T = jnp.asarray(rng.standard_normal((L_f, K)), dtype=jnp.float32)
        got = np.asarray(_framed_matmul(xp, T, nb, hop))
        xf = np.asarray(xp, dtype=np.float64)
        fr = np.stack([xf[:, b * hop : b * hop + L_f]
                       for b in range(nb)], axis=1)
        oracle = fr @ np.asarray(T, dtype=np.float64)
        # f32 contraction of K<=900 ~N(0,1) products: |err| bounded by
        # ~K*eps*sqrt(K) of the ~sqrt(K) result magnitude
        tol = 64 * np.finfo(np.float32).eps * np.sqrt(L_f)
        assert got.shape == oracle.shape, (C, nb, hop, L_f, K)
        assert np.abs(got - oracle).max() <= tol, (C, nb, hop, L_f, K)


def test_fracpoly_apply_v_nonzero_in_latency():
    """A poly FracStage with in_latency > 0 must take the SLICED path in
    apply_v: folding the latency into window starts would read real
    samples from the latency prefix where apply()'s left pad reads zeros
    (window starts reach -fll at the stream head).  No generated plan
    currently emits such a stage (0/3000 advisor sweep), so pin it on a
    synthetic latency-shifted spec."""
    import dataclasses

    import jax.numpy as jnp

    from r8brain_tpu.models.plan import make_plan
    from r8brain_tpu.ops.stages import FracPolyExec

    plan = make_plan(44100, 96001, 2.0, 180.15, 0)
    fr = [s for s in plan.stages if s.kind == "frac" and not s.is_whole]
    assert fr, "expected a poly stage in the 44100->96001 plan"
    spec = dataclasses.replace(fr[0], in_latency=3)
    ex = FracPolyExec(spec, jnp.float32, engine="banded")
    rng = np.random.default_rng(7)
    n = 4000
    x = jnp.asarray(rng.standard_normal((2, n + 64)), jnp.float32)
    y_ref = np.asarray(ex.apply(x[:, :n]))
    buf, m = ex.apply_v(x, n)
    assert m == y_ref.shape[1]
    assert np.array_equal(np.asarray(buf)[:, :m], y_ref)
    assert ex.phys_in_need(n) is None


def test_df_carry_raw_vs_sliced_class():
    """The df32-carry chain threads RAW (hi, lo) buffers between stages
    (valid-prefix argument as apply_v).  Unlike the f32 seam protocol
    this is NOT bit-identical to sliced threading: the ozaki engines'
    per-channel pow2 scale sees the framing surplus, which may shift
    the split grid by one exponent — harmless to the class (the scale
    only needs >= max|x|) but visible in ulps.  Pin the raw-vs-sliced
    agreement at the guarantee class bound instead."""
    import jax.numpy as jnp

    from r8brain_tpu.models.resampler import Resampler

    for (src, dst, atten) in [(44100, 96001, 180.15),
                              (352800, 44100, 136.1)]:
        rs = Resampler(src, dst, 2.0, atten, 0, dtype="float32",
                       precision="high", fused=False,
                       conv_engine="ozaki", frac_engine="ozaki")
        assert rs.df_carry
        n = 5000
        x = jnp.asarray(lcg_uniform(3, n).astype(np.float32))[None, :]
        out_len = int(np.floor(n * dst / src))
        T = max(n, rs.in_len_for_out(out_len))
        xp = jnp.pad(x, ((0, 0), (0, T - n)))
        y_raw = np.asarray(rs._chain(xp), np.float64)[:, :out_len]
        # sliced threading: cut both streams to the logical length at
        # every seam (n_valid = buffer length)
        h, l = xp, None
        for i, e in enumerate(rs.execs):
            last = i == len(rs.execs) - 1
            if l is not None and l.shape[1] != h.shape[1]:
                l = l[:, :h.shape[1]]
            h2, l2, m = e.apply_df(h, l, emit_pair=not last)
            h = h2[:, :m]
            l = None if l2 is None else l2[:, :m]
        y_sl = np.asarray(h if l is None else h + l,
                          np.float64)[:, :out_len]
        ref = max(1e-12, float(np.abs(y_sl).max()))
        err = np.abs(y_raw - y_sl).max() / ref
        db = 20 * np.log10(err) if err else -400.0
        assert db <= -150.0, (src, dst, db)
