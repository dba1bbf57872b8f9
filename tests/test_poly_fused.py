"""FusedPolyExec (composite [conv, poly-frac] banded matmul) vs the
two-stage pipeline and the f64 oracle (NEXT r2 item 4: mid-chain poly
fusion — the poly chain's front convolver is its MAC hot spot)."""

import numpy as np
import pytest

import jax.numpy as jnp

from r8brain_tpu.models.oracle import OracleResampler
from r8brain_tpu.models.plan import ConvStage, FracStage, make_plan
from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.ops.poly_fused import FusedPolyExec
from r8brain_tpu.ops.stages import build_exec

from .helpers import lcg_uniform, rms_db

RATIOS = [
    ("poly_96001", 44100, 96001),
    ("poly_sqrt2", 44100, 44100 * np.sqrt(2.0)),
    ("poly_slight", 44100, 44100 * 1.0001),
    ("poly_192k1", 44100, 192001),
]


def _first_pair(plan):
    s = plan.stages
    for i in range(len(s) - 1):
        if (isinstance(s[i], ConvStage) and s[i].down == 1
                and isinstance(s[i + 1], FracStage)
                and not s[i + 1].is_whole):
            return s[i], s[i + 1]
    return None


@pytest.mark.parametrize("label,src,dst", RATIOS, ids=[r[0] for r in RATIOS])
@pytest.mark.parametrize("dtype,tol", [(jnp.float64, -230.0),
                                       (jnp.float32, -110.0)],
                         ids=["f64", "f32"])
def test_fused_poly_matches_two_stage(label, src, dst, dtype, tol):
    plan = make_plan(src, dst, 2.0, 170.0, 0)
    pair = _first_pair(plan)
    if pair is None:
        pytest.skip("plan has no [conv, poly-frac] pair")
    conv, frac = pair
    rng = np.random.default_rng(11)
    x = rng.standard_normal((3, 9000))
    xd = jnp.asarray(x, dtype)
    ce = build_exec(conv, dtype)
    fe = build_exec(frac, dtype)
    y2 = np.asarray(fe.apply(ce.apply(xd)), np.float64)
    yf = np.asarray(FusedPolyExec(conv, frac, dtype).apply(xd), np.float64)
    assert yf.shape == y2.shape
    d = rms_db(yf - y2)
    assert d < tol, f"{label}: {d:.1f} dB"


def test_fused_poly_high_residual():
    """precision='high' residual pass tightens the composite's f32
    kernel-representation error (f64 chain as the yardstick)."""
    plan = make_plan(44100, 96001, 2.0, 180.15, 0)
    conv, frac = _first_pair(plan)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 9000))
    y64 = np.asarray(
        FusedPolyExec(conv, frac, jnp.float64).apply(
            jnp.asarray(x, jnp.float64)), np.float64)
    xd = jnp.asarray(x, jnp.float32)
    d_fast = rms_db(np.asarray(
        FusedPolyExec(conv, frac, jnp.float32, "fast").apply(xd),
        np.float64) - y64)
    d_high = rms_db(np.asarray(
        FusedPolyExec(conv, frac, jnp.float32, "high").apply(xd),
        np.float64) - y64)
    assert d_high < -120.0
    assert d_high <= d_fast + 1.0  # residual never hurts


def test_fused_poly_opt_in_wiring():
    """fused="poly" opts the f32 chain into FusedPolyExec (not yet the
    default: the operator build measured slower than the two-stage
    banded chain on chip); f64 and the default keep the two-stage
    chain."""
    rs = Resampler(44100, 96001, 2.0, 180.15, 0, dtype=jnp.float32,
                   fused="poly")
    assert any(isinstance(e, FusedPolyExec) for e in rs.execs)
    rs_def = Resampler(44100, 96001, 2.0, 180.15, 0, dtype=jnp.float32)
    assert not any(isinstance(e, FusedPolyExec) for e in rs_def.execs)
    rs64 = Resampler(44100, 96001, 2.0, 180.15, 0, dtype=jnp.float64,
                     fused="poly")
    assert not any(isinstance(e, FusedPolyExec) for e in rs64.execs)


@pytest.mark.parametrize("precision", ["fast", "high"])
def test_fused_poly_chain_vs_oracle(precision):
    """Full fused f32 poly chain vs the f64 oracle (oneshot semantics,
    flush included)."""
    src, dst = 44100, 96001
    orc = OracleResampler(src, dst, 4096, 2.0, 180.15, 0)
    n = 14000
    x = lcg_uniform(77, n) * 0.9
    out_len = int(np.floor(n * dst / src))
    ref = orc.oneshot(x, out_len)
    rs = Resampler(src, dst, 2.0, 180.15, 0, dtype=jnp.float32,
                   precision=precision, fused="poly")
    assert any(isinstance(e, FusedPolyExec) for e in rs.execs)
    y = np.asarray(rs.oneshot(x.astype(np.float32), out_len), np.float64)
    d = rms_db(y - ref)
    assert d < -120.0, f"{precision}: {d:.1f} dB"
