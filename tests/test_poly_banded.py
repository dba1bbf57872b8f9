"""Banded (MXU, gather-free) polynomial-mode interpolator vs the gather
reference engine (VERDICT r1 item 9: the reference's convolve2 is its
FAST path, CDSPFracInterpolator.h:1069-1179 — ours must be MXU-shaped,
not a per-tap gather chain).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r8brain_tpu.models.oracle import OracleResampler
from r8brain_tpu.models.plan import make_plan
from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.ops.stages import FracPolyExec

from .helpers import lcg_uniform, rms_db

RATIOS = [
    ("poly_96001", 44100, 96001),
    ("poly_down", 96001, 44100),
    ("poly_sqrt2", 44100, 44100 * np.sqrt(2.0)),
    ("poly_slight", 44100, 44100 * 1.0001),
]


@pytest.mark.parametrize("label,src,dst", RATIOS, ids=[r[0] for r in RATIOS])
@pytest.mark.parametrize("dtype,tol", [(jnp.float64, -250.0),
                                       (jnp.float32, -110.0)],
                         ids=["f64", "f32"])
def test_banded_matches_gather(label, src, dst, dtype, tol):
    plan = make_plan(src, dst, 2.0, 170.0, 0)
    fr = [s for s in plan.stages if s.kind == "frac" and not s.is_whole]
    if not fr:
        pytest.skip("plan has no poly stage")
    spec = fr[0]
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 16000))
    xd = jnp.asarray(x, dtype)
    yg = np.asarray(FracPolyExec(spec, dtype, engine="gather").apply(xd),
                    np.float64)
    yb = np.asarray(FracPolyExec(spec, dtype, engine="banded").apply(xd),
                    np.float64)
    assert yg.shape == yb.shape
    d = rms_db(yg - yb)
    assert d < tol, f"{label}: {d:.1f} dB"


def test_banded_default_for_f32_chain():
    # fused=False: the default f32 chain replaces the pair with
    # FusedPolyExec (tests/test_poly_fused.py); unfused keeps banded
    rs = Resampler(44100, 96001, 2.0, 180.15, 0, dtype=jnp.float32,
                   fused=False)
    poly = [e for e in rs.execs if isinstance(e, FracPolyExec)]
    assert poly and poly[0].engine == "banded"
    rs64 = Resampler(44100, 96001, 2.0, 180.15, 0, dtype=jnp.float64)
    poly64 = [e for e in rs64.execs if isinstance(e, FracPolyExec)]
    assert poly64 and poly64[0].engine == "gather"


def test_banded_chain_vs_oracle():
    """Full f32 chain with the banded poly engine vs the f64 oracle."""
    src, dst = 44100, 96001
    n = 12000
    x = lcg_uniform(31, n)
    orc = OracleResampler(src, dst, 4096, 2.0, 180.15, 0)
    out_len = int(np.floor(n * dst / src))
    ref = orc.oneshot(x, out_len)
    rs = Resampler(src, dst, 2.0, 180.15, 0, dtype=jnp.float32,
                   plan=orc.plan)
    y = np.asarray(rs.oneshot(x.astype(np.float32), out_len), np.float64)
    d = rms_db(y - ref)
    assert d < -125.0, d


def test_banded_tiny_input():
    """Edge: input so short only a partial group of outputs exists."""
    plan = make_plan(44100, 96001, 2.0, 140.0, 0)
    spec = [s for s in plan.stages if s.kind == "frac"][0]
    x = jnp.asarray(lcg_uniform(7, 300)[None], jnp.float32)
    yg = np.asarray(FracPolyExec(spec, jnp.float32, engine="gather").apply(x))
    yb = np.asarray(FracPolyExec(spec, jnp.float32, engine="banded").apply(x))
    assert yg.shape == yb.shape
    if yg.size:
        assert rms_db(yg - yb) < -110.0
