"""Centrosymmetry-folded banded-Toeplitz convolver (ops/stages.py
ConvExec engine="toeplitz_sym") vs the plain operator and the oracle.

The fold halves MXU flops for linear-phase kernels (every ConvStage the
planner emits carries one: CDSPSincFilterGen.h:312-395 windowed-sinc
band kernels are symmetric by construction).  These tests pin:

* f64 formulation exactness — the fold is algebra, not approximation;
* f32 / precision="high" accuracy classes vs the f64 oracle stage;
* the fallback when a kernel is NOT bit-symmetric or a phase row is not
  palindromic (up >= 3 phases generally are not);
* full-chain (Resampler with conv_engine="toeplitz_sym") parity vs the
  streaming oracle for the poly chain the engine was built to speed up.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r8brain_tpu.models.oracle import OracleResampler
from r8brain_tpu.models.plan import ConvStage, make_plan
from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.ops.stages import ConvExec

from .helpers import lcg_uniform, rms_db

jax.config.update("jax_enable_x64", True)


def _conv_specs():
    specs = []
    for (s, d) in ((44100, 96001), (96000, 44100), (44100, 96000)):
        plan = make_plan(s, d, 2.0, 180.15, 0)
        specs += [st for st in plan.stages if isinstance(st, ConvStage)]
    # de-dup by (K, up, down)
    seen, out = set(), []
    for st in specs:
        key = (st.filt.kernel.shape[0], st.up, st.down)
        if key not in seen:
            seen.add(key)
            out.append(st)
    return out


SPECS = _conv_specs()
IDS = [f"K{s.filt.kernel.shape[0]}_u{s.up}_d{s.down}" for s in SPECS]


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_f64_formulation_exact(spec):
    x = jnp.asarray(lcg_uniform(7, 6000)[None].repeat(2, 0), jnp.float64)
    ref = ConvExec(spec, jnp.float64, engine="toeplitz")
    sym = ConvExec(spec, jnp.float64, engine="toeplitz_sym")
    assert sym.engine == "toeplitz_sym"
    yr = np.asarray(ref.apply(x), np.float64)
    ys = np.asarray(sym.apply(x), np.float64)
    assert yr.shape == ys.shape
    rel = np.abs(ys - yr).max() / np.abs(yr).max()
    assert rel < 1e-13, rel


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_f32_and_high_accuracy(spec):
    x64 = lcg_uniform(11, 6000)
    x = jnp.asarray(x64[None], jnp.float32)
    oracle = ConvExec(spec, jnp.float64, engine="toeplitz")
    yo = np.asarray(oracle.apply(jnp.asarray(x64[None], jnp.float64)),
                    np.float64)
    fast = ConvExec(spec, jnp.float32, engine="toeplitz_sym")
    d = rms_db(np.asarray(fast.apply(x), np.float64) - yo) \
        - rms_db(yo)
    assert d < -115.0, f"fast: {d:.1f} dB"
    high = ConvExec(spec, jnp.float32, engine="toeplitz_sym",
                    precision="high")
    assert high.sym_comp  # fold-error compensation on for the high path
    dh = rms_db(np.asarray(high.apply(x), np.float64) - yo) - rms_db(yo)
    # XLA:CPU f32 accumulation floor; measured ~-149 dB on the TPU MXU
    assert dh < -130.0, f"high: {dh:.1f} dB"


def test_short_input_and_multi_block():
    spec = SPECS[0]
    for n in (700, 1100, 4096, 9001):
        x = jnp.asarray(lcg_uniform(n, n)[None], jnp.float64)
        ref = ConvExec(spec, jnp.float64, engine="toeplitz")
        sym = ConvExec(spec, jnp.float64, engine="toeplitz_sym")
        yr = np.asarray(ref.apply(x))
        ys = np.asarray(sym.apply(x))
        assert yr.shape == ys.shape
        assert np.abs(ys - yr).max() / np.abs(yr).max() < 1e-13, n


def test_fallback_on_asymmetric_kernel():
    """Min-phase kernels are not symmetric: the sym engine must fall back
    to the plain operator and still be correct."""
    plan = make_plan(44100, 96000, 2.0, 140.0, 1)  # phase=1: min-phase
    spec = next(st for st in plan.stages if isinstance(st, ConvStage))
    k = np.asarray(spec.filt.kernel)
    assert not np.array_equal(k, k[::-1])
    sym = ConvExec(spec, jnp.float64, engine="toeplitz_sym")
    assert sym.engine == "toeplitz"  # fell back
    ref = ConvExec(spec, jnp.float64, engine="toeplitz")
    x = jnp.asarray(lcg_uniform(3, 5000)[None], jnp.float64)
    assert np.array_equal(np.asarray(sym.apply(x)), np.asarray(ref.apply(x)))


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
@pytest.mark.parametrize("precision", ["fast", "high"])
def test_pallas_kernel_interpret_matches_xla_fold(spec, precision):
    """The fused Pallas stage kernel (ops/pallas_symconv.py) vs the XLA
    fold path, in interpreter mode with C=8 (choose_ct needs C % 8 == 0;
    the production chip path is the same kernel with CT up to 128).
    The fast path must be BIT-identical: both formulations perform the
    same f32 fold adds and HIGHEST-precision dots."""
    x64 = np.stack([lcg_uniform(s, 5000) for s in range(8)])
    x = jnp.asarray(x64, jnp.float32)
    xla = ConvExec(spec, jnp.float32, engine="toeplitz_sym",
                   precision=precision)
    y_xla = np.asarray(xla.apply(x))
    pal = ConvExec(spec, jnp.float32, engine="toeplitz_sym",
                   precision=precision)
    pal.sym_pallas_interpret = True
    y_pal = np.asarray(pal.apply(x))
    assert y_pal.shape == y_xla.shape
    if precision == "fast":
        assert np.array_equal(y_pal, y_xla)
    else:
        # interpreter DEFAULT-precision dots run f32 (bf16 on TPU): the
        # residual/compensation terms differ below the high-path floor
        rel = np.abs(y_pal - y_xla).max() / np.abs(y_xla).max()
        assert rel < 2e-6, rel


@pytest.mark.parametrize("cfg", [(44100, 96001), (96000, 44100)],
                         ids=["poly_96001", "down_96k_44k"])
def test_full_chain_vs_oracle(cfg):
    src, dst = cfg
    n = 6000
    x = lcg_uniform(101, n)
    orc = OracleResampler(src, dst, 4096, 2.0, 180.15, 0)
    out_len = int(np.floor(n * dst / src))
    ref = orc.oneshot(x, out_len)
    rs = Resampler(src, dst, 2.0, 180.15, 0, dtype="float32",
                   plan=orc.plan, conv_engine="toeplitz_sym")
    y = np.asarray(rs.oneshot(x.astype(np.float32)[None], out_len),
                   np.float64)[0]
    d = rms_db(y - ref)
    assert d < -115.0, f"{cfg}: {d:.1f} dB"
