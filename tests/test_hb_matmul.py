"""Half-band matmul engines (stride-2 Toeplitz framed matmuls) vs the
deinterleaved stencil form: stride-2 minor-dim slices / interleaves are
lane relayouts on TPU, so the f32 default routes both HB stages through
the MXU (measured: the DSD chain went 561 -> 7293 Mrops)."""

import numpy as np
import pytest

import jax.numpy as jnp

from r8brain_tpu.models.plan import HBDownStage, HBUpStage, make_plan
from r8brain_tpu.ops.stages import HBDownExec, HBUpExec

from .helpers import rms_db


def _stages(src, dst, cls):
    plan = make_plan(src, dst, 2.0, 150.0, 0)
    return [s for s in plan.stages if isinstance(s, cls)]


@pytest.mark.parametrize("n", [4097, 8192, 12000])
def test_hb_down_matmul_matches_stencil(n):
    specs = _stages(2822400, 96000, HBDownStage)
    assert specs
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, n))
    for spec in specs:
        xd = jnp.asarray(x, jnp.float32)
        ys = np.asarray(HBDownExec(spec, jnp.float32,
                                   engine="stencil").apply(xd), np.float64)
        ym = np.asarray(HBDownExec(spec, jnp.float32,
                                   engine="matmul").apply(xd), np.float64)
        assert ys.shape == ym.shape
        assert rms_db(ym - ys) < -120.0


@pytest.mark.parametrize("n", [4097, 8192, 12000])
def test_hb_up_matmul_matches_stencil(n):
    specs = _stages(44100, 352800, HBUpStage)  # 8x: steep conv + 2 HB ups
    assert specs
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, n))
    for spec in specs:
        xd = jnp.asarray(x, jnp.float32)
        ys = np.asarray(HBUpExec(spec, jnp.float32,
                                 engine="stencil").apply(xd), np.float64)
        ym = np.asarray(HBUpExec(spec, jnp.float32,
                                 engine="matmul").apply(xd), np.float64)
        assert ys.shape == ym.shape
        assert rms_db(ym - ys) < -120.0


def test_hb_engine_defaults():
    dspec = _stages(2822400, 96000, HBDownStage)[0]
    uspec = _stages(44100, 352800, HBUpStage)[0]
    assert HBDownExec(dspec, jnp.float32).engine == "matmul"
    assert HBDownExec(dspec, jnp.float64).engine == "stencil"
    assert HBUpExec(uspec, jnp.float32).engine == "matmul"
    assert HBUpExec(uspec, jnp.float64).engine == "stencil"
