"""Fused conv+interpolator executor (ops/fused.py) vs the oracle.

The composite must be sample-exact in f64, including the stream-start
correction (the composite otherwise extends the convolver formula into its
discarded latency zone — the same pre-ring subtlety as time-sharding's
device 0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from r8brain_tpu.models.lengths import chain_in_for_out
from r8brain_tpu.models.oracle import OracleResampler
from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.ops.fused import FusedUpExec, can_fuse

from .helpers import lcg_uniform, rms_db

CONFIGS = [
    ("up_44k_96k", 44100, 96000, 180.15),
    ("up_44k_48k", 44100, 48000, 180.15),
    ("up_44k_64k", 44100, 64000, 160.0),
    ("preset_def", 44100, 96000, 206.91),
    # small in_step: the start-correction zone spans multiple supercycles
    # (regression for the multi-supercycle pre-ring fix)
    ("small_step_4_3", 44100, 58800, 160.0),
    ("small_step_3_4", 44100, 117600, 160.0),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_fused_exact_vs_oracle(cfg):
    label, src, dst, atten = cfg
    orc = OracleResampler(src, dst, 4096, 2.0, atten, 0)
    assert can_fuse(orc.plan), orc.plan.describe()
    n = 16000
    x = lcg_uniform(33, n)
    out_len = int(np.floor(n * dst / src))
    ref = orc.oneshot(x, out_len)
    T = max(n, chain_in_for_out(orc.plan.stages, out_len))
    xp = np.pad(x, (0, T - n))
    for dt, tol in (("float64", -250.0), ("float32", -125.0)):
        ex = FusedUpExec(orc.plan, jnp.dtype(dt))
        y = np.asarray(ex.apply(jnp.asarray(xp[None], dtype=dt)),
                       np.float64)[0][:out_len]
        d = rms_db(y - ref)
        assert d < tol, f"{label} {dt}: {d:.1f} dB"


def test_prefix_fusion_mid_frac_chain():
    """Intermediate-interpolation plans fuse their [conv, whole-frac]
    prefix; the trailing convolver + half-band cascade runs unchanged."""
    orc = OracleResampler(44100, 384000, 4096, 2.0, 140.0, 0)
    rs = Resampler(44100, 384000, 2.0, 140.0, 0, dtype="float32",
                   plan=orc.plan)
    assert isinstance(rs.execs[0], FusedUpExec) and len(rs.execs) > 1
    n = 4000
    x = lcg_uniform(3, n)
    out_len = int(np.floor(n * 384000 / 44100))
    ref = orc.oneshot(x, out_len)
    y = np.asarray(rs.oneshot(x.astype(np.float32)[None], out_len),
                   np.float64)[0]
    assert rms_db(y - ref) < -120.0


def test_resampler_auto_fuses():
    rs = Resampler(44100, 96000, 2.0, 180.15, 0, dtype="float32")
    assert len(rs.execs) == 1 and isinstance(rs.execs[0], FusedUpExec)
    rs2 = Resampler(44100, 96000, 2.0, 180.15, 0, dtype="float32",
                    fused=False)
    assert len(rs2.execs) == 2
    n = 12000
    x = lcg_uniform(1, n).astype(np.float32)[None]
    out_len = rs.default_out_len(n)
    y1 = np.asarray(rs.oneshot(x, out_len), np.float64)
    y2 = np.asarray(rs2.oneshot(x, out_len), np.float64)
    assert rms_db(y1 - y2) < -130.0


def test_fused_sharded_parity():
    """Time-sharded execution with the fused executor: the start correction
    must apply on device 0 and fall in the discarded warmup elsewhere."""
    from r8brain_tpu.parallel.sharding import ShardedResampler

    rs = Resampler(44100, 96000, 2.0, 160.0, 0, dtype="float32")
    assert isinstance(rs.execs[0], FusedUpExec)
    mesh = Mesh(np.array(jax.devices()[:4]), ("t",))
    srs = ShardedResampler(rs, mesh)
    n = 8000
    x = np.stack([lcg_uniform(s, n) for s in range(2)]).astype(np.float32)
    out_len = rs.default_out_len(n)
    ref = np.asarray(rs.oneshot(x, out_len), np.float64)
    y = np.asarray(srs.oneshot(x, out_len), np.float64)
    assert rms_db(y - ref) < -130.0


def test_fused_high_precision():
    orc = OracleResampler(44100, 96000, 4096, 2.0, 180.15, 0)
    n = 16000
    x = lcg_uniform(7, n)
    out_len = int(np.floor(n * 96000 / 44100))
    ref = orc.oneshot(x, out_len)
    ex = FusedUpExec(orc.plan, jnp.float32, precision="high")
    T = max(n, chain_in_for_out(orc.plan.stages, out_len))
    y = np.asarray(ex.apply(jnp.asarray(np.pad(x, (0, T - n))[None],
                                        dtype=jnp.float32)),
                   np.float64)[0][:out_len]
    d = rms_db(y - ref)
    # kernel-residual pass removes representation error; accumulation is
    # backend-dependent (CPU here) — gate loosely, chip measured separately
    assert d < -130.0, d
