"""Sharded vs unsharded parity on a virtual 8-device CPU mesh.

The reference has no distributed layer; the equivalent acceptance here
(SURVEY.md §4 "multi-node testing") is exact numerical parity between the
sharded execution (channels and/or time-blocks over a Mesh, halo exchange
via ppermute) and the single-device whole-array execution — in float64 the
streams must match to reduction-order noise, in float32 bit-for-bit modulo
halo-window framing differences in the FFT blocks.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.parallel.sharding import (ShardedResampler,
                                           chain_input_span,
                                           chain_shift_period)

from .helpers import lcg_uniform, rms_db

CONFIGS = [
    ("up_44k_96k", 44100, 96000, 180.15),
    ("down_96k_44k", 96000, 44100, 180.15),
    ("up_44k_48k", 44100, 48000, 180.15),
    ("x4_up", 44100, 176400, 180.15),
    ("x4_down", 176400, 44100, 140.0),
]


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.parametrize("mesh_shape", [("ch4", (4,)), ("t4", (4,)),
                                        ("ch2t4", (2, 4))],
                         ids=["ch4", "t4", "ch2t4"])
def test_sharded_parity(cfg, mesh_shape):
    label, src, dst, atten = cfg
    kind, shape = mesh_shape
    if kind == "ch4":
        mesh = _mesh((4,), ("ch",))
    elif kind == "t4":
        mesh = _mesh((4,), ("t",))
    else:
        mesh = _mesh((2, 4), ("ch", "t"))

    rs = Resampler(src, dst, 2.0, atten, 0, dtype="float64")
    n = 4000 if src < 1e6 else 1500
    C = 4
    x = np.stack([lcg_uniform(s + 11, n) for s in range(C)])
    out_len = rs.default_out_len(n)
    ref = np.asarray(rs.oneshot(x, out_len))

    srs = ShardedResampler(rs, mesh)
    y = np.asarray(srs.oneshot(x, out_len))
    assert y.shape == ref.shape
    d = rms_db(y - ref)
    assert d < -260.0, f"{label}/{kind}: {d:.1f} dB"


def test_poly_time_sharding_rejected():
    rs = Resampler(44100, 96001, 2.0, 160.0, 0, dtype="float64")
    assert chain_shift_period(rs.plan) is None
    mesh = _mesh((4,), ("t",))
    with pytest.raises(ValueError):
        ShardedResampler(rs, mesh)


def test_poly_channel_sharding_ok():
    rs = Resampler(44100, 96001, 2.0, 160.0, 0, dtype="float64")
    mesh = _mesh((4,), ("ch",))
    srs = ShardedResampler(rs, mesh)
    n = 3000
    x = np.stack([lcg_uniform(s + 3, n) for s in range(4)])
    out_len = rs.default_out_len(n)
    ref = np.asarray(rs.oneshot(x, out_len))
    y = np.asarray(srs.oneshot(x, out_len))
    d = rms_db(y - ref)
    assert d < -260.0, f"{d:.1f} dB"


def test_period_sanity():
    rs = Resampler(44100, 96000, 2.0, 180.15, 0, dtype="float64")
    p = chain_shift_period(rs.plan)
    assert p is not None
    p_in, p_out = p
    assert p_in * 96000 == p_out * 44100
    assert chain_input_span(rs.plan) > 0


def test_uneven_channels():
    """Channel count not divisible by the mesh: padded and sliced back."""
    rs = Resampler(44100, 96000, 2.0, 140.0, 0, dtype="float64")
    mesh = _mesh((4,), ("ch",))
    srs = ShardedResampler(rs, mesh)
    n = 2000
    x = np.stack([lcg_uniform(s, n) for s in range(3)])  # 3 channels on 4 devs
    out_len = rs.default_out_len(n)
    ref = np.asarray(rs.oneshot(x, out_len))
    y = np.asarray(srs.oneshot(x, out_len))
    assert y.shape == ref.shape
    assert rms_db(y - ref) < -260.0


class TestHaloEfficiencyModel:
    """The published scaling-efficiency claims (README/BASELINE) must be
    reproducible from the production geometry (tools/halo_model.py uses
    the same shard_geometry as ShardedResampler)."""

    def test_flagship_efficiency_table(self):
        from r8brain_tpu.models.plan import make_plan
        from r8brain_tpu.parallel.sharding import (
            chain_input_span, chain_shift_period, shard_geometry)

        plan = make_plan(44100.0, 96000.0, 2.0, 180.15, 0)
        period = chain_shift_period(plan)
        span = chain_input_span(plan)

        def eff(n_t, sec):
            n_in = int(sec * 44100)
            out_len = int(n_in * 96000 / 44100)
            M_s, L_s, H, W, R = shard_geometry(plan, period, span, n_t,
                                               out_len, n_in)
            return L_s / (H + L_s + R)

        assert abs(eff(2, 1) - 0.938) < 0.005    # README: 93.8% @ 2 x 1 s
        assert eff(8, 10) >= 0.974               # README: >= 97.4% @ 8 x 10 s
        assert eff(2, 60) >= 0.998               # README: ~99.9% @ 60 s
        # halos are fixed-size: efficiency must be monotone in duration
        assert eff(8, 10) > eff(8, 1)
        assert eff(8, 60) > eff(8, 10)
