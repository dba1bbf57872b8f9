"""Planner decision-tree tests (CDSPResampler.h:117-394 parity)."""

import pytest

from r8brain_tpu.models.oracle import OracleResampler
from r8brain_tpu.models.plan import (ConvStage, FracStage, HBDownStage,
                                     HBUpStage, make_plan)

from .helpers import lcg_uniform


def kinds(plan):
    return [s.kind for s in plan.stages]


def test_identity():
    assert make_plan(48000.0, 48000.0).stages == ()


def test_common_ratios_single_step():
    for src, dst, up, down in [
        (88200, 44100, 1, 2), (44100, 14700, 1, 3), (44100, 29400, 2, 3),
        (44100, 66150, 3, 2), (44100, 33075, 3, 4),
    ]:
        p = make_plan(float(src), float(dst), 2.0, 180.15)
        assert kinds(p) == ["conv"], (src, dst)
        s = p.stages[0]
        assert (s.up, s.down) == (up, down)


def test_pow2_upsampling_chain():
    p = make_plan(44100.0, 44100.0 * 8, 2.0, 180.15)
    assert kinds(p) == ["conv", "hb_up", "hb_up"]
    assert p.stages[0].up == 2
    assert [s.hb.steep_index for s in p.stages[1:]] == [0, 1]

    p3 = make_plan(44100.0, 44100.0 * 12, 2.0, 180.15)
    assert kinds(p3) == ["conv", "hb_up", "hb_up"]
    assert p3.stages[0].up == 3
    assert all(s.hb.is_third for s in p3.stages[1:])


def test_flagship_whole_stepping():
    p = make_plan(44100.0, 96000.0, 2.0, 180.15)
    assert kinds(p) == ["conv", "frac"]
    f = p.stages[1]
    assert f.is_whole and (f.in_step, f.out_step) == (147, 160)


def test_fractional_downsampling_to_2x():
    p = make_plan(96000.0, 44100.0, 2.0, 180.15)
    assert kinds(p) == ["conv", "frac"]
    c = p.stages[0]
    assert (c.up, c.down) == (1, 1)
    # branch 5 with c=0 half-band stages: NormFreq = dst/src
    # (CDSPResampler.h:365-370)
    assert abs(c.filt.norm_freq - 44100 / 96000) < 1e-15


def test_deep_downsampling_hb_cascade():
    p = make_plan(2822400.0, 96000.0, 2.0, 180.15)
    assert kinds(p) == ["hb_down", "hb_down", "hb_down", "conv", "frac"]
    assert [s.hb.steep_index for s in p.stages[:3]] == [2, 1, 0]
    assert all(s.hb.is_third for s in p.stages[:3])  # NormFreq*3 <= 1
    c = p.stages[3]
    assert c.filt.req_gain == 0.125  # FinGain = 0.5^3


def test_intermediate_interpolation():
    p = make_plan(96000.0, 2822400.0, 2.0, 180.15)
    assert kinds(p) == ["conv", "frac", "conv", "hb_up", "hb_up", "hb_up"]
    f = p.stages[1]
    assert f.is_whole and (f.in_step, f.out_step) == (160, 147)


def test_latency_frac_threading_minphase():
    p = make_plan(44100.0, 176400.0, 2.0, 120.0, phase=1)
    # min-phase convolver leaves fractional latency; hb_up doubles it
    c = p.stages[0]
    assert c.filt.latency_frac != 0.0
    hb = p.stages[1]
    assert hb.prev_latency_frac == c.latency_frac_out


def test_latency_query_consistency():
    """zerotest-style check (bench/zerotest.cpp:115-128): feeding exactly
    get_input_required_for_output(n) samples must yield >= n outputs, and
    one fewer must not."""
    for src, dst in [(44100.0, 96000.0), (96000.0, 44100.0),
                     (44100.0, 48000.0), (44100.0, 96001.0),
                     (2822400.0, 96000.0)]:
        rs = OracleResampler(src, dst, 4096, 2.0, 180.15)
        for n in (1, 7, 100, 555):
            need = rs.get_input_required_for_output(n)
            rs.clear()
            y = rs.process(lcg_uniform(3, need))
            assert y.shape[0] >= n, (src, dst, n, need, y.shape)
            rs.clear()
            y2 = rs.process(lcg_uniform(3, need - 1))
            assert y2.shape[0] < n, (src, dst, n, need, y2.shape)
        rs.clear()


class TestMaxOutLen:
    """max_out_len (getMaxOutLen, CDSPResampler.h:497-506): an upper
    bound on outputs per block at ANY stream position — must dominate
    both the start block and every mid-stream block."""

    @pytest.mark.parametrize("cfg", [(44100, 96000), (96000, 44100),
                                     (44100, 96001), (44100, 176400)])
    def test_bounds_streaming_blocks(self, cfg):
        src, dst = cfg
        import numpy as np
        from r8brain_tpu.models.oracle import OracleResampler

        orc = OracleResampler(src, dst, 4096, 2.0, 140.0, 0)
        from r8brain_tpu.models.lengths import chain_max_out_len

        block = 1000
        bound = chain_max_out_len(orc.plan.stages, block)
        assert bound == orc.max_out_len(block)
        x = np.random.default_rng(0).standard_normal(20 * block)
        for i in range(20):
            y = orc.process(x[i * block : (i + 1) * block])
            assert len(y) <= bound, (i, len(y), bound)


def test_make_plan_rejects_hostile_rates():
    """Hostile/degenerate rates must fail with a clear ValueError, never an
    OverflowError deep in the decision tree — mirrors the native designer's
    std::isfinite + ratio-cap validation (native/r8bt_design.cpp)."""
    import math

    import pytest

    from r8brain_tpu.models.plan import make_plan

    for src, dst in [(0.0, 44100.0), (-1.0, 44100.0), (44100.0, 0.0),
                     (44100.0, -2.0), (math.nan, 96000.0),
                     (44100.0, math.nan), (math.inf, 96000.0),
                     (44100.0, math.inf), (1e-300, 1e300), (1e300, 1e-300)]:
        with pytest.raises(ValueError):
            make_plan(src, dst)
