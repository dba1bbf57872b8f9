"""Streaming (push-mode) vs oneshot equality.

The reference's central streaming contract: feeding a signal in chunks of
any size produces the same output stream as one big call
(CDSPBlockConvolver overlap-save is invariant to segmentation).  Here the
device-side block streaming must reproduce the whole-array oneshot bit-for-
bit in float64 and to storage precision in float32.
"""

import numpy as np
import pytest

from r8brain_tpu.models.resampler import Resampler
from r8brain_tpu.models.stream import StreamResampler

from .helpers import lcg_uniform, rms_db

CONFIGS = [
    ("up_44k_96k", 44100, 96000, 180.15),
    ("up_44k_48k", 44100, 48000, 180.15),
    ("down_96k_44k", 96000, 44100, 180.15),
    ("x4_up", 44100, 176400, 140.0),
    ("x4_down", 176400, 44100, 140.0),
    ("poly_mid_96001", 44100, 96001, 160.0),
    ("poly_down", 96001, 44100, 140.0),
    ("poly_up_80k", 44100, 80000, 160.0),
    # mid-chain poly with an hb_up SUFFIX (conv->poly->conv->hb_up, the
    # intermediate-interpolation branch at ratio > 4): the poly stage's
    # varying per-block counts re-block onto a multi-stage suffix grid
    ("poly_mid_hbup", 44100, 352800.3, 140.0),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.parametrize("chunks", ["even", "ragged"])
def test_stream_equals_oneshot(cfg, chunks):
    label, src, dst, atten = cfg
    rs = Resampler(src, dst, 2.0, atten, 0, dtype="float64")
    n = 26000
    C = 2
    x = np.stack([lcg_uniform(7 + i, n) for i in range(C)])
    out_len = rs.default_out_len(n)
    ref = np.asarray(rs.oneshot(x, out_len))

    st = StreamResampler(rs, block_len=4096)
    if chunks == "even":
        sizes = [5000] * 5 + [1000]
    else:
        sizes = [1, 999, 7000, 3, 12000, 4997, 1000]
    pos = 0
    outs = []
    for s in sizes:
        outs.append(st.process(x[:, pos : pos + s]))
        pos += s
    assert pos == n
    outs.append(st.flush(out_len))
    y = np.concatenate(outs, axis=1)
    assert y.shape == ref.shape, (y.shape, ref.shape)
    # identical math modulo f64 FFT framing noise (the streaming window
    # grid differs from the oneshot grid, as the reference's flip-flop
    # buffers differ from any other segmentation)
    d = rms_db(y - ref)
    assert d < -300.0, f"{label}: {d:.1f} dB"


def test_stream_clear_reuse():
    rs = Resampler(44100, 96000, 2.0, 140.0, 0, dtype="float64")
    st = StreamResampler(rs, block_len=2048)
    x = lcg_uniform(3, 9000)[None]
    out_len = rs.default_out_len(9000)
    y1 = np.concatenate([st.process(x), st.flush(out_len)], axis=1)
    st.clear()
    y2 = np.concatenate([st.process(x), st.flush(out_len)], axis=1)
    assert np.array_equal(y1, y2)  # clear() is a full deterministic reset
    ref = np.asarray(rs.oneshot(x, out_len))
    from .helpers import rms_db
    assert rms_db(y1 - ref) < -300.0


def test_stream_f32_matches_oneshot_f32():
    """Same float32 two-stage arithmetic => only window-framing noise.
    (fused=False so the oneshot uses the same two-stage pipeline the
    streaming executor runs; the fused composite differs at the f32
    rounding level by design.)"""
    rs = Resampler(44100, 96000, 2.0, 180.15, 0, dtype="float32",
                   fused=False)
    st = StreamResampler(rs, block_len=4096)
    n = 20000
    x = lcg_uniform(9, n)[None].astype(np.float32)
    out_len = rs.default_out_len(n)
    ref = np.asarray(rs.oneshot(x, out_len), dtype=np.float64)
    y = np.concatenate([st.process(x), st.flush(out_len)], axis=1)
    assert y.shape == ref.shape
    assert rms_db(y - ref) < -135.0


@pytest.mark.parametrize("cfg", [(44100, 96000, 140.0),
                                 (44100, 96001, 140.0)],
                         ids=["rational", "poly"])
def test_stream_checkpoint_resume(cfg):
    """get_state/set_state mid-stream: a resumed stream (even in a fresh
    object) continues bit-identically (SURVEY.md §5 checkpoint state)."""
    src, dst, atten = cfg
    rs = Resampler(src, dst, 2.0, atten, 0, dtype="float64")
    n = 20000
    x = lcg_uniform(13, n)[None]
    out_len = rs.default_out_len(n)

    st = StreamResampler(rs, block_len=2048)
    y1 = st.process(x[:, :11000])
    ckpt = st.get_state()
    y2a = st.process(x[:, 11000:])
    y3a = st.flush(out_len)
    full_a = np.concatenate([y1, y2a, y3a], axis=1)

    st2 = StreamResampler(rs, block_len=2048)
    st2.process(x[:, :1])  # arbitrary prior state, then restore
    st2.set_state(ckpt)
    y2b = st2.process(x[:, 11000:])
    y3b = st2.flush(out_len)
    assert np.array_equal(y2a, y2b)
    assert np.array_equal(y3a, y3b)

    ref = np.asarray(rs.oneshot(x, out_len))
    assert full_a.shape == ref.shape
    assert rms_db(full_a - ref) < -300.0


def test_stream_high_precision():
    """Streaming the df32-FFT guarantee engine meets the golden class vs
    the f64 oracle on any backend; the DEFAULT high mode (fast fused
    residual matmuls) streams at the CPU matmul floor here and at -149 dB
    on the MXU (bench.py re-measures each round)."""
    from r8brain_tpu.models.oracle import OracleResampler

    n = 16000
    x = lcg_uniform(21, n)
    orc = OracleResampler(44100, 96000, 4096, 2.0, 180.15, 0)

    rs = Resampler(44100, 96000, 2.0, 180.15, 0, dtype="float32",
                   precision="high", fused=False, conv_engine="fft")
    st = StreamResampler(rs, block_len=4096)
    out_len = rs.default_out_len(n)
    y = np.concatenate([st.process(x.astype(np.float32)),
                        st.flush(out_len)])
    ref = orc.oneshot(x, out_len)
    assert y.shape == ref.shape
    assert rms_db(y - ref) < -141.0

    rs_d = Resampler(44100, 96000, 2.0, 180.15, 0, dtype="float32",
                     precision="high")
    st_d = StreamResampler(rs_d, block_len=4096)
    y_d = np.concatenate([st_d.process(x.astype(np.float32)),
                          st_d.flush(out_len)])
    assert y_d.shape == ref.shape
    assert rms_db(y_d - ref) < -133.0


def test_stream_tiny_block_len():
    """Regression: block_len smaller than the chain warmup must be grown,
    not silently emit shifted output (code-review finding)."""
    rs = Resampler(44100, 96000, 2.0, 180.15, 0, dtype="float64")
    st = StreamResampler(rs, block_len=256)
    n = 20000
    x = lcg_uniform(13, n)[None]
    out_len = rs.default_out_len(n)
    y = np.concatenate([st.process(x), st.flush(out_len)], axis=1)
    ref = np.asarray(rs.oneshot(x, out_len))
    assert y.shape == ref.shape
    assert rms_db(y - ref) < -300.0


def test_stream_fused_matches_fused_oneshot():
    """A fused parent resampler streams through the same fused composite;
    stream == oneshot to f32 window-framing noise."""
    from r8brain_tpu.ops.fused import FusedUpExec

    rs = Resampler(44100, 96000, 2.0, 180.15, 0, dtype="float32")
    assert isinstance(rs.execs[0], FusedUpExec)
    st = StreamResampler(rs, block_len=4096)
    assert isinstance(st._core.execs[0], FusedUpExec)
    n = 20000
    x = lcg_uniform(9, n)[None].astype(np.float32)
    out_len = rs.default_out_len(n)
    ref = np.asarray(rs.oneshot(x, out_len), dtype=np.float64)
    y = np.concatenate([st.process(x), st.flush(out_len)], axis=1)
    assert y.shape == ref.shape
    assert rms_db(y - ref) < -135.0


def test_stream_device_resident():
    """process_block_device: device-in/device-out blocks equal the host
    path bit-for-bit."""
    import jax.numpy as jnp

    rs = Resampler(44100, 96000, 2.0, 140.0, 0, dtype="float32")
    st_h = StreamResampler(rs, block_len=2048)
    st_d = StreamResampler(rs, block_len=2048)
    n = st_h.block * 4
    x = lcg_uniform(3, n).astype(np.float32)[None]
    outs_h, outs_d = [], []
    for i in range(0, n, st_h.block):
        blk = x[:, i : i + st_h.block]
        outs_h.append(st_h.process(blk))
        outs_d.append(np.asarray(st_d.process_block_device(
            jnp.asarray(blk))))
    yh = np.concatenate(outs_h, axis=1)
    yd = np.concatenate(outs_d, axis=1)
    assert np.array_equal(yh.astype(np.float32), yd.astype(np.float32))


@pytest.mark.parametrize("cfg", [
    ("poly_suffix", 44100, 96001),   # poly + conv suffix (device re-block)
    ("poly_last", 96001, 44100),     # poly final stage
    ("poly_hbup_suffix", 44100, 352800.3),  # conv->poly->conv->hb_up
], ids=lambda c: c[0] if isinstance(c, tuple) else str(c))
def test_stream_device_resident_poly(cfg):
    """Device-resident streaming for polynomial (irrational-ratio) plans
    (VERDICT r3 missing #2 / next #5): the tail interpolator runs with
    per-block device position args; a suffix is re-blocked on device
    through a static ring buffer.  Must equal oneshot in f64, and the
    host process() path bit-for-bit in f32, including when mixing device
    and host calls mid-stream."""
    import jax.numpy as jnp

    _, src, dst = cfg
    rs = Resampler(src, dst, 2.0, 180.15, 0, dtype="float64")
    st = StreamResampler(rs, block_len=2048)
    n = st.block * 4
    x = np.stack([lcg_uniform(11, n), lcg_uniform(12, n)])
    outs = [np.asarray(st.process_block_device(
        jnp.asarray(x[:, i : i + st.block])), dtype=np.float64)
        for i in range(0, n, st.block)]
    out_len = rs.default_out_len(n)
    outs.append(st.flush(out_len))
    y = np.concatenate(outs, axis=1)
    ref = np.asarray(rs.oneshot(x, out_len))
    assert y.shape == ref.shape
    assert rms_db(y - ref) < -280.0

    # f32: device path == host path bit-for-bit, mixed mid-stream
    rs32 = Resampler(src, dst, 2.0, 180.15, 0, dtype="float32")
    st_h = StreamResampler(rs32, block_len=2048)
    st_m = StreamResampler(rs32, block_len=2048)
    x32 = x.astype(np.float32)
    yh, ym = [], []
    for j, i in enumerate(range(0, n, st_h.block)):
        blk = x32[:, i : i + st_h.block]
        yh.append(np.asarray(st_h.process(blk), dtype=np.float64))
        if j == 2:  # host call mid-stream drains the device re-blocker
            ym.append(np.asarray(st_m.process(blk), dtype=np.float64))
        else:
            ym.append(np.asarray(st_m.process_block_device(
                jnp.asarray(blk)), dtype=np.float64))
    assert np.array_equal(np.concatenate(yh, axis=1),
                          np.concatenate(ym, axis=1))


@pytest.mark.parametrize("cfg", [
    ("period", 44100, 96000),
    ("poly_last", 44100, 96001),
    ("poly_hbup_suffix", 44100, 352800.3),
], ids=lambda c: c[0] if isinstance(c, tuple) else str(c))
def test_stream_batched_device(cfg):
    """k-block batched serving (process_blocks_device): one scanned-prefix
    jit + ONE length-general tail program per k blocks, amortizing the
    per-block dispatch latency (NEXT.md round-6 #2; the reference's
    process() is one-block host-serial by construction,
    CDSPResampler.h:559-575).  Contract: rational plans are BIT-IDENTICAL
    to k successive per-block device calls (the scan body IS _steady);
    polynomial plans hold the streaming class — f64 equals oneshot at
    oracle level, f32 differs from the per-block path only in banded
    group-padding placement (same exact positions)."""
    import jax.numpy as jnp

    label, src, dst = cfg
    rs = Resampler(src, dst, 2.0, 180.15, 0, dtype="float64")
    st = StreamResampler(rs, block_len=2048)
    L = st.block
    k, ncalls = 3, 3
    n = L * k * ncalls
    x = np.stack([lcg_uniform(21, n), lcg_uniform(22, n)])
    outs = [np.asarray(st.process_blocks_device(
        jnp.asarray(x[:, i : i + k * L])), dtype=np.float64)
        for i in range(0, n, k * L)]
    out_len = rs.default_out_len(n)
    outs.append(st.flush(out_len))
    y = np.concatenate(outs, axis=1)
    ref = np.asarray(rs.oneshot(x, out_len))
    assert y.shape == ref.shape
    assert rms_db(y - ref) < -280.0

    # f32: batched vs per-block device path — bit-identical for period
    # plans; class-bounded for poly (group packing differs)
    rs_a = Resampler(src, dst, 2.0, 180.15, 0, dtype="float32")
    rs_b = Resampler(src, dst, 2.0, 180.15, 0, dtype="float32")
    st_a = StreamResampler(rs_a, block_len=2048)
    st_b = StreamResampler(rs_b, block_len=2048)
    x32 = x.astype(np.float32)
    ya, yb = [], []
    for i in range(0, n, L):
        ya.append(np.asarray(st_a.process_block_device(
            jnp.asarray(x32[:, i : i + L]))))
    for i in range(0, n, k * L):
        yb.append(np.asarray(st_b.process_blocks_device(
            jnp.asarray(x32[:, i : i + k * L]))))
    ya = np.concatenate(ya, axis=1)
    yb = np.concatenate(yb, axis=1)
    m = min(ya.shape[1], yb.shape[1])
    assert ya.shape[1] == yb.shape[1] or label == "poly_hbup_suffix"
    if label == "period":
        assert np.array_equal(ya[:, :m], yb[:, :m])
    else:
        peak = np.abs(ya[:, :m]).max()
        assert np.abs(ya[:, :m] - yb[:, :m]).max() < peak * 10 ** (-120 / 20)


def test_device_stream_guards():
    """Device streaming: channel bookkeeping for flush/checkpoint; strict
    shape validation; refusal to mix with a pending partial chunk
    (code-review findings)."""
    import jax.numpy as jnp

    rs = Resampler(44100, 96000, 2.0, 140.0, 0, dtype="float32")
    st = StreamResampler(rs, block_len=2048)
    n = st.block * 3
    x = lcg_uniform(5, n).astype(np.float32)
    xb = np.stack([x, 0.5 * x])
    outs = [np.asarray(st.process_block_device(
        jnp.asarray(xb[:, i : i + st.block])))
        for i in range(0, n, st.block)]
    tail = st.flush(rs.default_out_len(n))  # channels recorded: no crash
    y = np.concatenate(outs + [tail], axis=1)
    ref = np.asarray(rs.oneshot(xb, rs.default_out_len(n)), np.float64)
    assert y.shape == ref.shape
    assert rms_db(y - ref) < -130.0

    st2 = StreamResampler(rs, block_len=2048)
    with pytest.raises(ValueError):
        st2.process_block_device(jnp.zeros(st2.block, dtype=jnp.float32))
    st2.process(xb[:, :100])  # partial chunk pending
    with pytest.raises(RuntimeError):
        st2.process_block_device(
            jnp.zeros((2, st2.block), dtype=jnp.float32))


def test_stream_conv_engine_propagates():
    """A forced conv engine must survive streaming's executor rebuild."""
    rs = Resampler(44100, 96001, 2.0, 140.0, 0, dtype="float32",
                   conv_engine="fft")
    st = StreamResampler(rs, block_len=2048)
    from r8brain_tpu.ops.stages import ConvExec

    convs = [e for e in st._core.execs if isinstance(e, ConvExec)]
    assert convs and all(c.engine == "fft" for c in convs)


def test_stream_random_poly_ratios():
    """Randomized irrational-ish ratios with random chunking: streamed
    output must equal oneshot (masstest-style property for the poly
    streaming machinery: prefix periods, host-timed tail, suffix
    re-blocking)."""
    rng = np.random.default_rng(77)
    for trial in range(6):
        src = 44100.0
        # a ratio that is NOT rational in <= 1500 steps -> poly mode
        dst = float(int(44100 * (1.0 + 3.0 * rng.random())) * 7 + 1)
        rs = Resampler(src, dst, 2.0, 140.0, 0, dtype="float64")
        st = StreamResampler(rs, block_len=int(rng.integers(1024, 4096)))
        n = 16000
        x = lcg_uniform(trial, n)[None]
        out_len = rs.default_out_len(n)
        ref = np.asarray(rs.oneshot(x, out_len))
        pos = 0
        outs = []
        while pos < n:
            c = int(rng.integers(1, 5000))
            outs.append(st.process(x[:, pos : pos + c]))
            pos += c
        outs.append(st.flush(out_len))
        y = np.concatenate(outs, axis=1)
        assert y.shape == ref.shape, (trial, dst, y.shape, ref.shape)
        d = rms_db(y - ref)
        assert d < -290.0, f"trial {trial} dst={dst}: {d:.1f} dB"


class TestOneshotMaxChunk:
    """Resampler.oneshot(max_chunk=...) must match the whole-array
    program while keeping the device working set bounded (the streaming
    path underneath is content-identical)."""

    @pytest.mark.parametrize("cfg", [(44100, 96000), (96000, 44100),
                                     (44100, 96001)])
    def test_chunked_equals_whole(self, cfg):
        src, dst = cfg
        rs = Resampler(src, dst, 2.0, 150.0, 0, dtype="float64")
        n = 30000
        x = np.stack([lcg_uniform(11, n), lcg_uniform(12, n)])
        out_len = rs.default_out_len(n)
        y_whole = np.asarray(rs.oneshot(x, out_len))
        y_chunk = np.asarray(rs.oneshot(x, out_len, max_chunk=4096))
        assert y_chunk.shape == y_whole.shape
        assert rms_db(y_chunk - y_whole) < -250.0

    def test_chunked_short_input_passthrough(self):
        rs = Resampler(44100, 96000, 2.0, 150.0, 0, dtype="float64")
        x = lcg_uniform(3, 1000)
        y1 = np.asarray(rs.oneshot(x, max_chunk=4096))
        y0 = np.asarray(rs.oneshot(x))
        assert rms_db(y1 - y0) < -300.0


def test_stream_f32_poly_matches_oneshot_class():
    """f32 polynomial-plan streaming vs the whole-array oneshot: the
    stream tail evaluates the spline filters ON DEVICE from f32 tables
    + f32 t (the oneshot embeds host-f64-evaluated literals), so the
    agreement class is the f32 spline-eval rounding (~-131 dB measured,
    identical for the gather and the round-5 banded MXU serving tail) —
    pinned here because no f32 poly stream-vs-oneshot test existed
    before round 5."""
    rs = Resampler(44100, 96001, 2.0, 180.15, 0, dtype="float32")
    st = StreamResampler(rs, block_len=4096)
    n = 20000
    x = lcg_uniform(21, n).astype(np.float32)[None]
    out_len = rs.default_out_len(n)
    ref = np.asarray(rs.oneshot(x, out_len), dtype=np.float64)
    outs = [st.process(x[:, i : i + 3001]) for i in range(0, n, 3001)]
    outs.append(st.flush(out_len))
    y = np.concatenate(outs, axis=1)
    assert y.shape == ref.shape
    assert rms_db(y - ref) - rms_db(ref) < -125.0


def test_stream_guarantee_class():
    """Round 5: the df32 inter-stage carry applies WITHIN each streamed
    block's chain (blocks recompute from the carried raw f32 input, so
    block boundaries add no rounding) and the poly serving tail ships
    host-f64-evaluated spline values as bf16 slices, contracted in the
    error-free split form.  Streaming the guarantee config therefore
    holds: rational/HB plans the oneshot's ~-152 dB class (one final
    store rounding), poly plans ~-148 (the prefix->tail and
    tail->suffix seams still collapse once each)."""
    from r8brain_tpu.models.oracle import OracleResampler

    for (src, dst, atten, bound) in [
            (44100, 96000, 180.15, -150.0),
            (352800, 44100, 136.1, -150.0),
            (44100, 96001, 180.15, -146.0),
            (44100, 352800.3, 140.0, -146.0)]:
        n = 16000
        x32 = lcg_uniform(11, n).astype(np.float32)
        rs = Resampler(src, dst, 2.0, atten, 0, dtype="float32",
                       precision="high", fused=False,
                       conv_engine="ozaki", frac_engine="ozaki")
        out_len = rs.default_out_len(n)
        orc = OracleResampler(src, dst, 4096, 2.0, atten, 0).oneshot(
            x32.astype(np.float64), out_len)
        st = StreamResampler(rs, block_len=4096)
        outs = [st.process(x32[i : i + 3001][None])
                for i in range(0, n, 3001)]
        outs.append(st.flush(out_len))
        y = np.concatenate(outs, axis=1)
        d = rms_db(y - orc) - rms_db(orc)
        assert d < bound, (src, dst, d)


def test_stream_short_block_full_history():
    """Round-5 streaming-fuzzer find (-83 dB): with block_len < the
    chain's history span H, the first carried hist was left-zero-padded
    — silently switching the stream head to mid-stream (zero-prefixed)
    semantics, which differ from the fresh-start chain in the first
    ~span outputs at stop-band level (later stages read their
    predecessors' pre-start look-ahead spill that a fresh start never
    materializes; the f64 oracle shows the same head transient, so the
    stream's synthetic history was the bug).  The effective block now
    grows to cover H; pin the found config at the f32 class."""
    from r8brain_tpu.models.oracle import OracleResampler
    from r8brain_tpu.models.plan import make_plan

    src, dst, tb, atten = 401310.0, 44100.0, 4.034, 193.96
    plan = make_plan(src, dst, tb, atten, 0)
    n = 5000
    x32 = lcg_uniform(7005, n).astype(np.float32)
    out_len = int(np.floor(n * dst / src))
    orc = OracleResampler(src, dst, 4096, tb, atten, 0,
                          plan=plan).oneshot(x32.astype(np.float64),
                                             out_len)
    rs = Resampler(src, dst, tb, atten, 0, dtype="float32", plan=plan,
                   precision="fast")
    for block in (2048, 1024):
        st = StreamResampler(rs, block_len=block)
        assert st._core.L >= st._core.H
        outs = [st.process(x32[i : i + 1777][None])
                for i in range(0, n, 1777)]
        outs.append(st.flush(out_len))
        y = np.concatenate(outs, axis=1)
        d = rms_db(y - orc) - rms_db(orc)
        assert d < -125.0, (block, d)
