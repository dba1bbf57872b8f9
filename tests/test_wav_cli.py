"""WAV I/O round-trips and the CLI converter end-to-end."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from r8brain_tpu.io.wavio import read_wav, write_wav

from .helpers import rms_db


@pytest.mark.parametrize("bits,float_fmt", [(16, False), (24, False),
                                            (32, False), (32, True),
                                            (64, True)])
def test_wav_roundtrip(tmp_path, bits, float_fmt):
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((2, 500)) * 0.3, -0.999, 0.999)
    p = tmp_path / "t.wav"
    write_wav(str(p), 48000, x, bits, float_fmt)
    w = read_wav(str(p))
    assert w.rate == 48000
    assert w.data.shape == x.shape
    tol = {16: 2 ** -15, 24: 2 ** -23, 32: 2 ** -22}.get(bits, 1e-12)
    if float_fmt:
        tol = 1e-6 if bits == 32 else 1e-15
    assert np.abs(w.data - x).max() <= tol


def test_cli_end_to_end(tmp_path):
    """Convert a sine WAV 44.1k -> 96k through the CLI (oracle precision —
    no device needed) and check the output spectrum."""
    rate = 44100
    n = 20000
    x = 0.7 * np.sin(2 * np.pi * 1000.0 * np.arange(n) / rate)
    inp = tmp_path / "in.wav"
    outp = tmp_path / "out.wav"
    write_wav(str(inp), rate, x[None], 24)
    r = subprocess.run(
        [sys.executable, "-m", "r8brain_tpu.cli", str(inp), str(outp),
         "96000", "--precision", "oracle", "--bits", "24", "--bench"],
        capture_output=True, text=True,
        cwd=str(Path(__file__).resolve().parent.parent))
    assert r.returncode == 0, r.stderr
    assert "Mrops" in r.stderr
    w = read_wav(str(outp))
    assert w.rate == 96000
    y = w.data[0]
    assert w.frames == int(np.floor(n * 96000 / rate))
    win = np.blackman(len(y))
    S = np.abs(np.fft.rfft(y * win))
    S /= S.max()
    f = np.fft.rfftfreq(len(y), 1 / 96000.0)
    assert abs(f[np.argmax(S)] - 1000.0) < 2.0
    # exclude the Blackman leakage skirt around the carrier; remaining
    # floor is 24-bit PCM quantization + resampler stop-band
    spur = 20 * np.log10(S[(f < 500) | (f > 1500)].max() + 1e-300)
    assert spur < -140.0


def test_cli_native_precision(tmp_path):
    """--precision native: the C++ engine + C++ designer path (no JAX).
    Output must match the CPU oracle within the golden class."""
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    rate = 44100
    n = 20000
    x = 0.7 * np.sin(2 * np.pi * 1000.0 * np.arange(n) / rate)
    inp = tmp_path / "in.wav"
    out_nat = tmp_path / "nat.wav"
    out_orc = tmp_path / "orc.wav"
    write_wav(str(inp), rate, x[None], 24)
    repo = str(Path(__file__).resolve().parent.parent)
    for prec, outp in (("native", out_nat), ("oracle", out_orc)):
        r = subprocess.run(
            [sys.executable, "-m", "r8brain_tpu.cli", str(inp), str(outp),
             "96000", "--precision", prec, "--float", "--bits", "32"],
            capture_output=True, text=True, cwd=repo)
        assert r.returncode == 0, r.stderr
    wn = read_wav(str(out_nat))
    wo = read_wav(str(out_orc))
    assert wn.rate == 96000 and wn.data.shape == wo.data.shape
    d = wn.data - wo.data
    rms = 20 * np.log10(np.sqrt(np.mean(d * d)) /
                        np.sqrt(np.mean(wo.data ** 2)) + 1e-300)
    # f32 WAV quantization floor; the engines themselves agree to -280 dB
    assert rms < -135.0


def test_cli_stream_mode(tmp_path):
    """--stream converts through the push-mode engine (memory-bounded) and
    matches the oneshot conversion."""
    rate, n = 44100, 30000
    x = 0.6 * np.sin(2 * np.pi * 700.0 * np.arange(n) / rate)
    inp = tmp_path / "in.wav"
    write_wav(str(inp), rate, x[None], 24)
    outs = {}
    for label, extra in (("oneshot", []), ("stream", ["--stream"])):
        outp = tmp_path / f"out_{label}.wav"
        r = subprocess.run(
            [sys.executable, "-m", "r8brain_tpu.cli", str(inp), str(outp),
             "96000", "--precision", "fast", "--platform", "cpu", *extra],
            capture_output=True, text=True,
            cwd=str(Path(__file__).resolve().parent.parent))
        assert r.returncode == 0, r.stderr[-1500:]
        outs[label] = read_wav(str(outp)).data
    assert outs["oneshot"].shape == outs["stream"].shape
    d = outs["oneshot"] - outs["stream"]
    assert rms_db(d) < -120.0  # 24-bit quantization + framing noise


@pytest.mark.parametrize("bits,float_fmt", [(16, False), (24, False),
                                            (32, True)])
def test_wav_streaming_io_roundtrip(tmp_path, bits, float_fmt):
    """WavWriter written block-by-block == write_wav; WavReader read
    block-by-block == read_wav."""
    from r8brain_tpu.io.wavio import WavReader, WavWriter
    rng = np.random.default_rng(3)
    x = np.clip(rng.standard_normal((3, 1777)) * 0.3, -0.999, 0.999)
    p1 = tmp_path / "whole.wav"
    p2 = tmp_path / "stream.wav"
    write_wav(str(p1), 44100, x, bits, float_fmt)
    with WavWriter(str(p2), 44100, 3, bits, float_fmt) as wr:
        pos = 0
        while pos < x.shape[1]:
            n = min(313, x.shape[1] - pos)
            wr.write(x[:, pos : pos + n])
            pos += n
    assert p1.read_bytes() == p2.read_bytes()
    with WavReader(str(p1)) as rd:
        assert (rd.rate, rd.channels, rd.bits, rd.frames) == \
            (44100, 3, bits, 1777)
        blocks = []
        while True:
            b = rd.read(400)
            if b.shape[1] == 0:
                break
            blocks.append(b)
    y = np.concatenate(blocks, axis=1)
    ref = read_wav(str(p1)).data
    assert np.array_equal(y, ref)


def test_cli_stream_matches_oneshot(tmp_path):
    """--stream (incremental WAV I/O + push-mode engine) produces the
    same file content class as the whole-file path."""
    from r8brain_tpu.cli import main
    from r8brain_tpu.io.wavio import read_wav, write_wav
    rng = np.random.default_rng(5)
    x = np.clip(rng.standard_normal((2, 30000)) * 0.3, -0.999, 0.999)
    src = tmp_path / "in.wav"
    write_wav(str(src), 44100, x, 24)
    a = tmp_path / "whole.wav"
    b = tmp_path / "stream.wav"
    for out, flags in ((a, []), (b, ["--stream"])):
        rc = main([str(src), str(out), "96000", "--platform", "cpu",
                   "--precision", "fast", "--atten", "140"] + flags)
        assert rc == 0
    wa = read_wav(str(a))
    wb = read_wav(str(b))
    assert wa.data.shape == wb.data.shape
    assert rms_db(wa.data - wb.data) < -135.0


class TestMalformedWav:
    """read_wav / WavReader must reject corrupted files with ValueError
    (not struct.error / ZeroDivisionError / numpy buffer errors) — the
    WAV parser is this framework's own untrusted-input surface, like the
    native engine's plan blobs."""

    def _cases(self, tmp_path):
        import struct

        def wav(fmt_payload, data=b"\x00" * 64):
            out = b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            out += b"fmt " + struct.pack("<I", len(fmt_payload)) \
                + fmt_payload + (b"\x00" * (len(fmt_payload) & 1))
            out += b"data" + struct.pack("<I", len(data)) + data
            return out

        good = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
        return {
            "truncated_header": b"RIFF\x00\x00",
            "not_wave": b"RIFX" + b"\x00" * 20,
            "short_fmt": wav(good[:10]),
            "zero_channels": wav(struct.pack("<HHIIHH", 1, 0, 44100,
                                             0, 0, 16)),
            "zero_bits": wav(struct.pack("<HHIIHH", 1, 1, 44100, 0, 0, 0)),
            "odd_bits": wav(struct.pack("<HHIIHH", 1, 1, 44100, 0, 0, 12)),
            "float_16bit": wav(struct.pack("<HHIIHH", 3, 1, 44100, 0, 0,
                                           16)),
            "short_extensible": wav(struct.pack("<HHIIHH", 0xFFFE, 1,
                                                44100, 0, 0, 16)),
            "zero_rate": wav(struct.pack("<HHIIHH", 1, 1, 0, 0, 0, 16)),
            "pcm_64bit": wav(struct.pack("<HHIIHH", 1, 1, 44100, 0, 0,
                                         64)),
        }

    def test_read_wav_rejects(self, tmp_path):
        from r8brain_tpu.io.wavio import read_wav

        for name, blob in self._cases(tmp_path).items():
            p = tmp_path / f"{name}.wav"
            p.write_bytes(blob)
            with pytest.raises(ValueError):
                read_wav(str(p))

    def test_wavreader_rejects(self, tmp_path):
        from r8brain_tpu.io.wavio import WavReader

        for name, blob in self._cases(tmp_path).items():
            p = tmp_path / f"{name}.wav"
            p.write_bytes(blob)
            with pytest.raises(ValueError):
                WavReader(str(p))
