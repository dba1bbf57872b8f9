"""Minimal WAV read/write (PCM 16/24/32-bit and float32/float64).

Counterpart of the reference bench tools' WAV layer: those depend on the
author's unpublished `libvox` support library (bench/r8bfreesrc.cpp:3-15
"pseudo-code" disclaimer), so this framework ships its own.  Stdlib-only;
samples are exchanged as float64 numpy arrays in [-1, 1), channel-major
[channels, frames] to match the resampler batch layout.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

__all__ = ["WavData", "read_wav", "write_wav"]

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


@dataclass
class WavData:
    rate: int
    data: np.ndarray  # [channels, frames] float64 in [-1, 1)
    bits: int  # source/target bit depth
    float_fmt: bool = False

    @property
    def channels(self) -> int:
        return int(self.data.shape[0])

    @property
    def frames(self) -> int:
        return int(self.data.shape[1])


def read_wav(path: str) -> WavData:
    with open(path, "rb") as f:
        riff, _size, wave_ = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave_ != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, csize = struct.unpack("<4sI", hdr)
            payload = f.read(csize + (csize & 1))[:csize]
            if cid == b"fmt ":
                fmt = payload
            elif cid == b"data":
                data = payload
        if fmt is None or data is None:
            raise ValueError(f"{path}: missing fmt/data chunk")
        (tag, ch, rate, _br, _ba, bits) = struct.unpack("<HHIIHH", fmt[:16])
        if tag == _WAVE_FORMAT_EXTENSIBLE:
            tag = struct.unpack("<H", fmt[24:26])[0]
        n = len(data) // (bits // 8) // ch
        if tag == _WAVE_FORMAT_IEEE_FLOAT:
            dt = np.float32 if bits == 32 else np.float64
            x = np.frombuffer(data, dtype="<" + np.dtype(dt).char,
                              count=n * ch).astype(np.float64)
            out = x.reshape(n, ch).T.copy()
            return WavData(rate, out, bits, True)
        if tag != _WAVE_FORMAT_PCM:
            raise ValueError(f"{path}: unsupported format tag {tag}")
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2", count=n * ch).astype(
                np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8,
                                count=n * ch * 3).reshape(-1, 3)
            ints = (raw[:, 0].astype(np.int32)
                    | (raw[:, 1].astype(np.int32) << 8)
                    | (raw[:, 2].astype(np.int32) << 16))
            ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
            x = ints.astype(np.float64) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4", count=n * ch).astype(
                np.float64) / 2147483648.0
        else:
            raise ValueError(f"{path}: unsupported PCM depth {bits}")
        return WavData(rate, x.reshape(n, ch).T.copy(), bits, False)


def write_wav(path: str, rate: int, data: np.ndarray, bits: int = 24,
              float_fmt: bool = False) -> None:
    """data: [channels, frames] float64 in [-1, 1)."""
    data = np.atleast_2d(np.asarray(data, dtype=np.float64))
    ch, n = data.shape
    inter = data.T.reshape(-1)  # interleaved
    if float_fmt:
        if bits == 32:
            payload = inter.astype("<f4").tobytes()
        elif bits == 64:
            payload = inter.astype("<f8").tobytes()
        else:
            raise ValueError(
                f"IEEE-float WAV supports bits=32 or 64, got {bits}")
        tag = _WAVE_FORMAT_IEEE_FLOAT
    else:
        tag = _WAVE_FORMAT_PCM
        if bits == 16:
            q = np.clip(np.round(inter * 32768.0), -32768, 32767)
            payload = q.astype("<i2").tobytes()
        elif bits == 24:
            q = np.clip(np.round(inter * 8388608.0), -8388608,
                        8388607).astype(np.int32)
            b = np.empty((q.shape[0], 3), dtype=np.uint8)
            b[:, 0] = q & 0xFF
            b[:, 1] = (q >> 8) & 0xFF
            b[:, 2] = (q >> 16) & 0xFF
            payload = b.tobytes()
        elif bits == 32:
            q = np.clip(np.round(inter * 2147483648.0), -2147483648,
                        2147483647)
            payload = q.astype("<i4").tobytes()
        else:
            raise ValueError(f"unsupported PCM depth {bits}")
    ba = ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ba, ba, bits)
    chunks = []
    if tag == _WAVE_FORMAT_IEEE_FLOAT:
        # non-PCM WAVE requires the cbSize extension field and a fact chunk
        fmt += struct.pack("<H", 0)
        chunks.append((b"fact", struct.pack("<I", n)))
    chunks.insert(0, (b"fmt ", fmt))
    chunks.append((b"data", payload))
    size = 4 + sum(8 + len(c) + (len(c) & 1) for _, c in chunks)
    with open(path, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", size, b"WAVE"))
        for cid, c in chunks:
            f.write(struct.pack("<4sI", cid, len(c)))
            f.write(c)
            if len(c) & 1:  # RIFF chunks are word-aligned
                f.write(b"\x00")
