"""Summarize a jax.profiler xplane trace without TensorFlow deps.

Minimal hand-rolled protobuf walker for the tsl XSpace/XPlane format
(tensorflow/tsl/profiler/protobuf/xplane.proto) — the sandbox has no
xplane_pb2 module, and the per-op device-time breakdown is the data every
perf decision in NEXT.md rests on.

Usage: python tools/profile_summary.py <trace.xplane.pb> [--top 30]
Prints per-op-name total device time (TensorCore plane), grouped, plus a
coarse bucket rollup (dots / copies / fusions / other).
"""

from __future__ import annotations

import argparse
import re
from collections import defaultdict


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    """Yield (field_no, wire_type, value) over a protobuf message body."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(pbuf):
    name = ""
    ev_meta = {}
    lines = []
    for fno, wt, v in _fields(pbuf):
        if fno == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 4 and wt == 2:  # map<int64, XEventMetadata>
            k = None
            mname = None
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == 0:
                    k = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    mid = None
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 2 and w3 == 2:
                            mname = v3.decode("utf-8", "replace")
                    if k is None:
                        k = mid
            if k is not None:
                ev_meta[k] = mname or ""
        elif fno == 3 and wt == 2:  # XLine
            evs = []
            lname = ""
            for f2, w2, v2 in _fields(v):
                if f2 == 2 and w2 == 2:
                    lname = v2.decode("utf-8", "replace")
                elif f2 == 4 and w2 == 2:  # XEvent
                    mid = dur = 0
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    evs.append((mid, dur))
            lines.append((lname, evs))
    return name, ev_meta, lines


BUCKETS = [
    ("dot", re.compile(r"dot_general|convolution")),
    ("copy/relayout", re.compile(r"copy|transpose|all-to-all")),
    ("pad", re.compile(r"(^|/)pad|_pad")),
    ("slice/dus", re.compile(r"slice|dynamic-update")),
    ("reshape", re.compile(r"reshape|bitcast")),
    ("custom-call", re.compile(r"custom-call|tpu_custom_call|Mosaic")),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default="TensorCore",
                    help="substring of the plane name to summarize")
    args = ap.parse_args(argv)
    buf = open(args.trace, "rb").read()
    planes = [v for fno, wt, v in _fields(buf) if fno == 1 and wt == 2]
    tot_by_name = defaultdict(int)
    plane_names = []
    for p in planes:
        name, meta, lines = parse_plane(p)
        plane_names.append(name)
        if args.plane.lower() not in name.lower():
            continue
        for lname, evs in lines:
            # XLA op lines carry per-op events; step lines duplicate them
            if "step" in lname.lower():
                continue
            for mid, dur in evs:
                tot_by_name[meta.get(mid, f"#{mid}")] += dur
    if not tot_by_name:
        print("planes found:", plane_names)
        return 1
    total = sum(tot_by_name.values())
    print(f"total device time: {total/1e9:.3f} ms over "
          f"{len(tot_by_name)} distinct ops")
    buckets = defaultdict(int)
    for n, d in tot_by_name.items():
        for bname, rx in BUCKETS:
            if rx.search(n):
                buckets[bname] += d
                break
        else:
            buckets["other"] += d
    for bname, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {bname:15s} {d/1e9:8.3f} ms  {100*d/total:5.1f}%")
    print(f"top {args.top} ops:")
    for n, d in sorted(tot_by_name.items(), key=lambda kv: -kv[1])[
            : args.top]:
        print(f"  {d/1e9:8.3f} ms  {n[:110]}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
