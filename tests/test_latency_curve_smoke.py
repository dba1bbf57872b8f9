"""Smoke-test tools/latency_curve.py's JSON contract on CPU.

The chip numbers land in BENCHMATRIX_r<N>.json per round; this guards
the tool itself (finite timings, block-geometry dedup, valid JSON) so a
regression can't silently corrupt the committed serving-latency
artifact (VERDICT r2 #7).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_latency_curve_cpu_smoke():
    env = os.environ.copy()
    env.update({
        "JAX_PLATFORMS": "cpu",
        "R8B_LBENCH_CHANNELS": "4",
        "R8B_LBENCH_BLOCKS": "256,1024,4096",
        "R8B_LBENCH_ITERS": "3",
    })
    r = subprocess.run([sys.executable, "tools/latency_curve.py"],
                       capture_output=True, text=True, env=env,
                       cwd=str(ROOT), timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip(), f"empty stdout; stderr: {r.stderr[-2000:]}"
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "stream_latency_curve"
    assert rec["points"], rec
    lens = [p["block_len"] for p in rec["points"]]
    assert len(set(lens)) == len(lens), f"duplicate block_len: {lens}"
    for p in rec["points"]:
        assert p["ms_per_block"] > 0 and p["block_ms"] > 0
        assert isinstance(p["realtime"], bool)
