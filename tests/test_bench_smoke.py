"""Smoke test for bench.py — the driver runs it on chip every round, so a
bit-rotted bench (import error, env-knob regression, broken JSON) would
silently cost the round's benchmark record.  Runs the real script in a
subprocess on CPU with a tiny config and validates the JSON contract."""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_bench_cpu_smoke():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        R8B_BENCH_CHANNELS="4",
        R8B_BENCH_SECONDS="0.05",
        R8B_BENCH_ITERS="2",
        R8B_BENCH_REPEATS="0",  # must clamp to 1, not crash
    )
    r = subprocess.run([sys.executable, str(ROOT / "bench.py")],
                       capture_output=True, text=True, env=env,
                       cwd=str(ROOT), timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip(), f"bench.py exited 0 with empty stdout; " \
                             f"stderr: {r.stderr[-2000:]}"
    line = r.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "resample_44k_to_96k_24bit_throughput"
    assert rec["unit"] == "Mrops"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["exec_value"] > 0 and rec["exec_vs_baseline"] > 0
