"""Smoke test for tools/bench_stream.py (the serving-throughput bench):
the steady-state scan must run and emit a sane JSON line on CPU."""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_bench_stream_smoke():
    env = dict(os.environ, R8B_SBENCH_CHANNELS="2", R8B_SBENCH_BLOCKS="3",
               JAX_PLATFORMS="cpu")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy; runpy.run_path(r'%s', run_name='__main__')"
        % (ROOT / "tools" / "bench_stream.py"))
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["unit"] == "Mrops" and d["value"] > 0
    assert d["realtime_streams_per_chip"] > 0
