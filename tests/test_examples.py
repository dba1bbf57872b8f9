"""Examples must run end-to-end on CPU (example.cpp / bench/sacd.cpp
equivalents)."""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize("args", [
    ("examples/basic.py", "--cpu"),
    ("examples/sacd.py", "--cpu", "--seconds", "0.06"),
    ("examples/serving.py", "--cpu", "--channels", "8", "--blocks", "2"),
    ("examples/native_deploy.py",),
    ("examples/differentiable.py", "--cpu", "--iters", "200"),
], ids=["basic", "sacd", "serving", "native_deploy", "differentiable"])
def test_example_runs(args):
    r = subprocess.run([sys.executable, *args], capture_output=True,
                       text=True, cwd=str(ROOT), timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip()
