"""Two-process jax.distributed CPU run — the multi-host (DCN) stand-in.

The reference has no distributed layer to mirror (SURVEY.md §2); the
TPU framework's invented one (parallel/sharding.py) is validated here
across a REAL process boundary: two OS processes, each owning 2 virtual
CPU devices, form one 4-device global mesh via jax.distributed + Gloo.
Collectives that cross the process boundary take the same code path
XLA uses for multi-host DCN traffic.  Run both mesh orientations so the
time-halo ppermutes cross the boundary in one of them.

Real >=2-host ICI/DCN timing requires hardware this environment lacks
(one tunneled chip); this test pins down correctness, BASELINE.md tracks
the scaling-efficiency target.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

_WORKER = Path(__file__).resolve().parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_parity():
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, str(_WORKER), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} PASS" in out, out[-3000:]
