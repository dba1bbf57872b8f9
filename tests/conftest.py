"""Test configuration.

Tests run JAX on CPU with 8 virtual devices so the multi-chip sharding
paths (channel + time-block sharding with halo collectives) are exercised
without TPU hardware, mirroring the reference's test strategy of running
everything on commodity hardware (SURVEY.md §4).  Numerics of the f32 /
double-float compute paths are identical between XLA:CPU and XLA:TPU for
the IEEE ops used, so precision assertions made here carry to TPU (and are
re-measured on hardware by bench.py).
"""

import os
import sys
from pathlib import Path

# Force CPU: the ambient environment may point JAX at a remote TPU
# (JAX_PLATFORMS=axon via a sitecustomize that also sets the jax config
# option, which overrides the env var) — never use it for the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup, before any test imports)

jax.config.update("jax_platforms", "cpu")
# x64 so the float64 exactness tests (TPU path vs oracle) work; the float32
# compute paths pass explicit dtypes everywhere and are unaffected.
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
