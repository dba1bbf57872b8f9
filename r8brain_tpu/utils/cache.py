"""Persistent JAX compilation cache setup.

Remote-TPU compiles take minutes per program; the persistent cache lets
repeated invocations (benchmarks, the round driver, CLI runs) reuse
compiled executables.  Shared by bench.py and __graft_entry__.py.
"""

from __future__ import annotations

import os
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent


def honor_jax_platforms_env() -> None:
    """Make an explicit JAX_PLATFORMS env request win.

    A sitecustomize on some hosts pins jax_platforms="axon,cpu" at the
    CONFIG level, which silently overrides the JAX_PLATFORMS env var — an
    explicit env request (e.g. JAX_PLATFORMS=cpu for smoke runs or the
    driver's virtual-mesh dryrun) must win, or backend init hangs on an
    unreachable tunnel.  Shared by bench.py and __graft_entry__.py."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def enable_compilation_cache(default_dir: str | None = None) -> None:
    import jax

    cache_dir = os.environ.get(
        "R8B_JAX_CACHE",
        default_dir or str(_REPO_ROOT / ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options
