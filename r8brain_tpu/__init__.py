"""r8brain_tpu — TPU-native professional sample-rate conversion framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
`avaneev/r8brain-free-src` (mounted read-only at /root/reference during
development): Kaiser-windowed sinc FIR design, FFT overlap-save block
convolution with whole-number resampling, cascaded half-band 2X stages, and
polynomial-interpolated fractional-delay sinc banks — re-architected for
batched multi-channel execution on TPU device meshes.

Public API:
  * Resampler / Resampler16 / Resampler16IR / Resampler24 — device-batched
    streaming converters (models.resampler; TPU path).
  * OracleResampler — CPU float64 reference executor (models.oracle),
    sample-exact vs the C++ reference.
  * make_plan — stage planner (models.plan).
  * resample_fn — pure functional transform for composition with the
    user's own jit/vmap/grad/pjit programs (functional).
  * design.* — host-side filter design (sinc, lpfilter, minphase, halfband,
    fracbank).
"""

from .design.lpfilter import LINEAR_PHASE, MIN_PHASE, build_lp_filter, get_lp_filter
from .functional import resample_fn
from .models.oracle import OracleResampler
from .models.plan import Plan, make_plan
from .models.resampler import (Resampler, Resampler16, Resampler16IR,
                               Resampler24)
from .models.stream import StreamResampler

__version__ = "0.1.0"

__all__ = [
    "LINEAR_PHASE",
    "MIN_PHASE",
    "build_lp_filter",
    "get_lp_filter",
    "OracleResampler",
    "Plan",
    "make_plan",
    "Resampler",
    "Resampler16",
    "Resampler16IR",
    "Resampler24",
    "StreamResampler",
    "resample_fn",
    "__version__",
]
