"""Fast-tier pins of the differential fuzzer's worst configs.

The 200-trial slow-tier sweep (tests/test_differential_slow.py,
SLOWTIER_r4.log) found these worst pairs; pinning them here puts a
cheap CI guard on the thinnest margins.  Round 5's df32 inter-stage
carry + ozaki-product poly operator moved the guarantee class's worst
(poly-downsampling, was -142.4 dB — dominated by per-seam f32 store
roundings) to -152.4 dB; the oz bounds here are tightened to the new
-150 dB class accordingly (the residual floor is the single final f32
store rounding).
"""

import numpy as np
import pytest

from r8brain_tpu.models.oracle import OracleResampler
from r8brain_tpu.models.plan import make_plan
from r8brain_tpu.models.resampler import Resampler

from .helpers import lcg_uniform, rms_db

WORST = [
    # (label, src, dst, tb, atten, executor, bound)
    ("oz_poly_down", 431181.83, 44100.0, 9.625, 139.53, "oz", -150.0),
    ("oz_hb_down", 80039.87, 44100.0, 3.327, 161.0, "oz", -150.0),
    ("oz_hb_8x", 352800.0, 44100.0, 3.951, 136.1, "oz", -150.0),
    ("f32_down_tb08", 44100.0, 33075.0, 0.791, 127.59, "f32", -115.0),
]


@pytest.mark.parametrize("cfg", WORST, ids=[c[0] for c in WORST])
def test_fuzzer_worst_config_pinned(cfg):
    _label, src, dst, tb, atten, ex, bound = cfg
    plan = make_plan(src, dst, tb, atten, 0)
    n = 3000
    x32 = lcg_uniform(7176, n).astype(np.float32)
    out_len = int(np.floor(n * dst / src))
    ref = OracleResampler(src, dst, 4096, tb, atten, 0,
                          plan=plan).oneshot(x32.astype(np.float64),
                                             out_len)
    if ex == "oz":
        rs = Resampler(src, dst, tb, atten, 0, dtype="float32",
                       plan=plan, precision="high", fused=False,
                       conv_engine="ozaki", frac_engine="ozaki")
    else:
        rs = Resampler(src, dst, tb, atten, 0, dtype="float32",
                       plan=plan, precision="fast")
    y = np.asarray(rs.oneshot(x32, out_len), dtype=np.float64)
    d = rms_db(y - ref) - rms_db(ref)
    assert d < bound, f"{d:.1f} dB"
