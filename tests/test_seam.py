"""Valid-prefix seam protocol (ops/stages.py apply_v) bit-exactness.

The jitted chain hands RAW (unsliced) framing buffers between stages
(models/resampler.py _chain); the claim is not "close" but BIT-IDENTICAL
to the sliced per-stage chain: a banded operator's nonzero rows for
every kept output read only the valid prefix, so surplus columns feed
only outputs the next seam discards.  Pinned here over every plan shape
the protocol touches (conv->poly->conv, conv->frac, HB cascades,
downsampling) and both the default and the env-gated variants.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from r8brain_tpu.models.resampler import Resampler

from .helpers import lcg_uniform

PLANS = [
    ("poly_96001", 44100, 96001, 180.15),
    ("flagship", 44100, 96000, 180.15),
    ("down_96k", 96000, 44100, 180.15),
    ("up_48k", 44100, 48000, 140.0),
    ("x8_down_hb", 352800, 44100, 136.1),
    ("poly_108001", 44100, 108001, 160.0),
]


def _run_pair(src, dst, atten, env=None):
    old = {}
    env = env or {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        rs = Resampler(src, dst, 2.0, atten, 0, dtype="float32",
                       fused=False)
        n = 6000
        x = jnp.asarray(lcg_uniform(3, n).astype(np.float32))[None, :]
        out_len = int(np.floor(n * dst / src))
        T = max(n, rs.in_len_for_out(out_len))
        xp = jnp.pad(x, ((0, 0), (0, T - n)))
        y_seam = np.asarray(rs._chain(xp))[:, :out_len]
        z = xp
        for e in rs.execs:
            z = e.apply(z)
        y_plain = np.asarray(z)[:, :out_len]
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return y_seam, y_plain


@pytest.mark.parametrize("cfg", PLANS, ids=[c[0] for c in PLANS])
def test_seam_chain_bit_identical(cfg):
    _label, src, dst, atten = cfg
    y_seam, y_plain = _run_pair(src, dst, atten)
    assert np.array_equal(y_seam, y_plain)


@pytest.mark.parametrize("env", [
    {"R8BT_SEAM_MINOUT": "1"},
    {"R8BT_POLY_WIDE": "1"},
    {"R8BT_SEAM_MINOUT": "1", "R8BT_POLY_WIDE": "1"},
], ids=["minout", "wide", "minout_wide"])
def test_seam_env_variants_bit_identical(env):
    """The env-gated (measured-null, kept for future hardware) variants
    must stay bit-exact too: overproduced blocks/groups and widened
    bands only add DISCARDED outputs."""
    y_seam, y_plain = _run_pair(44100, 96001, 180.15, env)
    assert np.array_equal(y_seam, y_plain)


def test_framed_pallas_matches_xla_segments():
    """ops/pallas_framed.py (opt-in R8BT_FRAMED_PALLAS kernel) must
    reproduce the XLA segmented framed matmul exactly (interpret mode;
    on TPU the same jnp.dot/HIGHEST contraction runs on the MXU)."""
    from r8brain_tpu.ops.pallas_framed import framed_matmul_pallas
    from r8brain_tpu.ops.stages import _framed_matmul

    rng = np.random.default_rng(0)
    for (C, nb, hop, L_f, K) in [(3, 7, 128, 300, 256),
                                 (2, 5, 256, 704, 512),
                                 (2, 12, 384, 900, 256)]:
        xp = jnp.asarray(rng.standard_normal((C, (nb + 16) * hop)),
                         dtype=jnp.float32)
        T = jnp.asarray(rng.standard_normal((L_f, K)), dtype=jnp.float32)
        ref = np.asarray(_framed_matmul(xp, T, nb, hop))
        got = np.asarray(framed_matmul_pallas(xp, T, nb, hop,
                                              interpret=True))
        assert np.array_equal(got, ref), (C, nb, hop, L_f, K)
