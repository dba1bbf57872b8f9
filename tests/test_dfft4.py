"""Radix-4 real-packed df32-FFT kernel (ops/pallas_dfft4.py) and the
real-packed path of the radix-2 kernel (ops/pallas_dfft.py), interpret
mode.  Chip throughput is measured by the bench harness; these pin the
math: the host stage model is a permuted DFT, the kernels perform exact
circular convolution at the df32 accuracy class, packing changes nothing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from r8brain_tpu.ops.pallas_dfft import (HAVE_PALLAS, DfFFTConvPlan,
                                         df_ols_convolve_pallas)
from r8brain_tpu.ops.pallas_dfft4 import (DfFFTConvPlan4, _stage_plan,
                                          df_ols_convolve_pallas4,
                                          host_forward_model)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="no pallas")


def _ref_conv(frames, H, n):
    return np.fft.ifft(np.fft.fft(frames.astype(np.float64), axis=-1)
                       * H[None, None, :] * n, axis=-1).real


@pytest.mark.parametrize("n", [256, 512, 1024])
def test_host_model_is_permuted_dft(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    X = host_forward_model(x, n)
    e1 = np.zeros(n, complex)
    e1[1] = 1.0
    sigma = np.mod(np.round(-np.angle(host_forward_model(e1, n)) * n
                            / (2 * np.pi)), n).astype(int)
    assert len(set(sigma)) == n
    err = np.abs(X - np.fft.fft(x)[sigma]).max() / np.abs(X).max()
    assert err < 1e-12


@pytest.mark.parametrize("n", [256, 512])
def test_radix4_packed_convolution(n):
    rng = np.random.default_rng(1)
    k = rng.standard_normal(n // 4)
    H = np.fft.fft(k, n) / n
    plan = DfFFTConvPlan4(n, H)
    frames = rng.standard_normal((2, 5, n)).astype(np.float32)  # odd F
    y = np.asarray(df_ols_convolve_pallas4(jnp.asarray(frames), plan,
                                           T2=2, interpret=True),
                   np.float64)
    ref = _ref_conv(frames, H, n)
    rel = 10 * np.log10(np.mean((y - ref) ** 2) / np.mean(ref**2))
    assert rel < -135.0, rel


@pytest.mark.parametrize("n", [256, 512])
def test_radix2_packed_matches_unpacked(n):
    rng = np.random.default_rng(2)
    k = rng.standard_normal(n // 4)
    H = np.fft.fft(k, n) / n
    plan = DfFFTConvPlan(n, H)
    frames = rng.standard_normal((3, 3, n)).astype(np.float32)
    ref = _ref_conv(frames, H, n)
    for pack in (False, True):
        y = np.asarray(df_ols_convolve_pallas(
            jnp.asarray(frames), plan, T=2, interpret=True, pack=pack),
            np.float64)
        rel = 10 * np.log10(np.mean((y - ref) ** 2) / np.mean(ref**2))
        assert rel < -140.0, (pack, rel)


def test_stage_plan_roll_legality():
    """No radix-4 stage may need a roll crossing the row boundary
    (4h | 128 for lane stages, h a row multiple for row stages)."""
    for bits in range(8, 15):
        n = 1 << bits
        for r, h in _stage_plan(n):
            if r == 4:
                assert h >= 128 or (4 * h) <= 128, (n, h)
            assert h != 64 or r == 2, (n, h)
