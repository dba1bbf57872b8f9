"""Four-step df32-FFT kernel (ops/pallas_dfft5.py), interpret mode.

The v3 guarantee-engine kernel restructures the transform as a four-step
N = A x 128 decomposition so almost every butterfly level is a direct
tile-aligned row slice instead of a roll+select network.  These tests pin:
the numpy host pipeline is an exact (permuted-layout) DFT, the kernel
performs circular convolution at the df32 accuracy class, and the ConvExec
engine string reaches it (with the documented fallback off-range).
Chip throughput is measured by the bench harness.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from r8brain_tpu.ops.pallas_dfft import HAVE_PALLAS
from r8brain_tpu.ops.pallas_dfft5 import (DfFFTConvPlan5, _part_plan,
                                          _recover_freq_map,
                                          df_ols_convolve_pallas5,
                                          host_pipeline_forward,
                                          host_pipeline_inverse,
                                          supported_n)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="no pallas")

LANES = 128


def _kidx(n):
    A = n // LANES
    fA = _recover_freq_map(_part_plan(A), A)
    fB = _recover_freq_map(_part_plan(LANES), LANES)
    return (fA[None, :] + A * fB[:, None]) % n


@pytest.mark.parametrize("n", [1024, 4096, 8192])
def test_host_pipeline_is_permuted_dft(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    Y = host_pipeline_forward(x, n)
    ref = np.fft.fft(x)[_kidx(n)]
    assert np.abs(Y - ref).max() / np.abs(ref).max() < 1e-12
    xr = host_pipeline_inverse(Y.copy(), n) / n
    assert np.abs(xr - x).max() < 1e-11


# NOTE: there is deliberately no interpret-mode test of the kernel body:
# XLA:CPU takes tens of minutes to compile the ~50k-op butterfly graph
# (the TPU backend compiles and runs it in seconds).  The kernel's Mosaic
# lowering is audited on hardware by `tools/chip_accuracy.py --configs
# hp_dfft_pallas5` and the bench harness; everything host-checkable (the
# transform math, the stacked-cell layout, framing/packing/padding, the
# ConvExec engine wiring) is pinned below against the exact numpy model.


def _host_convolve5(x, plan, interpret, transpose_mode):
    """Numpy stand-in for the kernel body: exact forward pipeline +
    permuted spectrum multiply + inverse, same interleaved-frame
    [cells, 2*T2, A, 128] blocking as the kernel."""
    import numpy as _np

    T2, A, n = plan.T2, plan.A, plan.n
    fA = _recover_freq_map(plan.planA, A)
    fB = _recover_freq_map(plan.planB, LANES)
    a_of_row = _np.arange(LANES) % A
    H = (plan.h_tw[0] + plan.h_tw[3]) + 1j * (plan.h_tw[4] + plan.h_tw[7])
    x = _np.asarray(x, _np.float64).reshape(-1, n)
    out = _np.empty_like(x)
    for c0 in range(0, x.shape[0], 2 * T2):
        z = x[c0 : c0 + 2 * T2 : 2] + 1j * x[c0 + 1 : c0 + 2 * T2 : 2]
        Y = _np.stack([host_pipeline_forward(z[t], n) for t in range(T2)])
        # stacked-cell layout: lane t2*A + a of the [128,128] cell
        Yc = _np.concatenate(list(Y), axis=1) * H * n
        for t in range(T2):
            w = host_pipeline_inverse(Yc[:, t * A : (t + 1) * A], n) / n
            out[c0 + 2 * t] = w.real
            out[c0 + 2 * t + 1] = w.imag
    return jnp.asarray(out.reshape(-1, A, LANES), jnp.float32)


def test_wrapper_packing_and_layout(monkeypatch):
    """df_ols_convolve_pallas5's framing, padding, real-packing, and the
    plan's stacked-cell spectrum layout, with the kernel body replaced by
    the exact host model (fast on CPU; the kernel itself is pinned by the
    slow-tier interpret test and the chip audit)."""
    from r8brain_tpu.ops import pallas_dfft5 as mod

    monkeypatch.setattr(
        mod, "_convolve5",
        lambda x, plan, interpret, transpose_mode:
        _host_convolve5(x, plan, interpret, transpose_mode))
    rng = np.random.default_rng(4)
    n = 1024
    k = rng.standard_normal(192)
    H = np.fft.fft(k, n) / n
    plan = DfFFTConvPlan5(n, H)
    for F in (3, 64):  # odd F exercises the pad path
        frames = rng.standard_normal((2, F, n)).astype(np.float32)
        y = np.asarray(mod.df_ols_convolve_pallas5(jnp.asarray(frames),
                                                   plan), np.float64)
        ref = np.fft.ifft(np.fft.fft(frames.astype(np.float64), axis=-1)
                          * H[None, None, :] * n, axis=-1).real
        rel = 10 * np.log10(np.mean((y - ref) ** 2) / np.mean(ref**2))
        assert rel < -135.0, (F, rel)


def test_supported_range():
    assert [n for n in (256, 512, 1024, 8192, 16384, 32768)
            if supported_n(n)] == [1024, 8192, 16384]


def _host_convolve5_framed(u_p, plan, n_frames, interpret, transpose_mode):
    """Numpy stand-in for the framed kernel: overlap-save with hop=3n/4,
    head p_pad=n/4, valid-only output — direct circular convolution per
    frame (the transform layout itself is pinned by _host_convolve5)."""
    import numpy as _np

    n, hop, p_pad, A = plan.n, plan.hop, plan.p_pad, plan.A
    G = 2 * plan.T2
    n_cells = -(-n_frames // G)
    L_need = n_cells * G * hop + p_pad
    u = _np.asarray(u_p, _np.float64)
    if u.shape[1] < L_need:
        u = _np.pad(u, ((0, 0), (0, L_need - u.shape[1])))
    # natural-order spectrum from the baked permuted planes
    fA = _recover_freq_map(plan.planA, A)
    fB = _recover_freq_map(plan.planB, LANES)
    a_of_row = _np.arange(LANES) % A
    k_idx = (fA[a_of_row][None, :] + A * fB[:, None]) % n
    Hs = ((plan.h_tw[0] + plan.h_tw[3])
          + 1j * (plan.h_tw[4] + plan.h_tw[7]))
    H_nat = _np.zeros(n, complex)
    H_nat[k_idx.ravel()] = Hs.ravel()
    out = _np.zeros((u.shape[0], n_cells * G * hop), _np.float32)
    for f in range(n_cells * G):
        fr = u[:, f * hop : f * hop + n]
        w = _np.fft.ifft(_np.fft.fft(fr, axis=-1) * H_nat[None, :] * n,
                         axis=-1).real
        out[:, f * hop : (f + 1) * hop] = w[:, p_pad:]
    return jnp.asarray(out)


def test_framed_wrapper_is_valid_ols(monkeypatch):
    """df_ols_convolve_pallas5_framed (kernel stubbed with the host
    model) == direct linear convolution of the unpadded signal."""
    from r8brain_tpu.ops import pallas_dfft5 as mod

    monkeypatch.setattr(
        mod, "_convolve5_framed",
        lambda u, plan, n_frames, interpret, transpose_mode:
        _host_convolve5_framed(u, plan, n_frames, interpret,
                               transpose_mode))
    rng = np.random.default_rng(5)
    n = 4096  # smallest framed-supported size
    assert mod.framed_supported(n) and not mod.framed_supported(2048)
    K = 700
    k = rng.standard_normal(K)
    plan = DfFFTConvPlan5(n, np.fft.fft(k, n) / n)
    sig = rng.standard_normal((2, 9000))
    u_p = jnp.asarray(np.pad(sig, ((0, 0), (plan.p_pad, 0))), jnp.float32)
    n_frames = -(-9000 // plan.hop)
    w = np.asarray(mod.df_ols_convolve_pallas5_framed(u_p, plan, n_frames),
                   np.float64)[:, : 9000 - K]
    ref = np.stack([np.convolve(sig[c], k)[: 9000 - K] for c in range(2)])
    rel = 10 * np.log10(np.mean((w - ref) ** 2) / np.mean(ref**2))
    assert rel < -135.0, rel


def _host_convolve5_framed_poly(x_p, plan, n_frames, interpret,
                                transpose_mode):
    """Numpy stand-in for the polyphase framed kernel: per-frame circular
    convolution with BOTH baked spectra, valid-only polyphase output."""
    import numpy as _np

    n, hop, p_pad, A = plan.n, plan.hop, plan.p_pad, plan.A
    G = 2 * plan.T2
    n_cells = -(-n_frames // G)
    L_need = n_cells * G * hop + p_pad
    u = _np.asarray(x_p, _np.float64)
    if u.shape[1] < L_need:
        u = _np.pad(u, ((0, 0), (0, L_need - u.shape[1])))
    fA = _recover_freq_map(plan.planA, A)
    fB = _recover_freq_map(plan.planB, LANES)
    a_of_row = _np.arange(LANES) % A
    k_idx = (fA[a_of_row][None, :] + A * fB[:, None]) % n
    out = _np.zeros((u.shape[0], 2, n_cells * G * hop), _np.float32)
    for p, planes in enumerate((plan.h_tw, plan.h_tw2)):
        Hs = (planes[0] + planes[3]) + 1j * (planes[4] + planes[7])
        H_nat = _np.zeros(n, complex)
        H_nat[k_idx.ravel()] = Hs.ravel()
        for f in range(n_cells * G):
            fr = u[:, f * hop : f * hop + n]
            w = _np.fft.ifft(_np.fft.fft(fr, axis=-1) * H_nat[None, :] * n,
                             axis=-1).real
            out[:, p, f * hop : (f + 1) * hop] = w[:, p_pad:]
    return jnp.asarray(out)


def test_framed_poly_wrapper_is_stuffed_conv(monkeypatch):
    """Polyphase wrapper (kernel stubbed): interleaved output == linear
    convolution of the zero-stuffed signal with the full kernel."""
    from r8brain_tpu.ops import pallas_dfft5 as mod

    monkeypatch.setattr(
        mod, "_convolve5_framed_poly",
        lambda x, plan, n_frames, interpret, transpose_mode:
        _host_convolve5_framed_poly(x, plan, n_frames, interpret,
                                    transpose_mode))
    rng = np.random.default_rng(6)
    n = 4096
    K = 1500
    k = rng.standard_normal(K)
    plan = DfFFTConvPlan5(n, np.fft.fft(k[0::2], n) / n,
                          np.fft.fft(k[1::2], n) / n)
    sig = rng.standard_normal((2, 7000))
    x_p = jnp.asarray(np.pad(sig, ((0, 0), (plan.p_pad, 0))), jnp.float32)
    n_frames = -(-7000 // plan.hop)
    wp = np.asarray(mod.df_ols_convolve_pallas5_framed_poly(
        x_p, plan, n_frames), np.float64)
    w = np.swapaxes(wp, 1, 2).reshape(2, -1)
    u = np.zeros((2, 14000))
    u[:, ::2] = sig
    ref = np.stack([np.convolve(u[c], k)[:14000 - K] for c in range(2)])
    m = ref.shape[1]
    rel = 10 * np.log10(np.mean((w[:, :m] - ref) ** 2) / np.mean(ref**2))
    assert rel < -135.0, rel


def test_conv_exec_engine_reaches_kernel(monkeypatch):
    """ConvExec(engine="pallas_fft5") matches the f64 fft engine through
    the real stage framing (interpret mode, flagship first-stage spec)."""
    from r8brain_tpu.models.oracle import OracleResampler
    from r8brain_tpu.ops import pallas_dfft5, stages

    monkeypatch.setattr(
        pallas_dfft5, "_convolve5",
        lambda x, plan, interpret, transpose_mode:
        _host_convolve5(x, plan, interpret, transpose_mode))
    monkeypatch.setattr(
        pallas_dfft5, "_convolve5_framed",
        lambda u, plan, n_frames, interpret, transpose_mode:
        _host_convolve5_framed(u, plan, n_frames, interpret,
                               transpose_mode))
    monkeypatch.setattr(
        pallas_dfft5, "_convolve5_framed_poly",
        lambda x, plan, n_frames, interpret, transpose_mode:
        _host_convolve5_framed_poly(x, plan, n_frames, interpret,
                                    transpose_mode))

    plan = OracleResampler(44100, 96000, 4096, 2.0, 180.15, 0).plan
    spec = plan.stages[0]
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3000))
    ex5 = stages.ConvExec(spec, dtype=jnp.float32, precision="high",
                          engine="pallas_fft5")
    assert ex5.engine == "pallas_fft5"  # no silent fallback for this nfft
    # flagship stage 0 is up=2 -> polyphase-folded in-VMEM OLS path
    assert ex5.framed5_poly and not ex5.framed5
    ex64 = stages.ConvExec(spec, dtype=jnp.float64)
    y5 = np.asarray(ex5.apply(jnp.asarray(x, jnp.float32)), np.float64)
    y64 = np.asarray(ex64.apply(jnp.asarray(x)))
    rel = 10 * np.log10(np.mean((y5 - y64) ** 2) / np.mean(y64**2))
    assert rel < -135.0, rel


def test_conv_exec_framed_nonpoly(monkeypatch):
    """A non-up=2 stage (96k->44.1k stage 1, up=1 down>1) takes the plain
    framed in-VMEM OLS path and matches the f64 fft engine."""
    from r8brain_tpu.models.oracle import OracleResampler
    from r8brain_tpu.ops import pallas_dfft5, stages

    monkeypatch.setattr(
        pallas_dfft5, "_convolve5_framed",
        lambda u, plan, n_frames, interpret, transpose_mode:
        _host_convolve5_framed(u, plan, n_frames, interpret,
                               transpose_mode))

    plan = OracleResampler(96000, 44100, 4096, 2.0, 180.15, 0).plan
    spec = next(s for s in plan.stages
                if s.kind == "conv" and s.up != 2)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3000))
    ex5 = stages.ConvExec(spec, dtype=jnp.float32, precision="high",
                          engine="pallas_fft5")
    if ex5.engine != "pallas_fft5" or not ex5.framed5:
        import pytest
        pytest.skip(f"stage geometry not framed5-eligible "
                    f"(engine={ex5.engine})")
    ex64 = stages.ConvExec(spec, dtype=jnp.float64)
    y5 = np.asarray(ex5.apply(jnp.asarray(x, jnp.float32)), np.float64)
    y64 = np.asarray(ex64.apply(jnp.asarray(x)))
    rel = 10 * np.log10(np.mean((y5 - y64) ** 2) / np.mean(y64**2))
    assert rel < -135.0, rel
