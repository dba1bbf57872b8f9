"""Functional transform (r8brain_tpu.functional.resample_fn): composition
with jax.jit / vmap / grad, and parity with Resampler.oneshot.

The reference has no analog (its converter is a stateful C++ object,
CDSPResampler.h:406-651); this surface is the TPU-native extension that
lets SRC sit inside a larger jitted/differentiated program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import r8brain_tpu as r8b
from r8brain_tpu.functional import resample_fn

from .helpers import rms_db


def _sig(c, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((c, n)).astype(np.float32) * 0.5


@pytest.mark.parametrize("src,dst", [(44100, 96000), (96000, 44100),
                                     (44100, 96001)])
def test_matches_oneshot(src, dst):
    rs = r8b.Resampler(src, dst, atten=136.45)
    x = _sig(3, src // 4)
    f = resample_fn(rs, x.shape[1])
    y_fn = np.asarray(jax.jit(f)(x))
    y_os = np.asarray(rs.oneshot(x))
    assert y_fn.shape == y_os.shape
    np.testing.assert_array_equal(y_fn, y_os)


def test_composes_inside_outer_jit():
    rs = r8b.Resampler(44100, 48000, atten=109.56)
    x = _sig(2, 8000)
    f = resample_fn(rs, 8000)

    @jax.jit
    def program(x, g):
        return f(x * g) + 1.0

    y = program(x, 2.0)
    ref = np.asarray(rs.oneshot(x * 2.0)) + 1.0
    assert rms_db(np.asarray(y) - ref) < -130.0


def test_vmap_over_leading_batch():
    rs = r8b.Resampler(44100, 96000, atten=109.56)
    xb = np.stack([_sig(2, 4410, seed=s) for s in range(4)])  # [B, C, N]
    f = resample_fn(rs, 4410)
    yb = np.asarray(jax.jit(jax.vmap(f))(xb))
    for b in range(4):
        ref = np.asarray(rs.oneshot(xb[b]))
        assert rms_db(yb[b] - ref) < -120.0


def test_linearity_jvp_exact():
    # The chain is linear: jvp at any point equals f applied to the tangent.
    rs = r8b.Resampler(44100, 96000, atten=136.45)
    f = resample_fn(rs, 4410)
    x, dx = _sig(2, 4410, 1), _sig(2, 4410, 2)
    y, dy = jax.jvp(f, (x,), (dx,))
    np.testing.assert_allclose(np.asarray(dy), np.asarray(f(dx)),
                               rtol=0, atol=1e-5)


def test_grad_is_transpose():
    # grad_x <w, f(x)> = f^T w; check against an explicit small operator.
    rs = r8b.Resampler(44100, 48000, atten=109.56)
    n = 2048
    f = resample_fn(rs, n)
    x = _sig(1, n, 3)
    w = _sig(1, rs.default_out_len(n), 4)
    g = np.asarray(jax.grad(lambda x: jnp.vdot(w, f(x)))(x))
    assert g.shape == x.shape and np.isfinite(g).all()
    # <w, f(x)> must equal <g, x> + <w, f(0)> = <g, x> for linear f.
    lhs = float(np.vdot(w, np.asarray(f(x))))
    rhs = float(np.vdot(g, x))
    assert abs(lhs - rhs) <= 1e-4 * max(1.0, abs(lhs))


def test_passthrough_and_length_checks():
    rs = r8b.Resampler(48000, 48000)
    f = resample_fn(rs, 100)
    x = _sig(2, 100)
    np.testing.assert_array_equal(np.asarray(f(x)), x)
    with pytest.raises(ValueError):
        f(_sig(2, 101))
    with pytest.raises(ValueError):
        resample_fn(rs, 0)
    y = resample_fn(rs, 100, out_len=150)(x)
    assert y.shape == (2, 150) and float(np.abs(np.asarray(y)[:, 100:]).max()) == 0.0


def test_1d_input():
    rs = r8b.Resampler(44100, 96000, atten=109.56)
    x = _sig(1, 4410)[0]
    y = resample_fn(rs, 4410)(x)
    assert y.ndim == 1
    ref = np.asarray(rs.oneshot(x))
    assert rms_db(np.asarray(y) - ref) < -120.0


def test_pjit_channel_sharded():
    # Channel sharding composes transparently: every stage is
    # channel-independent, so jit with a ("ch",) in-sharding runs the
    # program SPMD over the mesh with no collectives.  Per-shard matmul
    # shapes change XLA's f32 accumulation order, so parity uses the
    # same -125 dB budget as tests/test_sharding_f32.py.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("ch",))
    rs = r8b.Resampler(44100, 96000, atten=136.45)
    x = _sig(8, 4410)
    f = resample_fn(rs, 4410)
    sh = NamedSharding(mesh, P("ch", None))
    y_sh = np.asarray(jax.jit(f, in_shardings=sh, out_shardings=sh)(x))
    y = np.asarray(jax.jit(f)(x))
    assert rms_db(y_sh - y) < -125.0


def test_pallas_chain_grads_via_xla_twin(monkeypatch):
    # Pallas kernels have no autodiff rules; resample_fn wraps such chains
    # in a custom_vjp whose backward runs an XLA twin (same plan/precision).
    # The kernels themselves cannot run on CPU, so force the twin path on
    # an XLA chain: forward must still be the ORIGINAL chain bit-for-bit,
    # and gradients must match the plain differentiable chain.
    import r8brain_tpu.functional as F
    rs = r8b.Resampler(44100, 96000, atten=136.45, precision="high")
    x = _sig(2, 4410, 5)
    w = _sig(2, 9600, 6)
    f_plain = resample_fn(rs, 4410)
    monkeypatch.setattr(F, "_has_pallas", lambda execs: True)
    f_twin = F.resample_fn(rs, 4410)
    np.testing.assert_array_equal(np.asarray(f_twin(x)),
                                  np.asarray(f_plain(x)))
    loss_t = lambda xx: jnp.vdot(w, f_twin(xx)[:, :9600])
    loss_p = lambda xx: jnp.vdot(w, f_plain(xx)[:, :9600])
    g_t = np.asarray(jax.grad(loss_t)(x))
    g_p = np.asarray(jax.grad(loss_p)(x))
    assert rms_db(g_t - g_p) - rms_db(g_p) < -120.0  # relative dB


def test_has_pallas_detection():
    from r8brain_tpu.functional import _has_pallas
    rs = r8b.Resampler(44100, 96000, atten=136.45)
    assert not _has_pallas(rs.execs)
    rs_p = r8b.Resampler(44100, 96000, atten=136.45, precision="high",
                         fused=False, conv_engine="pallas_fft5")
    assert _has_pallas(rs_p.execs)


def test_grad_through_poly_mode():
    # The polynomial-interpolator branch (irrational ratio) must
    # differentiate too: its gathers/polynomial evaluation are plain XLA.
    rs = r8b.Resampler(44100, 96001, atten=109.56)
    n = 2048
    f = resample_fn(rs, n)
    x = _sig(1, n, 7)
    m = rs.default_out_len(n)
    w = _sig(1, m, 8)
    g = np.asarray(jax.grad(lambda xx: jnp.vdot(w, f(xx)))(x))
    assert g.shape == x.shape and np.isfinite(g).all()
    lhs = float(np.vdot(w, np.asarray(f(x))))
    rhs = float(np.vdot(g, x))
    assert abs(lhs - rhs) <= 1e-4 * max(1.0, abs(lhs))
