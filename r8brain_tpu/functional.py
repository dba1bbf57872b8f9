"""Pure-functional resampling transform for composition with jax.

The reference is an imperative, stateful C++ object (CDSPResampler.h:406-651:
one object per channel, process() mutates ring buffers).  On TPU the whole
stage chain is already a pure function of the input block (Resampler._chain),
so it can be exposed as a first-class jax transform: a closure suitable for
embedding inside a *user's* ``jax.jit`` / ``pjit`` program, batching with
``jax.vmap`` over extra leading axes, and differentiating with
``jax.grad``/``jax.vjp`` (the chain is linear, so gradients are exact — a
capability the reference has no analog for; it enables on-TPU data
augmentation and differentiable-DSP pipelines with SRC in the middle).

Pallas engines (``conv_engine="pallas*"``, ``frac_engine="pallas"``) are
custom kernels without native autodiff rules; ``resample_fn`` makes them
differentiable anyway via ``jax.custom_vjp``: the forward pass runs the
Pallas chain, the backward pass backpropagates through a lazily-built XLA
twin chain (same plan, same precision class, default matmul engines — the
same linear map within f32 rounding), so gradients cost one extra chain
evaluation and match the XLA engines' gradients.

Example::

    import jax, r8brain_tpu as r8b
    from r8brain_tpu.functional import resample_fn

    rs = r8b.Resampler24(44100, 96000)
    f = resample_fn(rs, n_in=44100)           # [C, 44100] -> [C, 96000]

    @jax.jit
    def augment(batch):                        # [B, C, 44100]
        return jax.vmap(f)(batch) * 0.5        # [B, C, 96000]

    g = jax.grad(lambda x: resample_fn(rs, x.shape[-1])(x).sum())(x)
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .models.resampler import Resampler

__all__ = ["resample_fn"]


def _core(execs, n_in: int, T: int, out_len: int) -> Callable:
    """[C, n_in] -> [C, out_len]: zero-flush pad, stage chain, slice."""

    def run(x):
        if T > n_in:
            x = jnp.pad(x, ((0, 0), (0, T - n_in)))
        for e in execs:
            x = e.apply(x)
        return x[:, :out_len]

    return run


def _has_pallas(execs) -> bool:
    return any(str(getattr(e, "engine", "")).startswith("pallas")
               for e in execs)


def resample_fn(rs: Resampler, n_in: int,
                out_len: Optional[int] = None) -> Callable:
    """Build a pure function ``f(x) -> y`` for a fixed input length.

    ``x``: [channels, n_in] (or [n_in]); ``y``: [channels, out_len] with the
    same zero-flush semantics as ``Resampler.oneshot`` (right-pad with the
    exact zeros whose outputs cover ``out_len``; CDSPResampler.h:592-651).

    Lengths are static (resolved on the host now), so the returned closure
    contains no data-dependent shapes and is safe under ``jax.jit``,
    ``jax.vmap`` (extra leading axes), ``jax.lax.scan``, ``pjit``, and
    ``jax.grad``/``jax.vjp``/``jax.jvp`` (Pallas chains differentiate
    through an XLA twin; see module docstring).  The closure is NOT itself
    jitted: compose it into your own program (wrap in ``jax.jit`` yourself
    for standalone use).
    """
    n_in = int(n_in)
    if n_in < 1:
        raise ValueError(f"n_in must be >= 1, got {n_in}")
    if out_len is None:
        out_len = int(math.floor(
            n_in * rs.plan.dst_rate / rs.plan.src_rate))
    else:
        out_len = int(out_len)
    if out_len < 0:
        raise ValueError(f"out_len must be >= 0, got {out_len}")
    passthrough = not rs.plan.stages
    T = n_in if passthrough else max(n_in, rs.in_len_for_out(out_len))
    dtype = rs.dtype

    if passthrough:
        core = None
    else:
        core = _core(rs.execs, n_in, T, out_len)
        if _has_pallas(rs.execs):
            # Pallas kernels have no autodiff rules: differentiate via an
            # XLA twin chain of the same plan + precision class (default
            # matmul engines — the same linear map within f32 rounding).
            fwd_core = core
            twin: list = []  # built on first backward pass only

            def _twin_core():
                if not twin:
                    t_rs = Resampler(rs.plan.src_rate, rs.plan.dst_rate,
                                     plan=rs.plan, dtype=rs.dtype,
                                     precision=rs.precision)
                    twin.append(_core(t_rs.execs, n_in, T, out_len))
                return twin[0]

            @jax.custom_vjp
            def core(x):
                return fwd_core(x)

            def _fwd(x):
                return fwd_core(x), x

            def _bwd(x, ct):
                return (jax.vjp(_twin_core(), x)[1](ct)[0],)

            core.defvjp(_fwd, _bwd)

    def f(x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=dtype)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        if x.shape[-1] != n_in:
            raise ValueError(
                f"resample_fn built for n_in={n_in}, got input with "
                f"{x.shape[-1]} samples (build a new closure per length)")
        if passthrough:
            y = x[:, :out_len]
            if out_len > n_in:
                y = jnp.pad(y, ((0, 0), (0, out_len - n_in)))
        else:
            y = core(x)
        return y[0] if squeeze else y

    return f
