"""Minimum-phase transform via cepstral discrete Hilbert transform.

TPU-native counterpart of calcMinPhaseTransform (reference:
CDSPRealFFT.h:681-785; algorithm per Damera-Venkata et al., cited at
CDSPRealFFT.h:663).  Runs host-side once at plan time.

Precision: the reference runs this in float64 and documents that the result
then skews "purely at random" (CDSPFIRFilter.h:40-46) — at high attenuation
the stop-band magnitude sits only ~100x above the f64 FFT noise floor, so
log() of those bins is implementation-dependent noise that the Hilbert step
spreads into every tap (measured: two f64 FFT backends give taps apart 8e-3
and LATENCY estimates apart 18 samples at atten 218).  This implementation
improves on that: where the platform has true extended-precision long
double (x86: eps 1.08e-19), all four FFTs run in long double
(design/ldfft.py), dropping the noise ~1000x below the deepest supported
stop-band — min-phase designs become reproducible across implementations
(the native designer mirrors this, native/r8bt_design.cpp).  Elsewhere it
falls back to the reference-equivalent f64 numpy FFT.

Algorithm:
  1. zero-pad kernel to Len = 2^ceil(log2(kernel_len * len_mult)),
  2. log-magnitude spectrum (biased by the dtype's smallest normal
     against log(0)),
  3. inverse FFT -> real cepstrum,
  4. causal fold: c[0]=0, c[1..N/2-1] kept, c[N/2]=0, c[N/2+1..] negated
     (the discrete Hilbert window, CDSPRealFFT.h:737-749),
  5. forward FFT -> i*theta(w) (pure imaginary): the minimum phase,
  6. H_min = |H| * exp(i*theta), with DC and Nyquist bins keeping their
     original signed values (CDSPRealFFT.h:757-758),
  7. inverse FFT -> minimum-phase kernel (first kernel_len taps).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from ..utils.fir import calc_fir_group_delay

__all__ = ["min_phase_transform"]


def min_phase_transform(
    kernel: np.ndarray,
    len_mult: int = 2,
    do_final_mul: bool = True,
) -> Tuple[np.ndarray, float]:
    """Return (min-phase kernel of the same length, DC group delay).

    ``len_mult`` is the frequency-domain oversampling factor; the LP filter
    designer uses 16 (CDSPFIRFilter.h:479).  ``do_final_mul`` is accepted for
    interface parity; scaling is exact here either way since we use unitary-
    normalized numpy FFTs.
    """
    kernel = np.asarray(kernel, dtype=np.float64)
    kernel_len = kernel.shape[0]
    if kernel_len <= 0:
        raise ValueError("empty kernel")
    if len_mult < 2:
        raise ValueError("len_mult must be >= 2")

    len_bits = max(1, int(math.ceil(math.log2(kernel_len * len_mult))))
    n = 1 << len_bits
    n2 = n >> 1

    from .ldfft import HAVE_LONGDOUBLE, fft_ld

    if HAVE_LONGDOUBLE:
        # log(0) guard: the smallest normal of the platform's long double
        # (x86 80-bit: ~3.36e-4932; double-double: ~f64 tiny).  A literal
        # like 1e-4000 would silently underflow to 0 where long double has
        # only f64 exponent range, losing the guard.  The native designer
        # uses std::numeric_limits<long double>::min() — bit-identical on
        # matching ABIs.
        real_t, tiny = np.longdouble, np.finfo(np.longdouble).tiny

        def rfft(x):
            return fft_ld(x)[: n2 + 1]

        def irfft_half(X_half):
            full = np.zeros(n, dtype=np.clongdouble)
            full[: n2 + 1] = X_half
            full[n2 + 1 :] = np.conj(X_half[1:n2][::-1])
            return fft_ld(full, inverse=True).real
    else:  # f64 fallback (np.longdouble == float64 on this ABI)
        # Match the native designer, which biases with
        # numeric_limits<long double>::min() == DBL_MIN on 64-bit long
        # double ABIs — so both designers stay bit-identical there.  The
        # reference's literal is 1e-300 (CDSPRealFFT.h:716); the two
        # differ only for exact-zero magnitude bins, which windowed-sinc
        # spectra do not produce.
        real_t, tiny = np.float64, np.finfo(np.float64).tiny
        rfft = np.fft.rfft

        def irfft_half(X_half):
            return np.fft.irfft(X_half, n)

    buf = np.zeros(n, dtype=real_t)
    buf[:kernel_len] = kernel

    spec = rfft(buf)  # length n2+1
    mag = np.abs(spec)

    # Save signed DC / Nyquist values (CDSPRealFFT.h:716-719).
    dc_val = spec[0].real
    nyq_val = spec[n2].real

    logmag = np.log(mag + tiny)
    logmag[0] = np.log(np.abs(dc_val) + tiny)
    logmag[n2] = np.log(np.abs(nyq_val) + tiny)

    # Real cepstrum of the log-magnitude (even) spectrum.
    cep = irfft_half(logmag)

    # Discrete Hilbert windowing (CDSPRealFFT.h:737-749).
    cep[0] = 0.0
    cep[n2] = 0.0
    cep[n2 + 1 :] = -cep[n2 + 1 :]

    # Forward transform gives i*theta at each bin (odd real input ->
    # pure imaginary spectrum).
    theta = rfft(cep).imag

    out_spec = mag * (np.cos(theta) + 1j * np.sin(theta))
    out_spec[0] = dc_val
    out_spec[n2] = nyq_val

    out = np.asarray(irfft_half(out_spec)[:kernel_len], dtype=np.float64)
    dc_group_delay = calc_fir_group_delay(out, 0.0)
    return out, dc_group_delay
