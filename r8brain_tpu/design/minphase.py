"""Minimum-phase transform via cepstral discrete Hilbert transform.

TPU-native counterpart of calcMinPhaseTransform (reference:
CDSPRealFFT.h:681-785; algorithm per Damera-Venkata et al., cited at
CDSPRealFFT.h:663).  Runs host-side in float64 — the reference itself notes
the transform requires 64-bit FFT precision (CDSPFIRFilter.h:44-46), and it
happens once at plan time.

Algorithm:
  1. zero-pad kernel to Len = 2^ceil(log2(kernel_len * len_mult)),
  2. log-magnitude spectrum (biased by 1e-300 against log(0)),
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

    buf = np.zeros(n, dtype=np.float64)
    buf[:kernel_len] = kernel

    spec = np.fft.rfft(buf)  # length n2+1
    mag = np.abs(spec)

    # Save signed DC / Nyquist values (CDSPRealFFT.h:716-719).
    dc_val = spec[0].real
    nyq_val = spec[n2].real

    logmag = np.log(mag + 1e-300)
    logmag[0] = math.log(abs(dc_val) + 1e-300)
    logmag[n2] = math.log(abs(nyq_val) + 1e-300)

    # Real cepstrum of the log-magnitude (even) spectrum.
    cep = np.fft.irfft(logmag, n)

    # Discrete Hilbert windowing (CDSPRealFFT.h:737-749).
    cep[0] = 0.0
    cep[n2] = 0.0
    cep[n2 + 1 :] = -cep[n2 + 1 :]

    # Forward transform gives i*theta at each bin (odd real input ->
    # pure imaginary spectrum).
    theta = np.fft.rfft(cep).imag

    out_spec = mag * (np.cos(theta) + 1j * np.sin(theta))
    out_spec[0] = dc_val
    out_spec[n2] = nyq_val

    out = np.fft.irfft(out_spec, n)[:kernel_len].copy()
    dc_group_delay = calc_fir_group_delay(out, 0.0)
    return out, dc_group_delay
