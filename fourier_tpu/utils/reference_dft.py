"""Naive O(N^2) DFT oracle in float64 numpy.

The correctness oracle for every integration test, mirroring the reference's
test strategy (``fourier/tests/integrity.rs:6-40``): all plans are validated
end-to-end against a naive DFT, and the oracle itself is validated against
known-good vectors (here: numpy.fft, the FFTW-convention baseline) so it cannot
silently rot (``integrity.rs:42-87``).
"""

from __future__ import annotations

import numpy as np

from fourier_tpu.transform import Transform


def naive_dft(x: np.ndarray, forward: bool) -> np.ndarray:
    """Unscaled naive DFT over the last axis, computed in complex128."""
    x = np.asarray(x, dtype=np.complex128)
    n = x.shape[-1]
    j = np.arange(n)
    sign = -2j if forward else 2j
    w = np.exp(sign * np.pi * np.outer(j, j) / n)  # (n, n)
    return x @ w


def oracle_transform(x: np.ndarray, mode: Transform) -> np.ndarray:
    """Naive-DFT equivalent of any of the five transform modes."""
    x = np.asarray(x, dtype=np.complex128)
    n = x.shape[-1]
    y = naive_dft(x, mode.is_forward)
    scale = mode.scale(n)
    return y if scale is None else y * scale
