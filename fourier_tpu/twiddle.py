"""Twiddle-factor generation.

All trigonometry happens here, at plan time, in float64 numpy — never inside a
traced/compiled function. This mirrors the reference's strict plan/execute split
(``fourier-algorithms/src/twiddle.rs:8-19`` computes every twiddle in f64 and then
narrows to the target precision; ``autosort/mod.rs:24-46`` lays out the per-stage
tables).

On TPU the resulting arrays become jit trace-time constants, which is the
TPU-native analog of the reference's compile-time ``static_fft`` twiddle baking
(``fourier-macros/src/lib.rs:62-77``).
"""

from __future__ import annotations

import numpy as np


def compute_twiddle(index, size: int, forward: bool) -> np.complex128:
    """exp(-2*pi*i*index/size), conjugated for inverse transforms.

    Matches ``compute_twiddle`` (``twiddle.rs:8-19``): the angle is computed in
    f64; the caller narrows to the plan dtype.
    """
    theta = 2.0 * np.pi * float(index) / float(size)
    tw = np.complex128(complex(np.cos(theta), -np.sin(theta)))
    return tw if forward else np.conj(tw)


def stage_twiddles(size: int, radix: int, forward: bool) -> np.ndarray:
    """Twiddle table for one Stockham stage, shape (m, radix) with m = size//radix.

    Entry (i, k) = W_size^(i*k); column 0 is all ones. Layout matches
    ``initialize_twiddles`` (``autosort/mod.rs:24-46``).
    """
    m = size // radix
    i = np.arange(m, dtype=np.float64)[:, None]
    k = np.arange(radix, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * (i * k) / float(size)
    tw = np.cos(theta) - 1j * np.sin(theta)
    return tw if forward else np.conj(tw)


def half_twiddle(index: np.ndarray, size: int) -> np.ndarray:
    """exp(-i*pi*index/size) elementwise — the chirp helper for Bluestein.

    Matches ``compute_half_twiddle`` (``bluesteins.rs:9-15``); `index` may be a
    float64 array (e.g. i**2, which overflows int32 for large sizes — the
    reference also goes through f64 here).
    """
    theta = np.asarray(index, dtype=np.float64) * np.pi / float(size)
    return np.cos(theta) - 1j * np.sin(theta)
