"""Spectral helper functions: fftshift / ifftshift / fftfreq.

numpy.fft-compatible conveniences (the reference exposes none of these, but
any user switching from a general FFT library expects them). All are
jit-friendly jnp ops; they also accept numpy arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fftshift(x, axes=None):
    """Shift the zero-frequency component to the center of the spectrum."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [x.shape[a] // 2 for a in axes], axes)


def ifftshift(x, axes=None):
    """Inverse of :func:`fftshift`."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [-(x.shape[a] // 2) for a in axes], axes)


def fftfreq(n: int, d: float = 1.0) -> np.ndarray:
    """Sample frequencies for an n-point transform with sample spacing d."""
    results = np.empty(n, dtype=np.float64)
    half = (n - 1) // 2 + 1
    results[:half] = np.arange(0, half)
    results[half:] = np.arange(-(n // 2), 0)
    return results / (n * d)
