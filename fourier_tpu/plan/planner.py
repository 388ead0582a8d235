"""Runtime planner: the ``create_fft_f32`` / ``create_fft_f64`` analog.

Mirrors ``fourier/src/lib.rs:31-60``: try the Stockham autosort plan first
(sizes 2^a * 3^b), fall back to Bluestein for every other size. Returns a
type-stable plan object (pytree) rather than a boxed trait object.

Plans are cached per (size, dtype): creating a plan costs O(N) f64 trig plus one
plan-time numpy FFT for Bluestein sizes, and plan reuse also maximizes jit-cache
hits on the execute path.
"""

from __future__ import annotations

from typing import Dict, Tuple, Union

import numpy as np

from fourier_tpu.plan.autosort import AutosortPlan
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.plan.bluestein import BluesteinPlan

_PLAN_CACHE: Dict[Tuple[int, str], FftPlan] = {}


def create_fft(size: int, dtype=np.complex64, *, cache: bool = True) -> FftPlan:
    """Create (or fetch a cached) FFT plan for complex transforms of `size`."""
    dtype = np.dtype(dtype)
    if dtype not in (np.dtype(np.complex64), np.dtype(np.complex128)):
        raise ValueError(f"unsupported dtype {dtype}; use complex64 or complex128")
    if dtype == np.dtype(np.complex128):
        _require_x64()
    key = (int(size), dtype.name)
    if cache and key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    plan: Union[AutosortPlan, BluesteinPlan, None] = AutosortPlan.create(size, dtype)
    if plan is None:
        plan = BluesteinPlan.create(size, dtype)
    if cache:
        _PLAN_CACHE[key] = plan
    return plan


def create_fft_f32(size: int) -> FftPlan:
    """Complex64 (f32) FFT plan (``create_fft_f32``, ``fourier/src/lib.rs:31``)."""
    return create_fft(size, np.complex64)


def create_fft_f64(size: int) -> FftPlan:
    """Complex128 (f64) FFT plan (``create_fft_f64``, ``fourier/src/lib.rs:49``).

    Requires ``jax.config.jax_enable_x64`` on CPU; on TPU (no native f64) use
    the double-word emulation path in :mod:`fourier_tpu.precision`.
    """
    return create_fft(size, np.complex128)


def clear_plan_cache() -> None:
    _PLAN_CACHE.clear()


def _require_x64() -> None:
    import jax

    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "complex128 plans require x64 mode: set jax.config.update"
            "('jax_enable_x64', True) (CPU), or use the double-word f32 "
            "emulation path (fourier_tpu.precision) on TPU."
        )
