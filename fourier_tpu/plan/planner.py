"""Runtime planner: the ``create_fft_f32`` / ``create_fft_f64`` analog.

Mirrors ``fourier/src/lib.rs:31-60`` — pick the best plan family per size —
widened with a TPU-native backend axis:

* ``vpu``      — fused all-stages-in-VMEM Pallas VPU kernel (powers of two,
                 64..16384); other sizes compose through four-step / Bluestein
                 with vpu-first sub-plans, falling back to ``mxu``. The
                 fastest path on this chip (~3x mxu even batch-major).
* ``mxu``      — fused Pallas MXU kernels (ops/pallas/bailey.py): any
                 n = n1*n2 with n1, n2 <= 128 (c64 only); other sizes via
                 Bluestein with an MXU inner plan.
* ``stockham`` — pure-XLA planar Stockham autosort (2^a*3^b) + Bluestein:
                 the reference-faithful path; runs on any backend, supports
                 c128, and is the differential-test oracle for ``mxu``/``vpu``.
* ``auto``     — ``vpu`` on a TPU default backend for c64 (the default
                 planner picks the fastest kernel, like the reference's
                 runtime planner ``fourier/src/lib.rs:31-43``), else
                 ``stockham``.

Plans are cached per (size, dtype, resolved backend): creating a plan costs
O(N) f64 trig plus a plan-time numpy FFT for Bluestein sizes, and plan reuse
maximizes jit-cache hits on the execute path.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Tuple

import numpy as np

from fourier_tpu.plan.autosort import AutosortPlan
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.plan.bluestein import BluesteinPlan
from fourier_tpu.plan.mxu import MxuFftPlan

# LRU-bounded: twiddle tables for big plans are MBs, and each distinct plan
# object also anchors jit executables — a loop over many sizes must not grow
# host memory without bound.
_PLAN_CACHE: "OrderedDict[Tuple[int, str, str], FftPlan]" = OrderedDict()
_PLAN_CACHE_MAX = 256

BACKENDS = ("auto", "mxu", "stockham", "dd", "vpu", "measure")


def _resolve_backend(backend: str, dtype: np.dtype) -> str:
    if backend not in BACKENDS:
        raise ValueError(f"unknown backend {backend!r}; use one of {BACKENDS}")
    if backend != "auto":
        return backend
    import jax

    if dtype == np.dtype(np.complex64):
        if jax.default_backend() == "tpu":
            return "vpu"
        return "stockham"
    # complex128: native f64 Stockham where x64 is available (CPU), else the
    # double-word f32 emulation (TPU has no f64 at all).
    if jax.default_backend() == "tpu" or not jax.config.jax_enable_x64:
        return "dd"
    return "stockham"


def _create_stockham(size: int, dtype: np.dtype) -> FftPlan:
    plan = AutosortPlan.create(size, dtype)
    if plan is None:
        plan = BluesteinPlan.create(size, dtype)
    return plan


def _create_mxu_composite(size: int, dtype: np.dtype, *, vpu_first: bool = False):
    """Best fused-kernel plan for a composite size, or None (primes etc.).

    With ``vpu_first`` the fused VPU kernel is preferred wherever its size
    restriction allows (2^a*3^b, 8|n, 64..16384), including recursively for
    four-step sub-plans. Otherwise/next: MxuFftPlan directly for n = n1*n2
    (n1, n2 <= 128); larger composites recurse through single-chip four-step
    composition (n = p*q with p, q <= 16384 each themselves fused/four-step
    plans) up to n = 16384^2.
    """
    from fourier_tpu.plan.four_step_local import (
        FourStepLocalPlan,
        choose_large_split,
    )

    if vpu_first:
        from fourier_tpu.plan.vpu import VpuFftPlan

        plan = VpuFftPlan.create(size, dtype)
        if plan is not None:
            return plan
    plan = MxuFftPlan.create(size, dtype)
    if plan is not None:
        return plan
    split = choose_large_split(size)
    if split is None:
        return None
    factory = lambda m, dt: (
        _create_mxu_composite(m, dt, vpu_first=vpu_first)
        or _create_stockham(m, dt)
    )
    return FourStepLocalPlan.create(size, dtype, split[0], split[1], factory)


def _create_mxu(size: int, dtype: np.dtype, *, vpu_first: bool = False) -> FftPlan:
    plan = _create_mxu_composite(size, dtype, vpu_first=vpu_first)
    if plan is not None:
        return plan

    # Split-less sizes (primes > 128) up to the measured crossover: one
    # at-peak DFT matmul beats Bluestein's two padded inner transforms
    # (MxuFftPlan.DIRECT_SINGLE_MAX rationale).
    if (
        dtype == np.dtype(np.complex64)
        and size <= MxuFftPlan.DIRECT_SINGLE_MAX
    ):
        plan = MxuFftPlan.create_direct(size, dtype)
        if plan is not None:
            return plan

    # Above the direct-matmul crossover, primes run the ONE-KERNEL fused
    # Bluestein (whole chirp-z pipeline VMEM-resident) when its inner size
    # fits; measured ~1.9x the composed Bluestein at n=1013 (round 3).
    if vpu_first and dtype == np.dtype(np.complex64):
        from fourier_tpu.plan.bluestein_fused import VpuBluesteinPlan

        plan = VpuBluesteinPlan.create(size, dtype)
        if plan is not None:
            return plan

    # No usable divisor structure (large primes): Bluestein, whose
    # power-of-two inner always has a fused-kernel plan.
    def inner_factory(m, dt):
        inner = _create_mxu_composite(m, dt, vpu_first=vpu_first)
        return inner if inner is not None else AutosortPlan.create(m, dt)

    return BluesteinPlan.create(size, dtype, inner_factory=inner_factory)


def _create_dd(size: int):
    """Best dd (c128 double-word) plan for this backend.

    On TPU: the fused all-stages-in-VMEM dd VPU kernel where its size
    restriction allows (2^a*3^b, 8|n, 64..4096), and Bluestein with a fused
    power-of-two inner where the inner size allows. Off-TPU: the XLA dd plan
    (the differential oracle; also the exact-IEEE eager-numpy path).
    """
    import jax

    from fourier_tpu.precision import DdFftPlan

    if jax.default_backend() == "tpu":
        from fourier_tpu.precision.dd_split import (DdSplitPow2Plan,
                                                    DdSplitRadixPlan)
        from fourier_tpu.precision.vpu_dd_plan import VpuDdFftPlan

        plan = VpuDdFftPlan.create(size)
        if plan is not None:
            return plan
        # Even sizes just above the fused kernel's VMEM cap (6144..16384):
        # radix-2 DIT split over a batched fused half beats the XLA dd
        # Stockham — and 8192 is the Bluestein inner for n in (2048, 4096].
        plan = DdSplitPow2Plan.create(size)
        if plan is not None:
            return plan
        # Odd-smooth sizes whose quotient by 3/5 is fused (2187 = 3*729,
        # 3125 = 5*625): radix-3/5 DIT split with the fused Pallas combine —
        # 48.7/47.3 GF at the suite config (batch 16384, chain 16;
        # PROF_r5.json, BENCH_SUITE_r5.json) vs 29.0 for the best all-fused
        # 3-stage schedule (2187) and 14.4 for the Bluestein-over-split-8192
        # route (3125).
        plan = DdSplitRadixPlan.create(size)
        if plan is not None:
            return plan
        # Split-less sizes whose Bluestein inner has a fused dd schedule
        # (inner <= 2048, i.e. n <= 1024): one-kernel fused chirp-z pipeline,
        # measured +6-11% over the composed path (dd_bluestein.MAX_INNER).
        from fourier_tpu.precision.dd_bluestein import VpuDdBluesteinPlan

        plan = VpuDdBluesteinPlan.create(size)
        if plan is not None:
            return plan
        inner_factory = lambda m: (
            VpuDdFftPlan.create(m) or DdSplitPow2Plan.create(m) or DdFftPlan(m)
        )
        return DdFftPlan(size, inner_factory=inner_factory)
    return DdFftPlan(size)


def create_fft(
    size: int, dtype=np.complex64, *, backend: str = "auto", cache: bool = True
) -> FftPlan:
    """Create (or fetch a cached) FFT plan for complex transforms of `size`."""
    dtype = np.dtype(dtype)
    if dtype not in (np.dtype(np.complex64), np.dtype(np.complex128)):
        raise ValueError(f"unsupported dtype {dtype}; use complex64 or complex128")
    if backend == "measure":
        # Measured planning (plan/measure.py): consult wisdom, else time the
        # candidate families now and remember the winner.
        from fourier_tpu.plan import measure as _measure

        key = (int(size), dtype.name, "measure")
        if cache and key in _PLAN_CACHE:
            _PLAN_CACHE.move_to_end(key)
            return _PLAN_CACHE[key]
        plan = _measure.plan_from_wisdom(size, dtype)
        if plan is None:
            plan = _measure.measure_fft(size, dtype).plan
        if cache:
            _PLAN_CACHE[key] = plan
            while len(_PLAN_CACHE) > _PLAN_CACHE_MAX:
                _PLAN_CACHE.popitem(last=False)
        return plan
    resolved = _resolve_backend(backend, dtype)
    if resolved in ("mxu", "vpu") and dtype != np.dtype(np.complex64):
        raise ValueError(
            f"backend={resolved!r} supports complex64 only (c128: dd/stockham)"
        )
    if resolved == "dd" and dtype != np.dtype(np.complex128):
        raise ValueError("backend='dd' is the complex128 emulation path")
    if resolved == "stockham" and dtype == np.dtype(np.complex128):
        _require_x64()
    key = (int(size), dtype.name, resolved)
    if cache and key in _PLAN_CACHE:
        _PLAN_CACHE.move_to_end(key)
        return _PLAN_CACHE[key]
    if resolved == "mxu":
        plan = _create_mxu(size, dtype)
    elif resolved == "dd":
        plan = _create_dd(size)
    elif resolved == "vpu":
        # Fused all-stages-in-VMEM kernel (2^a*3^b, 8|n, 64..16384, batch-minor
        # native layout — the fastest path on this chip); other sizes compose
        # through four-step / Bluestein with vpu-first sub-plans, falling back
        # to the MXU family.
        from fourier_tpu.plan.vpu import VpuFftPlan

        plan = VpuFftPlan.create(size, dtype)
        if plan is None:
            plan = _create_mxu(size, dtype, vpu_first=True)
    else:
        plan = _create_stockham(size, dtype)
    if cache:
        _PLAN_CACHE[key] = plan
        while len(_PLAN_CACHE) > _PLAN_CACHE_MAX:
            _PLAN_CACHE.popitem(last=False)
    return plan


def create_fft_f32(size: int, backend: str = "auto") -> FftPlan:
    """Complex64 (f32) FFT plan (``create_fft_f32``, ``fourier/src/lib.rs:31``)."""
    return create_fft(size, np.complex64, backend=backend)


def create_fft_f64(size: int, backend: str = "auto") -> FftPlan:
    """Complex128 (f64) FFT plan (``create_fft_f64``, ``fourier/src/lib.rs:49``).

    Requires ``jax.config.jax_enable_x64`` (CPU); on TPU (no native f64) use
    the double-word emulation path in :mod:`fourier_tpu.precision`.
    """
    return create_fft(size, np.complex128, backend=backend)


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
