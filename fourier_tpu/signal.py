"""FFT-based convolution: ``fftconvolve`` / ``next_fast_len``.

Beyond-reference surface (the Rust reference ships transforms only): linear
convolution via the circular-convolution theorem is the canonical use of an
FFT library, and scipy.signal.fftconvolve is its de-facto interface. Semantics
follow scipy: inputs of equal rank, convolved over ``axes`` (default all),
non-convolved axes must match; ``mode`` is full / same (same shape as ``in1``)
/ valid.

TPU-native shape: each convolved axis is zero-padded to ``next_fast_len``
(the smallest 2^a*3^b size, which is exactly the Stockham/fused-kernel family
— no Bluestein detour for a size we chose ourselves), both spectra come from
the planner's plans (fused VPU kernels on TPU), the pointwise product and the
inverse run in the same jit. c64 runs fully on device; c128 runs the
double-word N-D path with the spectral product in host f64.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ndim import NdFftPlan, _nd_plan
from fourier_tpu.transform import Transform


def next_fast_len(n: int) -> int:
    """Smallest m >= n with m = 2^a * 3^b (the fast Stockham family).

    The reference planner's fast family is 2^a*3^b (``RADICES = [4,8,4,3,2]``,
    ``autosort/mod.rs:20-21``); everything else pays a Bluestein ~4x penalty.
    Convolution gets to pick its own padded size, so it always picks fast.
    """
    n = int(n)
    if n <= 1:
        return 1
    best = 1 << (n - 1).bit_length()  # pure power of two upper bound
    p3 = 1
    while p3 < best:
        # smallest 2^a with p3 * 2^a >= n
        need = -(-n // p3)
        m = p3 * (1 << max(0, (need - 1).bit_length()))
        if n <= m < best:
            best = m
        p3 *= 3
    return best


def _norm_axes(ndim: int, axes) -> Tuple[int, ...]:
    if axes is None:
        return tuple(range(ndim))
    if np.isscalar(axes):
        axes = (axes,)
    out = tuple(sorted(a % ndim for a in axes))
    if len(set(out)) != len(out):
        raise ValueError(f"repeated axis in axes={axes}")
    return out


def _out_slice(mode: str, s1: int, s2: int, full: int) -> slice:
    if mode == "full":
        return slice(0, full)
    if mode == "same":
        start = (s2 - 1) // 2
        return slice(start, start + s1)
    if mode == "valid":
        if s1 < s2:
            raise ValueError(
                "valid mode requires in1 to be at least as large as in2 "
                "along every convolved axis"
            )
        return slice(s2 - 1, s1)
    raise ValueError(f"mode must be full/same/valid, got {mode!r}")


@jax.jit
def _conv_planar(plan, ar, ai, br, bi):
    """fftn(a) * fftn(b) -> unscaled-ifftn, planar c64, all inside one jit."""
    fr1, fi1 = plan.transform_planar(ar, ai, Transform.FFT)
    fr2, fi2 = plan.transform_planar(br, bi, Transform.FFT)
    pr = fr1 * fr2 - fi1 * fi2
    pi = fr1 * fi2 + fi1 * fr2
    return plan.transform_planar(pr, pi, Transform.IFFT)


def fftconvolve(in1, in2, mode: str = "full",
                axes: Optional[Sequence[int]] = None,
                dtype=np.complex64) -> np.ndarray:
    """Convolve two arrays via FFT (scipy.signal.fftconvolve semantics).

    Inputs must have equal rank; convolution runs over ``axes`` (default all),
    other axes must have matching sizes (batch dims). Real inputs produce a
    real output. ``dtype=complex128`` runs the double-precision path (dd on
    f32-only hardware).
    """
    a = np.asarray(in1)
    b = np.asarray(in2)
    if a.ndim != b.ndim:
        raise ValueError("in1 and in2 must have the same rank")
    if a.ndim == 0:
        return a * b
    conv_axes = _norm_axes(a.ndim, axes)
    for ax in range(a.ndim):
        if ax not in conv_axes and a.shape[ax] != b.shape[ax]:
            raise ValueError(
                f"non-convolved axis {ax} differs: {a.shape[ax]} vs "
                f"{b.shape[ax]}"
            )
    full = {ax: a.shape[ax] + b.shape[ax] - 1 for ax in conv_axes}
    fast = {ax: next_fast_len(s) for ax, s in full.items()}

    # Move convolved axes to the end (NdFftPlan transforms trailing axes).
    order = [ax for ax in range(a.ndim) if ax not in conv_axes] + list(conv_axes)
    at = np.transpose(a, order)
    bt = np.transpose(b, order)
    k = len(conv_axes)
    pad_a = [(0, 0)] * (a.ndim - k) + [
        (0, fast[ax] - at.shape[a.ndim - k + i])
        for i, ax in enumerate(conv_axes)
    ]
    pad_b = [(0, 0)] * (a.ndim - k) + [
        (0, fast[ax] - bt.shape[a.ndim - k + i])
        for i, ax in enumerate(conv_axes)
    ]
    at = np.pad(at, pad_a)
    bt = np.pad(bt, pad_b)
    shape = tuple(fast[ax] for ax in conv_axes)

    real_out = not (
        np.issubdtype(a.dtype, np.complexfloating)
        or np.issubdtype(b.dtype, np.complexfloating)
    )
    dtype = np.dtype(dtype)
    plan = _nd_plan(shape, dtype)
    if plan.is_dd or dtype == np.dtype(np.complex128):
        # Double precision: transforms on the plan's c128 path, pointwise
        # product in host f64 (exact relative to the dd transform accuracy).
        fa = plan.fft(at.astype(np.complex128))
        fb = plan.fft(bt.astype(np.complex128))
        out = np.asarray(plan.ifft(fa * fb))
    else:
        rt = np.float32
        ore, oim = _conv_planar(
            plan,
            jnp.asarray(np.real(at).astype(rt)),
            jnp.asarray(np.imag(at).astype(rt)),
            jnp.asarray(np.real(bt).astype(rt)),
            jnp.asarray(np.imag(bt).astype(rt)),
        )
        out = np.asarray(ore).astype(np.complex64) + 1j * np.asarray(oim)

    # Slice each convolved axis to the mode's window.
    sl = [slice(None)] * a.ndim
    for i, ax in enumerate(conv_axes):
        sl[a.ndim - k + i] = _out_slice(
            mode, a.shape[ax], b.shape[ax], full[ax]
        )
    out = out[tuple(sl)]
    # Undo the axis reordering.
    inv = np.argsort(order)
    out = np.transpose(out, inv)
    return np.real(out) if real_out else out
