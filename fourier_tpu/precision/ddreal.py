"""Double-word (double-double style) f32 arithmetic: ~49-bit mantissa reals.

This TPU backend has no f64 (and no complex) support, so the c128 capability
of the reference (``create_fft_f64``, ``fourier/src/lib.rs:49``) is emulated
with pairs of f32 — a value x is represented as (hi, lo) with x = hi + lo and
|lo| <= ulp(hi)/2. The error-free transformations are the classical ones
(Knuth two-sum, Veltkamp split + Dekker two-product); every function here is
elementwise over arrays and jit/XLA-friendly, so the whole FFT execute path
runs as fused VPU arithmetic on TPU.

A dd value is a tuple (hi, lo) of same-shaped f32 arrays. Relative accuracy
of dd multiplication/addition is ~2^-47; combined with twiddles stored as
dd-split f64 this meets the c128 gate of <=1e-12 relative L2 error
(BASELINE.md) with ~10x the flops of the plain f32 path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_SPLIT = 4097.0  # 2^12 + 1: Veltkamp split constant for f32 (24-bit mantissa)

DD = Tuple  # (hi, lo)


def _opaque(x):
    """Force a value to one correctly-rounded f32 materialization.

    Two compiler behaviors otherwise destroy the error-free transformations
    (both measured, rel-L2 degrades 1e-15 -> 5e-8):

    * the XLA algebraic simplifier folds patterns like ``(a + b) - a`` to
      ``b`` (TPU, xla_allow_excess_precision);
    * XLA:CPU codegen contracts ``a*b + c`` into fma — ``optimization_barrier``
      does NOT survive to codegen (OptimizationBarrierExpander strips it
      after the HLO passes), fusions then re-materialize the product per
      consumer, and the sum path sees the *unrounded* product while the
      residual path sees the rounded one, breaking fast2sum.

    ``lax.reduce_precision(x, 8, 23)`` solves both: numerically the identity
    on f32, but a real HLO op that persists through codegen, so no
    simplification or contraction can reach across it.
    """
    try:
        import jax

        if isinstance(x, jax.core.Tracer) or isinstance(x, jax.Array):
            return jax.lax.reduce_precision(x, 8, 23)
    except Exception:  # pragma: no cover
        pass
    return x  # numpy path: numpy never simplifies or contracts


def two_sum(a, b):
    """Error-free sum: s + e == a + b exactly (Knuth)."""
    s = _opaque(a + b)
    bb = _opaque(s - a)
    e = (a - _opaque(s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (Dekker fast2sum).

    ``b`` is materialized through a barrier first: callers pass unrounded
    product-sum expressions (e.g. ``e + x1*c`` in :func:`mul_f32`), and XLA's
    FMA contraction can otherwise evaluate that expression *differently* in
    the sum path ``a + b`` vs the residual path ``b - (s - a)`` — the two
    uses must see bit-identical values or the fast2sum invariant s + e == a+b
    breaks (measured on XLA:CPU: scaled-mode rel-L2 degraded 1e-15 → 5e-8).
    """
    b = _opaque(b)
    s = _opaque(a + b)
    e = b - (s - a)
    return s, e


def veltkamp_split(a):
    """a == hi + lo with hi, lo each fitting in 12 mantissa bits."""
    t = _opaque(_SPLIT * a)
    hi = _opaque(t - (t - a))
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free product: p + e == a * b exactly (Dekker)."""
    p = _opaque(a * b)
    ah, al = veltkamp_split(a)
    bh, bl = veltkamp_split(b)
    e = ((_opaque(ah * bh) - p) + _opaque(ah * bl) + _opaque(al * bh)) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# dd operations
# ---------------------------------------------------------------------------


def add(x: DD, y: DD) -> DD:
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return quick_two_sum(s, e)


def sub(x: DD, y: DD) -> DD:
    return add(x, neg(y))


def neg(x: DD) -> DD:
    return -x[0], -x[1]


def mul(x: DD, y: DD) -> DD:
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p, e)


def _split_scalar_f32(c: float):
    """Veltkamp split of a scalar with explicit f32 semantics.

    A Python-float split computes in f64 where SPLIT*c never rounds, so the
    'hi' part keeps all 24 bits and Dekker products stop being exact (measured
    on TPU: mul_const degraded to 3.6e-8 before this fix; XLA:CPU's excess
    precision masks it). Forcing np.float32 arithmetic yields a true 12-bit
    hi/lo pair.
    """
    c32 = np.float32(c)
    t = np.float32(_SPLIT) * c32
    hi = t - (t - c32)
    lo = c32 - hi
    return float(hi), float(lo)


def mul_f32(x: DD, c: float) -> DD:
    """Multiply a dd value by an f32-representable scalar constant."""
    ch, cl = _split_scalar_f32(c)
    p = _opaque(x[0] * c)
    ah, al = veltkamp_split(x[0])
    e = ((_opaque(ah * ch) - p) + _opaque(ah * cl) + _opaque(al * ch)) + al * cl
    e = e + x[1] * c
    return quick_two_sum(p, e)


def is_pow2_scalar(c: float) -> bool:
    """True when f32(c) is a (signed) power of two — dd-exact to scale by."""
    c = float(np.float32(c))
    if c == 0.0 or not np.isfinite(c):
        return False
    import math

    return math.frexp(c)[0] in (0.5, -0.5)


def scale_pow2(x: DD, c: float) -> DD:
    """Multiply by a power-of-two scalar: exact, two multiplies, no EFT."""
    return x[0] * c, x[1] * c


def mul_dd_const(x: DD, c) -> DD:
    """Multiply a dd value by a compile-time f64 scalar, given as its dd
    split ``c = (ch, cl)`` (:func:`const`).

    One Dekker product against ``ch`` (whose Veltkamp split is precomputed
    host-side), with the ``x0*cl`` and ``x1*ch`` cross terms folded into the
    error limb.  The dropped ``x1*cl`` term and the error-limb roundings are
    all O(u^2)*|x*c| — the same accuracy class as composing
    ``add(mul_f32(x, ch), mul_f32(x, cl))`` at roughly half the VPU ops
    (one EFT product + one fast2sum instead of two products + a full dd add).

    .. warning:: NOT safe under XLA:CPU's multi-threaded partitioned fusion
       emitter (``backend_config outer_dimension_partitions``, seen with
       ``--xla_force_host_platform_device_count=8``): measured rel-L2
       5e-15 -> 1e-8 in a fused FFT stage with the optimized HLO
       *bit-identical* to the correct single-threaded compile, insensitive
       to ``reduce_precision``/``optimization_barrier`` placement — the
       breakage is below HLO, in codegen.  Use only on the eager numpy
       path or under Mosaic, where it measures exact
       (``stockham_vpu_dd._DdOps._dmul_dd_const``, on-chip rel-L2 5.6e-15).
       ``ddcplx.mul_const`` keeps the two-product composition for traced
       XLA code.
    """
    ch, cl = c
    chh, chl = _split_scalar_f32(ch)
    # materialize the limbs once: x0 feeds four consumers and XLA:CPU fusion
    # can otherwise re-materialize an unrounded compound x0 per consumer with
    # different fma contraction, breaking the Dekker invariant (measured
    # under --xla_force_host_platform_device_count=8; stockham_vpu_dd twin)
    x0, x1 = _opaque(x[0]), _opaque(x[1])
    p = _opaque(x0 * ch)
    ah, al = veltkamp_split(x0)
    e = ((_opaque(ah * chh) - p) + _opaque(ah * chl) + _opaque(al * chh)) + al * chl
    e = e + (x0 * cl + x1 * ch)
    return quick_two_sum(p, e)


def from_f64(a: np.ndarray, dtype=np.float32) -> DD:
    """Split f64 numpy data into an exact (hi, lo) f32 pair (plan time)."""
    a = np.asarray(a, dtype=np.float64)
    hi = a.astype(dtype)
    lo = (a - hi.astype(np.float64)).astype(dtype)
    return hi, lo


def to_f64(x: DD) -> np.ndarray:
    """Recombine to f64 numpy (host side)."""
    return np.asarray(x[0], dtype=np.float64) + np.asarray(x[1], dtype=np.float64)


def const(v: float):
    """Split a Python float into dd scalar parts (hi, lo) as Python floats."""
    hi = float(np.float32(v))
    lo = float(np.float32(v - hi))
    return hi, lo
