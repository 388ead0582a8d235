"""Planar complex arithmetic on (re, im) pairs of real arrays.

The TPU-native analog of the reference's L0 vector vocabulary
(``fourier-algorithms/src/vector/generic.rs`` / ``avx.rs``): a tiny set of
complex operations over planar (re, im) real planes. This axon/TPU backend has
no complex dtype support at all (probed: even elementwise complex64 multiply is
UNIMPLEMENTED), so planar f32 planes are the representation everywhere — in
pure-JAX stages, in Pallas kernels, and across the FFI boundary — with complex
dtypes appearing only at the CPU-side API boundary.

A value is a tuple ``(re, im)`` of same-shaped real arrays. All functions are
shape-polymorphic and dtype-preserving, and work identically on jnp arrays,
numpy arrays, and Pallas ref slices.
"""

from __future__ import annotations

from typing import Tuple

Pair = Tuple  # (re, im)


def add(a: Pair, b: Pair) -> Pair:
    return a[0] + b[0], a[1] + b[1]


def sub(a: Pair, b: Pair) -> Pair:
    return a[0] - b[0], a[1] - b[1]


def neg(a: Pair) -> Pair:
    return -a[0], -a[1]


def conj(a: Pair) -> Pair:
    return a[0], -a[1]


def mul(a: Pair, b: Pair) -> Pair:
    """Full complex multiply (4 mul + 2 add, like ``avx.rs:46-58``)."""
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def mul_const(a: Pair, cr: float, ci: float) -> Pair:
    """Multiply by a compile-time complex constant (cr + i*ci)."""
    return a[0] * cr - a[1] * ci, a[0] * ci + a[1] * cr


def scale(a: Pair, s) -> Pair:
    return a[0] * s, a[1] * s


def rotate(a: Pair, forward: bool) -> Pair:
    """Multiply by +i (forward) or -i. Sign matches ``rotate!``
    (``vector/generic.rs:34-44``)."""
    if forward:
        return -a[1], a[0]
    return a[1], -a[0]
