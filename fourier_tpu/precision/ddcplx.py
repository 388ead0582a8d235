"""Planar complex arithmetic over double-word f32 reals.

The dd twin of :mod:`fourier_tpu.ops.cplx`: same function vocabulary (add,
sub, mul, mul_const, scale, rotate, conj) so the shared butterfly code
(:mod:`fourier_tpu.ops.butterflies`) runs unchanged over dd values. A complex
value is ``(re, im)`` where re and im are dd pairs ``(hi, lo)`` of f32 arrays
— four planes total.
"""

from __future__ import annotations

from typing import Tuple

from fourier_tpu.precision import ddreal as dd

Pair = Tuple  # ((re_hi, re_lo), (im_hi, im_lo))


def add(a: Pair, b: Pair) -> Pair:
    return dd.add(a[0], b[0]), dd.add(a[1], b[1])


def sub(a: Pair, b: Pair) -> Pair:
    return dd.sub(a[0], b[0]), dd.sub(a[1], b[1])


def neg(a: Pair) -> Pair:
    return dd.neg(a[0]), dd.neg(a[1])


def conj(a: Pair) -> Pair:
    return a[0], dd.neg(a[1])


def mul(a: Pair, b: Pair) -> Pair:
    """Full complex multiply: 4 dd products + 2 dd additions."""
    re = dd.sub(dd.mul(a[0], b[0]), dd.mul(a[1], b[1]))
    im = dd.add(dd.mul(a[0], b[1]), dd.mul(a[1], b[0]))
    return re, im


def mul_const(a: Pair, cr: float, ci: float) -> Pair:
    """Multiply by a compile-time complex constant, dd-split for accuracy.

    Axis-aligned constants reduce to a scale (optionally after an exact
    rotate); the general case uses the fused dd-const product
    (:func:`ddreal.mul_dd_const`), ~2x cheaper than composing two
    ``mul_f32`` per dd-real at the same O(u^2) accuracy.
    """
    cr, ci = float(cr), float(ci)
    if ci == 0.0:
        return scale(a, cr)
    if cr == 0.0:
        return scale(rotate(a, True), ci)
    crd = dd.const(cr)
    cid = dd.const(ci)
    # two-product composition, NOT ddreal.mul_dd_const: this module's traced
    # path executes under XLA, whose CPU multi-threaded partitioned fusion
    # emitter breaks the fused form's EFT at codegen (guard-insensitive;
    # see ddreal.mul_dd_const).  The fused form is Mosaic-only
    # (ops/pallas/stockham_vpu_dd._DdOps._dmul_dd_const, barrier=False).
    mulc = lambda x, c: dd.add(dd.mul_f32(x, c[0]), dd.mul_f32(x, c[1]))
    re = dd.sub(mulc(a[0], crd), mulc(a[1], cid))
    im = dd.add(mulc(a[0], cid), mulc(a[1], crd))
    return re, im


def scale(a: Pair, s: float) -> Pair:
    s = float(s)
    if dd.is_pow2_scalar(s):
        # exact: powers of two (the radix-3 -1/2, transform 1/N scales for
        # pow2 sizes) scale each limb directly — no EFT needed
        return dd.scale_pow2(a[0], s), dd.scale_pow2(a[1], s)
    sd = dd.const(s)
    sc = lambda x: dd.add(dd.mul_f32(x, sd[0]), dd.mul_f32(x, sd[1]))
    return sc(a[0]), sc(a[1])


def rotate(a: Pair, forward: bool) -> Pair:
    """Multiply by +i (forward) / -i — exact (sign/swap only)."""
    if forward:
        return dd.neg(a[1]), a[0]
    return a[1], dd.neg(a[0])
