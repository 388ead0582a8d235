"""Radix-2/3/4/8 DIT butterflies on planar (re, im) arrays.

TPU-build analog of the reference's butterfly macros
(``fourier-algorithms/src/autosort/butterfly.rs``): the same add/sub/rotate
decompositions (radix-4 as two radix-2 layers plus a ±i rotation, radix-8 as
two radix-4 plus a radix-2 layer with W_8 twiddles) rather than generic r-point
DFT matmuls — same operation structure and exactness as the reference.

Each butterfly takes a list of `r` planar values (``(re, im)`` pairs of
same-shaped real arrays, already gathered along the radix axis) and returns `r`
planar outputs. Applied to whole (batch, m, stride)-shaped planes, every VPU
lane performs one scalar butterfly — the vectorization axis is the position
within the transform (and the batch), just as the reference maps `stride` onto
AVX lanes (``autosort/mod.rs:225-228``). Works identically on jnp arrays and
Pallas ref slices, so the Pallas kernel reuses these functions verbatim.
"""

from __future__ import annotations

import math
from typing import List, Sequence

from fourier_tpu.ops import cplx

_SQRT_2_2 = math.sqrt(2.0) / 2.0
_SIN_PI_3 = math.sqrt(3.0) / 2.0


def butterfly2(x: Sequence, forward: bool, ops=cplx) -> List:
    """[a+b, a-b] (``butterfly.rs:3-5``)."""
    del forward
    return [ops.add(x[0], x[1]), ops.sub(x[0], x[1])]


def butterfly3(x: Sequence, forward: bool, ops=cplx) -> List:
    """Radix-3 via W_3 = exp(∓2πi/3) and its conjugate (``butterfly.rs:9-22``).

    Expressed in the reduced form x0 - s/2 ± i*ti*(x1-x2): identical math to the
    reference's t*x1 + conj(t)*x2 with t = -1/2 + i*ti, fewer multiplies.
    """
    ti = -_SIN_PI_3 if forward else _SIN_PI_3  # imag part of W_3^1
    s = ops.add(x[1], x[2])
    d = ops.sub(x[1], x[2])
    base = ops.add(x[0], ops.scale(s, -0.5))
    # i * ti * d  =  ti * rotate(d, +i)
    rot = ops.scale(ops.rotate(d, True), ti)
    return [
        ops.add(x[0], s),
        ops.add(base, rot),
        ops.sub(base, rot),
    ]


def butterfly4(x: Sequence, forward: bool, ops=cplx) -> List:
    """Two radix-2 layers + ±i rotation + output permutation
    (``butterfly.rs:26-43``)."""
    a0 = ops.add(x[0], x[2])
    a1 = ops.sub(x[0], x[2])
    a2 = ops.add(x[1], x[3])
    a3 = ops.rotate(ops.sub(x[1], x[3]), forward)
    return [
        ops.add(a0, a2),
        ops.sub(a1, a3),
        ops.sub(a0, a2),
        ops.add(a1, a3),
    ]


def butterfly8(x: Sequence, forward: bool, ops=cplx) -> List:
    """Two radix-4 + radix-2 combine with W_8 twiddles (``butterfly.rs:47-65``)."""
    c = _SQRT_2_2
    tw_i = -c if forward else c  # W_8^1 = c + i*tw_i
    a = butterfly4([x[0], x[2], x[4], x[6]], forward, ops)
    b = butterfly4([x[1], x[3], x[5], x[7]], forward, ops)
    b1 = ops.mul_const(b[1], c, tw_i)
    b2 = ops.rotate(b[2], not forward)
    b3 = ops.mul_const(b[3], -c, tw_i)  # W_8^3 = -conj(W_8^1)
    return [
        ops.add(a[0], b[0]),
        ops.add(a[1], b1),
        ops.add(a[2], b2),
        ops.add(a[3], b3),
        ops.sub(a[0], b[0]),
        ops.sub(a[1], b1),
        ops.sub(a[2], b2),
        ops.sub(a[3], b3),
    ]


def _two_level(x: Sequence, R: int, S: int, forward: bool, ops) -> List:
    """N = R*S-point DFT as an SxR Cooley-Tukey over the ops vocabulary.

    Same exchange as stockham_vpu._two_level, but parameterized over the
    complex-ops vocabulary so the dd (double-double) kernels can use it:
    with j = R*q + r, G_r[k1] = DFT_S over q, then X[k1 + S*k2] = DFT_R
    over r of (W_N^(r*k1) * G_r[k1]) at k2. W_N twiddles are compile-time
    f64 constants applied with ops.mul_const.
    """
    n = R * S
    sign = -1.0 if forward else 1.0
    w = [
        (math.cos(sign * 2.0 * math.pi * t / n),
         math.sin(sign * 2.0 * math.pi * t / n))
        for t in range(n)
    ]
    bfS = BUTTERFLIES[S]
    bfR = BUTTERFLIES[R]
    g = [bfS([x[R * q + r] for q in range(S)], forward, ops)
         for r in range(R)]
    out = [None] * n
    for k1 in range(S):
        col = []
        for r in range(R):
            t = (r * k1) % n
            if t == 0:
                col.append(g[r][k1])
            else:
                col.append(ops.mul_const(g[r][k1], w[t][0], w[t][1]))
        res = bfR(col, forward, ops)
        for k2 in range(R):
            out[k1 + S * k2] = res[k2]
    return out


_C5_1 = math.cos(2.0 * math.pi / 5.0)
_C5_2 = math.cos(4.0 * math.pi / 5.0)
_S5_1 = math.sin(2.0 * math.pi / 5.0)
_S5_2 = math.sin(4.0 * math.pi / 5.0)


def butterfly5(x: Sequence, forward: bool, ops=cplx) -> List:
    """Radix-5 via the sum/difference symmetry of W_5^k (real constants).

    With t1 = x1+x4, t2 = x2+x3, t3 = x1-x4, t4 = x2-x3:
      y0    = x0 + t1 + t2
      y1/y4 = (x0 + c1*t1 + c2*t2) ± i*sign*(s1*t3 + s2*t4)
      y2/y3 = (x0 + c2*t1 + c1*t2) ± i*sign*(s2*t3 - s1*t4)
    (sign = -1 forward). Same trick as :func:`butterfly3`, one radix higher;
    the reference has no radix-5 (``autosort/mod.rs:20-21`` stops at 2^a*3^b).
    """
    t1 = ops.add(x[1], x[4])
    t2 = ops.add(x[2], x[3])
    t3 = ops.sub(x[1], x[4])
    t4 = ops.sub(x[2], x[3])
    a = ops.add(x[0], ops.add(ops.scale(t1, _C5_1), ops.scale(t2, _C5_2)))
    b = ops.add(x[0], ops.add(ops.scale(t1, _C5_2), ops.scale(t2, _C5_1)))
    u = ops.add(ops.scale(t3, _S5_1), ops.scale(t4, _S5_2))
    v = ops.sub(ops.scale(t3, _S5_2), ops.scale(t4, _S5_1))
    iu = ops.rotate(u, not forward)  # i*sign*u (rotate(·, True) = +i)
    iv = ops.rotate(v, not forward)
    return [
        ops.add(x[0], ops.add(t1, t2)),
        ops.add(a, iu),
        ops.add(b, iv),
        ops.sub(b, iv),
        ops.sub(a, iu),
    ]


def butterfly25(x: Sequence, forward: bool, ops=cplx) -> List:
    """25-point DFT as 5x5 Cooley-Tukey (see _two_level)."""
    return _two_level(x, 5, 5, forward, ops)


def butterfly9(x: Sequence, forward: bool, ops=cplx) -> List:
    """9-point DFT as 3x3 Cooley-Tukey (see _two_level)."""
    return _two_level(x, 3, 3, forward, ops)


def butterfly27(x: Sequence, forward: bool, ops=cplx) -> List:
    """27-point DFT as 9x3 Cooley-Tukey (see _two_level)."""
    return _two_level(x, 3, 9, forward, ops)


BUTTERFLIES = {
    2: butterfly2, 3: butterfly3, 4: butterfly4, 5: butterfly5,
    8: butterfly8,
}
BUTTERFLIES[9] = butterfly9
BUTTERFLIES[25] = butterfly25
BUTTERFLIES[27] = butterfly27


def apply_butterfly(radix: int, parts: Sequence, forward: bool, ops=cplx) -> List:
    """Dispatch to the radix-`radix` butterfly over the given complex-ops
    vocabulary (default: planar f32/f64; fourier_tpu.precision.ddcplx for the
    double-double c128 emulation)."""
    return BUTTERFLIES[radix](parts, forward, ops)
