"""Fused VPU Stockham kernel: all stages in VMEM, batch-minor layout.

The SURVEY.md §7 step-3 kernel, shaped by this backend's measured Mosaic
behavior (docs/DESIGN.md): dots are ~5 TF (unusable), big in-kernel transposes
run at 334 GB/s (unusable), but tile-aligned reshape/stack/transpose stage
interleaves run at ~1.1 TB/s. The winning layout is therefore **batch-minor**:
data (n, B) with the transform axis on sublanes and 128 batch lanes per grid
block — every radix-8 stage keeps trailing dims (stride, 128) with stride in
{1->dropped, 8, 64, 512, ...}, all (8,128)-tile aligned, zero transposes and
zero matmuls. The whole transform runs input-once/output-once against HBM with
every intermediate stage VMEM-resident (the reference keeps its ping-pong
buffers in L1/registers the same way, ``autosort/mod.rs:337-378``).

Restriction: n = 2^a * 3^b * 5^c with 8 | n and 64 <= n <= 16384 (mixed
radix-64/8/4/3/2 + 125/25/5 schedules with a leading pow2 stage keep every
stage's interleave stride 8-aligned; see radix_schedule), plus the pure 3^b
sizes 243..6561 via measured two-stage in-register 27/81 schedules
(_POW3_SCHEDULES — 1.9-2.5x the MXU two-phase path despite the misaligned
3-based interleaves, because two in-register two-level stages need only one
interleave pass) and the pure 5^c sizes 625/3125 via the radix-125/25 twins
(_POW5_SCHEDULES — 2.0-2.5x the direct-matmul/Bluestein defaults they
replace; 125 itself stays on the at-peak direct DFT matmul). Other sizes
use the MXU/XLA paths. Batch-minor is the framework's native
batched layout for chained spectral pipelines (fft -> pointwise -> ifft needs
no transposes anywhere); batch-major callers pay one XLA transpose each way.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from fourier_tpu.twiddle import stage_twiddles


# Pure 3^b stage schedules, chosen by on-chip measurement (round 3, chained
# batch-minor, honest 4-byte-fetch sync): two in-register two-level stages
# beat every alternative order and the MXU two-phase path by 1.9-2.5x.
# 243: (27,9) 355 GF [vs (9,27) 314]; 729: (81,9) 498 [vs (27,27) 432,
# (9,81) 342]; 2187: (81,27) 468 [vs (27,81) 332]; 6561: (81,81) 326.
_POW3_SCHEDULES = {
    243: (27, 9),
    729: (81, 9),
    2187: (81, 27),
    6561: (81, 81),
}

# Pure 5^c stage schedules (round 3, second half): same two-level in-register
# composition idea as _POW3_SCHEDULES, radix-25/125 blocks built from the
# real-constant radix-5 butterfly. Chosen by on-chip measurement (chained,
# element-fetch sync, B=65536/16384): 625 (125,5) 518 GF beats (25,25) 422
# and (5,125) 345 — and the prior direct-matmul default's 264; 3125 (125,25)
# 515 GF beats (25,125) 284 and the prior Bluestein default's 209. n=125 is
# deliberately ABSENT: its best fused schedule (25,5) measured 330 GF vs the
# direct at-peak DFT matmul's 699, so it stays on the MXU direct path.
_POW5_SCHEDULES = {
    625: (125, 5),
    3125: (125, 25),
}


def radix_schedule(n: int) -> Optional[Sequence[int]]:
    """Stage radices for n = 2^a * 3^b * 5^c with 8 | n, 64 <= n <= 16384,
    plus the tabled pure 3^b and 5^c sizes.

    Greedy radix-64 stages (the 64-point butterfly's internal 8x8 exchange is
    pure register-level value shuffling with constant twiddles, halving the
    interleave/twiddle memory passes), then radix-8s, one {4, 2} remainder
    stage, then radix-3 stages LAST. The first stage must be a power of two
    >= 8 so every later stage's interleave stride is a multiple of 8
    (tile-aligned) — hence the 8 | n restriction (pure 3^b sizes stay on the
    MXU family) — and first-stage slices must be >= 8 sublane rows where the
    divisor structure allows. The upper bound keeps (n, 128) f32 blocks
    within VMEM: n=16384 measures ~80 MiB scoped (needs the 110 MiB limit,
    see VpuFftPlan.create; 670 GF on-chip vs 170 GF for the 128x128 MXU
    split it replaces); n=32768 would double that past the 128 MiB chip.
    """
    if n < 64 or n > 16384:
        return None
    pow2 = n
    threes = 0
    while pow2 % 3 == 0:
        pow2 //= 3
        threes += 1
    fives = 0
    while pow2 % 5 == 0:
        pow2 //= 5
        fives += 1
    if pow2 & (pow2 - 1):
        return None  # not 2^a * 3^b * 5^c
    if pow2 < 8:
        # Pure 3^b sizes: two-stage in-register 27/81 schedules (the round-2
        # many-stage radix-9 attempt lost to the MXU path; two stages halve
        # the misaligned 3-based interleave passes). Pure 5^c sizes: the
        # radix-25/125 twins.
        if pow2 == 1 and threes == 0 and n in _POW5_SCHEDULES:
            return list(_POW5_SCHEDULES[n])
        if pow2 == 1 and fives == 0 and n in _POW3_SCHEDULES:
            return list(_POW3_SCHEDULES[n])
        return None  # first stage must be a pow2 radix >= 8
    sched = []
    # First-stage slices are n/r rows; prefer radix 64 when it keeps >= 8 rows.
    first = 64 if (pow2 >= 64 and n >= 512) else 8
    sched.append(first)
    m = pow2 // first
    while m % 64 == 0:
        sched.append(64)
        m //= 64
    while m % 8 == 0:
        sched.append(8)
        m //= 8
    if m > 1:
        sched.append(int(m))  # 4 or 2
    sched.extend([9] * (threes // 2))
    sched.extend([3] * (threes % 2))
    # Greedy-large radix-5 blocks (125 > 25 > 5): matches the measured pure
    # 5^c winners (625 = [125,5], 3125 = [125,25]) — bigger in-register
    # blocks amortize the misaligned 5-based interleave passes.
    rem5 = fives
    while rem5 >= 3:
        sched.append(125)
        rem5 -= 3
    if rem5 == 2:
        sched.append(25)
    elif rem5 == 1:
        sched.append(5)
    return sched


def make_stage_tables(n: int, forward: bool):
    """Per-stage twiddles pre-expanded to (n/r, r), sublane-major.

    Entry [i*stride + j, k] = W_size^(i*k): already replicated over the j
    (stride) positions at plan time, so the kernel's twiddle multiply is a
    plain 2-D (blk, CB) * (blk, 1) broadcast — no 3-D reshapes (degenerate
    (m, 1, CB) shapes crash this backend's Mosaic compiler). The final
    all-ones stage is skipped (``mod.rs:238-242``).
    """
    tables = []
    size = n
    stride = 1
    for r in radix_schedule(n):
        if size == r:
            break  # final stage: all-ones twiddles, skipped
        m = size // r
        tw = stage_twiddles(size, r, forward)  # (m, r) complex128
        t = np.repeat(tw, stride, axis=0)  # (m*stride, r) = (n/r, r)
        tables.append(
            (t.real.astype(np.float32), t.imag.astype(np.float32))
        )
        size //= r
        stride *= r
    return tables


_C = np.float32(np.sqrt(2.0) / 2.0)


def _b4(x0, x1, x2, x3, forward: bool):
    """Planar radix-4 butterfly core, sign-inlined (no unary negation).

    Mosaic has no XLA-style algebraic simplifier: a traced ``-x`` is a real
    VPU issue, so the ±i rotation is folded into the final adds/subs as
    component swaps with explicit signs (round-4 measured issue accounting).
    """
    a0 = (x0[0] + x2[0], x0[1] + x2[1])
    a1 = (x0[0] - x2[0], x0[1] - x2[1])
    a2 = (x1[0] + x3[0], x1[1] + x3[1])
    dr, di = x1[0] - x3[0], x1[1] - x3[1]
    if forward:  # y1 = a1 - i*d, y3 = a1 + i*d
        y1 = (a1[0] + di, a1[1] - dr)
        y3 = (a1[0] - di, a1[1] + dr)
    else:
        y1 = (a1[0] - di, a1[1] + dr)
        y3 = (a1[0] + di, a1[1] - dr)
    return [
        (a0[0] + a2[0], a0[1] + a2[1]),
        y1,
        (a0[0] - a2[0], a0[1] - a2[1]),
        y3,
    ]


def _butterfly8(parts, forward: bool):
    """Planar radix-8 butterfly on a list of 8 (re, im) pairs (2D values).

    Sign-inlined form: the W_8^2 = ∓i rotation and the negative halves of the
    W_8^{1,3} constant multiplies are folded into the output adds/subs, so no
    unary negation of a traced value is ever emitted (each would be a full
    vector-issue in Mosaic).
    """
    a = _b4(parts[0], parts[2], parts[4], parts[6], forward)
    b = _b4(parts[1], parts[3], parts[5], parts[7], forward)
    c = _C
    ti = -c if forward else c  # W_8^1 = c + i*ti (trace-time constant)
    b1 = (b[1][0] * c - b[1][1] * ti, b[1][0] * ti + b[1][1] * c)
    out = [None] * 8
    out[0] = (a[0][0] + b[0][0], a[0][1] + b[0][1])
    out[4] = (a[0][0] - b[0][0], a[0][1] - b[0][1])
    out[1] = (a[1][0] + b1[0], a[1][1] + b1[1])
    out[5] = (a[1][0] - b1[0], a[1][1] - b1[1])
    # W_8^2 = ∓i: bb2 = (±b2i, ∓b2r) — swap components, signs inlined.
    b2r, b2i = b[2]
    if forward:
        out[2] = (a[2][0] + b2i, a[2][1] - b2r)
        out[6] = (a[2][0] - b2i, a[2][1] + b2r)
    else:
        out[2] = (a[2][0] - b2i, a[2][1] + b2r)
        out[6] = (a[2][0] + b2i, a[2][1] - b2r)
    # W_8^3 = -c + i*ti: bb3 = (-(p) - b3i*ti, b3r*ti - q) with p = b3r*c,
    # q = b3i*c; forward (ti=-c): bb3 = (q - p, -(p + q)) — inline the signs.
    p = b[3][0] * c
    q = b[3][1] * c
    if forward:
        out[3] = (a[3][0] + q - p, a[3][1] - p - q)
        out[7] = (a[3][0] - q + p, a[3][1] + p + q)
    else:
        out[3] = (a[3][0] - p - q, a[3][1] + p - q)
        out[7] = (a[3][0] + p + q, a[3][1] - p + q)
    return out


def _two_level(parts, R, S, bfR, bfS, forward: bool):
    """N = R*S-point DFT as an SxR Cooley-Tukey entirely in registers.

    With j = R*q + r: G_r[k1] = DFT_S over q of parts[R*q + r], then
    X[k1 + S*k2] = DFT_R over r of (W_N^(r*k1) * G_r[k1]), evaluated at k2.
    The inter-level exchange is pure Python list shuffling of SSA values —
    no Mosaic relayouts — and the W_N twiddles are compile-time constants,
    so one radix-N stage costs one interleave pass where two radix-R/S
    stages would cost two plus a table-twiddle pass.
    """
    n = R * S
    sign = -1.0 if forward else 1.0
    w = np.exp(sign * 2j * np.pi * np.arange(n) / float(n))
    g = [bfS([parts[R * q + r] for q in range(S)], forward)
         for r in range(R)]  # g[r][k1]
    out = [None] * n
    for k1 in range(S):
        col = []
        for r in range(R):
            t = (r * k1) % n
            if t == 0:
                col.append(g[r][k1])
            else:
                c = w[t]
                cr, ci = np.float32(c.real), np.float32(c.imag)
                gr, gi = g[r][k1]
                col.append((gr * cr - gi * ci, gr * ci + gi * cr))
        res = bfR(col, forward)
        for k2 in range(R):
            out[k1 + S * k2] = res[k2]
    return out


def _butterfly64(parts, forward: bool):
    """64-point DFT as 8x8 Cooley-Tukey in registers (see _two_level)."""
    return _two_level(parts, 8, 8, _butterfly8, _butterfly8, forward)


def _butterfly2(parts, forward: bool):
    del forward
    (ar, ai), (br, bi) = parts
    return [(ar + br, ai + bi), (ar - br, ai - bi)]


_S3 = np.float32(np.sqrt(3.0) / 2.0)


def _butterfly3(parts, forward: bool):
    """Radix-3 DIT butterfly: y_k = x0 + w^k x1 + w^{2k} x2, w = e^{∓2πi/3}.

    With a = x1 + x2, b = x1 - x2 and w = -1/2 + i*s (s = ∓√3/2):
    y0 = x0 + a, y{1,2} = (x0 - a/2) ± i*s*b  (``butterfly.rs:9-22`` analog).
    """
    (x0r, x0i), (x1r, x1i), (x2r, x2i) = parts
    s = -_S3 if forward else _S3
    ar, ai = x1r + x2r, x1i + x2i
    br, bi = x1r - x2r, x1i - x2i
    ur, ui = x0r - np.float32(0.5) * ar, x0i - np.float32(0.5) * ai
    vr, vi = -s * bi, s * br  # i*s*b
    return [
        (x0r + ar, x0i + ai),
        (ur + vr, ui + vi),
        (ur - vr, ui - vi),
    ]


def _butterfly4(parts, forward: bool):
    return _b4(parts[0], parts[1], parts[2], parts[3], forward)


_C51 = np.float32(np.cos(2.0 * np.pi / 5.0))
_C52 = np.float32(np.cos(4.0 * np.pi / 5.0))
_S51 = np.float32(np.sin(2.0 * np.pi / 5.0))
_S52 = np.float32(np.sin(4.0 * np.pi / 5.0))


def _butterfly5(parts, forward: bool):
    """Radix-5 DIT butterfly, real-constant form.

    With t1 = x1+x4, t2 = x2+x3, t3 = x1-x4, t4 = x2-x3 and
    w = e^(sign*2πi/5) (sign = -1 forward):
      y0 = x0 + t1 + t2
      y1/y4 = x0 + c1*t1 + c2*t2 ± i*sign*(s1*t3 + s2*t4)
      y2/y3 = x0 + c2*t1 + c1*t2 ± i*sign*(s2*t3 - s1*t4)
    Same sum/difference symmetry trick as the reference's radix-3
    (``butterfly.rs:9-22``), one radix higher.
    """
    (x0r, x0i), (x1r, x1i), (x2r, x2i), (x3r, x3i), (x4r, x4i) = parts
    sg = np.float32(-1.0) if forward else np.float32(1.0)
    t1r, t1i = x1r + x4r, x1i + x4i
    t2r, t2i = x2r + x3r, x2i + x3i
    t3r, t3i = x1r - x4r, x1i - x4i
    t4r, t4i = x2r - x3r, x2i - x3i
    # a = x0 + c1*t1 + c2*t2 ;  b = x0 + c2*t1 + c1*t2
    ar = x0r + _C51 * t1r + _C52 * t2r
    ai = x0i + _C51 * t1i + _C52 * t2i
    br = x0r + _C52 * t1r + _C51 * t2r
    bi = x0i + _C52 * t1i + _C51 * t2i
    # u = s1*t3 + s2*t4 ;  v = s2*t3 - s1*t4 ;  i*sign*z = (-sign*zi, sign*zr)
    ur, ui = _S51 * t3r + _S52 * t4r, _S51 * t3i + _S52 * t4i
    vr, vi = _S52 * t3r - _S51 * t4r, _S52 * t3i - _S51 * t4i
    return [
        (x0r + t1r + t2r, x0i + t1i + t2i),
        (ar - sg * ui, ai + sg * ur),
        (br - sg * vi, bi + sg * vr),
        (br + sg * vi, bi - sg * vr),
        (ar + sg * ui, ai - sg * ur),
    ]


def _butterfly25(parts, forward: bool):
    """25-point DFT as 5x5 Cooley-Tukey in registers (see _two_level)."""
    return _two_level(parts, 5, 5, _butterfly5, _butterfly5, forward)


def _butterfly125(parts, forward: bool):
    """125-point DFT as 25x5 Cooley-Tukey in registers (see _two_level)."""
    return _two_level(parts, 5, 25, _butterfly5, _butterfly25, forward)


def _butterfly9(parts, forward: bool):
    """9-point DFT as 3x3 Cooley-Tukey in registers (see _two_level)."""
    return _two_level(parts, 3, 3, _butterfly3, _butterfly3, forward)


def _butterfly27(parts, forward: bool):
    """27-point DFT as 9x3 Cooley-Tukey in registers (see _two_level)."""
    return _two_level(parts, 3, 9, _butterfly3, _butterfly9, forward)


def _butterfly81(parts, forward: bool):
    """81-point DFT as 9x9 Cooley-Tukey in registers (see _two_level)."""
    return _two_level(parts, 9, 9, _butterfly9, _butterfly9, forward)


_BUTTERFLIES = {
    2: _butterfly2, 3: _butterfly3, 4: _butterfly4, 5: _butterfly5,
    8: _butterfly8, 9: _butterfly9, 25: _butterfly25, 27: _butterfly27,
    64: _butterfly64, 81: _butterfly81, 125: _butterfly125,
}


def _stages_value(re, im, n, schedule, tws, forward):
    """Run the full Stockham stage pipeline on SSA values (no refs).

    `tws`: list of (twre, twim) VALUE pairs per twiddle stage (the final
    stage's all-ones table is omitted). Returns the transformed (n, cb)
    planes. Shared by the plain kernel's prefix and the fused Bluestein
    kernel (which runs two full pipelines back to back).
    """
    cb = re.shape[-1]
    ntw = len(schedule) - 1
    size = n
    stride = 1
    for s, r in enumerate(schedule):
        m = size // r
        blk = m * stride
        parts = [
            (re[k * blk:(k + 1) * blk], im[k * blk:(k + 1) * blk])
            for k in range(r)
        ]
        outs = _BUTTERFLIES[r](parts, forward)
        if s < ntw:
            twre, twim = tws[s]
            for k in range(1, r):
                tr = twre[:, k].reshape(blk, 1)
                ti_ = twim[:, k].reshape(blk, 1)
                orr, oii = outs[k]
                outs[k] = (orr * tr - oii * ti_, orr * ti_ + oii * tr)
        if stride == 1:
            sre = jnp.stack([o[0] for o in outs], axis=1)
            sim = jnp.stack([o[1] for o in outs], axis=1)
        else:
            sre = jnp.stack(
                [o[0].reshape(m, stride, cb) for o in outs], axis=1
            )
            sim = jnp.stack(
                [o[1].reshape(m, stride, cb) for o in outs], axis=1
            )
        re = sre.reshape(n, cb)
        im = sim.reshape(n, cb)
        size = m
        stride *= r
    return re, im


def _kernel(n, schedule, forward, scale, *refs):
    """All-stages-fused Stockham over a (n, CB) block (radices 2..81)."""
    ntw = len(schedule) - 1  # final stage has all-ones twiddles
    tw_refs = refs[:2 * ntw]
    xre_ref, xim_ref, ore_ref, oim_ref = refs[2 * ntw:]
    re = xre_ref[...]
    im = xim_ref[...]
    cb = re.shape[-1]
    size = n
    stride = 1
    last = len(schedule) - 1
    sc = None if scale is None else np.float32(scale)
    # Scale folding: multiply the FIRST twiddle stage's table (a tiny
    # (n/r, r) block, amortized over all CB lanes) and that stage's
    # untwiddled outs[0] slab (1/r of the data) by the mode scale, instead
    # of two full-array multiplies in the epilogue — saves ~2 VPU issues
    # per point on scaled modes (round-4 issue accounting: the kernel is
    # FMA-issue-bound and the epilogue muls have no adds to contract with).
    fold_scale = sc is not None and ntw >= 1
    for s, r in enumerate(schedule):
        m = size // r
        # Gather: contiguous sublane slices (input viewed (r, m*stride, CB)).
        blk = m * stride
        parts = [
            (re[k * blk:(k + 1) * blk], im[k * blk:(k + 1) * blk])
            for k in range(r)
        ]
        outs = _BUTTERFLIES[r](parts, forward)
        if s < ntw:
            twre = tw_refs[2 * s][...]  # (blk, r), pre-expanded over stride
            twim = tw_refs[2 * s + 1][...]
            if s == 0 and fold_scale:
                twre = twre * sc
                twim = twim * sc
                orr, oii = outs[0]
                outs[0] = (orr * sc, oii * sc)
            for k in range(1, r):
                tr = twre[:, k].reshape(blk, 1)
                ti_ = twim[:, k].reshape(blk, 1)
                orr, oii = outs[k]
                outs[k] = (orr * tr - oii * ti_, orr * ti_ + oii * tr)
        if s == last:
            # Final stage: m == 1, so out k covers the contiguous row slab
            # [k*stride, (k+1)*stride) — store each slab straight to the
            # output refs, skipping the stack+reshape materialization and
            # the full-array copy the generic epilogue would cost (one
            # whole read+write of the block saved per call; safe under
            # input/output aliasing because every input ref was read once
            # up front). The mode scale rides the first twiddle stage
            # (fold_scale) when one exists, else it lands here.
            for k in range(r):
                orr, oii = outs[k]
                if sc is not None and not fold_scale:
                    orr = orr * sc
                    oii = oii * sc
                ore_ref[k * stride:(k + 1) * stride] = orr
                oim_ref[k * stride:(k + 1) * stride] = oii
            return
        # Interleave: stacked (r, m, stride, CB) -> (m, r, stride, CB) -> flat.
        if stride == 1:
            # (m, r, CB): trailing (r, CB) is tile-aligned.
            sre = jnp.stack([o[0] for o in outs], axis=1)
            sim = jnp.stack([o[1] for o in outs], axis=1)
            re = sre.reshape(n, cb)
            im = sim.reshape(n, cb)
        else:
            sre = jnp.stack(
                [o[0].reshape(m, stride, cb) for o in outs], axis=1
            )  # (m, r, stride, CB)
            sim = jnp.stack(
                [o[1].reshape(m, stride, cb) for o in outs], axis=1
            )
            re = sre.reshape(n, cb)
            im = sim.reshape(n, cb)
        size = m
        stride *= r


def _rev_rows(x, m: int):
    """Full reverse of the leading m (= 2^k) sublane rows.

    Mosaic has no ``lax.rev`` lowering (measured: NotImplementedError on this
    backend). Two-level decomposition: m = a*b, reverse the a outer groups
    (one a-way concat), then the b rows inside every group (one b-way concat,
    vectorized over groups) — 2m total row-moves vs m*log2(m) for the
    per-bit half-swap ladder, and the FFT stages these kernels share a VPU
    with are themselves only 2-3 two-level passes.
    """
    assert m & (m - 1) == 0, m
    cb = x.shape[-1]
    a = 1 << (int(np.log2(m)) // 2)
    b = m // a
    y = x.reshape(a, b, cb)
    y = jnp.concatenate([y[i:i + 1] for i in range(a - 1, -1, -1)], axis=0)
    y = jnp.concatenate([y[:, j:j + 1] for j in range(b - 1, -1, -1)], axis=1)
    return y.reshape(m, cb)


#: m at or above which the DMA-addressed even/odd split (``dma_eo``) beats
#: the in-VMEM interleave kernels. Measured round 5 at the suite batches:
#: n=4096 (m=2048, B=16384) 864 vs 820 GF for dma_eo, but n=1024 (m=512,
#: B=65536) 686 vs 764 GF — the XLA-side copies (concat + row-pair reshape,
#: ~450 GB/s effective) cost more than the small-m kernels' in-VMEM shuffles
#: and less than the large-m ones'.
_RFFT_DMA_EO_MIN_M = 2048


def _rfft_pack_kernel(m, schedule, dma_eo, *refs):
    """Fused even-n rfft: FFT_m of (x_even + i*x_odd) + Hermitian pack.

    The pack (conj-mirror + half-spectrum twiddle, ``rfft.py:311-331``) runs
    entirely in VMEM — the XLA formulation costs ~5.2 ms per application at
    (512, 65536) because the sublane reverse never fuses (measured round 5),
    ~2.5x the whole inner FFT pair.
    """
    ntw = len(schedule) - 1
    tw_refs = refs[:2 * ntw]
    if dma_eo:
        # Even/odd samples arrive as two separate (m, CB) blocks of the
        # caller's (m, 2B) row-pair view — the de-interleave is pure DMA
        # addressing, zero in-VMEM shuffles.
        wre_ref, wim_ref, xe_ref, xo_ref, or_ref, oi_ref = refs[2 * ntw:]
        re = xe_ref[...]  # x_even
        im = xo_ref[...]  # x_odd
    else:
        # De-interleave in VMEM: stride-2 sublane slices of the (2m, CB)
        # block. Cheaper than the XLA-side copies below _RFFT_DMA_EO_MIN_M.
        wre_ref, wim_ref, x_ref, or_ref, oi_ref = refs[2 * ntw:]
        x = x_ref[...]
        v = x.reshape(m, 2, x.shape[-1])
        re = v[:, 0, :]  # x_even
        im = v[:, 1, :]  # x_odd
    tws = [(tw_refs[2 * s][...], tw_refs[2 * s + 1][...]) for s in range(ntw)]
    zr, zi = _stages_value(re, im, m, tuple(schedule), tws, True)
    # conj-mirror c[k] = conj(z[(m-k) mod m]): full reverse + roll-down-1.
    rr = _rev_rows(zr, m)
    ri = _rev_rows(zi, m)
    cr = jnp.concatenate([rr[-1:], rr[:-1]], axis=0)
    ci = -jnp.concatenate([ri[-1:], ri[:-1]], axis=0)
    er = 0.5 * (zr + cr)
    ei = 0.5 * (zi + ci)
    o_r = 0.5 * (zi - ci)
    o_i = -0.5 * (zr - cr)
    wre = wre_ref[...]  # (m, 1): exp(-2*pi*i*k/n)
    wim = wim_ref[...]
    or_ref[:m] = er + wre * o_r - wim * o_i
    oi_ref[:m] = ei + wre * o_i + wim * o_r
    # Nyquist row X[m] = E[0] - O[0]
    or_ref[m:m + 1] = er[:1] - o_r[:1]
    oi_ref[m:m + 1] = ei[:1] - o_i[:1]


def _irfft_unpack_kernel(m, schedule, dma_eo, *refs):
    """Fused even-n irfft: Hermitian unpack + IFFT_m (``rfft.py:333-354``
    math; 1/m folded into the unpack's 0.5 constants so the inverse stages
    run unscaled). Emits interleaved (2m, CB) signal rows, or aligned
    x_even/x_odd planes when ``dma_eo`` (see _RFFT_DMA_EO_MIN_M)."""
    ntw = len(schedule) - 1
    tw_refs = refs[:2 * ntw]
    if dma_eo:
        wre_ref, wim_ref, xr_ref, xi_ref, oe_ref, oo_ref = refs[2 * ntw:]
    else:
        wre_ref, wim_ref, xr_ref, xi_ref, out_ref = refs[2 * ntw:]
    re = xr_ref[...]  # (m+1, CB) one-sided spectrum planes
    im = xi_ref[...]
    zero = jnp.zeros_like(im[:1])
    head_r = re[:m]
    head_i = jnp.concatenate([zero, im[1:m]], axis=0)  # DC imag is 0
    # c[k] = conj(X[m-k]), k = 0..m-1: reverse rows 1..m (Nyquist imag is 0).
    cr = _rev_rows(re[1:m + 1], m)
    ci = -_rev_rows(jnp.concatenate([im[1:m], zero], axis=0), m)
    h = np.float32(0.5 / m)  # unpack half + the inverse 1/m normalization
    er = h * (head_r + cr)
    ei = h * (head_i + ci)
    wor = h * (head_r - cr)
    woi = h * (head_i - ci)
    wre = wre_ref[...]
    wim = wim_ref[...]
    o_r = wre * wor + wim * woi  # conj(W^k) * WO
    o_i = wre * woi - wim * wor
    zr = er - o_i
    zi = ei + o_r
    tws = [(tw_refs[2 * s][...], tw_refs[2 * s + 1][...]) for s in range(ntw)]
    zr, zi = _stages_value(zr, zi, m, tuple(schedule), tws, False)
    if dma_eo:
        # Aligned (m, CB) stores; the caller re-interleaves with one XLA
        # concat + free row-pair reshape.
        oe_ref[...] = zr
        oo_ref[...] = zi
    else:
        # Re-interleave in VMEM: (m, 1, CB) stack-reshape to (2m, CB).
        cbw = zr.shape[-1]
        out_ref[...] = jnp.concatenate(
            [zr.reshape(m, 1, cbw), zi.reshape(m, 1, cbw)], axis=1
        ).reshape(2 * m, cbw)


def vpu_rfft_pack_batch_minor(
    x3,
    m: int,
    tables,
    w,
    *,
    cb: int = 128,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
    dma_eo: Optional[bool] = None,
):
    """Even-n rfft: (2m, B) real signal rows -> one-sided (m+1, B) spectrum
    planes.

    De-interleave strategy (PROF_r5 rfft_epilogue_variants, measured both
    ways on-chip): for m >= _RFFT_DMA_EO_MIN_M (override with ``dma_eo``),
    the row-major view (2m, B) -> (m, 2B) puts x_even in lanes [0, B) and
    x_odd in lanes [B, 2B) of each row-pair row, so two input BlockSpecs
    over the SAME view (lane blocks i and B/cb + i) hand the kernel
    de-interleaved planes as pure DMA addressing — no in-VMEM stride-2
    sublane shuffles, at the price of the XLA row-pair-view copy (which a
    chained irfft->rfft pipeline cancels). Below the threshold the shuffles
    are cheaper than the copy and the split stays in the kernel. A 3-D
    (m, 2, B) input block is never used: 2 rows per 8-sublane tile = 4x the
    input DMA.

    `tables`: forward stage tables for m; `w`: planar (m, 1) half-spectrum
    twiddles exp(-2*pi*i*k/n). B % cb == 0 (callers pad).
    """
    schedule = radix_schedule(m)
    assert schedule is not None, m
    b = x3.shape[-1]
    assert x3.shape[0] == 2 * m and b % cb == 0, (x3.shape, m, cb)
    if dma_eo is None:
        dma_eo = m >= _RFFT_DMA_EO_MIN_M
    grid = (b // cb,)
    nb = b // cb
    if dma_eo:
        x_args = (x3.reshape(m, 2 * b),) * 2
        in_specs = [
            pl.BlockSpec((m, cb), lambda i: (0, i), memory_space=_VMEM),
            pl.BlockSpec((m, cb), lambda i: (0, i + nb), memory_space=_VMEM),
        ]
    else:
        x_args = (x3,)
        in_specs = [
            pl.BlockSpec((2 * m, cb), lambda i: (0, i), memory_space=_VMEM)
        ]
    out_spec = pl.BlockSpec((m + 1, cb), lambda i: (0, i), memory_space=_VMEM)
    w_spec = pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=_VMEM)
    const_specs = []
    const_args = []
    for tre, tim in tables:
        shp = tre.shape
        const_specs += [
            pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
        ] * 2
        const_args += [jnp.asarray(tre), jnp.asarray(tim)]
    out_shape = [jax.ShapeDtypeStruct((m + 1, b), jnp.float32)] * 2
    kern = functools.partial(_rfft_pack_kernel, m, tuple(schedule), dma_eo)
    flops = int((5 * m * np.log2(m) + 16 * m) * b)
    kw = {}
    if vmem_limit_bytes and pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes)
        )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=const_specs + [w_spec, w_spec] + in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=3 * m * b * 4, transcendentals=0
        ),
        **kw,
    )(*const_args, w[0], w[1], *x_args)


def vpu_irfft_unpack_batch_minor(
    xr,
    xi,
    m: int,
    tables,
    w,
    *,
    cb: int = 128,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
    dma_eo: Optional[bool] = None,
):
    """Even-n irfft: one-sided (m+1, B) spectrum planes -> (2m, B)
    interleaved signal rows.

    Re-interleave strategy (PROF_r5 rfft_epilogue_variants, measured both
    ways on-chip): for m >= _RFFT_DMA_EO_MIN_M (override with ``dma_eo``),
    the kernel stores aligned (m, B) x_even / x_odd planes; one XLA lane
    concat gives (m, 2B) whose row-major reshape to (2m, B) IS the
    interleave (row 2j = even, 2j+1 = odd) for free, and a chained
    rfft->irfft pipeline cancels that reshape against the forward pack's
    row-pair view. Below the threshold the in-VMEM stack-reshape interleave
    is cheaper than the XLA concat copy and stays in the kernel.

    `tables`: INVERSE stage tables for m; `w`: planar (m, 1)
    exp(-2*pi*i*k/n) (the kernel conjugates). B % cb == 0.
    """
    schedule = radix_schedule(m)
    assert schedule is not None, m
    b = xr.shape[-1]
    assert xr.shape[0] == m + 1 and b % cb == 0, (xr.shape, m, cb)
    if dma_eo is None:
        dma_eo = m >= _RFFT_DMA_EO_MIN_M
    grid = (b // cb,)
    in_spec = pl.BlockSpec((m + 1, cb), lambda i: (0, i), memory_space=_VMEM)
    if dma_eo:
        out_specs = [
            pl.BlockSpec((m, cb), lambda i: (0, i), memory_space=_VMEM)
        ] * 2
        out_shape = [jax.ShapeDtypeStruct((m, b), jnp.float32)] * 2
    else:
        out_specs = [
            pl.BlockSpec((2 * m, cb), lambda i: (0, i), memory_space=_VMEM)
        ]
        out_shape = [jax.ShapeDtypeStruct((2 * m, b), jnp.float32)]
    w_spec = pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=_VMEM)
    const_specs = []
    const_args = []
    for tre, tim in tables:
        shp = tre.shape
        const_specs += [
            pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
        ] * 2
        const_args += [jnp.asarray(tre), jnp.asarray(tim)]
    kern = functools.partial(_irfft_unpack_kernel, m, tuple(schedule), dma_eo)
    flops = int((5 * m * np.log2(m) + 16 * m) * b)
    kw = {}
    if vmem_limit_bytes and pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes)
        )
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=const_specs + [w_spec, w_spec, in_spec, in_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=3 * m * b * 4, transcendentals=0
        ),
        **kw,
    )(*const_args, w[0], w[1], xr, xi)
    if dma_eo:
        even, odd = outs
        return jnp.concatenate([even, odd], axis=1).reshape(2 * m, b)
    return outs[0]


def _four_step_row_kernel(p, schedule, forward, *refs):
    """Row leg of the single-chip four-step (``plan/four_step_local.py``).

    Grid = (q, B/CB). Per step: one (p, CB) slice of the column-FFT
    intermediate [k2, a, b] (read through a (1, p, CB) block of the 3-D
    view — tile-aligned), pre-multiplied by this k2's split-twiddle column
    W_n^(a*k2) (mode scale folded in by the caller), then the standard
    all-stages-fused Stockham over p. The store is the transpose: the
    output is the 2-D (p, q*B) array whose reshape to (n, B) IS natural
    order X[k1*q + k2], written as tile-aligned (p, CB) blocks at lane
    block k2*(B/CB) + i. Replaces two full XLA passes (dense split twiddle
    + (q,p,B)->(p,q,B) transpose) with zero extra HBM traffic.
    """
    ntw = len(schedule) - 1
    tw_refs = refs[:2 * ntw]
    pre_re, pre_im, xre_ref, xim_ref, ore_ref, oim_ref = refs[2 * ntw:]
    re = xre_ref[0]  # (p, CB)
    im = xim_ref[0]
    tr = pre_re[0]  # (p, 1): this k2's split-twiddle column
    ti = pre_im[0]
    re, im = re * tr - im * ti, re * ti + im * tr
    tws = [(tw_refs[2 * s][...], tw_refs[2 * s + 1][...]) for s in range(ntw)]
    ore_ref[...], oim_ref[...] = _stages_value(
        re, im, p, tuple(schedule), tws, forward
    )


def vpu_fft_four_step_row(
    re3,
    im3,
    p: int,
    q: int,
    tables,
    pre_tw,
    forward: bool,
    *,
    cb: int = 128,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
):
    """Fused four-step row leg: (q, p, B) planes -> (n, B) natural order.

    `pre_tw`: planar (p, q) split twiddle W_n^(±a*k2), direction-matched,
    with the transform mode's scale already folded in (it multiplies every
    point exactly once). `tables`: stage tables for p. B % cb == 0.
    """
    schedule = radix_schedule(p)
    assert schedule is not None, p
    assert re3.shape[:2] == (q, p), (re3.shape, q, p)
    b = re3.shape[-1]
    assert b % cb == 0, (b, cb)
    nlb = b // cb
    grid = (q, nlb)
    in_spec = pl.BlockSpec(
        (1, p, cb), lambda j, i: (j, 0, i), memory_space=_VMEM
    )
    out_spec = pl.BlockSpec(
        (p, cb), lambda j, i: (0, j * nlb + i), memory_space=_VMEM
    )
    # A (p, 1) block of a (p, q) array is illegal on real Mosaic (the last
    # block dim must be 128-divisible or the whole array dim; interpret mode
    # does not check) — stage the twiddle as (q, p, 1) with (1, p, 1) blocks,
    # constant across the inner lane-block axis so it is fetched once per k2.
    pre_spec = pl.BlockSpec(
        (1, p, 1), lambda j, i: (j, 0, 0), memory_space=_VMEM
    )
    pre_tw = (
        pre_tw[0].T.reshape(q, p, 1),
        pre_tw[1].T.reshape(q, p, 1),
    )
    const_specs = []
    const_args = []
    for tre, tim in tables:
        shp = tre.shape
        const_specs += [
            pl.BlockSpec(shp, lambda j, i: (0, 0), memory_space=_VMEM)
        ] * 2
        const_args += [jnp.asarray(tre), jnp.asarray(tim)]
    out_shape = [jax.ShapeDtypeStruct((p, q * b), jnp.float32)] * 2
    kern = functools.partial(
        _four_step_row_kernel, p, tuple(schedule), forward
    )
    flops = int((5 * p * np.log2(p) + 6 * p) * q * b)
    kw = {}
    if vmem_limit_bytes and pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes)
        )
    ore, oim = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=const_specs + [pre_spec, pre_spec, in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * p * q * b * 8, transcendentals=0
        ),
        **kw,
    )(*const_args, pre_tw[0], pre_tw[1], re3, im3)
    return ore.reshape(p * q, b), oim.reshape(p * q, b)


def _bluestein_kernel(n, m_inner, schedule, scale, *refs):
    """Fully-fused Bluestein chirp-z over a (n, CB) block.

    One VMEM-resident pipeline per block: chirp multiply -> zero-pad to
    m_inner -> forward Stockham stages -> w multiply -> inverse Stockham
    stages (1/M folded into the final chirp table at plan time) -> chirp
    multiply (+ mode scale) -> store. Replaces ~6 separate dispatches and
    their HBM round-trips (chirp/pad/fft/w/ifft/chirp) with one kernel —
    the reference runs the same five steps from L1 (bluesteins.rs:215-259).

    Twiddle-table refs (in order): per-stage fwd tables, per-stage inv
    tables (each ntw = len(schedule)-1 pairs), then xt (2 refs, (n, 1)),
    wt (2 refs, (m_inner, 1)), xt_out (2 refs, (n, 1), includes 1/M).
    """
    (fwd_tws, inv_tws, chirps), off = _bluestein_tables(schedule, refs)
    xre_ref, xim_ref, ore_ref, oim_ref = refs[off:]
    ore_ref[...], oim_ref[...] = _bluestein_value(
        n, m_inner, schedule, fwd_tws, inv_tws, chirps, scale,
        xre_ref[...], xim_ref[...]
    )


def _bluestein_tables(schedule, refs):
    """Unpack the Bluestein kernels' shared leading table refs; returns
    ((fwd_tws, inv_tws, (xt_r, xt_i, wt_r, wt_i, xo_r, xo_i)), next_off)."""
    ntw = len(schedule) - 1
    fwd_tws = [(refs[2 * s][...], refs[2 * s + 1][...]) for s in range(ntw)]
    off = 2 * ntw
    inv_tws = [
        (refs[off + 2 * s][...], refs[off + 2 * s + 1][...])
        for s in range(ntw)
    ]
    off = 4 * ntw
    chirps = tuple(refs[off + j][...] for j in range(6))
    return (fwd_tws, inv_tws, chirps), off + 6


def _bluestein_value(n, m_inner, schedule, fwd_tws, inv_tws, chirps, scale,
                     re, im):
    """The whole chirp-z pipeline on (n, CB) planar values, in VMEM."""
    xt_r, xt_i, wt_r, wt_i, xo_r, xo_i = chirps
    cb = re.shape[-1]
    # chirp multiply + zero-pad to the inner size
    wre = re * xt_r - im * xt_i
    wim = re * xt_i + im * xt_r
    zeros = jnp.zeros((m_inner - n, cb), jnp.float32)
    wre = jnp.concatenate([wre, zeros], axis=0)
    wim = jnp.concatenate([wim, zeros], axis=0)
    # inner forward FFT
    wre, wim = _stages_value(wre, wim, m_inner, schedule, fwd_tws, True)
    # w multiply
    wre, wim = wre * wt_r - wim * wt_i, wre * wt_i + wim * wt_r
    # inner inverse FFT (unscaled; 1/M lives in xo)
    wre, wim = _stages_value(wre, wim, m_inner, schedule, inv_tws, False)
    # final chirp multiply on the first n rows; the mode scale rides the
    # (n, 1) chirp-out table (amortized over CB lanes) instead of two
    # full-block multiplies.
    if scale is not None:
        sc = np.float32(scale)
        xo_r = xo_r * sc
        xo_i = xo_i * sc
    hre, him = wre[:n], wim[:n]
    return hre * xo_r - him * xo_i, hre * xo_i + him * xo_r


def vpu_bluestein_batch_minor(
    re_t,
    im_t,
    n: int,
    m_inner: int,
    stage_tables,
    chirp_tables,
    scale: Optional[float],
    *,
    cb: int = 128,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
):
    """Fused Bluestein FFT over batch-minor planar (n, B) data.

    `stage_tables` = (fwd_tables, inv_tables) for the inner size (from
    :func:`make_stage_tables`); `chirp_tables` = (xt, wt, xt_out) planar
    pairs of shapes (n, 1), (m_inner, 1), (n, 1) — direction-matched, with
    1/m_inner folded into xt_out. B must be a multiple of `cb`.
    """
    schedule = radix_schedule(m_inner)
    assert schedule is not None, m_inner
    b = re_t.shape[-1]
    assert b % cb == 0, (b, cb)
    grid = (b // cb,)
    io = pl.BlockSpec((n, cb), lambda i: (0, i), memory_space=_VMEM)
    const_specs = []
    const_args = []
    fwd_tables, inv_tables = stage_tables
    for tbl in (fwd_tables, inv_tables):
        for tre, tim in tbl:
            shp = tre.shape
            const_specs += [
                pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
            ] * 2
            const_args += [jnp.asarray(tre), jnp.asarray(tim)]
    for tre, tim in chirp_tables:
        shp = tre.shape  # works for tracers (plan passed as a jit argument)
        const_specs += [
            pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
        ] * 2
        const_args += [jnp.asarray(tre), jnp.asarray(tim)]
    out_shape = [jax.ShapeDtypeStruct((n, b), jnp.float32)] * 2
    kern = functools.partial(
        _bluestein_kernel, n, m_inner, tuple(schedule), scale
    )
    flops = int(2 * 5 * m_inner * np.log2(m_inner) * b + 18 * n * b)
    n_consts = len(const_args)
    kw = {}
    if vmem_limit_bytes and pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes)
        )
    ore, oim = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=const_specs + [io, io],
        out_specs=[io, io],
        out_shape=out_shape,
        input_output_aliases={n_consts: 0, n_consts + 1: 1},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n * b * 16, transcendentals=0
        ),
        **kw,
    )(*const_args, re_t, im_t)
    return ore, oim


def _rev_rows_any(x, m: int):
    """Reverse of the leading m sublane rows for ARBITRARY m: zero-pad to
    the next power of two, two-level reverse, then drop the pad rows (which
    land at the front). ~2x the minimal row-moves; still far below the
    per-bit ladder."""
    p2 = 1
    while p2 < m:
        p2 *= 2
    if p2 != m:
        pad = jnp.zeros((p2 - m, x.shape[-1]), x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    return _rev_rows(x, p2)[p2 - m:]


def _rfft_odd_pack_kernel(n, m_inner, schedule, *refs):
    """Odd-n two-for-one rfft: one fused Bluestein c2c of (xa + i*xb) plus
    the Hermitian separation (``rfft.py:404-429`` math), all in VMEM — the
    XLA formulation pays the same non-fusing sublane reverse the even path
    did (measured round 5: ~5.2 ms per application at (512, 65536))."""
    L = (n + 1) // 2
    (fwd_tws, inv_tws, chirps), off = _bluestein_tables(schedule, refs)
    xa_ref, xb_ref, o1r, o1i, o2r, o2i = refs[off:]
    zr, zi = _bluestein_value(
        n, m_inner, schedule, fwd_tws, inv_tws, chirps, None,
        xa_ref[...], xb_ref[...]
    )
    # zs[k] = z[(n-k) mod n], k = 0..L-1: row 0 then the tail reversed.
    zsr = jnp.concatenate([zr[:1], _rev_rows_any(zr[1:], n - 1)], axis=0)[:L]
    zsi = jnp.concatenate([zi[:1], _rev_rows_any(zi[1:], n - 1)], axis=0)[:L]
    hr, hi = zr[:L], zi[:L]
    o1r[...] = 0.5 * (hr + zsr)
    o1i[...] = 0.5 * (hi - zsi)
    o2r[...] = 0.5 * (hi + zsi)
    o2i[...] = -0.5 * (hr - zsr)


def _irfft_odd_unpack_kernel(n, m_inner, schedule, *refs):
    """Odd-n two-for-one irfft: Hermitian recombination of two one-sided
    spectra (``rfft.py:438-468`` math) + one fused Bluestein inverse, in
    VMEM. The 1/n inverse scale rides the chirp-out table."""
    L = (n + 1) // 2
    (fwd_tws, inv_tws, chirps), off = _bluestein_tables(schedule, refs)
    x1r_ref, x1i_ref, x2r_ref, x2i_ref, oa_ref, ob_ref = refs[off:]
    x1r = x1r_ref[...]
    x2r = x2r_ref[...]
    zero = jnp.zeros((1, x1r.shape[-1]), jnp.float32)
    x1i = jnp.concatenate([zero, x1i_ref[1:]], axis=0)  # DC imag is 0
    x2i = jnp.concatenate([zero, x2i_ref[1:]], axis=0)
    # Head k = 0..L-1: Z = X1 + i*X2; tail k = L..n-1 (j = n-k = L-1..1):
    # conj(X1[j]) + i*conj(X2[j]).
    zr_head = x1r - x2i
    zi_head = x1i + x2r
    rev = lambda p: _rev_rows_any(p[1:], L - 1)
    zr_tail = rev(x1r) + rev(x2i)
    zi_tail = -rev(x1i) + rev(x2r)
    zr = jnp.concatenate([zr_head, zr_tail], axis=0)
    zi = jnp.concatenate([zi_head, zi_tail], axis=0)
    oa_ref[...], ob_ref[...] = _bluestein_value(
        n, m_inner, schedule, fwd_tws, inv_tws, chirps,
        1.0 / n, zr, zi
    )


def _bluestein_const_plumbing(stage_tables, chirp_tables):
    """(const_specs, const_args) for the Bluestein kernels' table refs."""
    const_specs = []
    const_args = []
    fwd_tables, inv_tables = stage_tables
    for tbl in (fwd_tables, inv_tables):
        for tre, tim in tbl:
            shp = tuple(tre.shape)
            const_specs += [
                pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
            ] * 2
            const_args += [jnp.asarray(tre), jnp.asarray(tim)]
    for tre, tim in chirp_tables:
        shp = tuple(tre.shape)
        const_specs += [
            pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
        ] * 2
        const_args += [jnp.asarray(tre), jnp.asarray(tim)]
    return const_specs, const_args


def vpu_rfft_odd_pack_batch_minor(
    x_t,
    n: int,
    m_inner: int,
    stage_tables,
    chirps_fwd,
    *,
    cb: int = 128,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
):
    """Odd-n rfft of (n, B) real rows -> 4 planes (L, B/2), L = (n+1)//2:
    (x1r, x1i) the spectra of lanes [0, B/2), (x2r, x2i) of [B/2, B).
    Lane pairing is block t <-> block B/2 + t, read through two lane-offset
    specs on the same array (no XLA slice materialization). B must be a
    multiple of 2*cb (callers pad)."""
    schedule = radix_schedule(m_inner)
    assert schedule is not None, m_inner
    assert n % 2 == 1 and x_t.shape[0] == n, (x_t.shape, n)
    b = x_t.shape[-1]
    assert b % (2 * cb) == 0, (b, cb)
    b2 = b // 2
    nlb = b2 // cb
    grid = (nlb,)
    L = (n + 1) // 2
    in_a = pl.BlockSpec((n, cb), lambda i: (0, i), memory_space=_VMEM)
    in_b = pl.BlockSpec((n, cb), lambda i: (0, nlb + i), memory_space=_VMEM)
    out_spec = pl.BlockSpec((L, cb), lambda i: (0, i), memory_space=_VMEM)
    const_specs, const_args = _bluestein_const_plumbing(
        stage_tables, chirps_fwd
    )
    out_shape = [jax.ShapeDtypeStruct((L, b2), jnp.float32)] * 4
    kern = functools.partial(
        _rfft_odd_pack_kernel, n, m_inner, tuple(schedule)
    )
    flops = int(2 * 5 * m_inner * np.log2(m_inner) * b2 + 26 * n * b2)
    kw = {}
    if vmem_limit_bytes and pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes)
        )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=const_specs + [in_a, in_b],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=3 * n * b * 4, transcendentals=0
        ),
        **kw,
    )(*const_args, x_t, x_t)


def vpu_irfft_odd_unpack_batch_minor(
    re_t,
    im_t,
    n: int,
    m_inner: int,
    stage_tables,
    chirps_inv,
    *,
    cb: int = 128,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
):
    """Odd-n irfft of one-sided (L, B) spectrum planes -> 2 real planes
    (n, B/2): signals of lanes [0, B/2) and [B/2, B). Same lane pairing and
    padding contract as the forward pack."""
    schedule = radix_schedule(m_inner)
    assert schedule is not None, m_inner
    L = (n + 1) // 2
    assert n % 2 == 1 and re_t.shape[0] == L, (re_t.shape, n)
    b = re_t.shape[-1]
    assert b % (2 * cb) == 0, (b, cb)
    b2 = b // 2
    nlb = b2 // cb
    grid = (nlb,)
    in_a = pl.BlockSpec((L, cb), lambda i: (0, i), memory_space=_VMEM)
    in_b = pl.BlockSpec((L, cb), lambda i: (0, nlb + i), memory_space=_VMEM)
    out_spec = pl.BlockSpec((n, cb), lambda i: (0, i), memory_space=_VMEM)
    const_specs, const_args = _bluestein_const_plumbing(
        stage_tables, chirps_inv
    )
    out_shape = [jax.ShapeDtypeStruct((n, b2), jnp.float32)] * 2
    kern = functools.partial(
        _irfft_odd_unpack_kernel, n, m_inner, tuple(schedule)
    )
    flops = int(2 * 5 * m_inner * np.log2(m_inner) * b2 + 26 * n * b2)
    kw = {}
    if vmem_limit_bytes and pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes)
        )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=const_specs + [in_a, in_a, in_b, in_b],
        out_specs=[out_spec] * 2,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=3 * n * b * 4, transcendentals=0
        ),
        **kw,
    )(*const_args, re_t, im_t, re_t, im_t)


def vpu_fft_batch_minor(
    re_t,
    im_t,
    n: int,
    tables,
    forward: bool,
    scale: Optional[float],
    *,
    cb: int = 128,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
):
    """Fused radix-8 FFT over batch-minor planar data of shape (n, B).

    B must be a multiple of `cb` (the wrapper in plan/vpu.py pads).
    `tables`: planar compact stage twiddles from :func:`make_stage_tables`
    (direction-matched). Returns (n, B) planar output.
    """
    schedule = radix_schedule(n)
    assert schedule is not None, n
    b = re_t.shape[-1]
    assert b % cb == 0, (b, cb)
    grid = (b // cb,)
    io = pl.BlockSpec((n, cb), lambda i: (0, i), memory_space=_VMEM)
    const_specs = []
    const_args = []
    for tre, tim in tables:
        shp = tre.shape
        const_specs += [
            pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
        ] * 2
        const_args += [jnp.asarray(tre), jnp.asarray(tim)]
    out_shape = [jax.ShapeDtypeStruct((n, b), jnp.float32)] * 2
    kern = functools.partial(_kernel, n, tuple(schedule), forward, scale)
    flops = int(5 * n * np.log2(n) * b)
    n_consts = len(const_args)
    kw = {}
    if vmem_limit_bytes and pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes)
        )
    ore, oim = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=const_specs + [io, io],
        out_specs=[io, io],
        out_shape=out_shape,
        # Alias the data inputs onto the outputs: the transform is logically
        # in-place (the reference's contract too, ``fft.rs:48``), and this
        # halves VMEM block buffering — (n=4096, 128) f32 blocks x 2 planes
        # x in+out x double-buffering would exceed the 16 MB VMEM otherwise.
        input_output_aliases={n_consts: 0, n_consts + 1: 1},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n * b * 16, transcendentals=0
        ),
        **kw,
    )(*const_args, re_t, im_t)
    return ore, oim
