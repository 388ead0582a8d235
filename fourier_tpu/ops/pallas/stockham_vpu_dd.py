"""Fused VPU Stockham kernel for double-word (c128) data: all stages in VMEM.

The dd twin of :mod:`stockham_vpu`: batch-minor (n, B) layout, the transform
axis on sublanes, 128 batch lanes per grid block, every stage's interleave
tile-aligned, input-once/output-once against HBM. A dd-complex value is four
f32 planes (re_hi, re_lo, im_hi, im_lo); butterflies are the shared
radix-2/3/4/8 decompositions (:mod:`fourier_tpu.ops.butterflies`) over a
double-word ops vocabulary, so one nominal c128 flop costs ~12 hardware f32
flops — which is exactly why fusing matters ~10x more here than for c64.

**Precision under two compilers** (measured, see docs/DESIGN.md): Mosaic does
NOT algebraically simplify, so the error-free transformations (Knuth two-sum,
Dekker two-product) hold with NO optimization barriers — and
``optimization_barrier`` does not lower in Pallas TPU anyway. The interpret
path (CPU tests) executes through XLA, whose simplifier folds ``(a+b)-a`` to
``b`` and destroys the EFTs — there the kernel inserts the barriers
(``precision/ddreal._opaque`` rationale). The `barrier` flag below selects
per compilation regime.

Schedule: radix 8 first (tile alignment), then 8s, one {4,2} remainder, then
3s — radix-64/9 fusions are skipped: dd butterflies are compute-bound, not
interleave-bound, and 64 dd values would be 256 live planes of registers.
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

from fourier_tpu.ops.butterflies import apply_butterfly
from fourier_tpu.precision import ddreal
from fourier_tpu.twiddle import stage_twiddles

_SPLIT = np.float32(4097.0)  # Veltkamp split constant for f32


class _DdOps:
    """ddcplx-compatible complex ops over (hi, lo) f32 pairs.

    ``barrier=False`` emits the raw EFT expression sequences (exact under
    Mosaic, which never algebraically simplifies — measured); ``barrier=True``
    wraps rounded intermediates in ``optimization_barrier`` for XLA-executed
    paths (the Pallas interpreter), where the simplifier would otherwise fold
    the EFTs away. A complex value is ((re_hi, re_lo), (im_hi, im_lo)).
    """

    def __init__(self, barrier: bool):
        self._barrier = bool(barrier)
        if barrier:
            # reduce_precision(8, 23) = identity rounding on f32 that survives
            # to codegen — optimization_barrier is stripped before codegen and
            # XLA:CPU fma-contraction then breaks the EFTs (ddreal._opaque).
            self._f = lambda x: jax.lax.reduce_precision(x, 8, 23)
        else:
            self._f = lambda x: x

    # -- dd real primitives ------------------------------------------------

    def _two_sum(self, a, b):
        f = self._f
        s = f(a + b)
        bb = f(s - a)
        e = (a - f(s - bb)) + (b - bb)
        return s, e

    def _quick_two_sum(self, a, b):
        # b materialized first: both uses (sum + residual) must see the same
        # rounded value or FMA contraction breaks fast2sum (ddreal twin).
        f = self._f
        b = f(b)
        s = f(a + b)
        return s, b - (s - a)

    def _split(self, a):
        f = self._f
        t = f(_SPLIT * a)
        hi = f(t - (t - a))
        return hi, a - hi

    def _two_prod(self, a, b):
        f = self._f
        p = f(a * b)
        ah, al = self._split(a)
        bh, bl = self._split(b)
        e = ((f(ah * bh) - p) + f(ah * bl) + f(al * bh)) + al * bl
        return p, e

    def _dadd(self, x, y):
        s, e = self._two_sum(x[0], y[0])
        return self._quick_two_sum(s, e + (x[1] + y[1]))

    def _dneg(self, x):
        return -x[0], -x[1]

    def _dsub(self, x, y):
        return self._dadd(x, self._dneg(y))

    def _dmul(self, x, y):
        p, e = self._two_prod(x[0], y[0])
        return self._quick_two_sum(p, e + (x[0] * y[1] + x[1] * y[0]))

    def _dmul_f32(self, x, c: float):
        """dd * f32-representable scalar constant (trace-time split)."""
        f = self._f
        ch, cl = ddreal._split_scalar_f32(c)
        ch, cl = np.float32(ch), np.float32(cl)
        c32 = np.float32(c)
        p = f(x[0] * c32)
        ah, al = self._split(x[0])
        e = ((f(ah * ch) - p) + f(ah * cl) + f(al * ch)) + al * cl
        return self._quick_two_sum(p, e + x[1] * c32)

    def _dmul_dd_const(self, x, c: float):
        """dd * compile-time f64 scalar constant.

        Mosaic path (barrier=False): ONE fused EFT product — the constant's
        dd split (ch, cl) and ch's Veltkamp split are precomputed at trace
        time; the cl and lo-limb cross terms fold into the error limb.  Same
        O(u^2) accuracy as add(mul_f32(ch), mul_f32(cl)) at ~half the VPU
        ops; measured on-chip n=243 dd rel-L2 5.6e-15 with a 1.66x kernel
        speedup.

        XLA-executed path (barrier=True, interpret tests): the two-product
        composition.  The fused form is NOT safe there: XLA:CPU's
        multi-threaded partitioned fusion emitter
        (backend_config outer_dimension_partitions, appears under
        --xla_force_host_platform_device_count=8) breaks its EFT at the
        codegen level — measured rel-L2 5e-15 -> 1e-8 with the optimized
        HLO *bit-identical* to the correct single-threaded compile and
        insensitive to reduce_precision or optimization_barrier placement.
        Emitter-level breakage cannot be guarded from HLO, so the
        XLA-executed path keeps the composition that measures robust.
        """
        if self._barrier:
            sh, sl = ddreal.const(float(c))
            return self._dadd(self._dmul_f32(x, sh), self._dmul_f32(x, sl))
        f = self._f
        ch, cl = ddreal.const(float(c))
        chh, chl = ddreal._split_scalar_f32(ch)
        ch, cl = np.float32(ch), np.float32(cl)
        chh, chl = np.float32(chh), np.float32(chl)
        x0, x1 = x
        p = f(x0 * ch)
        ah, al = self._split(x0)
        e = ((f(ah * chh) - p) + f(ah * chl) + f(al * chh)) + al * chl
        return self._quick_two_sum(p, e + (x0 * cl + x1 * ch))

    def _dscale_const(self, x, s: float):
        """dd * arbitrary f64 scalar constant, dd-split for accuracy."""
        if ddreal.is_pow2_scalar(s):
            c = np.float32(s)  # exact: no EFT needed for powers of two
            return x[0] * c, x[1] * c
        return self._dmul_dd_const(x, float(s))

    # -- ddcplx vocabulary (complex over dd pairs) -------------------------

    def add(self, a, b):
        return self._dadd(a[0], b[0]), self._dadd(a[1], b[1])

    def sub(self, a, b):
        return self._dsub(a[0], b[0]), self._dsub(a[1], b[1])

    def mul(self, a, b):
        re = self._dsub(self._dmul(a[0], b[0]), self._dmul(a[1], b[1]))
        im = self._dadd(self._dmul(a[0], b[1]), self._dmul(a[1], b[0]))
        return re, im

    # -- split-cached table multiply ----------------------------------------

    def split_table(self, t4):
        """Pre-split a complex dd table (rh, rl, ih, il) -> 6 planes.

        Computes the Veltkamp-hi planes of rh/ih ONCE on the (blk, r)-sized
        table (1/cb of the data cost), so :meth:`mul_tw` skips the 4-op
        per-point table-side splits entirely (round-4 issue accounting: the
        in-kernel table split costs ~8 ops per TABLE element vs ~16 ops per
        DATA point saved).
        """
        rh, rl, ih, il = t4
        rhh, _ = self._split(rh)
        ihh, _ = self._split(ih)
        return rh, rl, ih, il, rhh, ihh

    def _dmul_cached(self, x, xs, b0, b0h, b0l, b1):
        """dd * dd with both Veltkamp splits supplied.

        ``xs = self._split(x[0])`` (cached by the caller across the four
        component products) and ``(b0h, b0l = b0 - b0h)`` the table side.
        Same EFT structure as :meth:`_dmul`; only redundant splits removed.
        """
        f = self._f
        p = f(x[0] * b0)
        e = ((f(xs[0] * b0h) - p) + f(xs[0] * b0l) + f(xs[1] * b0h)) \
            + xs[1] * b0l
        return self._quick_two_sum(p, e + (x[0] * b1 + x[1] * b0))

    def mul_tw(self, a, t6):
        """Complex dd multiply by a pre-split table value (split_table).

        Shares the data-side splits across the four component products
        (Mosaic never CSEs, so :meth:`mul` recomputes them twice) and uses
        the table-side splits computed once per stage — ~21% fewer VPU ops
        per twiddled point than :meth:`mul` (measured accounting, round 4).
        """
        rh, rl, ih, il, rhh, ihh = t6
        rhl = rh - rhh  # exact: Veltkamp lo limb
        ihl = ih - ihh
        xs = self._split(a[0][0])
        ys = self._split(a[1][0])
        rr = self._dmul_cached(a[0], xs, rh, rhh, rhl, rl)
        ii = self._dmul_cached(a[1], ys, ih, ihh, ihl, il)
        ri = self._dmul_cached(a[0], xs, ih, ihh, ihl, il)
        ir = self._dmul_cached(a[1], ys, rh, rhh, rhl, rl)
        return self._dsub(rr, ii), self._dadd(ri, ir)

    def mul_const(self, a, cr: float, ci: float):
        cr, ci = float(cr), float(ci)
        if ci == 0.0:
            return self.scale(a, cr)
        if cr == 0.0:
            return self.scale(self.rotate(a, True), ci)
        re = self._dsub(self._dmul_dd_const(a[0], cr),
                        self._dmul_dd_const(a[1], ci))
        im = self._dadd(self._dmul_dd_const(a[0], ci),
                        self._dmul_dd_const(a[1], cr))
        return re, im

    def scale(self, a, s: float):
        return self._dscale_const(a[0], s), self._dscale_const(a[1], s)

    def rotate(self, a, forward: bool):
        if forward:
            return self._dneg(a[1]), a[0]
        return a[1], self._dneg(a[0])


# Measured round 3 (chained batch-minor, element-fetch sync, b=32768):
# two-stage in-register schedules win for 243 (28.7 vs 23.2 GF XLA dd) and
# 729 (26.5 vs 22.4); 2187 as [27, 9, 9] measured 16.2 vs XLA's 31.3 GF
# (two misaligned 3-based interleave passes) and radix-81 was rejected
# outright (81 dd values = 324 live f32 planes of register pressure), so
# 2187 stays on the XLA dd path.
_POW3_DD_SCHEDULES = {
    243: (27, 9),
    729: (27, 27),
}

# Pure 5^c twins (measured on-chip, round 3 second half, B=16384 chained
# element-fetch sync): 625 (25,25) 38.3 GF beats the fused-Bluestein
# default's 33.3; 125 (25,5) measured 33.9 vs 36.6 and is deliberately
# ABSENT (stays on the fused dd Bluestein). radix-125 is rejected a priori
# (125 dd values = 500 live f32 planes — worse than the rejected radix-81's
# 324). Mixed 5-smooth sizes with an aligned pow2 first stage win big:
# 1000 [8,25,5] 223 GF vs 39.9 for the DdSplitPow2 default.
_POW5_DD_SCHEDULES = {
    625: (25, 25),
}


def radix_schedule_dd(n: int) -> Optional[Sequence[int]]:
    """Stage radices for the dd kernel: n = 2^a*3^b*5^c, 8 | n,
    64 <= n <= 4096, plus the tabled pure 3^b / 5^c sizes.

    First stage radix-8 (keeps every later interleave stride 8-aligned),
    greedy 8s, one {4, 2} remainder, radix-3 stages last. No 64/9 fusions —
    dd is compute-bound and their register pressure quadruples.

    Upper bound 4096: four f32 planes and the per-stage interleave copies put
    the fused kernel at ~80 MiB of VMEM at n=4096/cb=128 (fits in the 128 MiB
    chip budget); n=8192 measures 162 MiB and cannot compile, and cb=64 is
    not an option — Mosaic requires lane blocks of 128 (or the whole axis).
    Larger 2^a*3^b sizes run the XLA dd Stockham instead.
    """
    if n < 64 or n > 4096:
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
        return None
    if pow2 < 8:
        # Pure 3^b: an all-radix-3 fused schedule measured 3x SLOWER than
        # XLA dd (round 3: 243 at 10.9 vs 32.1 GF — five misaligned
        # interleave passes), but TWO-stage in-register 9/27 schedules
        # (one interleave pass, like the c64 pow3 fix) win at 243/729; see
        # _POW3_DD_SCHEDULES for the measured table. Pure 5^c: the
        # two-stage radix-25 twins (_POW5_DD_SCHEDULES).
        if pow2 == 1 and threes == 0 and n in _POW5_DD_SCHEDULES:
            return list(_POW5_DD_SCHEDULES[n])
        if pow2 == 1 and fives == 0 and n in _POW3_DD_SCHEDULES:
            return list(_POW3_DD_SCHEDULES[n])
        return None
    sched = []
    m = pow2
    while m % 8 == 0:
        sched.append(8)
        m //= 8
    if m > 1:
        sched.append(int(m))  # 4 or 2
    sched.extend([3] * threes)
    sched.extend([25] * (fives // 2))
    sched.extend([5] * (fives % 2))
    return sched


def make_stage_tables_dd(n: int, forward: bool):
    """Per-stage dd twiddles pre-expanded to (n/r, r): 4 f32 planes each."""
    tables = []
    size = n
    stride = 1
    for r in radix_schedule_dd(n):
        if size == r:
            break  # final stage: all-ones twiddles, skipped
        m = size // r
        tw = stage_twiddles(size, r, forward)  # (m, r) complex128
        t = np.repeat(tw, stride, axis=0)  # (n/r, r)
        rh, rl = ddreal.from_f64(t.real)
        ih, il = ddreal.from_f64(t.imag)
        tables.append((rh, rl, ih, il))
        size //= r
        stride *= r
    return tables


def _kernel(n, schedule, forward, scale, barrier, *refs):
    """All-stages-fused dd Stockham over four (n, CB) planes."""
    ops = _DdOps(barrier)
    ntw = len(schedule) - 1
    tw_refs = refs[: 4 * ntw]
    (xrh_ref, xrl_ref, xih_ref, xil_ref,
     orh_ref, orl_ref, oih_ref, oil_ref) = refs[4 * ntw:]
    planes = [xrh_ref[...], xrl_ref[...], xih_ref[...], xil_ref[...]]
    out_refs = (orh_ref, orl_ref, oih_ref, oil_ref)
    cb = planes[0].shape[-1]
    size = n
    stride = 1
    last = len(schedule) - 1
    # Scale folding (c64 twin): ride the mode scale on the FIRST twiddle
    # stage's (blk, r) table — 1/cb of the data size — plus that stage's
    # untwiddled outs[0], instead of a full-array dd scale pass (~30 hw
    # ops/point) in the epilogue.
    fold_scale = scale is not None and ntw >= 1
    for s, r in enumerate(schedule):
        m = size // r
        blk = m * stride
        parts = [
            (
                (planes[0][k * blk:(k + 1) * blk],
                 planes[1][k * blk:(k + 1) * blk]),
                (planes[2][k * blk:(k + 1) * blk],
                 planes[3][k * blk:(k + 1) * blk]),
            )
            for k in range(r)
        ]
        outs = apply_butterfly(r, parts, forward, ops=ops)
        if s < ntw:
            t4 = [tw_refs[4 * s + j][...] for j in range(4)]  # (blk, r) planes
            if s == 0 and fold_scale:
                (t4[0], t4[1]), (t4[2], t4[3]) = ops.scale(
                    ((t4[0], t4[1]), (t4[2], t4[3])), scale
                )
                outs[0] = ops.scale(outs[0], scale)
            t6 = ops.split_table(t4)  # once per stage, (blk, r)-sized
            for k in range(1, r):
                tk = tuple(t[:, k].reshape(blk, 1) for t in t6)
                outs[k] = ops.mul_tw(outs[k], tk)
        if s == last:
            # Final stage: m == 1, out k is the contiguous row slab
            # [k*stride, (k+1)*stride) — store straight to the output refs,
            # skipping the 4-plane stack+reshape materialization (safe
            # under aliasing: every input ref was read once up front). The
            # mode scale rides the first twiddle stage (fold_scale) when
            # one exists, else it lands here.
            for k in range(r):
                o = (
                    outs[k]
                    if scale is None or fold_scale
                    else ops.scale(outs[k], scale)
                )
                (rh_, rl_), (ih_, il_) = o
                for ref, val in zip(out_refs, (rh_, rl_, ih_, il_)):
                    ref[k * stride:(k + 1) * stride] = val
            return
        # Interleave: (r, m, stride, CB) -> (m, r, stride, CB) -> flat.
        flat = []
        for plane_i in range(4):
            sel = lambda o: o[plane_i // 2][plane_i % 2]
            if stride == 1:
                st = jnp.stack([sel(o) for o in outs], axis=1)  # (m, r, CB)
            else:
                st = jnp.stack(
                    [sel(o).reshape(m, stride, cb) for o in outs], axis=1
                )
            flat.append(st.reshape(n, cb))
        planes = flat
        size = m
        stride *= r


def _stages_value_dd(planes, n, schedule, tws, forward, ops):
    """Full dd Stockham stage pipeline on four (n, cb) plane VALUES.

    `tws`: per-twiddle-stage 4-tuples of (blk, r) plane values (final stage's
    all-ones table omitted). The fused Bluestein kernel runs two of these
    pipelines back to back, so unlike :func:`_kernel` there is no direct
    final-stage store — the caller keeps consuming values.
    """
    cb = planes[0].shape[-1]
    ntw = len(schedule) - 1
    size = n
    stride = 1
    for s, r in enumerate(schedule):
        m = size // r
        blk = m * stride
        parts = [
            (
                (planes[0][k * blk:(k + 1) * blk],
                 planes[1][k * blk:(k + 1) * blk]),
                (planes[2][k * blk:(k + 1) * blk],
                 planes[3][k * blk:(k + 1) * blk]),
            )
            for k in range(r)
        ]
        outs = apply_butterfly(r, parts, forward, ops=ops)
        if s < ntw:
            t6 = ops.split_table(tws[s])  # once per stage, (blk, r)-sized
            for k in range(1, r):
                tk = tuple(t[:, k].reshape(blk, 1) for t in t6)
                outs[k] = ops.mul_tw(outs[k], tk)
        flat = []
        for plane_i in range(4):
            sel = lambda o: o[plane_i // 2][plane_i % 2]
            if stride == 1:
                st = jnp.stack([sel(o) for o in outs], axis=1)
            else:
                st = jnp.stack(
                    [sel(o).reshape(m, stride, cb) for o in outs], axis=1
                )
            flat.append(st.reshape(n, cb))
        planes = flat
        size = m
        stride *= r
    return planes


def _bluestein_kernel_dd(n, m_inner, schedule, scale, barrier, *refs):
    """Fully-fused dd Bluestein chirp-z over four (n, CB) planes.

    The dd twin of :func:`stockham_vpu._bluestein_kernel`: chirp multiply ->
    zero-pad to m_inner -> forward dd stages -> w multiply -> inverse dd
    stages (1/M folded into the output chirp at plan time) -> chirp multiply
    (+ mode scale) -> store, all VMEM-resident. Fusing matters ~10x more for
    dd than c64: the composed path's six dispatches each move FOUR planes
    through HBM.

    Ref order: fwd stage tables (4*ntw), inv stage tables (4*ntw), xt (4,
    (n,1)), wt (4, (m_inner,1)), xt_out (4, (n,1), includes 1/M), input
    planes (4), output planes (4).
    """
    ops = _DdOps(barrier)
    ntw = len(schedule) - 1
    fwd_tws = [
        tuple(refs[4 * s + j][...] for j in range(4)) for s in range(ntw)
    ]
    off = 4 * ntw
    inv_tws = [
        tuple(refs[off + 4 * s + j][...] for j in range(4))
        for s in range(ntw)
    ]
    off = 8 * ntw
    xt = tuple(refs[off + j][...] for j in range(4))
    wt = tuple(refs[off + 4 + j][...] for j in range(4))
    xo = tuple(refs[off + 8 + j][...] for j in range(4))
    x_refs = refs[off + 12: off + 16]
    out_refs = refs[off + 16:]
    planes = [r_[...] for r_ in x_refs]
    cb = planes[0].shape[-1]
    as_val = lambda p4: ((p4[0], p4[1]), (p4[2], p4[3]))
    as_p4 = lambda v: [v[0][0], v[0][1], v[1][0], v[1][1]]
    # chirp multiply ((n,1) tables broadcast over (n, cb), split once) + pad
    v = ops.mul_tw(as_val(planes), ops.split_table(xt))
    zeros = jnp.zeros((m_inner - n, cb), jnp.float32)
    p4 = [jnp.concatenate([p, zeros], axis=0) for p in as_p4(v)]
    # inner forward FFT
    p4 = _stages_value_dd(p4, m_inner, schedule, fwd_tws, True, ops)
    # w multiply
    p4 = as_p4(ops.mul_tw(as_val(p4), ops.split_table(wt)))
    # inner inverse FFT (unscaled; 1/M lives in xo)
    p4 = _stages_value_dd(p4, m_inner, schedule, inv_tws, False, ops)
    # final chirp multiply on the first n rows; the mode scale rides the
    # (n, 1) chirp-out table (1/cb of the data size) instead of a full
    # dd scale pass.
    xo_v = ((xo[0], xo[1]), (xo[2], xo[3]))
    if scale is not None:
        xo_v = ops.scale(xo_v, scale)
    xo4 = [xo_v[0][0], xo_v[0][1], xo_v[1][0], xo_v[1][1]]
    v = ops.mul_tw(as_val([p[:n] for p in p4]), ops.split_table(xo4))
    for ref, val in zip(out_refs, as_p4(v)):
        ref[...] = val


def vpu_dd_bluestein_batch_minor(
    rh, rl, ih, il,
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
    """Fused dd Bluestein FFT over batch-minor 4-plane data of shape (n, B).

    `stage_tables` = (fwd_tables, inv_tables) for m_inner (from
    :func:`make_stage_tables_dd`); `chirp_tables` = (xt, wt, xt_out), each a
    4-tuple of f32 planes of shapes (n,1)/(m_inner,1)/(n,1), direction-
    matched, with 1/m_inner folded into xt_out. B must be a multiple of cb.
    """
    schedule = radix_schedule_dd(m_inner)
    assert schedule is not None, m_inner
    b = rh.shape[-1]
    assert b % cb == 0, (b, cb)
    grid = (b // cb,)
    io = pl.BlockSpec((n, cb), lambda i: (0, i), memory_space=_VMEM)
    const_specs = []
    const_args = []
    fwd_tables, inv_tables = stage_tables
    for tbl in (fwd_tables, inv_tables):
        for t4 in tbl:
            shp = np.asarray(t4[0]).shape
            const_specs += [
                pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
            ] * 4
            const_args += [jnp.asarray(t) for t in t4]
    for t4 in chirp_tables:
        shp = np.asarray(t4[0]).shape
        const_specs += [
            pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
        ] * 4
        const_args += [jnp.asarray(t) for t in t4]
    out_shape = [jax.ShapeDtypeStruct((n, b), jnp.float32)] * 4
    kern = functools.partial(
        _bluestein_kernel_dd, n, m_inner, tuple(schedule), scale,
        bool(interpret),
    )
    flops = int(12 * (2 * 5 * m_inner * np.log2(m_inner) + 18 * n) * b)
    n_consts = len(const_args)
    kw = {}
    if vmem_limit_bytes and pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes)
        )
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=const_specs + [io, io, io, io],
        out_specs=[io, io, io, io],
        out_shape=out_shape,
        input_output_aliases={
            n_consts: 0, n_consts + 1: 1, n_consts + 2: 2, n_consts + 3: 3
        },
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n * b * 32, transcendentals=0
        ),
        **kw,
    )(*const_args, rh, rl, ih, il)
    return outs


def vpu_dd_fft_batch_minor(
    rh, rl, ih, il,
    n: int,
    tables,
    forward: bool,
    scale: Optional[float],
    *,
    cb: int = 128,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
):
    """Fused dd FFT over batch-minor 4-plane data of shape (n, B).

    B must be a multiple of `cb`. `tables` from :func:`make_stage_tables_dd`
    (direction-matched). Returns 4 (n, B) planes.
    """
    schedule = radix_schedule_dd(n)
    assert schedule is not None, n
    b = rh.shape[-1]
    assert b % cb == 0, (b, cb)
    grid = (b // cb,)
    io = pl.BlockSpec((n, cb), lambda i: (0, i), memory_space=_VMEM)
    const_specs = []
    const_args = []
    for t4 in tables:
        shp = t4[0].shape
        const_specs += [
            pl.BlockSpec(shp, lambda i: (0, 0), memory_space=_VMEM)
        ] * 4
        const_args += [jnp.asarray(t) for t in t4]
    out_shape = [jax.ShapeDtypeStruct((n, b), jnp.float32)] * 4
    # barrier=True only on XLA-executed (interpret) paths; Mosaic needs none.
    kern = functools.partial(
        _kernel, n, tuple(schedule), forward, scale, bool(interpret)
    )
    flops = int(12 * 5 * n * np.log2(n) * b)  # ~12 hw flops per nominal
    n_consts = len(const_args)
    kw = {}
    if vmem_limit_bytes and pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes)
        )
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=const_specs + [io, io, io, io],
        out_specs=[io, io, io, io],
        out_shape=out_shape,
        input_output_aliases={
            n_consts: 0, n_consts + 1: 1, n_consts + 2: 2, n_consts + 3: 3
        },
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n * b * 32, transcendentals=0
        ),
        **kw,
    )(*const_args, rh, rl, ih, il)
    return outs
