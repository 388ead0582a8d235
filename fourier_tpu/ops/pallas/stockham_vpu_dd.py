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

    def _dscale_const(self, x, s: float):
        """dd * arbitrary f64 scalar constant, dd-split for accuracy."""
        sh, sl = ddreal.const(float(s))
        return self._dadd(self._dmul_f32(x, sh), self._dmul_f32(x, sl))

    # -- ddcplx vocabulary (complex over dd pairs) -------------------------

    def add(self, a, b):
        return self._dadd(a[0], b[0]), self._dadd(a[1], b[1])

    def sub(self, a, b):
        return self._dsub(a[0], b[0]), self._dsub(a[1], b[1])

    def mul(self, a, b):
        re = self._dsub(self._dmul(a[0], b[0]), self._dmul(a[1], b[1]))
        im = self._dadd(self._dmul(a[0], b[1]), self._dmul(a[1], b[0]))
        return re, im

    def mul_const(self, a, cr: float, ci: float):
        mulc = lambda x, c: self._dadd(
            self._dmul_f32(x, ddreal.const(c)[0]),
            self._dmul_f32(x, ddreal.const(c)[1]),
        )
        re = self._dsub(mulc(a[0], cr), mulc(a[1], ci))
        im = self._dadd(mulc(a[0], ci), mulc(a[1], cr))
        return re, im

    def scale(self, a, s: float):
        return self._dscale_const(a[0], s), self._dscale_const(a[1], s)

    def rotate(self, a, forward: bool):
        if forward:
            return self._dneg(a[1]), a[0]
        return a[1], self._dneg(a[0])


def radix_schedule_dd(n: int) -> Optional[Sequence[int]]:
    """Stage radices for the dd kernel: n = 2^a*3^b, 8 | n, 64 <= n <= 4096.

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
    if pow2 & (pow2 - 1):
        return None
    if pow2 < 8:
        # Pure 3^b stays on the XLA dd path: an all-radix-3 fused schedule
        # was measured 3x SLOWER than XLA dd here (round 3: 243 at 10.9 vs
        # 32.1 GF nominal) — the misaligned 3-based interleaves dominate
        # even dd's 12x compute multiplier.
        return None
    sched = []
    m = pow2
    while m % 8 == 0:
        sched.append(8)
        m //= 8
    if m > 1:
        sched.append(int(m))  # 4 or 2
    sched.extend([3] * threes)
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
            for k in range(1, r):
                tk = tuple(t[:, k].reshape(blk, 1) for t in t4)
                outs[k] = ops.mul(
                    outs[k], ((tk[0], tk[1]), (tk[2], tk[3]))
                )
        if s == last:
            # Final stage: m == 1, out k is the contiguous row slab
            # [k*stride, (k+1)*stride) — fold the mode scale in and store
            # straight to the output refs, skipping the 4-plane stack+
            # reshape materialization and the separate dd scale pass (safe
            # under aliasing: every input ref was read once up front).
            for k in range(r):
                o = outs[k] if scale is None else ops.scale(outs[k], scale)
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
