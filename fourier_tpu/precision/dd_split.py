"""Radix-r DIT split dd plans: c128 sizes just outside the fused kernel.

The fused-VPU dd kernel tops out at n=4096 (VMEM ceiling, see
``stockham_vpu_dd.radix_schedule_dd``); the XLA dd Stockham it falls back to
at 8192 was measured ~6x slower per point (round 3) — and 8192 is exactly the
Bluestein inner size every c128 transform of n in (2048, 4096] needs (e.g. the
bench suite's n=3125). This module computes FFT_{r*m} as one *batched*
fused-m call plus one O(n) dd combine pass (shown for r = 2):

    E = FFT_m(x[0::2]),  O = FFT_m(x[1::2])        (stacked: ONE kernel call)
    X[k]   = E[k] + w^k O[k]
    X[k+m] = E[k] - w^k O[k],   w = exp(-+2*pi*i*k/2m)

so the heavy stage arithmetic stays inside the fused kernel at its native
size. :class:`DdSplitPow2Plan` is the r = 2 case (recursion covers 16384);
:class:`DdSplitRadixPlan` generalizes to r in {3, 5} for odd-smooth sizes
whose quotient is fused — 2187 = 3*729 and 3125 = 5*625 run their residue
classes through the tabled two-stage 27/25 kernels and combine with the
shared radix-3/5 butterfly over the dd complex vocabulary
(``ops/butterflies.apply_butterfly(ops=ddcplx)``). Measured round 4: the
all-fused 3-stage alternatives are worse or impossible (2187 (27,27,3)
29.0 GF — misaligned interleaves; 3125 (25,25,5) OOMs VMEM on 112 MiB of
register spills). With round 5's fused Pallas combine
(``ops/pallas/dd_combine.py`` — the twiddle x dd-mul + radix-r dd butterfly
was the O(n) XLA tail) the split measures 48.7/47.3 GF at the suite config
(batch 16384, chain 16, sqrt-scaled) vs 34.4/31.8 for the r4 XLA combine
and 27.9/14.4 for the XLA-path rows it replaced — see PROF_r5.json
dd_split_combine_kernel_gflops and BENCH_SUITE_r5.json pow3/pow5 c128 rows. All five transform modes are supported: the
sub-transforms run unscaled in the matching direction and the mode's scale
rides the (r-1) twiddle tables and the untwiddled class (1/r of the data).

Reference parity: the planner's power-of-two-inner guarantee for Bluestein
(``fourier/src/lib.rs:31-48``); the DIT split itself is standard and chosen
here purely for the TPU VMEM ceiling, not mirrored from the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.transform import Transform

#: Largest size the recursive split covers. Above this the extra O(n) combine
#: passes (and the degrading batch granularity of the halves) erode the win;
#: XLA dd Stockham takes over.
MAX_SPLIT_SIZE = 16384


def _twiddle_tables(m: int):
    """dd tables for w^k = exp(-2*pi*i*k/(2m)), k in [0, m), fwd + inv.

    f64 numpy at plan time (twiddle.py convention), split exactly into
    (hi, lo) f32 pairs.
    """
    from fourier_tpu.precision.dd_plan import _split_table

    theta = np.pi * np.arange(m, dtype=np.float64) / float(m)
    w = np.cos(theta) - 1j * np.sin(theta)
    return _split_table(w), _split_table(np.conj(w))


def _radix_twiddle_tables(n: int, r: int):
    """dd tables w^(t*k) = exp(-2*pi*i*t*k/n), t in [1, r), k in [0, n/r).

    One 4-plane (hi, lo) split per residue class t, fwd + inv tuples.
    """
    from fourier_tpu.precision.dd_plan import _split_table

    m = n // r
    k = np.arange(m, dtype=np.float64)
    fwd, inv = [], []
    for t in range(1, r):
        theta = 2.0 * np.pi * (t * k) / float(n)
        w = np.cos(theta) - 1j * np.sin(theta)
        fwd.append(_split_table(w))
        inv.append(_split_table(np.conj(w)))
    return tuple(fwd), tuple(inv)


@jax.tree_util.register_pytree_node_class
class DdSplitPow2Plan:
    """Radix-2 DIT over a fused-VPU dd half plan (sizes 8192, 16384)."""

    dtype = np.dtype(np.complex128)
    kind = "split-vpu-dd"

    def __init__(self, size, half, tw_fwd, tw_inv):
        self.size = int(size)
        self.half = half
        self.tw_fwd = tw_fwd
        self.tw_inv = tw_inv
        self._fallback_plan = None  # lazy eager-numpy twin

    #: Max radix-2 split levels per chain. Two cover the target sizes
    #: (16384 = 2*(2*4096)); deeper chains stack 3+ O(n) XLA dd combine
    #: passes over ever-thinner fused sub-calls (e.g. 10000 would reach
    #: fused-625 under FOUR combine levels) — shapes nobody has measured a
    #: win for, and 5-smooth sizes like 10000 route better through the
    #: single-combine DdSplitRadixPlan (sub 2000 is fused).
    MAX_DEPTH = 2

    @classmethod
    def create(cls, size: int, *,
               _depth: int = MAX_DEPTH) -> Optional["DdSplitPow2Plan"]:
        from fourier_tpu.precision.vpu_dd_plan import VpuDdFftPlan

        if size % 2 or size > MAX_SPLIT_SIZE or _depth < 1:
            return None
        m = size // 2
        # The planner tries the fused plan for `size` itself first; here we
        # only need a fast half (fused directly, or one more split level).
        half = VpuDdFftPlan.create(m) or cls.create(m, _depth=_depth - 1)
        if half is None:
            return None
        fwd, inv = _twiddle_tables(m)
        return cls(size, half, fwd, inv)

    # -- execution -----------------------------------------------------------

    def _apply_dd(self, value, transform: Transform):
        """((rh, rl), (ih, il)) with (..., n) planes — DdFftPlan interface."""
        transform = Transform(transform)
        (rh, rl), (ih, il) = value
        if isinstance(rh, np.ndarray):
            return self._fallback()._apply_dd(value, transform)
        return _apply_dd_via_bm(self, value, transform)

    def transform_planar_dd_bm(self, rh, rl, ih, il,
                               transform: Transform = Transform.FFT):
        """Batch-minor (n, B) dd planes, transpose-free end-to-end.

        The class de-interleave is a pure reshape in this layout —
        (n, B) row k = i*2 + t IS (m, 2*B) lane t*B + b — so the batched
        fused sub-call and the Pallas combine kernel
        (:mod:`fourier_tpu.ops.pallas.dd_combine`) see their native layout
        with zero data movement between them.
        """
        return _split_bm(
            self, 2, self.half, (rh, rl, ih, il), Transform(transform)
        )

    # -- DdFftPlan-compatible conveniences ------------------------------------

    def transform_planar_dd(self, re_hi, re_lo, im_hi, im_lo,
                            transform: Transform = Transform.FFT):
        value = ((re_hi, re_lo), (im_hi, im_lo))
        (rh, rl), (ih, il) = self._apply_dd(value, Transform(transform))
        return rh, rl, ih, il

    def transform(self, x, transform: Transform = Transform.FFT) -> np.ndarray:
        """complex128 numpy convenience (exact host split/recombine)."""
        return self._fallback().transform(x, transform)

    def fft(self, x):
        return self.transform(x, Transform.FFT)

    def ifft(self, x):
        return self.transform(x, Transform.IFFT)

    def __call__(self, x, transform: Transform = Transform.FFT):
        return self.transform(x, transform)

    def _fallback(self):
        if self._fallback_plan is None:
            from fourier_tpu.precision.dd_plan import DdFftPlan

            self._fallback_plan = DdFftPlan(self.size)
        return self._fallback_plan

    def __repr__(self):
        return f"DdSplitPow2Plan(size={self.size}, half={self.half!r})"

    # -- pytree ----------------------------------------------------------------

    def tree_flatten(self):
        return (self.half, self.tw_fwd, self.tw_inv), (self.size,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        half, tw_fwd, tw_inv = children
        return cls(aux[0], half, tw_fwd, tw_inv)


@jax.tree_util.register_pytree_node_class
class DdSplitRadixPlan:
    """Radix-r (r in {3, 5}) DIT over a fused-VPU dd sub-plan.

    n = r*m with m carrying a fused dd schedule: the r residue classes run
    as ONE batched fused-kernel call, then an O(n) dd combine twiddles
    classes 1..r-1 and applies the shared radix-r butterfly
    (``ops/butterflies`` over the ddcplx vocabulary). Covers 2187 = 3*729
    and 3125 = 5*625 (see module docstring for the measured rationale).
    """

    dtype = np.dtype(np.complex128)
    kind = "split-radix-vpu-dd"

    RADICES = (3, 5)

    def __init__(self, size, radix, sub, tw_fwd, tw_inv):
        self.size = int(size)
        self.radix = int(radix)
        self.sub = sub
        self.tw_fwd = tw_fwd
        self.tw_inv = tw_inv
        self._fallback_plan = None  # lazy eager-numpy twin

    @classmethod
    def create(cls, size: int) -> Optional["DdSplitRadixPlan"]:
        from fourier_tpu.precision.vpu_dd_plan import VpuDdFftPlan

        if size > MAX_SPLIT_SIZE:
            return None
        for r in cls.RADICES:
            if size % r:
                continue
            sub = VpuDdFftPlan.create(size // r)
            if sub is not None:
                fwd, inv = _radix_twiddle_tables(size, r)
                return cls(size, r, sub, fwd, inv)
        return None

    # -- execution -----------------------------------------------------------

    def _apply_dd(self, value, transform: Transform):
        """((rh, rl), (ih, il)) with (..., n) planes — DdFftPlan interface."""
        transform = Transform(transform)
        (rh, rl), (ih, il) = value
        if isinstance(rh, np.ndarray):
            return self._fallback()._apply_dd(value, transform)
        return _apply_dd_via_bm(self, value, transform)

    def transform_planar_dd_bm(self, rh, rl, ih, il,
                               transform: Transform = Transform.FFT):
        """Batch-minor (n, B) dd planes, transpose-free end-to-end.

        Same layout contract as :meth:`DdSplitPow2Plan.transform_planar_dd_bm`
        with r = self.radix residue classes.
        """
        return _split_bm(
            self, self.radix, self.sub, (rh, rl, ih, il), Transform(transform)
        )

    # -- DdFftPlan-compatible conveniences ------------------------------------

    def transform_planar_dd(self, re_hi, re_lo, im_hi, im_lo,
                            transform: Transform = Transform.FFT):
        value = ((re_hi, re_lo), (im_hi, im_lo))
        (rh, rl), (ih, il) = self._apply_dd(value, Transform(transform))
        return rh, rl, ih, il

    def transform(self, x, transform: Transform = Transform.FFT) -> np.ndarray:
        """complex128 numpy convenience (exact host split/recombine)."""
        return self._fallback().transform(x, transform)

    def fft(self, x):
        return self.transform(x, Transform.FFT)

    def ifft(self, x):
        return self.transform(x, Transform.IFFT)

    def __call__(self, x, transform: Transform = Transform.FFT):
        return self.transform(x, transform)

    def _fallback(self):
        if self._fallback_plan is None:
            from fourier_tpu.precision.dd_plan import DdFftPlan

            self._fallback_plan = DdFftPlan(self.size)
        return self._fallback_plan

    def __repr__(self):
        return (
            f"DdSplitRadixPlan(size={self.size}, radix={self.radix}, "
            f"sub={self.sub!r})"
        )

    # -- pytree ----------------------------------------------------------------

    def tree_flatten(self):
        return (self.sub, self.tw_fwd, self.tw_inv), (self.size, self.radix)

    @classmethod
    def tree_unflatten(cls, aux, children):
        sub, tw_fwd, tw_inv = children
        return cls(aux[0], aux[1], sub, tw_fwd, tw_inv)


# -- batch-minor execution (shared by both split plans) ------------------------


def _exec_cfg(plan):
    """(cb, interpret, vmem_limit) of the innermost fused sub-plan.

    Test configurations substitute XLA ``DdFftPlan`` subs (no Pallas config);
    they get the interpret-mode defaults — exactly the sanitizer regime those
    tests run the combine kernel in.
    """
    sub = plan
    while sub is not None and not hasattr(sub, "cb"):
        sub = getattr(sub, "half", None) or getattr(sub, "sub", None)
    if sub is None:
        return 128, jax.default_backend() != "tpu", None
    return sub.cb, sub.interpret, sub.vmem_limit_bytes


def _sub_bm(sub, planes, mode):
    """Run the sub-plan on batch-minor (m, RB) planes."""
    if hasattr(sub, "transform_planar_dd_bm"):
        return sub.transform_planar_dd_bm(*planes, mode)
    # XLA dd sub (test configurations): batch-major adapter.
    value = ((planes[0].T, planes[1].T), (planes[2].T, planes[3].T))
    (rh, rl), (ih, il) = sub._apply_dd(value, mode)
    return rh.T, rl.T, ih.T, il.T


def _split_bm(plan, r, sub, planes, transform):
    """Radix-r DIT split over (n, B) planes: reshape → batched fused sub →
    one fused Pallas combine (:mod:`fourier_tpu.ops.pallas.dd_combine`).

    The class de-interleave is free here: (n, B) row i*r + t IS
    (m, r*B) lane t*B + b under a pure reshape, which is the batched
    sub-call's native input AND the combine kernel's class-block layout —
    zero data movement end-to-end.
    """
    from fourier_tpu.ops.pallas.dd_combine import dd_split_combine_batch_minor

    transform = Transform(transform)
    forward = transform.is_forward
    n = plan.size
    m = n // r
    cb, interpret, vmem = _exec_cfg(plan)
    planes = [jnp.asarray(p) for p in planes]
    if planes[0].shape[0] != n:
        raise ValueError(f"leading axis {planes[0].shape[0]} != plan size {n}")
    b = planes[0].shape[-1]
    bp = -(-b // cb) * cb
    if bp != b:
        planes = [jnp.pad(p, [(0, 0), (0, bp - b)]) for p in planes]
    sub_in = [p.reshape(m, r * bp) for p in planes]
    sub_mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
    souts = _sub_bm(sub, sub_in, sub_mode)
    tws = plan.tw_fwd if forward else plan.tw_inv
    tables = (tws,) if r == 2 else tws
    tables = tuple(
        tuple(jnp.asarray(t).reshape(m, 1) for t in t4) for t4 in tables
    )
    outs = dd_split_combine_batch_minor(
        *souts, n, r, tables, forward, transform.scale(n),
        cb=cb, interpret=interpret, vmem_limit_bytes=vmem,
    )
    return tuple(o[:, :b] for o in outs)


def _apply_dd_via_bm(plan, value, transform):
    """Batch-major (..., n) DdFftPlan-interface adapter over the bm path."""
    (rh, rl), (ih, il) = value
    batch_shape = rh.shape[:-1]
    b = int(np.prod(batch_shape, initial=1))
    n = plan.size
    bm = [jnp.asarray(p).reshape(b, n).T for p in (rh, rl, ih, il)]
    orh, orl, oih, oil = plan.transform_planar_dd_bm(*bm, transform)
    back = lambda p: p.T.reshape(*batch_shape, n)
    return (back(orh), back(orl)), (back(oih), back(oil))
