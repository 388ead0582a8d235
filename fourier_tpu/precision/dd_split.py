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
register spills), while the split measures 34.4/31.8 GF at the suite
config (batch 16384/21845, chain 16, sqrt-scaled) vs 27.9/14.4 for the
XLA-path rows it replaces — see BENCH_SUITE_r5.json pow3/pow5 c128 rows. All five transform modes are supported: the
sub-transforms run unscaled in the matching direction and the mode's scale
rides the (r-1) twiddle tables and the untwiddled class (1/r of the data).

Reference parity: the planner's power-of-two-inner guarantee for Bluestein
(``fourier/src/lib.rs:31-48``); the DIT split itself is standard and chosen
here purely for the TPU VMEM ceiling, not mirrored from the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from fourier_tpu.ops.stockham_jax import xp_for
from fourier_tpu.precision import ddcplx
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
        forward = transform.is_forward
        scale = transform.scale(self.size)
        m = self.size // 2
        xp = xp_for(rh)

        # De-interleave even/odd into a fresh leading-of-last batch axis:
        # (..., 2m) -> (..., 2, m) with [..., 0, :] = x[0::2].
        planes = [
            xp.moveaxis(p.reshape(*p.shape[:-1], m, 2), -1, -2)
            for p in (rh, rl, ih, il)
        ]
        sub = ((planes[0], planes[1]), (planes[2], planes[3]))
        sub_mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
        (srh, srl), (sih, sil) = self.half._apply_dd(sub, sub_mode)

        tw4 = self.tw_fwd if forward else self.tw_inv
        twd = (
            (xp.asarray(tw4[0]), xp.asarray(tw4[1])),
            (xp.asarray(tw4[2]), xp.asarray(tw4[3])),
        )
        pick = lambda p, i: p[..., i, :]
        ev = ((pick(srh, 0), pick(srl, 0)), (pick(sih, 0), pick(sil, 0)))
        od = ((pick(srh, 1), pick(srl, 1)), (pick(sih, 1), pick(sil, 1)))
        t = ddcplx.mul(od, twd)
        lo = ddcplx.add(ev, t)
        hi = ddcplx.sub(ev, t)
        if scale is not None:
            lo = ddcplx.scale(lo, scale)
            hi = ddcplx.scale(hi, scale)
        cat = lambda a, b: xp.concatenate([a, b], axis=-1)
        return (
            (cat(lo[0][0], hi[0][0]), cat(lo[0][1], hi[0][1])),
            (cat(lo[1][0], hi[1][0]), cat(lo[1][1], hi[1][1])),
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
        from fourier_tpu.ops.butterflies import apply_butterfly

        transform = Transform(transform)
        (rh, rl), (ih, il) = value
        if isinstance(rh, np.ndarray):
            return self._fallback()._apply_dd(value, transform)
        forward = transform.is_forward
        scale = transform.scale(self.size)
        r = self.radix
        m = self.size // r
        xp = xp_for(rh)

        # De-interleave the r residue classes into a fresh batch axis:
        # (..., r*m) -> (..., r, m) with [..., t, :] = x[t::r].
        planes = [
            xp.moveaxis(p.reshape(*p.shape[:-1], m, r), -1, -2)
            for p in (rh, rl, ih, il)
        ]
        sub_val = ((planes[0], planes[1]), (planes[2], planes[3]))
        sub_mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
        (srh, srl), (sih, sil) = self.sub._apply_dd(sub_val, sub_mode)

        pick = lambda p, t: p[..., t, :]
        parts = [
            ((pick(srh, t), pick(srl, t)), (pick(sih, t), pick(sil, t)))
            for t in range(r)
        ]
        # Twiddle classes 1..r-1; the mode scale rides the (m,)-sized tables
        # and the untwiddled class 0 (1/r of the data) instead of all r
        # output sections.
        tws = self.tw_fwd if forward else self.tw_inv
        for t in range(1, r):
            t4 = tws[t - 1]
            twd = (
                (xp.asarray(t4[0]), xp.asarray(t4[1])),
                (xp.asarray(t4[2]), xp.asarray(t4[3])),
            )
            if scale is not None:
                twd = ddcplx.scale(twd, scale)
            parts[t] = ddcplx.mul(parts[t], twd)
        if scale is not None:
            parts[0] = ddcplx.scale(parts[0], scale)
        outs = apply_butterfly(r, parts, forward, ops=ddcplx)

        # outs[j] is the contiguous output section X[j*m:(j+1)*m].
        cat = lambda sel: xp.concatenate([sel(o) for o in outs], axis=-1)
        return (
            (cat(lambda o: o[0][0]), cat(lambda o: o[0][1])),
            (cat(lambda o: o[1][0]), cat(lambda o: o[1][1])),
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
