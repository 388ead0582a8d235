"""Radix-2 DIT split dd plan: pow2 c128 sizes above the fused kernel's cap.

The fused-VPU dd kernel tops out at n=4096 (VMEM ceiling, see
``stockham_vpu_dd.radix_schedule_dd``); the XLA dd Stockham it falls back to
at 8192 was measured ~6x slower per point (round 3) — and 8192 is exactly the
Bluestein inner size every c128 transform of n in (2048, 4096] needs (e.g. the
bench suite's n=3125). This plan computes FFT_{2m} as one *batched* fused-m
call plus one O(n) dd combine pass:

    E = FFT_m(x[0::2]),  O = FFT_m(x[1::2])        (stacked: ONE kernel call)
    X[k]   = E[k] + w^k O[k]
    X[k+m] = E[k] - w^k O[k],   w = exp(-+2*pi*i*k/2m)

so the heavy stage arithmetic stays inside the fused kernel at its native
size. Recursion covers 16384 (two combine passes). All five transform modes
are supported: the half transforms run unscaled in the matching direction and
the mode's scale is folded into the combine.

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

    @classmethod
    def create(cls, size: int) -> Optional["DdSplitPow2Plan"]:
        from fourier_tpu.precision.vpu_dd_plan import VpuDdFftPlan

        if size % 2 or size > MAX_SPLIT_SIZE:
            return None
        m = size // 2
        # The planner tries the fused plan for `size` itself first; here we
        # only need a fast half (fused directly, or one more split level).
        half = VpuDdFftPlan.create(m) or cls.create(m)
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
