"""c128 FFT plans via double-word f32 emulation: the TPU f64 path.

The reference's ``create_fft_f64`` (``fourier/src/lib.rs:49-60``) on hardware
with no f64: every real is a dd pair (hi, lo) of f32 (precision/ddreal.py),
the execute path is the same Stockham/Bluestein structure as the f32 plans
(shared butterfly code, parameterized by the ddcplx ops vocabulary), and all
plan-time tables are f64 numpy split exactly into dd pairs. Meets the c128
gate (<=1e-12 rel-L2, BASELINE.md) at ~10x the f32 flop count.

Data layout: four planes (re_hi, re_lo, im_hi, im_lo) of f32. The complex128
convenience API splits/recombines host-side in numpy, so this path needs
neither jax x64 mode nor device f64 support.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from fourier_tpu.ops.butterflies import apply_butterfly
from fourier_tpu.ops.stockham_jax import xp_for
from fourier_tpu.plan.factor import factorize_autosort, next_power_of_two
from fourier_tpu.precision import ddcplx
from fourier_tpu.precision import ddreal as dd
from fourier_tpu.transform import Transform
from fourier_tpu.twiddle import half_twiddle, stage_twiddles

# A dd-complex working value: ((re_hi, re_lo), (im_hi, im_lo)).
DDC = Tuple


def _split_table(a: np.ndarray):
    """f64 complex numpy -> 4 jnp f32 planes (re_hi, re_lo, im_hi, im_lo)."""
    import jax.numpy as jnp

    rh, rl = dd.from_f64(a.real)
    ih, il = dd.from_f64(a.imag)
    return tuple(jnp.asarray(p) for p in (rh, rl, ih, il))


def _stage_stack(xp, outs, plane, batch_shape, n):
    return xp.stack([o[plane[0]][plane[1]] for o in outs], axis=-2).reshape(
        *batch_shape, n
    )


def apply_stages_dd(value: DDC, radices: Sequence[int], twiddles, forward: bool,
                    scale: Optional[float]) -> DDC:
    """Stockham stage loop over dd-complex planes (stockham_jax twin)."""
    (rh, rl), (ih, il) = value
    xp = xp_for(rh)
    n = rh.shape[-1]
    batch_shape = rh.shape[:-1]
    size = n
    stride = 1
    for radix, tw in zip(radices, twiddles):
        m = size // radix
        planes = [p.reshape(*batch_shape, radix, m, stride) for p in (rh, rl, ih, il)]
        parts = [
            (
                (planes[0][..., k, :, :], planes[1][..., k, :, :]),
                (planes[2][..., k, :, :], planes[3][..., k, :, :]),
            )
            for k in range(radix)
        ]
        outs = apply_butterfly(radix, parts, forward, ops=ddcplx)
        if size != radix:
            twrh, twrl, twih, twil = (xp.asarray(t) for t in tw)
            for k in range(1, radix):
                tk = (
                    (twrh[:, k].reshape(m, 1), twrl[:, k].reshape(m, 1)),
                    (twih[:, k].reshape(m, 1), twil[:, k].reshape(m, 1)),
                )
                outs[k] = ddcplx.mul(outs[k], tk)
        rh = _stage_stack(xp, outs, (0, 0), batch_shape, n)
        rl = _stage_stack(xp, outs, (0, 1), batch_shape, n)
        ih = _stage_stack(xp, outs, (1, 0), batch_shape, n)
        il = _stage_stack(xp, outs, (1, 1), batch_shape, n)
        size = m
        stride *= radix
    out = ((rh, rl), (ih, il))
    if scale is not None:
        out = ddcplx.scale(out, scale)
    return out


class DdFftPlan:
    """Arbitrary-size c128 plan on f32 hardware (dd emulation).

    Mirrors the planner split (``fourier/src/lib.rs:31-60``): Stockham for
    2^a*3^b sizes, Bluestein otherwise (inner power-of-two DdFftPlan, chirp
    tables from f64 numpy at plan time per ``bluesteins.rs:18-61``).
    """

    dtype = np.dtype(np.complex128)

    def __init__(self, size: int, inner_factory=None):
        if size < 1:
            raise ValueError(f"FFT size must be >= 1, got {size}")
        self.size = int(size)
        radices = factorize_autosort(size)
        if radices is not None:
            self.kind = "stockham"
            self.radices = tuple(radices)
            self.fwd_tw, self.inv_tw = self._stage_tables(size, radices)
            self.inner = None
        else:
            self.kind = "bluestein"
            m = next_power_of_two(2 * size - 1)
            # inner_factory lets the planner substitute a faster power-of-two
            # dd plan (the fused VPU dd kernel on TPU); any object with the
            # `_apply_dd` interface works.
            self.inner = (inner_factory or DdFftPlan)(m)
            n_idx = np.arange(m, dtype=np.float64)
            d = np.where(n_idx < size, n_idx**2, (n_idx - m) ** 2)
            mask = (n_idx < size) | (n_idx > m - size)
            chirp = np.where(mask, half_twiddle(d, size), 0.0 + 0.0j)
            self.w_fwd = _split_table(np.fft.fft(np.conj(chirp)))
            self.w_inv = _split_table(np.fft.fft(chirp))
            j = np.arange(size, dtype=np.float64)
            x_inv = half_twiddle(-(j**2), size)
            self.x_fwd = _split_table(np.conj(x_inv))
            self.x_inv = _split_table(x_inv)

    @staticmethod
    def _stage_tables(size, radices):
        fwd, inv = [], []
        s = size
        for r in radices:
            tf = stage_twiddles(s, r, True)
            ti = stage_twiddles(s, r, False)
            fwd.append(_split_table(tf))
            inv.append(_split_table(ti))
            s //= r
        return tuple(fwd), tuple(inv)

    # -- execution ---------------------------------------------------------

    def _apply_dd(self, value: DDC, transform: Transform) -> DDC:
        transform = Transform(transform)
        forward = transform.is_forward
        scale = transform.scale(self.size)
        if self.kind == "stockham":
            tw = self.fwd_tw if forward else self.inv_tw
            return apply_stages_dd(value, self.radices, tw, forward, scale)
        # Bluestein (bluesteins.rs:215-259 semantics)
        import jax.numpy as jnp

        xp = xp_for(value[0][0])
        xt4 = self.x_fwd if forward else self.x_inv
        wt4 = self.w_fwd if forward else self.w_inv
        as_ddc = lambda t: ((xp.asarray(t[0]), xp.asarray(t[1])),
                            (xp.asarray(t[2]), xp.asarray(t[3])))
        xt, wt = as_ddc(xt4), as_ddc(wt4)
        work = ddcplx.mul(value, xt)
        pad_cfg = [(0, 0)] * (value[0][0].ndim - 1) + [
            (0, self.inner.size - self.size)
        ]
        work = tuple(
            tuple(xp.pad(p, pad_cfg) for p in plane) for plane in work
        )
        work = self.inner._apply_dd(work, Transform.FFT)
        work = ddcplx.mul(work, wt)
        work = self.inner._apply_dd(work, Transform.IFFT)  # absorbs 1/M
        work = tuple(
            tuple(p[..., : self.size] for p in plane) for plane in work
        )
        out = ddcplx.mul(work, xt)
        if scale is not None:
            out = ddcplx.scale(out, scale)
        return out

    def transform_planar_dd(self, re_hi, re_lo, im_hi, im_lo,
                            transform: Transform = Transform.FFT):
        """jit-friendly 4-plane API (f32 planes, the TPU-native c128 path)."""
        value = ((re_hi, re_lo), (im_hi, im_lo))
        (rh, rl), (ih, il) = self._jitted_apply(value, Transform(transform))
        return rh, rl, ih, il

    def _jitted_apply(self, value, transform):
        return _execute_dd(self, value, transform)

    def transform(self, x, transform: Transform = Transform.FFT) -> np.ndarray:
        """complex128 numpy convenience: exact host-side split/recombine.

        Runs the dd pipeline eagerly in numpy (strict IEEE f32, so the
        error-free transforms hold) — no device round-trip. Use
        :meth:`transform_planar_dd` for the jit/TPU path.
        """
        x = np.asarray(x, dtype=np.complex128)
        if x.shape[-1] != self.size:
            raise ValueError(
                f"last axis {x.shape[-1]} != plan size {self.size}"
            )
        rh, rl = dd.from_f64(x.real)
        ih, il = dd.from_f64(x.imag)
        (orh, orl), (oih, oil) = self._apply_dd(
            ((rh, rl), (ih, il)), Transform(transform)
        )
        return dd.to_f64((orh, orl)) + 1j * dd.to_f64((oih, oil))

    def fft(self, x):
        return self.transform(x, Transform.FFT)

    def ifft(self, x):
        return self.transform(x, Transform.IFFT)

    def __call__(self, x, transform: Transform = Transform.FFT):
        return self.transform(x, transform)

    def __repr__(self):
        return f"DdFftPlan(size={self.size}, kind={self.kind})"

    # -- pytree ------------------------------------------------------------

    def tree_flatten(self):
        if self.kind == "stockham":
            children = (self.fwd_tw, self.inv_tw)
            aux = ("stockham", self.size, self.radices)
        else:
            children = (self.inner, self.w_fwd, self.w_inv, self.x_fwd, self.x_inv)
            aux = ("bluestein", self.size)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.kind = aux[0]
        obj.size = aux[1]
        if obj.kind == "stockham":
            obj.radices = aux[2]
            obj.fwd_tw, obj.inv_tw = children
            obj.inner = None
        else:
            (obj.inner, obj.w_fwd, obj.w_inv, obj.x_fwd, obj.x_inv) = children
        return obj


jax.tree_util.register_pytree_node(
    DdFftPlan,
    lambda p: p.tree_flatten(),
    DdFftPlan.tree_unflatten,
)

import functools


@functools.partial(jax.jit, static_argnames=("transform",))
def _execute_dd(plan, value, transform):
    return plan._apply_dd(value, transform)
