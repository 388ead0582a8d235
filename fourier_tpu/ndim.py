"""Multi-dimensional FFTs (single-chip): fft2 / fftn over trailing axes.

The reference is 1-D only; multi-dimensional transforms are part of the TPU
build's widened surface (BASELINE.json configs include 2-D). An N-D transform
is separable: a 1-D plan applied along each transformed axis, with the mode's
normalization applied ONCE over the total transformed size (so the five
``Transform`` modes keep their 1-D semantics: IFFT scales by 1/prod(shape),
the sqrt-scaled pair stays unitary).

c128 works everywhere the reference's f64 path does (``fourier/src/lib.rs:49``
is unconditional): on an x64 host the per-axis plans are native-f64 2-plane
plans, on TPU (no f64) they are 4-plane double-word plans — the planar N-D
driver handles both representations.

For pod-sharded 2-D transforms over a device mesh, use
:class:`fourier_tpu.parallel.Fft2dPlan`; this module is the single-chip path
(batched over leading axes, jit-compatible, planar-first).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from fourier_tpu.plan.base import FftPlan
from fourier_tpu.plan.planner import create_fft
from fourier_tpu.transform import Transform


class NdFftPlan:
    """Separable N-D plan: one 1-D plan per transformed axis."""

    def __init__(self, shape: Sequence[int], dtype=np.complex64, *,
                 backend: str = "auto"):
        self.shape = tuple(int(s) for s in shape)
        if not self.shape:
            raise ValueError("NdFftPlan needs at least one axis")
        self.dtype = np.dtype(dtype)
        self.plans: Tuple[FftPlan, ...] = tuple(
            create_fft(s, self.dtype, backend=backend) for s in self.shape
        )
        # c128 on f32-only hardware resolves to 4-plane double-word plans;
        # everything else is 2-plane planar. Mixed plan kinds cannot happen
        # (one dtype+backend for all axes).
        self.is_dd = any(not hasattr(p, "_apply") for p in self.plans)
        self.size = int(np.prod(self.shape))

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def transform_planar(self, re, im, transform: Transform = Transform.FFT):
        """Transform the trailing ``ndim`` axes of planar (re, im) planes."""
        if self.is_dd:
            raise TypeError(
                "this plan uses the 4-plane double-word c128 representation; "
                "call transform_planar_dd(re_hi, re_lo, im_hi, im_lo)"
            )
        transform = Transform(transform)
        # Backend-polymorphic like the 1-D plans: numpy planes run the whole
        # per-axis pipeline eagerly in numpy (no trace, no per-shape
        # compile) when every axis plan supports it; jax input stays traced.
        eager = isinstance(re, np.ndarray) and all(
            getattr(p, "eager_host_ok", False) for p in self.plans
        )
        xp = np if eager else jnp
        re = xp.asarray(re)
        im = xp.asarray(im)
        if re.shape[-self.ndim:] != self.shape:
            raise ValueError(
                f"trailing axes {re.shape[-self.ndim:]} do not match plan "
                f"shape {self.shape}"
            )
        # Per-axis passes are unscaled; normalization applied once at the end.
        mode = Transform.FFT if transform.is_forward else Transform.UNSCALED_IFFT
        for axis_from_end, plan in enumerate(reversed(self.plans)):
            axis = re.ndim - 1 - axis_from_end
            re = xp.moveaxis(re, axis, -1)
            im = xp.moveaxis(im, axis, -1)
            re, im = plan._apply(re, im, mode)
            re = xp.moveaxis(re, -1, axis)
            im = xp.moveaxis(im, -1, axis)
        scale = transform.scale(self.size)
        if scale is not None:
            s = xp.asarray(scale).astype(re.dtype)
            re, im = re * s, im * s
        return re, im

    def transform_planar_dd(self, re_hi, re_lo, im_hi, im_lo,
                            transform: Transform = Transform.FFT):
        """N-D transform over 4-plane dd c128 data (the TPU c128 path).

        Planes are f32 arrays of shape (..., *shape); works eagerly on numpy
        input and traced on jax input (backend-polymorphic like the 1-D dd
        plan, ``precision/dd_plan.py``).
        """
        if not self.is_dd:
            raise TypeError(
                "this plan uses 2-plane planar data; call transform_planar"
            )
        from fourier_tpu.ops.stockham_jax import xp_for
        from fourier_tpu.precision import ddcplx

        transform = Transform(transform)
        planes = (re_hi, re_lo, im_hi, im_lo)
        xp = xp_for(planes[0])
        planes = tuple(xp.asarray(p) for p in planes)
        if planes[0].shape[-self.ndim:] != self.shape:
            raise ValueError(
                f"trailing axes {planes[0].shape[-self.ndim:]} do not match "
                f"plan shape {self.shape}"
            )
        mode = Transform.FFT if transform.is_forward else Transform.UNSCALED_IFFT
        for axis_from_end, plan in enumerate(reversed(self.plans)):
            axis = planes[0].ndim - 1 - axis_from_end
            planes = tuple(xp.moveaxis(p, axis, -1) for p in planes)
            (rh, rl), (ih, il) = plan._apply_dd(
                ((planes[0], planes[1]), (planes[2], planes[3])), mode
            )
            planes = tuple(
                xp.moveaxis(p, -1, axis) for p in (rh, rl, ih, il)
            )
        scale = transform.scale(self.size)
        if scale is not None:
            (rh, rl), (ih, il) = ddcplx.scale(
                ((planes[0], planes[1]), (planes[2], planes[3])), scale
            )
            planes = (rh, rl, ih, il)
        return planes

    def transform(self, x, transform: Transform = Transform.FFT):
        """Complex convenience (host/CPU boundary), numpy in -> numpy out."""
        x = np.asarray(x)
        if not np.issubdtype(x.dtype, np.complexfloating):
            x = x.astype(self.dtype)
        if self.is_dd:
            from fourier_tpu.precision import ddreal as dd

            x = np.asarray(x, dtype=np.complex128)
            rh, rl = dd.from_f64(x.real)
            ih, il = dd.from_f64(x.imag)
            orh, orl, oih, oil = self.transform_planar_dd(
                rh, rl, ih, il, transform
            )
            return dd.to_f64((orh, orl)) + 1j * dd.to_f64((oih, oil))
        real = np.float32 if self.dtype == np.complex64 else np.float64
        ore, oim = self.transform_planar(
            np.real(x).astype(real), np.imag(x).astype(real), transform
        )
        return (np.asarray(ore) + 1j * np.asarray(oim)).astype(self.dtype)

    def fft(self, x):
        return self.transform(x, Transform.FFT)

    def ifft(self, x):
        return self.transform(x, Transform.IFFT)

    def fft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.FFT)

    def ifft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.IFFT)

    # -- pytree --------------------------------------------------------------

    def tree_flatten(self):
        return (self.plans,), (self.shape, self.dtype.name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.shape, dtype_name = aux
        obj.dtype = np.dtype(dtype_name)
        (obj.plans,) = children
        obj.is_dd = any(not hasattr(p, "_apply") for p in obj.plans)
        obj.size = int(np.prod(obj.shape))
        return obj


import jax

jax.tree_util.register_pytree_node(
    NdFftPlan, lambda p: p.tree_flatten(), NdFftPlan.tree_unflatten
)


from collections import OrderedDict

_ND_CACHE: OrderedDict = OrderedDict()
_ND_CACHE_MAX = 64  # LRU-bounded; see planner._PLAN_CACHE


def _nd_plan(shape, dtype) -> NdFftPlan:
    key = (tuple(shape), np.dtype(dtype).name)
    if key in _ND_CACHE:
        _ND_CACHE.move_to_end(key)
        return _ND_CACHE[key]
    plan = NdFftPlan(shape, dtype)
    _ND_CACHE[key] = plan
    while len(_ND_CACHE) > _ND_CACHE_MAX:
        _ND_CACHE.popitem(last=False)
    return plan


def _norm_mode(norm: Optional[str], forward: bool):
    """numpy.fft ``norm`` -> (Transform mode, extra 1/N scale needed?).

    backward (default): fft unscaled, ifft 1/N. ortho: 1/sqrt(N) both ways.
    forward: fft 1/N, ifft unscaled — the 1/N forward scale has no Transform
    mode, so it is applied by the caller when the flag comes back True.
    """
    if norm in (None, "backward"):
        return (Transform.FFT if forward else Transform.IFFT), False
    if norm == "ortho":
        return (
            Transform.SQRT_SCALED_FFT if forward else Transform.SQRT_SCALED_IFFT
        ), False
    if norm == "forward":
        return (Transform.FFT if forward else Transform.UNSCALED_IFFT), forward
    raise ValueError(f"norm must be backward/ortho/forward, got {norm!r}")


def _crop_pad_axis(x: np.ndarray, n: int, axis: int) -> np.ndarray:
    """numpy.fft semantics: truncate or zero-pad `axis` to length n."""
    cur = x.shape[axis]
    if cur == n:
        return x
    if cur > n:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
        return x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - cur)
    return np.pad(x, pad)


def _resolve_axes(x_ndim: int, s, axes, ndim: Optional[int]):
    if axes is not None:
        axes = [a % x_ndim for a in np.atleast_1d(axes)]
        if len(set(axes)) != len(axes):
            raise ValueError(f"repeated axis in axes={axes}")
    elif s is not None:
        axes = list(range(x_ndim - len(s), x_ndim))
    else:
        k = x_ndim if ndim is None else ndim
        axes = list(range(x_ndim - k, x_ndim))
    if s is not None and len(s) != len(axes):
        raise ValueError("s and axes must have the same length")
    return axes


def _fftn_impl(x, s, axes, norm, ndim, dtype, forward: bool):
    x = np.asarray(x)
    if dtype is None:
        # numpy-parity promotion: double-precision input (f64/c128) ->
        # complex128, everything else -> the native complex64 path.
        dtype = (
            np.complex128
            if x.dtype in (np.float64, np.complex128) else np.complex64
        )
    axes = _resolve_axes(x.ndim, s, axes, ndim)
    if s is not None:
        for n, ax in zip(s, axes):
            x = _crop_pad_axis(x, int(n), ax)
    mode, fwd_scale = _norm_mode(norm, forward)
    # Rotate the transform axes (in order) to the trailing positions.
    rest = [a for a in range(x.ndim) if a not in axes]
    order = rest + axes
    xt = np.transpose(x, order)
    plan = _nd_plan(xt.shape[x.ndim - len(axes):], dtype)
    out = plan.transform(xt, mode)
    if fwd_scale:
        out = out / plan.size
    return np.transpose(out, np.argsort(order))


def fftn(x, ndim: Optional[int] = None, dtype=None, *,
         s=None, axes=None, norm: Optional[str] = None):
    """Forward FFT over `axes` (default: trailing `ndim` axes, default all).

    numpy.fft.fftn compatibility: ``s`` crops/zero-pads each transformed
    axis, ``axes`` selects arbitrary axes, ``norm`` is backward/ortho/forward.
    """
    return _fftn_impl(x, s, axes, norm, ndim, dtype, forward=True)


def ifftn(x, ndim: Optional[int] = None, dtype=None, *,
          s=None, axes=None, norm: Optional[str] = None):
    """Inverse FFT over `axes` (numpy.fft.ifftn compatibility)."""
    return _fftn_impl(x, s, axes, norm, ndim, dtype, forward=False)


def fft2(x, dtype=None, *, s=None, axes=(-2, -1),
         norm: Optional[str] = None):
    """2-D forward FFT (numpy.fft.fft2 compatibility)."""
    return _fftn_impl(x, s, list(axes), norm, None, dtype, forward=True)


def ifft2(x, dtype=None, *, s=None, axes=(-2, -1),
          norm: Optional[str] = None):
    """2-D inverse FFT (numpy.fft.ifft2 compatibility)."""
    return _fftn_impl(x, s, list(axes), norm, None, dtype, forward=False)
