"""Discrete cosine / sine transforms (types I-IV) via the FFT plans.

Beyond-reference surface (the Rust reference is c2c-FFT only): DCT/DST with
scipy.fft semantics — ``dct/idct/dst/idst``, types 1-4, norms backward /
ortho / forward, any axis, batched over the other axes.

Every transform reduces to one real/complex FFT through this framework's
planner (fused VPU kernels on TPU; dd double-word plans for float64 on
f32-only hardware), with O(n) host-side pre/post twiddles:

* DCT-I:  Re FFT[x, x[1:-1] reversed]           (length 2n-2)
* DCT-II: Re( e^{-i pi k/2n} . RFFT[x, rev x] ) (length 2n, Makhoul)
* DCT-III: inverse of the DCT-II factorization — spectrum rebuilt as
  V[k] = e^{i pi k/2n}(y[k] - i y[n-k]), one unscaled c2c IFFT of length n,
  even/odd de-interleave
* DCT-IV: odd-sample embedding in a length-8n RFFT
* DST-I:  -Im FFT[0, x, 0, -rev x]              (length 2n+2)
* DST-II: -Im( e^{-i pi k/2n} . RFFT[x, -rev x] )
* DST-III = diag((-1)^k) . DCT-III . flip ; DST-IV likewise from DCT-IV

float32 input runs complex64 plans; float64 runs complex128 plans (native
f64 on an x64 host, double-word f32 otherwise). All identities and norm
scalings are tested against scipy.fft across even/odd sizes.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import numpy as np

from fourier_tpu.plan.planner import create_fft
from fourier_tpu.rfft import RfftPlan
from fourier_tpu.transform import Transform

_RPLAN_CACHE: OrderedDict = OrderedDict()
_CPLAN_CACHE: OrderedDict = OrderedDict()
_CACHE_MAX = 64


def _cached(cache, key, make):
    if key in cache:
        cache.move_to_end(key)
        return cache[key]
    plan = make()
    cache[key] = plan
    while len(cache) > _CACHE_MAX:
        cache.popitem(last=False)
    return plan


def _rfft(u: np.ndarray, cdtype) -> np.ndarray:
    plan = _cached(
        _RPLAN_CACHE, (u.shape[-1], np.dtype(cdtype).name),
        lambda: RfftPlan(u.shape[-1], cdtype),
    )
    return plan.rfft(u)


def _unscaled_ifft(v: np.ndarray, cdtype) -> np.ndarray:
    plan = _cached(
        _CPLAN_CACHE, (v.shape[-1], np.dtype(cdtype).name),
        lambda: create_fft(v.shape[-1], cdtype),
    )
    return plan.transform(v, Transform.UNSCALED_IFFT)


def _rev(x):
    return x[..., ::-1]


# -- backward-normalized kernels (last axis) --------------------------------


def _dct1(x, cdtype):
    n = x.shape[-1]
    if n < 2:
        raise ValueError("DCT-I requires n >= 2")
    u = np.concatenate([x, _rev(x[..., 1:-1])], axis=-1)
    return np.real(_rfft(u, cdtype)[..., :n])


def _dct2(x, cdtype):
    n = x.shape[-1]
    u = np.concatenate([x, _rev(x)], axis=-1)
    spec = _rfft(u, cdtype)[..., :n]
    tw = np.exp(-1j * np.pi * np.arange(n) / (2.0 * n))
    return np.real(tw * spec)


def _dct3(y, cdtype):
    n = y.shape[-1]
    if n == 1:
        return y.copy()
    k = np.arange(n)
    yn = np.concatenate([y, np.zeros_like(y[..., :1])], axis=-1)
    v_spec = np.exp(1j * np.pi * k / (2.0 * n)) * (
        yn[..., k] - 1j * yn[..., n - k]
    )
    v = np.real(_unscaled_ifft(v_spec.astype(cdtype), cdtype))
    out = np.empty_like(y)
    half = (n + 1) // 2
    out[..., 0 : 2 * half : 2] = v[..., :half]
    out[..., 1::2] = v[..., n - 1 : half - 1 : -1]
    return out


def _dct4(x, cdtype):
    n = x.shape[-1]
    u = np.zeros(x.shape[:-1] + (8 * n,), dtype=x.dtype)
    u[..., 2 * np.arange(n) + 1] = x
    return 2.0 * np.real(_rfft(u, cdtype)[..., 2 * np.arange(n) + 1])


def _dst1(x, cdtype):
    n = x.shape[-1]
    z = np.zeros_like(x[..., :1])
    u = np.concatenate([z, x, z, -_rev(x)], axis=-1)
    return -np.imag(_rfft(u, cdtype)[..., 1 : n + 1])


def _dst2(x, cdtype):
    n = x.shape[-1]
    u = np.concatenate([x, -_rev(x)], axis=-1)
    spec = _rfft(u, cdtype)[..., 1 : n + 1]
    tw = np.exp(-1j * np.pi * np.arange(1, n + 1) / (2.0 * n))
    return -np.imag(tw * spec)


def _sign_alt(n):
    return (-1.0) ** np.arange(n)


def _dst3(x, cdtype):
    return _sign_alt(x.shape[-1]) * _dct3(_rev(x), cdtype)


def _dst4(x, cdtype):
    return _sign_alt(x.shape[-1]) * _dct4(_rev(x), cdtype)


_DCT = {1: _dct1, 2: _dct2, 3: _dct3, 4: _dct4}
_DST = {1: _dst1, 2: _dst2, 3: _dst3, 4: _dst4}
_INVERSE_TYPE = {1: 1, 2: 3, 3: 2, 4: 4}


def _den(kind: str, type: int, n: int) -> float:
    """Backward-normalization denominator: idct = dct(inv type) / den."""
    if type == 1:
        return 2.0 * (n - 1) if kind == "dct" else 2.0 * (n + 1)
    return 2.0 * n


def _ortho_pre_post(kind: str, type: int, n: int):
    """(pre, post) diagonal scalings turning backward into ortho norm."""
    pre = np.ones(n)
    post = np.ones(n)
    if kind == "dct":
        if type == 1:
            pre[0] = pre[-1] = np.sqrt(2.0)
            post[:] = np.sqrt(1.0 / (2.0 * (n - 1)))
            post[0] /= np.sqrt(2.0)
            post[-1] /= np.sqrt(2.0)
        elif type == 2:
            post[:] = np.sqrt(1.0 / (2.0 * n))
            post[0] = np.sqrt(1.0 / (4.0 * n))
        elif type == 3:
            pre[0] = 1.0 / np.sqrt(n)
            pre[1:] = 1.0 / np.sqrt(2.0 * n)
        else:
            post[:] = np.sqrt(1.0 / (2.0 * n))
    else:
        if type == 1:
            post[:] = np.sqrt(1.0 / (2.0 * (n + 1)))
        elif type == 2:
            post[:] = np.sqrt(1.0 / (2.0 * n))
            post[-1] = np.sqrt(1.0 / (4.0 * n))
        elif type == 3:
            pre[-1] = 1.0 / np.sqrt(n)
            pre[:-1] = 1.0 / np.sqrt(2.0 * n)
        else:
            post[:] = np.sqrt(1.0 / (2.0 * n))
    return pre, post


def _apply(kind: str, x, type: int, norm: Optional[str], axis: int,
           inverse: bool):
    if type not in (1, 2, 3, 4):
        raise ValueError(f"type must be 1..4, got {type}")
    if norm not in (None, "backward", "ortho", "forward"):
        raise ValueError(f"norm must be backward/ortho/forward, got {norm!r}")
    norm = norm or "backward"
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.complexfloating):
        raise TypeError(f"{kind} is defined for real input, got {x.dtype}")
    rdtype = np.float64 if x.dtype == np.float64 else np.float32
    cdtype = np.complex128 if rdtype == np.float64 else np.complex64
    x = np.moveaxis(x, axis, -1).astype(rdtype)
    n = x.shape[-1]
    if n == 0:
        raise ValueError("empty transform axis")

    eff_type = _INVERSE_TYPE[type] if inverse else type
    table = _DCT if kind == "dct" else _DST
    if norm == "ortho":
        pre, post = _ortho_pre_post(kind, eff_type, n)
        out = table[eff_type]((x * pre).astype(rdtype), cdtype) * post
    else:
        out = table[eff_type](x, cdtype)
        # 'backward': inverse carries 1/den; 'forward': forward carries it.
        if inverse == (norm == "backward"):
            out = out / _den(kind, eff_type, n)
    return np.moveaxis(out.astype(rdtype), -1, axis)


def dct(x, type: int = 2, norm: Optional[str] = None, axis: int = -1):
    """DCT of types 1-4 (scipy.fft.dct semantics)."""
    return _apply("dct", x, type, norm, axis, inverse=False)


def idct(x, type: int = 2, norm: Optional[str] = None, axis: int = -1):
    """Inverse DCT (scipy.fft.idct semantics)."""
    return _apply("dct", x, type, norm, axis, inverse=True)


def dst(x, type: int = 2, norm: Optional[str] = None, axis: int = -1):
    """DST of types 1-4 (scipy.fft.dst semantics)."""
    return _apply("dst", x, type, norm, axis, inverse=False)


def idst(x, type: int = 2, norm: Optional[str] = None, axis: int = -1):
    """Inverse DST (scipy.fft.idst semantics)."""
    return _apply("dst", x, type, norm, axis, inverse=True)


# -- N-D separable transforms (scipy.fft.dctn/idctn/dstn/idstn) -------------


def _nd_axes_shape(x: np.ndarray, s, axes):
    """Resolve scipy's (s, axes) convention: s given without axes means the
    last len(s) axes; s entries pad/truncate the corresponding axis."""
    if axes is None:
        axes = (
            tuple(range(x.ndim)) if s is None
            else tuple(range(x.ndim - len(s), x.ndim))
        )
    else:
        axes = tuple(int(a) % x.ndim for a in axes)
        if len(set(axes)) != len(axes):
            raise ValueError("repeated axis in axes")
    if s is not None and len(s) != len(axes):
        raise ValueError("s and axes must have the same length")
    return axes, s


def _resize_axis(x: np.ndarray, axis: int, n: int) -> np.ndarray:
    cur = x.shape[axis]
    if n == cur:
        return x
    if n < cur:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
        return x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - cur)
    return np.pad(x, pad)


def _apply_nd(kind: str, x, type: int, s, axes, norm, inverse: bool):
    x = np.asarray(x)
    if x.ndim == 0:
        raise ValueError("dctn/dstn require at least one axis")
    axes, s = _nd_axes_shape(x, s, axes)
    if s is not None:
        for a, n in zip(axes, s):
            x = _resize_axis(x, a, int(n))
    for a in axes:
        x = _apply(kind, x, type, norm, a, inverse)
    return x


def dctn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None):
    """N-D DCT over ``axes`` (scipy.fft.dctn semantics: separable 1-D DCTs,
    ``s`` pads/truncates)."""
    return _apply_nd("dct", x, type, s, axes, norm, inverse=False)


def idctn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None):
    """N-D inverse DCT (scipy.fft.idctn semantics)."""
    return _apply_nd("dct", x, type, s, axes, norm, inverse=True)


def dstn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None):
    """N-D DST over ``axes`` (scipy.fft.dstn semantics)."""
    return _apply_nd("dst", x, type, s, axes, norm, inverse=False)


def idstn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None):
    """N-D inverse DST (scipy.fft.idstn semantics)."""
    return _apply_nd("dst", x, type, s, axes, norm, inverse=True)
