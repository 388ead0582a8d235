"""scipy.fft backend: run existing scipy code on fourier-tpu unchanged.

``scipy.fft`` dispatches every public transform through `uarray`
multimethods, so a third-party backend can take over without callers
changing a line. This module implements that protocol
(``__ua_domain__`` / ``__ua_function__``) over the fourier-tpu surface:

    import scipy.fft
    import fourier_tpu

    with scipy.fft.set_backend(fourier_tpu.scipy_fft_backend):
        X = scipy.fft.fft(x)            # executes on fourier-tpu

    # or permanently, behind the default backend:
    scipy.fft.register_backend(fourier_tpu.scipy_fft_backend)

Every adapter accepts the exact scipy signature. Arguments that encode
host-CPU implementation details (``overwrite_x`` — XLA arrays are
immutable; ``workers`` — parallelism comes from the device, see
``fourier_tpu.set_workers``; ``plan`` — plans are cached internally) are
accepted and ignored, matching scipy's own documentation that backends
may do so. Calls whose options the TPU path does not cover (e.g.
``rfftn`` over non-trailing axes) return ``NotImplemented`` so uarray
falls through to the next registered backend — scipy's own pocketfft by
default — never silently computing the wrong thing.

Reference parity: none (the reference is a Rust crate); this is
ecosystem-integration surface so scipy users can switch per the project
goal, with behavior differentially tested against scipy itself
(tests/test_scipy_backend.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import fourier_tpu as ft


class _Fallback(Exception):
    """Adapter cannot honor these options; let the next backend handle it."""


def _trailing_ndim(axes, nd: int) -> Optional[int]:
    """axes == the last-k axes (any order)? -> k; else None."""
    if axes is None:
        return None
    axes = tuple(int(a) for a in (axes if np.iterable(axes) else (axes,)))
    k = len(axes)
    want = {nd - k + i for i in range(k)}
    got = {a % nd for a in axes}
    return k if got == want else None


def _crop_pad(x, n: Optional[int], axis: int):
    if n is None:
        return x
    x = np.asarray(x)
    n = int(n)
    cur = x.shape[axis]
    if n == cur:
        return x
    sl = [slice(None)] * x.ndim
    if n < cur:
        sl[axis] = slice(0, n)
        return x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - cur)
    return np.pad(x, pad)


# -- 1-D complex ------------------------------------------------------------


def _fft(x, n=None, axis=-1, norm=None, overwrite_x=False, workers=None,
         *, plan=None):
    return ft.fft(x, n=n, norm=norm, axis=axis)


def _ifft(x, n=None, axis=-1, norm=None, overwrite_x=False, workers=None,
          *, plan=None):
    return ft.ifft(x, n=n, norm=norm, axis=axis)


# -- N-D complex ------------------------------------------------------------


def _fft2(x, s=None, axes=(-2, -1), norm=None, overwrite_x=False,
          workers=None, *, plan=None):
    return ft.fft2(x, s=s, axes=axes, norm=norm)


def _ifft2(x, s=None, axes=(-2, -1), norm=None, overwrite_x=False,
           workers=None, *, plan=None):
    return ft.ifft2(x, s=s, axes=axes, norm=norm)


def _fftn(x, s=None, axes=None, norm=None, overwrite_x=False, workers=None,
          *, plan=None):
    return ft.fftn(x, s=s, axes=axes, norm=norm)


def _ifftn(x, s=None, axes=None, norm=None, overwrite_x=False, workers=None,
           *, plan=None):
    return ft.ifftn(x, s=s, axes=axes, norm=norm)


# -- real / Hermitian ---------------------------------------------------------


def _rfft(x, n=None, axis=-1, norm=None, overwrite_x=False, workers=None,
          *, plan=None):
    return ft.rfft(x, n=n, norm=norm, axis=axis)


def _irfft(x, n=None, axis=-1, norm=None, overwrite_x=False, workers=None,
           *, plan=None):
    return ft.irfft(x, n=n, norm=norm, axis=axis)


def _hfft(x, n=None, axis=-1, norm=None, overwrite_x=False, workers=None,
          *, plan=None):
    return ft.hfft(x, n=n, norm=norm, axis=axis)


def _ihfft(x, n=None, axis=-1, norm=None, overwrite_x=False, workers=None,
           *, plan=None):
    # ft.ihfft has no n: scipy's n crops/pads the real input first.
    return ft.ihfft(_crop_pad(x, n, axis), norm=norm, axis=axis)


def _rfft2(x, s=None, axes=(-2, -1), norm=None, overwrite_x=False,
           workers=None, *, plan=None):
    return _rfftn(x, s=s, axes=axes, norm=norm)


def _irfft2(x, s=None, axes=(-2, -1), norm=None, overwrite_x=False,
            workers=None, *, plan=None):
    return _irfftn(x, s=s, axes=axes, norm=norm)


def _rfftn(x, s=None, axes=None, norm=None, overwrite_x=False, workers=None,
           *, plan=None):
    if s is not None:
        raise _Fallback  # shape-adjusting N-D rfft not covered
    nd = np.asarray(x).ndim
    ndim = _trailing_ndim(axes, nd)
    if axes is not None and ndim is None:
        raise _Fallback  # non-trailing axes
    return ft.rfftn(x, ndim=ndim, norm=norm)


def _irfftn(x, s=None, axes=None, norm=None, overwrite_x=False, workers=None,
            *, plan=None):
    nd = np.asarray(x).ndim
    ndim = _trailing_ndim(axes, nd)
    if axes is not None and ndim is None:
        raise _Fallback
    return ft.irfftn(x, shape=s, ndim=ndim, norm=norm)


def _hfft2(x, s=None, axes=(-2, -1), norm=None, overwrite_x=False,
           workers=None, *, plan=None):
    return _hfftn(x, s=s, axes=axes, norm=norm)


def _ihfft2(x, s=None, axes=(-2, -1), norm=None, overwrite_x=False,
            workers=None, *, plan=None):
    return _ihfftn(x, s=s, axes=axes, norm=norm)


def _hfftn(x, s=None, axes=None, norm=None, overwrite_x=False, workers=None,
           *, plan=None):
    nd = np.asarray(x).ndim
    ndim = _trailing_ndim(axes, nd)
    if axes is not None and ndim is None:
        raise _Fallback
    return ft.hfftn(x, shape=s, ndim=ndim, norm=norm)


def _ihfftn(x, s=None, axes=None, norm=None, overwrite_x=False, workers=None,
            *, plan=None):
    if s is not None:
        raise _Fallback
    nd = np.asarray(x).ndim
    ndim = _trailing_ndim(axes, nd)
    if axes is not None and ndim is None:
        raise _Fallback
    return ft.ihfftn(x, ndim=ndim, norm=norm)


# -- DCT / DST ----------------------------------------------------------------


def _check_ortho(norm, orthogonalize):
    """scipy's orthogonalize defaults to (norm == "ortho"); our kernels
    implement exactly that pairing."""
    if orthogonalize is not None and bool(orthogonalize) != (norm == "ortho"):
        raise _Fallback


def _make_dct1(fn):
    def adapter(x, type=2, n=None, axis=-1, norm=None, overwrite_x=False,
                workers=None, orthogonalize=None):
        _check_ortho(norm, orthogonalize)
        return fn(_crop_pad(x, n, axis), type=type, norm=norm, axis=axis)

    return adapter


def _make_dctn(fn):
    def adapter(x, type=2, s=None, axes=None, norm=None, overwrite_x=False,
                workers=None, orthogonalize=None):
        _check_ortho(norm, orthogonalize)
        return fn(x, type=type, s=s, axes=axes, norm=norm)

    return adapter


# -- Hankel / helpers ----------------------------------------------------------


def _fht(a, dln, mu, offset=0.0, bias=0.0):
    return ft.fht(a, dln, mu, offset=offset, bias=bias)


def _ifht(A, dln, mu, offset=0.0, bias=0.0):
    return ft.ifht(A, dln, mu, offset=offset, bias=bias)


# (scipy's next_fast_len/prev_fast_len are lru_cache'd plain functions, not
# uarray multimethods — they cannot dispatch to a backend.)

_IMPL = {
    "fft": _fft,
    "ifft": _ifft,
    "fft2": _fft2,
    "ifft2": _ifft2,
    "fftn": _fftn,
    "ifftn": _ifftn,
    "rfft": _rfft,
    "irfft": _irfft,
    "rfft2": _rfft2,
    "irfft2": _irfft2,
    "rfftn": _rfftn,
    "irfftn": _irfftn,
    "hfft": _hfft,
    "ihfft": _ihfft,
    "hfft2": _hfft2,
    "ihfft2": _ihfft2,
    "hfftn": _hfftn,
    "ihfftn": _ihfftn,
    "dct": _make_dct1(ft.dct),
    "idct": _make_dct1(ft.idct),
    "dst": _make_dct1(ft.dst),
    "idst": _make_dct1(ft.idst),
    "dctn": _make_dctn(ft.dctn),
    "idctn": _make_dctn(ft.idctn),
    "dstn": _make_dctn(ft.dstn),
    "idstn": _make_dctn(ft.idstn),
    "fht": _fht,
    "ifht": _ifht,
}


class FourierTpuScipyBackend:
    """uarray backend object for the ``numpy.scipy.fft`` domain."""

    __ua_domain__ = "numpy.scipy.fft"

    @staticmethod
    def __ua_function__(method, args, kwargs):
        impl = _IMPL.get(getattr(method, "__name__", None))
        if impl is None:
            return NotImplemented
        try:
            out = impl(*args, **kwargs)
        except _Fallback:
            return NotImplemented
        # scipy callers mutate results in place (e.g. scipy.signal.istft's
        # `xsubs *= win.sum()`); a numpy view of a device buffer is
        # read-only, so hand back an owning, writable host array.
        out = np.asarray(out)
        return out if out.flags.writeable else out.copy()


scipy_fft_backend = FourierTpuScipyBackend
