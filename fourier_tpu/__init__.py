"""fourier-tpu: a TPU-native FFT framework.

From-scratch JAX/XLA/Pallas rebuild of the capability surface of the Rust
``fourier`` crate (see SURVEY.md): complex-to-complex 1-D FFTs of any size —
mixed-radix Stockham autosort (radix 2/3/4/8) for 2^a*3^b sizes, Bluestein
chirp-z for everything else — five normalization modes, plan-then-execute API,
batched transforms, and (net-new for TPU) pod-sharded multi-chip FFTs.

Public surface mirrors ``fourier/src/lib.rs:24-60``: ``create_fft_f32`` /
``create_fft_f64`` planners, the ``Transform`` mode enum, and plan objects
exposing ``fft`` / ``ifft`` / ``transform``. Because this TPU backend has no
complex dtype support, the canonical on-device representation is planar
(re, im) float planes — ``plan.transform_planar`` / ``fft_planar`` — with
complex arrays accepted at the host/CPU boundary for convenience.
"""

from __future__ import annotations

import numpy as _np

from fourier_tpu.plan import (
    AutosortPlan,
    BluesteinPlan,
    CompiledFft,
    FftPlan,
    MxuFftPlan,
    clear_plan_cache,
    create_fft,
    create_fft_f32,
    create_fft_f64,
    export_compiled,
    export_wisdom,
    forget_wisdom,
    import_wisdom,
    load_compiled,
    measure_fft,
)
from fourier_tpu.plan.serialize import load_plan, plan_to_bytes, save_plan
from fourier_tpu.plan.summary import describe, summarize
from fourier_tpu.ndim import NdFftPlan, fft2, fftn, ifft2, ifftn
from fourier_tpu.dctdst import (dct, dctn, dst, dstn, idct, idctn, idst,
                                idstn)
from fourier_tpu.rfft import (
    RfftPlan,
    hfft,
    hfft2,
    hfftn,
    ihfft,
    ihfft2,
    ihfftn,
    irfft,
    irfft2,
    irfftn,
    rfft,
    rfft2,
    rfftfreq,
    rfftn,
)
from fourier_tpu.fftlog import fht, fhtoffset, ifht
from fourier_tpu.signal import (ConvolvePlan, CztPlan, correlate,
                                correlation_lags, czt,
                                fftconvolve, hilbert, hilbert2,
                                next_fast_len, oaconvolve, prev_fast_len,
                                resample, zoom_fft)
from fourier_tpu.spectral import (StftPlan, check_cola, check_nola,
                                  coherence, csd, istft, periodogram,
                                  spectrogram, stft, welch)
from fourier_tpu.utils.helpers import fftfreq, fftshift, ifftshift
from fourier_tpu.transform import Transform

__version__ = "0.2.0"


def _plan_for(n: int, dtype):
    if dtype is None:
        dtype = _np.complex64
    return create_fft(n, dtype)


def transform(x, mode: Transform, dtype=None):
    """Plan-and-run a transform over the last axis of a complex array."""
    x = x if hasattr(x, "shape") else _np.asarray(x)
    if dtype is None and hasattr(x, "dtype"):
        if x.dtype in (_np.complex64, _np.complex128):
            dtype = x.dtype
        elif x.dtype in (_np.float64, _np.complex128):
            # numpy-parity promotion for real input (rfft._infer_cdtype):
            # double-precision in -> complex128 out.
            dtype = _np.complex128
    return _plan_for(x.shape[-1], dtype).transform(x, mode)


def _fft_1d(x, n, norm, dtype, forward: bool, axis: int = -1):
    from fourier_tpu.ndim import _crop_pad_axis, _norm_mode

    x = _np.asarray(x)
    if axis not in (-1, x.ndim - 1):
        out = _fft_1d(_np.moveaxis(x, axis, -1), n, norm, dtype, forward)
        return _np.moveaxis(out, -1, axis)
    if n is not None:
        x = _crop_pad_axis(x, int(n), x.ndim - 1)
    mode, fwd_scale = _norm_mode(norm, forward)
    out = transform(x, mode, dtype)
    return out / x.shape[-1] if fwd_scale else out


def fft(x, n=None, norm=None, dtype=None, axis: int = -1):
    """Forward FFT over ``axis`` (numpy.fft.fft compatibility:
    ``n`` crops/zero-pads, ``norm`` is backward/ortho/forward). Plans
    implicitly, cached per size."""
    return _fft_1d(x, n, norm, dtype, forward=True, axis=axis)


def ifft(x, n=None, norm=None, dtype=None, axis: int = -1):
    """Inverse FFT over ``axis`` (numpy.fft.ifft compatibility)."""
    return _fft_1d(x, n, norm, dtype, forward=False, axis=axis)


import contextlib as _contextlib

_workers = 1


@_contextlib.contextmanager
def set_workers(workers: int):
    """scipy.fft.set_workers-compatible context manager (accepted for API
    compatibility). Host-thread worker counts do not apply here: parallelism
    is XLA's — batched transforms vectorize over lanes/cores on one chip and
    shard over a mesh via :mod:`fourier_tpu.parallel`."""
    global _workers
    prev, _workers = _workers, int(workers)
    try:
        yield
    finally:
        _workers = prev


def get_workers() -> int:
    """scipy.fft.get_workers-compatible accessor (see :func:`set_workers`)."""
    return _workers


def transform_planar(re, im, mode: Transform, dtype=None):
    """Planar plan-and-run: the TPU-native convenience entry point."""
    return _plan_for(re.shape[-1], dtype).transform_planar(re, im, mode)


def fft_planar(re, im, dtype=None):
    return transform_planar(re, im, Transform.FFT, dtype)


def ifft_planar(re, im, dtype=None):
    return transform_planar(re, im, Transform.IFFT, dtype)


__all__ = [
    "AutosortPlan",
    "BluesteinPlan",
    "FftPlan",
    "MxuFftPlan",
    "NdFftPlan",
    "Transform",
    "CompiledFft",
    "clear_plan_cache",
    "create_fft",
    "create_fft_f32",
    "create_fft_f64",
    "CztPlan",
    "czt",
    "dct",
    "dctn",
    "export_compiled",
    "export_wisdom",
    "forget_wisdom",
    "import_wisdom",
    "measure_fft",
    "load_compiled",
    "describe",
    "dst",
    "fft",
    "fft2",
    "dstn",
    "ConvolvePlan",
    "fftconvolve",
    "fht",
    "fhtoffset",
    "fftfreq",
    "fftshift",
    "fft_planar",
    "fftn",
    "hfft",
    "hfft2",
    "hfftn",
    "ihfft",
    "ihfft2",
    "ihfftn",
    "next_fast_len",
    "oaconvolve",
    "prev_fast_len",
    "correlate",
    "correlation_lags",
    "hilbert",
    "hilbert2",
    "resample",
    "check_cola",
    "check_nola",
    "coherence",
    "csd",
    "istft",
    "periodogram",
    "spectrogram",
    "stft",
    "StftPlan",
    "welch",
    "idct",
    "idctn",
    "idst",
    "ifht",
    "idstn",
    "ifft",
    "ifft2",
    "ifft_planar",
    "ifftn",
    "ifftshift",
    "irfft",
    "irfft2",
    "irfftn",
    "load_plan",
    "plan_to_bytes",
    "rfft",
    "rfft2",
    "rfftfreq",
    "rfftn",
    "RfftPlan",
    "save_plan",
    "summarize",
    "set_workers",
    "get_workers",
    "transform",
    "zoom_fft",
    "transform_planar",
    "scipy_fft_backend",
    "__version__",
]


def __getattr__(name):
    # Lazy: scipy_backend imports this package back (adapter over the public
    # surface), so it must not load during package init.
    if name == "scipy_fft_backend":
        from fourier_tpu.scipy_backend import scipy_fft_backend

        return scipy_fft_backend
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
