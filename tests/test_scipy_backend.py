"""scipy.fft uarray backend: scipy code dispatches to fourier-tpu unchanged.

Every assertion compares `scipy.fft.<fn>` under `set_backend(fourier-tpu)`
against the same call on scipy's default backend — the strongest possible
differential gate, driven through scipy's own dispatch machinery.
"""

import numpy as np
import pytest
import scipy.fft as sfft

import fourier_tpu as ft

BE = ft.scipy_fft_backend
RNG = np.random.default_rng(0xBACE)


def _close(got, want, tol):
    got = np.asarray(got)
    assert got.shape == want.shape
    assert np.linalg.norm(got - want) <= tol * max(1.0, np.linalg.norm(want))


@pytest.mark.parametrize(
    "call,tol",
    [
        (lambda m, x: m.fft(x), 1e-12),
        (lambda m, x: m.fft(x, 100), 1e-12),
        (lambda m, x: m.fft(x, 64, 0, "ortho"), 1e-12),  # positional args
        (lambda m, x: m.ifft(x, norm="forward"), 1e-12),
        (lambda m, x: m.fft(x, workers=4, overwrite_x=True), 1e-12),
    ],
)
def test_fft_1d_dispatch(call, tol):
    x = RNG.standard_normal((8, 96)) + 1j * RNG.standard_normal((8, 96))
    # copies: overwrite_x=True licenses scipy to destroy its input
    want = call(sfft, x.copy())
    with sfft.set_backend(BE):
        got = call(sfft, x.copy())
    _close(got, want, tol)


def test_fftn_dispatch():
    x = RNG.standard_normal((4, 6, 8)) + 1j * RNG.standard_normal((4, 6, 8))
    for call in (
        lambda m: m.fft2(x),
        lambda m: m.fftn(x),
        lambda m: m.ifftn(x, norm="ortho"),
        lambda m: m.fftn(x, axes=(1, 2)),
        lambda m: m.fftn(x, s=(8, 8), axes=(-2, -1)),
    ):
        want = call(sfft)
        with sfft.set_backend(BE):
            got = call(sfft)
        _close(got, want, 1e-12)


def test_real_hermitian_dispatch():
    x = RNG.standard_normal((6, 80))
    spec = np.fft.rfft(x)
    for call, data in (
        (lambda m, v: m.rfft(v), x),
        (lambda m, v: m.rfft(v, n=72, axis=-1, norm="ortho"), x),
        (lambda m, v: m.irfft(v), spec),
        (lambda m, v: m.irfft(v, n=80), spec),
        (lambda m, v: m.hfft(v, n=80), spec),
        (lambda m, v: m.ihfft(v, n=64), x),
        (lambda m, v: m.rfftn(v), x),
        (lambda m, v: m.rfftn(v, axes=(-2, -1)), x),
        (lambda m, v: m.irfftn(v, axes=(-2, -1)), np.fft.rfftn(x)),
    ):
        want = call(sfft, data)
        with sfft.set_backend(BE):
            got = call(sfft, data)
        _close(got, want, 1e-11)


def test_dct_dst_dispatch():
    x = RNG.standard_normal((4, 64))
    for call in (
        lambda m: m.dct(x),
        lambda m: m.dct(x, type=3, norm="ortho"),
        lambda m: m.dct(x, n=48),  # scipy's n crops before the transform
        lambda m: m.idct(x, type=2),
        lambda m: m.dst(x, type=4, norm="ortho"),
        lambda m: m.idst(x),
        lambda m: m.dctn(x, norm="ortho"),
        lambda m: m.idstn(x, axes=(-1,)),
    ):
        want = call(sfft)
        with sfft.set_backend(BE):
            got = call(sfft)
        _close(got, want, 1e-11)


def test_fht_and_fast_len_dispatch():
    a = RNG.standard_normal(64)
    want = sfft.fht(a, 0.1, 0.5)
    with sfft.set_backend(BE):
        got = sfft.fht(a, 0.1, 0.5)
        back = sfft.ifht(got, 0.1, 0.5)
    _close(got, want, 1e-10)
    _close(back, a, 1e-10)


def test_unsupported_options_fall_through():
    """Options the TPU path doesn't cover run on scipy's default backend
    (NOT ours, NOT an error) unless only=True pins us."""
    x = RNG.standard_normal((4, 6, 8))
    want = sfft.rfftn(x, axes=(0, 2))  # non-trailing axes
    with sfft.set_backend(BE):
        got = sfft.rfftn(x, axes=(0, 2))
    _close(got, want, 1e-12)
    with pytest.raises(Exception):
        with sfft.set_backend(BE, only=True):
            sfft.rfftn(x, axes=(0, 2))


def test_register_backend_persistent():
    from scipy._lib import uarray as ua

    x = RNG.standard_normal(128)
    sfft.register_backend(BE)
    try:
        _close(sfft.fft(x), np.fft.fft(x), 1e-12)
    finally:
        # Drop the registration: registered backends are process-global and
        # would shadow scipy's pocketfft for the rest of the test session.
        ua.clear_backends("numpy.scipy.fft", registered=True, globals=False)
    _close(sfft.fft(x), np.fft.fft(x), 1e-12)  # default backend restored
