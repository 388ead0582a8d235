"""Transform enum semantics (mirrors ``fft.rs:5-36`` behavior)."""

from fourier_tpu import Transform


def test_ffi_codes():
    # Codes must match the reference C ABI (fourier-ffi/src/lib.rs:3-12).
    assert Transform.FFT == 0
    assert Transform.IFFT == 1
    assert Transform.UNSCALED_IFFT == 2
    assert Transform.SQRT_SCALED_FFT == 3
    assert Transform.SQRT_SCALED_IFFT == 4


def test_is_forward():
    assert Transform.FFT.is_forward
    assert Transform.SQRT_SCALED_FFT.is_forward
    assert not Transform.IFFT.is_forward
    assert not Transform.UNSCALED_IFFT.is_forward
    assert not Transform.SQRT_SCALED_IFFT.is_forward


def test_inverse():
    assert Transform.FFT.inverse() is Transform.IFFT
    assert Transform.IFFT.inverse() is Transform.FFT
    assert Transform.SQRT_SCALED_FFT.inverse() is Transform.SQRT_SCALED_IFFT
    assert Transform.SQRT_SCALED_IFFT.inverse() is Transform.SQRT_SCALED_FFT
    assert Transform.UNSCALED_IFFT.inverse() is None


def test_scale():
    assert Transform.FFT.scale(16) is None
    assert Transform.UNSCALED_IFFT.scale(16) is None
    assert Transform.IFFT.scale(16) == 1 / 16
    assert Transform.SQRT_SCALED_FFT.scale(16) == 0.25
    assert Transform.SQRT_SCALED_IFFT.scale(16) == 0.25


def test_axis_kwarg_matches_numpy():
    """numpy.fft parity: the axis= kwarg on the 1-D functional surface."""
    import numpy as np

    import fourier_tpu as ft

    rng = np.random.default_rng(3)
    x = (
        rng.standard_normal((4, 16, 3)) + 1j * rng.standard_normal((4, 16, 3))
    ).astype(np.complex64)
    for axis in (0, 1, -2):
        got = np.asarray(ft.fft(x, axis=axis))
        want = np.fft.fft(x, axis=axis)
        assert np.linalg.norm(got - want) < 1e-5 * np.linalg.norm(want)
    back = np.asarray(ft.ifft(ft.fft(x, axis=1), axis=1))
    assert np.linalg.norm(back - x) < 1e-5 * np.linalg.norm(x)

    xr = rng.standard_normal((5, 12, 3)).astype(np.float32)
    got = np.asarray(ft.rfft(xr, axis=1))
    want = np.fft.rfft(xr, axis=1)
    assert got.shape == want.shape
    assert np.linalg.norm(got - want) < 1e-5 * np.linalg.norm(want)
    back = np.asarray(ft.irfft(ft.rfft(xr, axis=1), axis=1))
    assert np.linalg.norm(back - xr) < 1e-5 * np.linalg.norm(xr)

    h = np.asarray(ft.ihfft(xr, axis=1))
    assert np.linalg.norm(h - np.fft.ihfft(xr, axis=1)) < 1e-5 * np.linalg.norm(h)
    spec = np.fft.ihfft(xr, axis=1).astype(np.complex64)
    got = np.asarray(ft.hfft(spec, axis=1))
    want = np.fft.hfft(spec, axis=1)
    assert np.linalg.norm(got - want) < 1e-4 * np.linalg.norm(want)


def test_set_workers_compat():
    import fourier_tpu as ft

    assert ft.get_workers() == 1
    with ft.set_workers(4):
        assert ft.get_workers() == 4
        with ft.set_workers(2):
            assert ft.get_workers() == 2
        assert ft.get_workers() == 4
    assert ft.get_workers() == 1
