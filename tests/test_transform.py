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
