"""stft / istft tests vs scipy.signal."""

import numpy as np
import pytest
from scipy import signal as ss

import fourier_tpu as ft
from fourier_tpu.spectral import check_cola, check_nola, istft, stft

RNG_SEED = 0x57F7


def _rel(got, want):
    return np.linalg.norm(np.asarray(got) - want) / max(
        np.linalg.norm(want), 1e-30
    )


@pytest.mark.parametrize("nperseg,noverlap,nfft,window", [
    (256, None, None, "hann"),
    (128, 96, None, "hamming"),
    (100, 50, 128, "hann"),
    (64, 48, None, ("tukey", 0.25)),
])
def test_stft_vs_scipy(nperseg, noverlap, nfft, window):
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(2000).astype(np.float32)
    f, t, z = stft(x, fs=10.0, window=window, nperseg=nperseg,
                   noverlap=noverlap, nfft=nfft)
    fw, tw, zw = ss.stft(x.astype(np.float64), fs=10.0, window=window,
                         nperseg=nperseg, noverlap=noverlap, nfft=nfft)
    np.testing.assert_allclose(f, fw)
    np.testing.assert_allclose(t, tw)
    assert z.shape == zw.shape
    assert _rel(z, zw) < 1e-5


def test_stft_boundary_and_padding_modes():
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(777).astype(np.float32)
    for boundary in (None, "zeros", "even", "odd", "constant"):
        for padded in (True, False) if boundary is not None else (True,):
            f, t, z = stft(x, nperseg=64, boundary=boundary, padded=padded)
            fw, tw, zw = ss.stft(x.astype(np.float64), nperseg=64,
                                 boundary=boundary, padded=padded)
            np.testing.assert_allclose(t, tw)
            assert z.shape == zw.shape, (boundary, padded)
            assert _rel(z, zw) < 1e-5, (boundary, padded)


def test_stft_complex_input_twosided():
    rng = np.random.default_rng(RNG_SEED)
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(
        np.complex64
    )
    with pytest.warns(UserWarning, match="onesided"):
        f, t, z = stft(x, nperseg=64)
    with pytest.warns(UserWarning):
        fw, tw, zw = ss.stft(x.astype(np.complex128), nperseg=64)
    np.testing.assert_allclose(f, fw)
    assert _rel(z, zw) < 1e-5


def test_stft_psd_scaling_and_detrend():
    rng = np.random.default_rng(RNG_SEED)
    x = (rng.standard_normal(1024) + 3.0).astype(np.float32)
    f, t, z = stft(x, fs=4.0, nperseg=128, scaling="psd", detrend="constant")
    fw, tw, zw = ss.stft(x.astype(np.float64), fs=4.0, nperseg=128,
                         scaling="psd", detrend="constant")
    assert _rel(z, zw) < 1e-5
    f, t, z = stft(x, nperseg=128, detrend="linear")
    fw, tw, zw = ss.stft(x.astype(np.float64), nperseg=128, detrend="linear")
    assert _rel(z, zw) < 1e-4


def test_stft_batched():
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((3, 2, 900)).astype(np.float32)
    f, t, z = stft(x, nperseg=128)
    fw, tw, zw = ss.stft(x.astype(np.float64), nperseg=128)
    assert z.shape == zw.shape
    assert _rel(z, zw) < 1e-5


@pytest.mark.parametrize("window,nperseg,noverlap", [
    ("hann", 128, None),
    ("hann", 128, 96),
    ("hamming", 100, 60),
])
def test_istft_roundtrip(window, nperseg, noverlap):
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(1500).astype(np.float32)
    f, t, z = stft(x, window=window, nperseg=nperseg, noverlap=noverlap)
    tr, xr = istft(z, window=window, nperseg=nperseg, noverlap=noverlap)
    assert xr.shape[-1] >= x.shape[-1]
    assert _rel(xr[..., :x.shape[-1]], x.astype(np.float64)) < 1e-5
    # matches scipy's istft of the same spectrogram
    twr, xwr = ss.istft(np.asarray(z, np.complex128), window=window,
                        nperseg=nperseg, noverlap=noverlap)
    assert _rel(xr[..., :xwr.shape[-1]], xwr) < 1e-4


def test_istft_twosided_and_errors():
    rng = np.random.default_rng(RNG_SEED)
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(
        np.complex64
    )
    with pytest.warns(UserWarning):
        f, t, z = stft(x, nperseg=64)
    tr, xr = istft(z, nperseg=64, input_onesided=False)
    assert _rel(xr[..., :512], x.astype(np.complex128)) < 1e-5
    with pytest.raises(ValueError):
        istft(z[..., :3, :], nperseg=64)           # wrong bin count
    with pytest.raises(ValueError):
        istft(np.zeros(5, np.complex64))           # rank < 2
    with pytest.raises(ValueError, match="NOLA"):
        # a window that is zero over most of the segment leaves overlap-add
        # gaps at noverlap=0 -> not invertible
        w = np.zeros(64)
        w[:16] = 1.0
        istft(z, window=w, nperseg=64, noverlap=0, nfft=64,
              input_onesided=False)


def test_check_cola_nola():
    assert check_cola("hann", 128, 64) == ss.check_COLA("hann", 128, 64)
    assert check_cola("hann", 128, 100) == ss.check_COLA("hann", 128, 100)
    assert check_nola("hann", 128, 64) == ss.check_NOLA("hann", 128, 64)
    assert check_nola("boxcar", 64, 0) == ss.check_NOLA("boxcar", 64, 0)
    # a window with zero overlap-add gaps
    w = np.zeros(64)
    w[:16] = 1.0
    assert check_nola(w, 64, 16) == ss.check_NOLA(w, 64, 16)


def test_stft_exports():
    assert ft.stft is stft and ft.istft is istft
    assert ft.check_cola is check_cola and ft.check_nola is check_nola
