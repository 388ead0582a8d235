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


# -- PSD family ----------------------------------------------------------------


@pytest.mark.parametrize("scaling", ["density", "spectrum"])
@pytest.mark.parametrize("average", ["mean", "median"])
def test_welch_vs_scipy(scaling, average):
    from fourier_tpu.spectral import welch

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(4000).astype(np.float32)
    f, p = welch(x, fs=8.0, nperseg=256, scaling=scaling, average=average)
    fw, pw = ss.welch(x.astype(np.float64), fs=8.0, nperseg=256,
                      scaling=scaling, average=average)
    np.testing.assert_allclose(f, fw)
    assert _rel(p, pw) < 1e-4


def test_welch_options_vs_scipy():
    from fourier_tpu.spectral import welch

    rng = np.random.default_rng(RNG_SEED)
    x = (rng.standard_normal(3000) + 2.5).astype(np.float32)
    for kw in (
        dict(nperseg=200, noverlap=150),
        dict(nperseg=128, nfft=256),
        dict(nperseg=128, detrend="linear"),
        dict(nperseg=128, detrend=False),
        dict(nperseg=127, window="hamming"),  # odd nperseg (Nyquist handling)
    ):
        f, p = welch(x, **kw)
        fw, pw = ss.welch(x.astype(np.float64), **kw)
        np.testing.assert_allclose(f, fw)
        assert _rel(p, pw) < 1e-4, kw


def test_welch_complex_twosided():
    from fourier_tpu.spectral import welch

    rng = np.random.default_rng(RNG_SEED)
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(
        np.complex64
    )
    f, p = welch(x, nperseg=256)
    fw, pw = ss.welch(x.astype(np.complex128), nperseg=256)
    np.testing.assert_allclose(f, fw)
    assert _rel(p, pw) < 1e-4


def test_csd_and_coherence_vs_scipy():
    from fourier_tpu.spectral import coherence, csd

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(4000).astype(np.float32)
    y = (
        np.roll(x, 3) + 0.4 * rng.standard_normal(4000).astype(np.float32)
    ).astype(np.float32)
    f, pxy = csd(x, y, fs=2.0, nperseg=256)
    fw, pw = ss.csd(x.astype(np.float64), y.astype(np.float64), fs=2.0,
                    nperseg=256)
    assert pxy.dtype.kind == "c"
    assert _rel(pxy, pw) < 1e-4
    f, cxy = coherence(x, y, nperseg=256)
    fw, cw = ss.coherence(x.astype(np.float64), y.astype(np.float64),
                          nperseg=256)
    assert _rel(cxy, cw) < 1e-4
    # unequal lengths: shorter zero-padded
    f, pxy = csd(x, y[:3000], nperseg=256)
    fw, pw = ss.csd(x.astype(np.float64), y[:3000].astype(np.float64),
                    nperseg=256)
    assert _rel(pxy, pw) < 1e-4


def test_periodogram_vs_scipy():
    from fourier_tpu.spectral import periodogram

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(1024).astype(np.float32)
    f, p = periodogram(x, fs=5.0)
    fw, pw = ss.periodogram(x.astype(np.float64), fs=5.0)
    np.testing.assert_allclose(f, fw)
    assert _rel(p, pw) < 1e-4
    f, p = periodogram(x, window="hann", nfft=2048)
    fw, pw = ss.periodogram(x.astype(np.float64), window="hann", nfft=2048)
    assert _rel(p, pw) < 1e-4


@pytest.mark.parametrize("mode", ["psd", "complex", "magnitude", "angle",
                                  "phase"])
def test_spectrogram_vs_scipy(mode):
    from fourier_tpu.spectral import spectrogram

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(3000).astype(np.float32)
    f, t, s = spectrogram(x, fs=100.0, nperseg=256, mode=mode)
    fw, tw, sw = ss.spectrogram(x.astype(np.float64), fs=100.0, nperseg=256,
                                mode=mode)
    np.testing.assert_allclose(f, fw)
    np.testing.assert_allclose(t, tw)
    assert s.shape == sw.shape
    tol = 2e-3 if mode in ("angle", "phase") else 1e-4
    assert _rel(s, sw) < tol, mode


def test_welch_batched():
    from fourier_tpu.spectral import welch

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((4, 2000)).astype(np.float32)
    f, p = welch(x, nperseg=256)
    fw, pw = ss.welch(x.astype(np.float64), nperseg=256)
    assert p.shape == pw.shape
    assert _rel(p, pw) < 1e-4


# -- device-resident StftPlan ----------------------------------------------------


def test_stft_plan_matches_host_stft():
    import jax

    from fourier_tpu.spectral import StftPlan

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((3, 1000)).astype(np.float32)
    plan = StftPlan(128, hop=64)
    re, im = jax.jit(plan.stft_planar)(x)
    got = np.asarray(re) + 1j * np.asarray(im)
    # host stft with boundary=None, padded=False == the plan's semantics
    fw, tw, zw = ss.stft(x.astype(np.float64), nperseg=128, noverlap=64,
                         boundary=None, padded=False)
    want = np.moveaxis(zw, -1, -2)  # plan layout: (..., frames, bins)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5
    np.testing.assert_allclose(plan.f(), fw)
    np.testing.assert_allclose(plan.t(1000), tw)


def test_stft_plan_roundtrip_jit():
    import jax

    from fourier_tpu.spectral import StftPlan

    rng = np.random.default_rng(RNG_SEED)
    plan = StftPlan(256, hop=64, window="hann")
    n = plan.n_samples(20)
    x = rng.standard_normal((2, n)).astype(np.float32)

    @jax.jit
    def roundtrip(p, x):
        re, im = p.stft_planar(x)
        return p.istft_planar(re, im)

    back = np.asarray(roundtrip(plan, x))
    # interior is exactly reconstructed; edges lack full window overlap
    assert back.shape == x.shape
    core = slice(256, n - 256)
    assert _rel(back[:, core], x[:, core]) < 1e-5


def test_stft_plan_twosided_complex():
    import jax

    from fourier_tpu.spectral import StftPlan

    rng = np.random.default_rng(RNG_SEED)
    plan = StftPlan(64, hop=16, onesided=False)
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(
        np.complex64
    )
    re, im = jax.jit(plan.stft_planar)(
        x.real.astype(np.float32), x.imag.astype(np.float32)
    )
    got = np.asarray(re) + 1j * np.asarray(im)
    fw, tw, zw = ss.stft(x.astype(np.complex128), nperseg=64, noverlap=48,
                         boundary=None, padded=False,
                         return_onesided=False)
    want = np.moveaxis(zw, -1, -2)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5
    # inverse roundtrip (twosided)
    rre, rim = jax.jit(plan.istft_planar)(re, im)
    back = np.asarray(rre) + 1j * np.asarray(rim)
    core = slice(64, 512 - 64)
    assert _rel(back[core], x[core].astype(np.complex128)) < 1e-5


def test_stft_plan_pytree_and_validation():
    import jax

    from fourier_tpu.spectral import StftPlan

    plan = StftPlan(64, hop=32, nfft=128)
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    plan2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert repr(plan2) == repr(plan)
    assert plan.n_bins == 65 and plan.n_frames(128) == 3
    assert plan.n_samples(3) == 128
    with pytest.raises(ValueError):
        StftPlan(64, hop=0)
    with pytest.raises(ValueError):
        StftPlan(64, nfft=32)
    with pytest.raises(ValueError):
        plan.n_frames(32)
    bad = StftPlan(64, hop=64, window=np.r_[np.ones(16), np.zeros(48)])
    assert not bad.invertible
    with pytest.raises(ValueError, match="NOLA"):
        bad.istft_planar(np.zeros((2, 65), np.float32),
                         np.zeros((2, 65), np.float32))
