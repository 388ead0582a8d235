"""fftconvolve / next_fast_len tests vs scipy.signal.fftconvolve."""

import numpy as np
import pytest
from scipy import signal as ss

import fourier_tpu as ft
from fourier_tpu.signal import fftconvolve, next_fast_len

RNG_SEED = 0xC0


def _rel(got, want):
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)


def test_next_fast_len_values():
    cases = {1: 1, 2: 2, 5: 6, 7: 8, 9: 9, 13: 16, 17: 18, 97: 108,
             1000: 1024, 1025: 1152, 2917: 3072}
    for n, want in cases.items():
        got = next_fast_len(n)
        assert got == want, (n, got, want)


def test_next_fast_len_is_fast_family():
    for n in range(1, 700):
        m = next_fast_len(n)
        assert m >= n
        r = m
        while r % 2 == 0:
            r //= 2
        while r % 3 == 0:
            r //= 3
        assert r == 1, (n, m)


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_fftconvolve_1d_real(mode):
    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal(100).astype(np.float32)
    b = rng.standard_normal(17).astype(np.float32)
    got = fftconvolve(a, b, mode)
    want = ss.fftconvolve(a, b, mode)
    assert got.shape == want.shape
    assert not np.iscomplexobj(got)
    assert _rel(got, want) < 1e-5


def test_fftconvolve_1d_complex():
    rng = np.random.default_rng(RNG_SEED)
    a = (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(
        np.complex64
    )
    b = (rng.standard_normal(31) + 1j * rng.standard_normal(31)).astype(
        np.complex64
    )
    got = fftconvolve(a, b)
    assert np.iscomplexobj(got)
    assert _rel(got, ss.fftconvolve(a, b)) < 1e-5


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_fftconvolve_2d(mode):
    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal((20, 30)).astype(np.float32)
    b = rng.standard_normal((5, 7)).astype(np.float32)
    got = fftconvolve(a, b, mode)
    want = ss.fftconvolve(a, b, mode)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5


def test_fftconvolve_batched_axes():
    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal((4, 50)).astype(np.float32)
    b = rng.standard_normal((4, 9)).astype(np.float32)
    got = fftconvolve(a, b, "same", axes=1)
    want = ss.fftconvolve(a, b, "same", axes=1)
    assert _rel(got, want) < 1e-5


def test_fftconvolve_c128():
    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal(100)
    b = rng.standard_normal(17)
    got = fftconvolve(a, b, dtype=np.complex128)
    assert _rel(got, ss.fftconvolve(a, b)) < 1e-12


def test_fftconvolve_c128_dd_path(monkeypatch):
    """Force the dd (f32-pair) c128 branch — what TPU runs."""
    from fourier_tpu import ndim, signal

    rng = np.random.default_rng(RNG_SEED)
    monkeypatch.setattr(
        signal, "_nd_plan",
        lambda shape, dtype: ndim.NdFftPlan(shape, dtype, backend="dd"),
    )
    a = rng.standard_normal(60)
    b = rng.standard_normal(13)
    got = fftconvolve(a, b, dtype=np.complex128)
    assert _rel(got, ss.fftconvolve(a, b)) < 1e-12


def test_fftconvolve_validation():
    with pytest.raises(ValueError):
        fftconvolve(np.zeros((2, 3)), np.zeros(3))  # rank mismatch
    with pytest.raises(ValueError):
        fftconvolve(np.zeros((2, 8)), np.zeros((3, 8)), axes=1)  # batch axis
    with pytest.raises(ValueError):
        fftconvolve(np.zeros(4), np.zeros(9), mode="valid")  # in2 > in1
    with pytest.raises(ValueError):
        fftconvolve(np.zeros(4), np.zeros(4), mode="bogus")


def test_exports():
    assert ft.fftconvolve is fftconvolve
    assert ft.next_fast_len is next_fast_len
