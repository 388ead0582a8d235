"""czt / zoom_fft / N-D DCT-DST vs scipy.

The chirp z-transform generalizes the Bluestein factorization the reference
ships (bluesteins.rs:63-131) to arbitrary (m, w, a); scipy.signal.czt /
zoom_fft and scipy.fft.dctn/idctn/dstn/idstn are the semantic oracles.
"""

import numpy as np
import pytest
import scipy.fft as sfft
import scipy.signal as ss

import fourier_tpu as ft

RNG = np.random.default_rng(0xC27)


def _randc(shape, dtype=np.complex128):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(dtype)


@pytest.mark.parametrize("n,m", [(16, 16), (17, 31), (64, 7), (100, 100),
                                 (1, 5), (5, 1)])
def test_czt_default_w(n, m):
    x = _randc((3, n))
    got = ft.czt(x, m)
    want = ss.czt(x, m)
    assert np.linalg.norm(got - want) <= 1e-12 * max(np.linalg.norm(want), 1)


def test_czt_equals_fft():
    x = _randc((64,))
    assert np.allclose(ft.czt(x), np.fft.fft(x), rtol=0, atol=1e-12)


@pytest.mark.parametrize("w,a", [
    (np.exp(-2j * np.pi * 0.007), 1 + 0j),          # unit-|w| off-grid
    (np.exp(-2j * np.pi / 40), np.exp(0.3j)),       # rotated start point
])
def test_czt_unit_w(w, a):
    n, m = 50, 23
    x = _randc((n,))
    got = ft.czt(x, m, w, a)
    want = ss.czt(x, m, w, a)
    assert np.linalg.norm(got - want) <= 1e-11 * np.linalg.norm(want)


def test_czt_nonunit_w_vs_direct():
    # |w| != 1 is inherently ill-conditioned (mag^{j^2/2} dynamic range);
    # gate against the direct O(nm) evaluation, and require parity with
    # scipy's own error.
    n, m = 50, 23
    w, a = 0.98 * np.exp(-2j * np.pi / 40), 1.1 + 0.2j
    x = _randc((n,))
    k, nn = np.arange(m), np.arange(n)
    z = a * w ** (-k)
    direct = (x[None, :] * z[:, None] ** (-nn[None, :])).sum(1)
    ours = np.linalg.norm(ft.czt(x, m, w, a) - direct)
    scipys = np.linalg.norm(ss.czt(x, m, w, a) - direct)
    assert ours <= 2.0 * scipys + 1e-12 * np.linalg.norm(direct)


def test_czt_c64_dtype_and_axis():
    x = _randc((4, 32, 2), np.complex64)
    got = ft.czt(x, 20, axis=1)
    want = ss.czt(x.astype(np.complex128), 20, axis=1)
    assert got.dtype == np.complex64
    assert np.linalg.norm(got - want) <= 1e-5 * np.linalg.norm(want)


def test_zoom_fft_band():
    x = _randc((3, 100))
    got = ft.zoom_fft(x, [0.1, 0.4], 47, fs=2)
    want = ss.zoom_fft(x, [0.1, 0.4], 47, fs=2)
    assert np.linalg.norm(got - want) <= 1e-11 * np.linalg.norm(want)


def test_zoom_fft_scalar_fn_endpoint():
    x = RNG.standard_normal(64)
    got = ft.zoom_fft(x, 0.5, 33, fs=2, endpoint=True)
    want = ss.zoom_fft(x, 0.5, 33, fs=2, endpoint=True)
    assert np.linalg.norm(got - want) <= 1e-11 * np.linalg.norm(want)


def test_czt_plan_reuse_and_repr():
    p = ft.CztPlan(24, 10)
    x = _randc((24,), np.complex64)
    a = p(x)
    b = p(x)
    assert np.array_equal(a, b)
    assert "CztPlan" in repr(p) and "inner=" in repr(p)


def test_czt_validation():
    with pytest.raises(ValueError):
        ft.CztPlan(0, 4)
    with pytest.raises(ValueError):
        ft.CztPlan(8, 8)(np.ones(7, np.complex64))


# -- N-D DCT / DST -----------------------------------------------------------


@pytest.mark.parametrize("kind,fwd,inv", [
    ("dct", ft.dctn, ft.idctn), ("dst", ft.dstn, ft.idstn)
])
@pytest.mark.parametrize("type_", [1, 2, 3, 4])
def test_dctn_dstn_vs_scipy(kind, fwd, inv, type_):
    x = RNG.standard_normal((6, 5, 8))
    sf = sfft.dctn if kind == "dct" else sfft.dstn
    si = sfft.idctn if kind == "dct" else sfft.idstn
    for kw in ({}, {"axes": (0, 2)}, {"norm": "ortho"},
               {"s": (4, 9), "axes": (1, 2)}):
        got = fwd(x, type_, **kw)
        want = sf(x, type_, **kw)
        assert np.linalg.norm(got - want) <= 1e-4 * np.linalg.norm(want), kw
        got = inv(x, type_, **kw)
        want = si(x, type_, **kw)
        assert np.linalg.norm(got - want) <= 1e-4 * np.linalg.norm(want), kw


def test_dctn_roundtrip_f64():
    x = RNG.standard_normal((5, 12)).astype(np.float64)
    rt = ft.idctn(ft.dctn(x, 2, norm="ortho"), 2, norm="ortho")
    assert np.linalg.norm(rt - x) <= 1e-10 * np.linalg.norm(x)


def test_dctn_s_defaults_last_axes():
    x = RNG.standard_normal((4, 6, 8))
    got = ft.dctn(x, 2, s=(3, 5))          # implies axes (1, 2)
    want = sfft.dctn(x, 2, s=(3, 5))
    assert np.linalg.norm(got - want) <= 1e-4 * np.linalg.norm(want)


# -- fast Hankel transform (FFTLog) ------------------------------------------


@pytest.mark.parametrize("n,mu,bias,offset", [
    (64, 0.5, 0.0, 0.0),
    (100, 2.0, 0.0, 0.3),
    (128, -0.5, 0.1, 0.0),
    (47, 1.0, -0.2, 0.5),
])
def test_fht_vs_scipy(n, mu, bias, offset):
    dln = 0.1
    a = RNG.standard_normal((2, n)) * np.exp(-0.05 * np.arange(n))
    got = ft.fht(a, dln, mu, offset, bias)
    want = sfft.fht(a, dln, mu, offset=offset, bias=bias)
    assert np.linalg.norm(got - want) <= 1e-11 * np.linalg.norm(want)
    gi = ft.ifht(got, dln, mu, offset, bias)
    wi = sfft.ifht(want, dln, mu, offset=offset, bias=bias)
    assert np.linalg.norm(gi - wi) <= 1e-11 * np.linalg.norm(wi)


def test_fht_roundtrip_low_ringing():
    n, dln, mu = 128, 0.08, 1.5
    offset = ft.fhtoffset(dln, mu, 0.0)
    assert offset == sfft.fhtoffset(dln, mu, initial=0.0, bias=0.0)
    a = RNG.standard_normal(n) * np.exp(-0.03 * np.arange(n))
    rt = ft.ifht(ft.fht(a, dln, mu, offset), dln, mu, offset)
    assert np.linalg.norm(rt - a) <= 1e-10 * np.linalg.norm(a)


def test_fht_singular_warns():
    # bias -3 at mu=0 puts only the numerator gamma at a pole: u_0 = inf
    # (scipy warns identically for this configuration)
    with pytest.warns(UserWarning, match="singular"):
        ft.fht(RNG.standard_normal(16), 0.1, 0.0, 0.0, -3.0)


def test_rfft_dtype_inference():
    # numpy promotion parity: f64 -> complex128, f32 -> complex64
    a = RNG.standard_normal(32)
    assert np.asarray(ft.rfft(a)).dtype == np.complex128
    assert np.asarray(ft.rfft(a.astype(np.float32))).dtype == np.complex64
    got = np.asarray(ft.rfft(a))
    assert np.linalg.norm(got - np.fft.rfft(a)) <= 1e-12 * np.linalg.norm(got)
    back = np.asarray(ft.irfft(got, 32))
    assert np.linalg.norm(back - a) <= 1e-12
