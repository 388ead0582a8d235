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


# -- overlap-add convolution ---------------------------------------------------


def test_prev_fast_len():
    from fourier_tpu.signal import prev_fast_len

    cases = {1: 1, 2: 2, 5: 4, 7: 6, 9: 9, 13: 12, 17: 16, 100: 96,
             1000: 972, 1025: 1024}
    for n, want in cases.items():
        assert prev_fast_len(n) == want, (n, prev_fast_len(n), want)
    for n in range(1, 500):
        m = prev_fast_len(n)
        assert 1 <= m <= n
        r = m
        while r % 2 == 0:
            r //= 2
        while r % 3 == 0:
            r //= 3
        assert r == 1
    with pytest.raises(ValueError):
        prev_fast_len(0)


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_oaconvolve_1d_real(mode):
    from fourier_tpu.signal import oaconvolve

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(4000).astype(np.float32)
    h = rng.standard_normal(31).astype(np.float32)
    got = np.asarray(oaconvolve(x, h, mode))
    want = ss.oaconvolve(x.astype(np.float64), h.astype(np.float64), mode)
    assert got.dtype.kind == "f"
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5


def test_oaconvolve_swapped_and_complex():
    from fourier_tpu.signal import oaconvolve

    rng = np.random.default_rng(RNG_SEED)
    # in2 is the long side (the split must land on in2)
    h = (rng.standard_normal(17) + 1j * rng.standard_normal(17)).astype(
        np.complex64
    )
    x = (rng.standard_normal(3000) + 1j * rng.standard_normal(3000)).astype(
        np.complex64
    )
    got = np.asarray(oaconvolve(h, x))
    want = ss.oaconvolve(h.astype(np.complex128), x.astype(np.complex128))
    assert got.dtype.kind == "c"
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("mode", ["full", "same"])
def test_oaconvolve_2d(mode):
    from fourier_tpu.signal import oaconvolve

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((300, 257)).astype(np.float32)
    h = rng.standard_normal((7, 5)).astype(np.float32)
    got = np.asarray(oaconvolve(x, h, mode))
    want = ss.oaconvolve(x.astype(np.float64), h.astype(np.float64), mode)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5


def test_oaconvolve_batched_axes():
    from fourier_tpu.signal import oaconvolve

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((3, 2000)).astype(np.float32)
    h = rng.standard_normal((3, 9)).astype(np.float32)
    got = np.asarray(oaconvolve(x, h, "full", axes=-1))
    want = ss.oaconvolve(
        x.astype(np.float64), h.astype(np.float64), "full", axes=-1
    )
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5


def test_oaconvolve_equal_sizes_falls_back():
    from fourier_tpu.signal import fftconvolve, oaconvolve

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(128).astype(np.float32)
    h = rng.standard_normal(128).astype(np.float32)
    got = np.asarray(oaconvolve(x, h))
    want = np.asarray(fftconvolve(x, h))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_oaconvolve_c128():
    from fourier_tpu.signal import oaconvolve

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(2500)
    h = rng.standard_normal(21)
    got = np.asarray(oaconvolve(x, h, dtype=np.complex128))
    want = ss.oaconvolve(x, h)
    assert _rel(got, want) < 1e-12


def test_oaconvolve_validation():
    from fourier_tpu.signal import oaconvolve

    with pytest.raises(ValueError):
        oaconvolve(np.zeros((2, 3), np.float32), np.zeros(3, np.float32))
    with pytest.raises(ValueError):
        oaconvolve(
            np.zeros((2, 100), np.float32),
            np.zeros((3, 5), np.float32),
            axes=-1,
        )


# -- analytic signal / resample / correlation ----------------------------------


@pytest.mark.parametrize("n", [64, 100, 101])
def test_hilbert_vs_scipy(n):
    from fourier_tpu.signal import hilbert

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((2, n))
    got = np.asarray(hilbert(x.astype(np.float32)))
    want = ss.hilbert(x)
    assert _rel(got, want) < 1e-5
    # envelope of a chirpy tone is ~constant
    tt = np.arange(512) / 512.0
    tone = np.cos(2 * np.pi * 50 * tt).astype(np.float32)
    env = np.abs(np.asarray(hilbert(tone)))
    assert np.all(np.abs(env[32:-32] - 1.0) < 0.02)


def test_hilbert_n_and_validation():
    from fourier_tpu.signal import hilbert

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(100)
    got = np.asarray(hilbert(x.astype(np.float32), 150))
    want = ss.hilbert(x, 150)
    assert _rel(got, want) < 1e-5
    with pytest.raises(ValueError):
        hilbert(x.astype(np.complex64))
    with pytest.raises(ValueError):
        hilbert(x, 0)


def test_hilbert2_vs_scipy():
    from fourier_tpu.signal import hilbert2

    rng = np.random.default_rng(RNG_SEED)
    img = rng.standard_normal((24, 37))
    got = np.asarray(hilbert2(img.astype(np.float32)))
    assert _rel(got, ss.hilbert2(img)) < 1e-5
    got = np.asarray(hilbert2(img.astype(np.float32), (32, 32)))
    assert _rel(got, ss.hilbert2(img, (32, 32))) < 1e-5
    b = rng.standard_normal((3, 16, 18))
    got = np.asarray(hilbert2(b.astype(np.float32), axes=(1, 2)))
    assert _rel(got, ss.hilbert2(b, axes=(1, 2))) < 1e-5
    with pytest.raises(ValueError):
        hilbert2(img.astype(np.complex64))
    with pytest.raises(ValueError):
        hilbert2(img, axes=(0, 0))


@pytest.mark.parametrize("n,num", [
    (100, 50), (100, 51), (101, 50), (100, 200), (100, 201), (101, 202),
    (128, 128),
])
def test_resample_vs_scipy(n, num):
    from fourier_tpu.signal import resample

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(n)
    got = np.asarray(resample(x.astype(np.float32), num))
    want = ss.resample(x, num)
    assert got.dtype.kind == "f"
    assert _rel(got, want) < 1e-5
    xc = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    got = np.asarray(resample(xc.astype(np.complex64), num))
    assert _rel(got, ss.resample(xc, num)) < 1e-5


def test_resample_window_t_and_domain():
    from fourier_tpu.signal import resample

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(120)
    t = np.arange(120) * 0.25
    got, gt = resample(x.astype(np.float32), 80, t=t, window="hamming")
    want, wt = ss.resample(x, 80, t=t, window="hamming")
    assert _rel(got, want) < 1e-5
    np.testing.assert_allclose(gt, wt)
    wf = lambda f: np.exp(-8.0 * f * f)
    got = resample(x.astype(np.float32), 80, window=wf)
    assert _rel(got, ss.resample(x, 80, window=wf)) < 1e-5
    spec = np.fft.fft(x)
    got = resample(spec.astype(np.complex64), 80, domain="freq")
    assert _rel(got, ss.resample(spec, 80, domain="freq")) < 1e-5
    # batched along axis 0 (scipy's default axis)
    xb = rng.standard_normal((100, 3))
    got = resample(xb.astype(np.float32), 64, axis=0)
    assert _rel(got, ss.resample(xb, 64, axis=0)) < 1e-5
    with pytest.raises(ValueError):
        resample(x, 0)
    with pytest.raises(ValueError):
        resample(x, 50, domain="nope")


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_correlate_vs_scipy(mode):
    from fourier_tpu.signal import correlate, correlation_lags

    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal(300).astype(np.float32)
    b = rng.standard_normal(41).astype(np.float32)
    got = np.asarray(correlate(a, b, mode))
    want = ss.correlate(a.astype(np.float64), b.astype(np.float64), mode,
                        method="fft")
    assert _rel(got, want) < 1e-5
    np.testing.assert_array_equal(
        correlation_lags(300, 41, mode), ss.correlation_lags(300, 41, mode)
    )


def test_correlate_complex_conjugation():
    from fourier_tpu.signal import correlate

    rng = np.random.default_rng(RNG_SEED)
    a = (rng.standard_normal(128) + 1j * rng.standard_normal(128)).astype(
        np.complex64
    )
    b = (rng.standard_normal(32) + 1j * rng.standard_normal(32)).astype(
        np.complex64
    )
    got = np.asarray(correlate(a, b))
    want = ss.correlate(
        a.astype(np.complex128), b.astype(np.complex128), method="fft"
    )
    assert _rel(got, want) < 1e-5
    # peak finds the embedded template
    sig = np.zeros(256, np.float32)
    sig[100:132] = b.real
    lag = np.argmax(np.abs(np.asarray(correlate(sig, b.real))))
    from fourier_tpu.signal import correlation_lags
    assert correlation_lags(256, 32)[lag] == 100


# -- ConvolvePlan (device-resident overlap-add) --------------------------------


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_convolve_plan_real(mode):
    from fourier_tpu.signal import ConvolvePlan

    rng = np.random.default_rng(7)
    x = rng.standard_normal(4000).astype(np.float32)
    h = rng.standard_normal(63).astype(np.float32)
    plan = ConvolvePlan(h, mode=mode)
    got = plan(x)
    want = ss.fftconvolve(x.astype(np.float64), h.astype(np.float64), mode)
    assert got.dtype == np.float32
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


def test_convolve_plan_complex_batched():
    from fourier_tpu.signal import ConvolvePlan

    rng = np.random.default_rng(8)
    x = (rng.standard_normal((3, 2000)) + 1j * rng.standard_normal((3, 2000))
         ).astype(np.complex64)
    h = (rng.standard_normal(100) + 1j * rng.standard_normal(100)
         ).astype(np.complex64)
    plan = ConvolvePlan(h, mode="full")
    got = plan(x)
    want = np.stack([
        ss.fftconvolve(x[i].astype(np.complex128), h.astype(np.complex128))
        for i in range(3)
    ])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4 * np.abs(want).max())


def test_convolve_plan_jittable_zero_host():
    """The planar path is traceable end-to-end: jit(conv) with the plan as a
    pytree argument compiles and matches the eager result."""
    import jax
    import jax.numpy as jnp

    from fourier_tpu.signal import ConvolvePlan

    rng = np.random.default_rng(9)
    x = rng.standard_normal(1777).astype(np.float32)
    h = rng.standard_normal(31).astype(np.float32)
    plan = ConvolvePlan(h, mode="same")

    @jax.jit
    def conv(p, xr):
        return p.convolve_planar(xr)

    got = np.asarray(conv(plan, jnp.asarray(x)))
    want = ss.fftconvolve(x.astype(np.float64), h.astype(np.float64), "same")
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


def test_convolve_plan_short_signal_and_edge_blocks():
    from fourier_tpu.signal import ConvolvePlan

    rng = np.random.default_rng(10)
    h = rng.standard_normal(17).astype(np.float32)
    plan = ConvolvePlan(h, mode="full")
    for s1 in (17, plan.step, plan.step + 1, 3 * plan.step - 1):
        x = rng.standard_normal(s1).astype(np.float32)
        got = plan(x)
        want = ss.fftconvolve(x.astype(np.float64), h.astype(np.float64))
        np.testing.assert_allclose(
            got, want, rtol=0, atol=3e-4 * np.abs(want).max()
        )


def test_convolve_plan_dd_c128():
    """dd plan: spectral product + fold fully in dd; ~1e-14 accuracy."""
    from fourier_tpu.signal import ConvolvePlan

    rng = np.random.default_rng(11)
    x = rng.standard_normal(900)
    h = rng.standard_normal(41)
    plan = ConvolvePlan(h, mode="full", dtype=np.complex128)
    got = plan(x)
    want = ss.fftconvolve(x, h)
    assert got.dtype == np.float64
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-13, rel


def test_convolve_plan_dd_complex_jit():
    import jax
    import jax.numpy as jnp

    from fourier_tpu.precision import ddreal
    from fourier_tpu.signal import ConvolvePlan

    rng = np.random.default_rng(12)
    x = rng.standard_normal(500) + 1j * rng.standard_normal(500)
    h = rng.standard_normal(29) + 1j * rng.standard_normal(29)
    plan = ConvolvePlan(h, mode="same", dtype=np.complex128)

    rh, rl = ddreal.from_f64(x.real)
    ih, il = ddreal.from_f64(x.imag)

    @jax.jit
    def conv(p, rh, rl, ih, il):
        return p.convolve_planar_dd(rh, rl, ih, il)

    orh, orl, oih, oil = conv(plan, *[jnp.asarray(v) for v in (rh, rl, ih, il)])
    got = (ddreal.to_f64((np.asarray(orh), np.asarray(orl)))
           + 1j * ddreal.to_f64((np.asarray(oih), np.asarray(oil))))
    want = ss.fftconvolve(x, h, "same")
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-13, rel


def test_convolve_plan_grad():
    """Linear in the input: grad through the plan matches the adjoint."""
    import jax
    import jax.numpy as jnp

    from fourier_tpu.signal import ConvolvePlan

    rng = np.random.default_rng(13)
    h = rng.standard_normal(9).astype(np.float32)
    plan = ConvolvePlan(h, mode="full")
    x = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(208).astype(np.float32))

    loss = lambda xv: jnp.vdot(w, plan.convolve_planar(xv))
    g = jax.grad(loss)(x)
    # adjoint of conv-with-h is correlation with h
    want = ss.correlate(np.asarray(w, np.float64), h.astype(np.float64),
                        "valid")
    np.testing.assert_allclose(np.asarray(g), want, rtol=0,
                               atol=2e-4 * np.abs(want).max())


def test_convolve_plan_validation():
    from fourier_tpu.signal import ConvolvePlan

    with pytest.raises(ValueError):
        ConvolvePlan(np.ones((2, 2)))
    with pytest.raises(ValueError):
        ConvolvePlan(np.ones(8), mode="banana")
    with pytest.raises(ValueError):
        ConvolvePlan(np.ones(64), block=16)
    plan = ConvolvePlan(np.ones(8), dtype=np.complex128)
    with pytest.raises(TypeError):
        plan.convolve_planar(np.zeros(32, np.float32))
