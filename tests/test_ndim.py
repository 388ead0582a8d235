"""Multi-dimensional transform tests vs numpy.fft."""

import numpy as np
import pytest

from fourier_tpu import Transform
from fourier_tpu.ndim import NdFftPlan, fft2, fftn, ifft2, ifftn

RNG_SEED = 0x2D2D


def _rand(shape, rng):
    return (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex64)


@pytest.mark.parametrize("shape", [(16, 16), (8, 32), (12, 35)])
def test_fft2_vs_numpy(shape):
    rng = np.random.default_rng(RNG_SEED)
    x = _rand(shape, rng)
    np.testing.assert_allclose(fft2(x), np.fft.fft2(x), atol=1e-3)
    np.testing.assert_allclose(ifft2(x), np.fft.ifft2(x), atol=1e-4)


def test_fftn_3d():
    rng = np.random.default_rng(RNG_SEED)
    x = _rand((4, 8, 16), rng)
    np.testing.assert_allclose(fftn(x), np.fft.fftn(x), atol=1e-3)
    np.testing.assert_allclose(ifftn(x), np.fft.ifftn(x), atol=1e-4)


def test_batched_fft2():
    rng = np.random.default_rng(RNG_SEED)
    x = _rand((3, 8, 16), rng)
    got = fftn(x, ndim=2)
    want = np.fft.fft2(x, axes=(-2, -1))
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("mode", list(Transform))
def test_nd_modes(mode):
    rng = np.random.default_rng(RNG_SEED)
    shape = (8, 12)
    x = _rand(shape, rng)
    plan = NdFftPlan(shape)
    got = plan.transform(x, mode)
    n = np.prod(shape)
    base = np.fft.fft2(x) if mode.is_forward else np.fft.ifft2(x) * n
    scale = mode.scale(n)
    want = base * (scale if scale is not None else 1.0)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_nd_unitary_roundtrip():
    rng = np.random.default_rng(RNG_SEED)
    shape = (16, 9)
    x = _rand(shape, rng)
    plan = NdFftPlan(shape)
    y = plan.transform(x, Transform.SQRT_SCALED_FFT)
    # Parseval
    assert abs(np.linalg.norm(y) - np.linalg.norm(x)) < 1e-4 * np.linalg.norm(x)
    back = plan.transform(y, Transform.SQRT_SCALED_IFFT)
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_nd_shape_validation():
    plan = NdFftPlan((8, 8))
    with pytest.raises(ValueError):
        plan.fft(np.zeros((8, 9), np.complex64))
    with pytest.raises(ValueError):
        NdFftPlan(())


@pytest.mark.parametrize("shape", [(16, 16), (8, 12)])
def test_fft2_c128_dd(shape):
    """c128 2-D via the 4-plane dd representation (the TPU c128 path)."""
    rng = np.random.default_rng(RNG_SEED)
    x = (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex128)
    plan = NdFftPlan(shape, np.complex128, backend="dd")
    assert plan.is_dd
    want = np.fft.fft2(x)
    got = plan.fft(x)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)
    back = plan.ifft(got)
    assert np.linalg.norm(back - x) < 1e-12 * np.linalg.norm(x)


def test_fft2_c128_dd_jit_path():
    """The 4-plane planar API traced under jit matches the eager numpy path."""
    import jax
    import jax.numpy as jnp

    from fourier_tpu.precision import ddreal as dd

    rng = np.random.default_rng(RNG_SEED)
    shape = (8, 16)
    x = (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex128)
    plan = NdFftPlan(shape, np.complex128, backend="dd")
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    fn = jax.jit(
        lambda a, b, c, d: plan.transform_planar_dd(a, b, c, d, Transform.FFT)
    )
    orh, orl, oih, oil = fn(jnp.asarray(rh), jnp.asarray(rl),
                            jnp.asarray(ih), jnp.asarray(il))
    got = dd.to_f64((np.asarray(orh), np.asarray(orl))) + 1j * dd.to_f64(
        (np.asarray(oih), np.asarray(oil))
    )
    want = np.fft.fft2(x)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)


def test_fftn_3d_c128_dd_bluestein_axis():
    """dd N-D with a Bluestein (prime) axis keeps the 1e-12 gate."""
    rng = np.random.default_rng(RNG_SEED)
    shape = (4, 7, 8)  # 7 is prime -> dd Bluestein along that axis
    x = (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex128)
    plan = NdFftPlan(shape, np.complex128, backend="dd")
    want = np.fft.fftn(x)
    got = plan.fft(x)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)


def test_nd_dd_plane_api_mismatch_raises():
    plan_dd = NdFftPlan((8, 8), np.complex128, backend="dd")
    with pytest.raises(TypeError):
        plan_dd.transform_planar(np.zeros((8, 8), np.float32),
                                 np.zeros((8, 8), np.float32))
    plan = NdFftPlan((8, 8))
    with pytest.raises(TypeError):
        plan.transform_planar_dd(*(np.zeros((8, 8), np.float32),) * 4)


def test_fftshift_helpers():
    from fourier_tpu import fftfreq, fftshift, ifftshift

    for n in (8, 9, 16):
        x = np.arange(n)
        np.testing.assert_array_equal(np.asarray(fftshift(x)), np.fft.fftshift(x))
        np.testing.assert_array_equal(
            np.asarray(ifftshift(fftshift(x))), x
        )
        np.testing.assert_allclose(fftfreq(n, d=0.5), np.fft.fftfreq(n, d=0.5))
    x2 = np.arange(24).reshape(4, 6)
    np.testing.assert_array_equal(np.asarray(fftshift(x2)), np.fft.fftshift(x2))
    np.testing.assert_array_equal(
        np.asarray(fftshift(x2, axes=1)), np.fft.fftshift(x2, axes=1)
    )


def test_numpy_compat_kwargs():
    """n/s/axes/norm parity with numpy.fft on the convenience API."""
    import fourier_tpu as ft

    rng = np.random.default_rng(0xA1)
    rel = lambda g, w: np.linalg.norm(np.asarray(g) - w) / max(
        np.linalg.norm(w), 1e-30
    )
    x = (
        rng.standard_normal((3, 100)) + 1j * rng.standard_normal((3, 100))
    ).astype(np.complex64)
    for norm in (None, "ortho", "forward"):
        for n in (None, 64, 128):
            assert rel(ft.fft(x, n=n, norm=norm), np.fft.fft(x, n=n, norm=norm)) < 1e-5
            assert rel(ft.ifft(x, n=n, norm=norm), np.fft.ifft(x, n=n, norm=norm)) < 1e-5
    a = (
        rng.standard_normal((4, 6, 8)) + 1j * rng.standard_normal((4, 6, 8))
    ).astype(np.complex64)
    assert rel(
        ft.fftn(a, axes=(0, 2), norm="ortho"),
        np.fft.fftn(a, axes=(0, 2), norm="ortho"),
    ) < 1e-5
    assert rel(ft.fft2(a, s=(8, 12)), np.fft.fft2(a, s=(8, 12))) < 1e-5
    assert rel(
        ft.ifftn(a, s=(4, 4), axes=(1, 2), norm="forward"),
        np.fft.ifftn(a, s=(4, 4), axes=(1, 2), norm="forward"),
    ) < 1e-5
    assert rel(ft.fftn(a, 2), np.fft.fftn(a, axes=(-2, -1))) < 1e-5
    with pytest.raises(ValueError):
        ft.fftn(a, axes=(0, 0))
    with pytest.raises(ValueError):
        ft.fft(x, norm="bogus")


def test_rfft_norm_kwargs():
    import fourier_tpu as ft

    rng = np.random.default_rng(0xA2)
    rel = lambda g, w: np.linalg.norm(np.asarray(g) - w) / np.linalg.norm(w)
    xr = rng.standard_normal((2, 50)).astype(np.float32)
    for norm in (None, "ortho", "forward"):
        for n in (None, 32, 64):
            assert rel(
                ft.rfft(xr, n=n, norm=norm), np.fft.rfft(xr, n=n, norm=norm)
            ) < 1e-5, (norm, n)
    spec = np.fft.rfft(xr).astype(np.complex64)
    for norm in (None, "ortho", "forward"):
        assert rel(ft.irfft(spec, norm=norm), np.fft.irfft(spec, norm=norm)) < 1e-4
