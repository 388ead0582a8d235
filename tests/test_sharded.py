"""Multi-chip sharded FFT tests on the virtual 8-device CPU mesh.

The net-new TPU capability (SURVEY.md §5): batch sharding, four-step sharded
large 1-D FFT, and sharded 2-D FFT, gated against single-chip/numpy results —
the sharded analog of the reference's oracle strategy.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import fourier_tpu as ft
from fourier_tpu import Transform
from fourier_tpu.parallel.sharded import Fft2dPlan, FourStepPlan, batched_transform

RNG_SEED = 0xFEED


def _mesh(axis="fft", n=None):
    devs = np.array(jax.devices()[: (n or len(jax.devices()))])
    return Mesh(devs, (axis,))


def _rand_planar(shape, rng):
    return (
        rng.standard_normal(shape).astype(np.float32),
        rng.standard_normal(shape).astype(np.float32),
    )


def test_batched_transform_matches_single():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh("batch")
    plan = ft.create_fft_f32(64)
    re, im = _rand_planar((16, 64), rng)
    ore, oim = batched_transform(plan, re, im, mesh, axis="batch")
    sre, sim = plan.fft_planar(re, im)
    np.testing.assert_allclose(np.asarray(ore), np.asarray(sre), atol=1e-4)
    np.testing.assert_allclose(np.asarray(oim), np.asarray(sim), atol=1e-4)


@pytest.mark.parametrize("n1,n2", [(16, 16), (32, 8), (24, 8)])
def test_four_step_natural_order(n1, n2):
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    size = n1 * n2
    x = (rng.standard_normal(size) + 1j * rng.standard_normal(size)).astype(
        np.complex64
    )
    plan = FourStepPlan(n1, n2, mesh, natural_order=True)
    re = np.real(x).reshape(n1, n2).astype(np.float32)
    im = np.imag(x).reshape(n1, n2).astype(np.float32)
    ore, oim = plan.fft_planar(re, im)
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = np.fft.fft(x)
    assert np.max(np.abs(got - want)) < 1e-3 * np.max(np.abs(want))


def test_four_step_digit_order_and_inverse():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1 = n2 = 16
    size = n1 * n2
    x = (rng.standard_normal(size) + 1j * rng.standard_normal(size)).astype(
        np.complex64
    )
    plan = FourStepPlan(n1, n2, mesh)
    re = np.real(x).reshape(n1, n2).astype(np.float32)
    im = np.imag(x).reshape(n1, n2).astype(np.float32)
    ore, oim = plan.fft_planar(re, im)
    y = np.asarray(ore) + 1j * np.asarray(oim)  # Y[k1, k2] = X[k1 + n1*k2]
    want = np.fft.fft(x).reshape(n2, n1).T  # (k1, k2) view of natural order
    assert np.max(np.abs(y - want)) < 1e-3 * np.max(np.abs(want))


def test_four_step_roundtrip_natural():
    # Roundtrip needs natural-order flat spectra on both legs: the plan maps
    # flat-reshaped input -> flat natural-order output for either direction
    # (a digit-order forward fed to the matrix-layout inverse is NOT identity).
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1 = n2 = 16
    size = n1 * n2
    x = (rng.standard_normal(size) + 1j * rng.standard_normal(size)).astype(
        np.complex64
    )
    plan = FourStepPlan(n1, n2, mesh, natural_order=True)
    fre, fim = plan.fft_planar(
        np.real(x).reshape(n1, n2).astype(np.float32),
        np.imag(x).reshape(n1, n2).astype(np.float32),
    )
    spec = np.asarray(fre) + 1j * np.asarray(fim)  # flat natural order
    bre, bim = plan.transform_planar(
        np.real(spec).reshape(n1, n2).astype(np.float32),
        np.imag(spec).reshape(n1, n2).astype(np.float32),
        Transform.IFFT,
    )
    back = np.asarray(bre) + 1j * np.asarray(bim)
    np.testing.assert_allclose(back, x, atol=2e-4 * max(1.0, np.max(np.abs(x))))


@pytest.mark.parametrize("n1,n2", [(32, 16), (16, 48)])
@pytest.mark.parametrize("mode", [Transform.FFT, Transform.IFFT])
def test_fft2d_vs_numpy(n1, n2, mode):
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    x = (
        rng.standard_normal((n1, n2)) + 1j * rng.standard_normal((n1, n2))
    ).astype(np.complex64)
    plan = Fft2dPlan(n1, n2, mesh)
    ore, oim = plan.transform_planar(
        np.real(x).astype(np.float32), np.imag(x).astype(np.float32), mode
    )
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = np.fft.fft2(x) if mode is Transform.FFT else np.fft.ifft2(x)
    assert got.shape == (n1, n2)
    assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.max(np.abs(want)))


def test_fft2d_transposed_output():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1, n2 = 16, 32
    x = (
        rng.standard_normal((n1, n2)) + 1j * rng.standard_normal((n1, n2))
    ).astype(np.complex64)
    plan = Fft2dPlan(n1, n2, mesh, transposed_output=True)
    ore, oim = plan.fft_planar(
        np.real(x).astype(np.float32), np.imag(x).astype(np.float32)
    )
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = np.fft.fft2(x).T
    assert got.shape == (n2, n1)
    assert np.max(np.abs(got - want)) < 1e-3 * np.max(np.abs(want))


def test_fft2d_roundtrip():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1 = n2 = 16
    re, im = _rand_planar((n1, n2), rng)
    plan = Fft2dPlan(n1, n2, mesh)
    fre, fim = plan.fft_planar(re, im)
    bre, bim = plan.ifft_planar(fre, fim)
    np.testing.assert_allclose(np.asarray(bre), re, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bim), im, atol=1e-4)


def test_divisibility_validation():
    mesh = _mesh()
    with pytest.raises(ValueError):
        FourStepPlan(9, 16, mesh)  # 9 not divisible by 8
    with pytest.raises(ValueError):
        Fft2dPlan(16, 9, mesh)
