"""Oracle-free FFT invariants, property-style.

Checks mathematical identities the naive-DFT oracle can't get wrong by
construction: linearity, the circular shift theorem, impulse/constant
spectra, conjugate symmetry for real inputs, Parseval for the unitary pair,
and cross-backend agreement. Run across all three execution backends.
"""

import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu import Transform

RNG_SEED = 0x1F1F

BACKENDS = ["stockham", "mxu"]
SIZES = [16, 48, 73, 100, 128]


def _plan(n, backend):
    return ft.create_fft(n, np.complex64, backend=backend, cache=False)


def _rand(n, rng):
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("n", SIZES)
def test_linearity(backend, n):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = _plan(n, backend)
    x, y = _rand(n, rng), _rand(n, rng)
    a, b = 1.7 - 0.3j, -0.8 + 2.1j
    lhs = np.asarray(plan.fft(a * x + b * y))
    rhs = a * np.asarray(plan.fft(x)) + b * np.asarray(plan.fft(y))
    np.testing.assert_allclose(lhs, rhs, atol=2e-4 * max(1, np.max(np.abs(rhs))))


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("n", SIZES)
def test_shift_theorem(backend, n):
    """FFT(roll(x, s))[k] == FFT(x)[k] * exp(-2*pi*i*s*k/n)."""
    rng = np.random.default_rng(RNG_SEED + n)
    plan = _plan(n, backend)
    x = _rand(n, rng)
    s = 3 % n
    lhs = np.asarray(plan.fft(np.roll(x, s)))
    k = np.arange(n)
    rhs = np.asarray(plan.fft(x)) * np.exp(-2j * np.pi * s * k / n).astype(
        np.complex64
    )
    np.testing.assert_allclose(lhs, rhs, atol=3e-4 * max(1, np.max(np.abs(rhs))))


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("n", SIZES)
def test_impulse_and_dc(backend, n):
    plan = _plan(n, backend)
    impulse = np.zeros(n, np.complex64)
    impulse[0] = 1.0
    np.testing.assert_allclose(
        np.asarray(plan.fft(impulse)), np.ones(n), atol=1e-5
    )
    const = np.ones(n, np.complex64)
    want = np.zeros(n, np.complex64)
    want[0] = n
    np.testing.assert_allclose(np.asarray(plan.fft(const)), want, atol=1e-3)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("n", SIZES)
def test_conjugate_symmetry_real_input(backend, n):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = _plan(n, backend)
    x = rng.standard_normal(n).astype(np.float32).astype(np.complex64)
    y = np.asarray(plan.fft(x))
    # X[n-k] == conj(X[k]) for real input
    np.testing.assert_allclose(
        y[1:], np.conj(y[1:][::-1]), atol=2e-4 * max(1, np.max(np.abs(y)))
    )


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("n", SIZES)
def test_parseval_unitary(backend, n):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = _plan(n, backend)
    x = _rand(n, rng)
    y = np.asarray(plan.transform(x, Transform.SQRT_SCALED_FFT))
    assert abs(np.linalg.norm(y) - np.linalg.norm(x)) < 1e-4 * np.linalg.norm(x)


@pytest.mark.parametrize("n", SIZES)
def test_backends_agree(n):
    rng = np.random.default_rng(RNG_SEED + n)
    x = _rand(n, rng)
    outs = [np.asarray(_plan(n, b).fft(x)) for b in BACKENDS]
    np.testing.assert_allclose(
        outs[0], outs[1], atol=2e-4 * max(1, np.max(np.abs(outs[0])))
    )


def test_nd_c128_both_representations():
    """c128 N-D works through both the native-f64 and 4-plane dd paths."""
    import jax

    from fourier_tpu.ndim import NdFftPlan

    if jax.config.jax_enable_x64:
        # On x64 hosts c128 resolves to stockham (2-plane native f64).
        plan = NdFftPlan((8, 8), np.complex128)
        assert plan.size == 64 and not plan.is_dd
    plan_dd = NdFftPlan((8, 8), np.complex128, backend="dd")
    assert plan_dd.is_dd
    x = np.eye(8, dtype=np.complex128)
    got = plan_dd.fft(x)
    np.testing.assert_allclose(got, np.fft.fft2(x), atol=1e-12)
