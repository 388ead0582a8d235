"""End-to-end integrity tests against the naive-DFT oracle.

Replicates the reference's test strategy (``fourier/tests/integrity.rs``):
  * the oracle itself is validated (against numpy.fft) so it can't rot
    (``integrity.rs:42-87``),
  * an exhaustive size sweep 1..256 per dtype per direction with seeded
    Gaussian inputs (``integrity.rs:145-192``) — covering autosort sizes,
    Bluestein sizes, and the size-1 edge case in one loop,
  * per-component absolute tolerances: f32 1e-4, f64 1e-11
    (``integrity.rs:92,120``),
  * all five normalization modes, roundtrips, and batch semantics (net-new).

The sweep runs the eager (`_apply`) path to keep compile counts sane; jit parity
is covered for representative sizes of each plan family.
"""

import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu import Transform
from fourier_tpu.plan import AutosortPlan, BluesteinPlan
from fourier_tpu.utils import naive_dft, oracle_transform

RNG_SEED = 0xDEADBEEF

# Per-component absolute tolerances, mirroring integrity.rs:92,120. The f64
# tolerance is relaxed by ~one digit for Bluestein sizes: the reference compares
# its own f64 inner FFT against a f64 naive DFT, while our plan-time chirp FFT
# runs in f64 numpy — error budgets differ slightly but stay ~1e-11.
F32_TOL = 1e-4
F64_TOL = 1e-10


def _rand(shape, rng, scale=1.0):
    return (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ) * scale


def _check(plan, x, mode, tol, jit=False):
    """Run plan on x (complex128 host array) and compare vs naive oracle."""
    xin = x.astype(plan.dtype)
    if jit:
        got = plan.transform(xin, mode)
    else:
        re, im = np.real(xin), np.imag(xin)
        ore, oim = plan._apply(
            np.asarray(re, dtype=plan.real_dtype),
            np.asarray(im, dtype=plan.real_dtype),
            mode,
        )
        got = np.asarray(ore) + 1j * np.asarray(oim)
    want = oracle_transform(xin, mode)
    err = np.max(np.abs(np.asarray(got) - want))
    assert err < tol, f"size={plan.size} mode={mode.name} max-abs-err={err:.3e}"


# ---------------------------------------------------------------------------
# Oracle self-check (integrity.rs:42-87)
# ---------------------------------------------------------------------------


def test_oracle_matches_numpy_fft():
    rng = np.random.default_rng(RNG_SEED)
    for n in (1, 2, 7, 10, 16, 73, 100):
        x = _rand(n, rng)
        np.testing.assert_allclose(naive_dft(x, True), np.fft.fft(x), atol=1e-9)
        np.testing.assert_allclose(
            naive_dft(x, False) / n, np.fft.ifft(x), atol=1e-9
        )


def test_oracle_modes():
    rng = np.random.default_rng(RNG_SEED)
    x = _rand(16, rng)
    np.testing.assert_allclose(
        oracle_transform(x, Transform.IFFT) * 16,
        oracle_transform(x, Transform.UNSCALED_IFFT),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        oracle_transform(x, Transform.SQRT_SCALED_FFT) * 4,
        oracle_transform(x, Transform.FFT),
        atol=1e-9,
    )


# ---------------------------------------------------------------------------
# Exhaustive size sweep (integrity.rs:145-192)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype,tol", [(np.complex64, F32_TOL), (np.complex128, F64_TOL)])
def test_sweep_all_sizes_forward_inverse(dtype, tol):
    rng = np.random.default_rng(RNG_SEED)
    for n in range(1, 256):
        plan = ft.create_fft(n, dtype)
        # Forward: unit-scale input.
        _check(plan, _rand(n, rng), Transform.FFT, tol)
        # Inverse: input scaled by n so the 1/n-normalized output is unit-scale
        # (mirrors integrity.rs:153-157).
        _check(plan, _rand(n, rng, scale=n), Transform.IFFT, tol * n)


def test_plan_family_selection():
    # 2^a*3^b -> autosort; others -> Bluestein (fourier/src/lib.rs:31-60).
    for n in (1, 2, 4, 96, 128, 243, 192):
        assert isinstance(ft.create_fft_f32(n), AutosortPlan)
    for n in (5, 7, 73, 100, 125, 222, 722, 1013, 1418):
        assert isinstance(ft.create_fft_f32(n), BluesteinPlan)


# ---------------------------------------------------------------------------
# Five normalization modes (fft.rs:5-16 semantics)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [16, 24, 73, 100])
@pytest.mark.parametrize("mode", list(Transform))
def test_all_modes_vs_oracle(n, mode):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = ft.create_fft(n, np.complex128)
    _check(plan, _rand(n, rng), mode, F64_TOL * max(1, n))


@pytest.mark.parametrize("n", [16, 27, 73])
def test_roundtrips(n):
    rng = np.random.default_rng(RNG_SEED)
    x = _rand(n, rng).astype(np.complex128)
    plan = ft.create_fft(n, np.complex128)
    # fft -> ifft is identity
    np.testing.assert_allclose(plan.ifft(plan.fft(x)), x, atol=1e-10)
    # sqrt-scaled pair is unitary both ways
    y = plan.transform(x, Transform.SQRT_SCALED_FFT)
    np.testing.assert_allclose(
        plan.transform(y, Transform.SQRT_SCALED_IFFT), x, atol=1e-10
    )
    # unscaled ifft = n * ifft
    np.testing.assert_allclose(
        plan.transform(x, Transform.UNSCALED_IFFT),
        np.asarray(plan.ifft(x)) * n,
        atol=1e-9,
    )
    # Parseval for the unitary pair
    assert abs(np.linalg.norm(y) - np.linalg.norm(x)) < 1e-10


# ---------------------------------------------------------------------------
# jit path parity (plan.transform goes through jax.jit)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 4, 64, 73, 100, 243])
@pytest.mark.parametrize("dtype,tol", [(np.complex64, F32_TOL), (np.complex128, F64_TOL)])
def test_jit_parity(n, dtype, tol):
    rng = np.random.default_rng(RNG_SEED)
    plan = ft.create_fft(n, dtype)
    _check(plan, _rand(n, rng), Transform.FFT, tol, jit=True)
    _check(plan, _rand(n, rng, scale=n), Transform.IFFT, tol * n, jit=True)


# ---------------------------------------------------------------------------
# Batch semantics (net-new TPU capability: leading axes are batch)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [32, 73])
def test_batched_matches_loop(n):
    rng = np.random.default_rng(RNG_SEED)
    plan = ft.create_fft(n, np.complex64)
    xb = _rand((5, n), rng).astype(np.complex64)
    got = np.asarray(plan.fft(xb))
    for b in range(xb.shape[0]):
        # Batched and single-shape traces compile to different XLA fusions;
        # agreement is within the f32 gate, not bitwise.
        np.testing.assert_allclose(
            got[b], np.asarray(plan.fft(xb[b])), atol=F32_TOL
        )


def test_multidim_batch():
    rng = np.random.default_rng(RNG_SEED)
    plan = ft.create_fft(16, np.complex64)
    xb = _rand((2, 3, 16), rng).astype(np.complex64)
    got = np.asarray(plan.fft(xb))
    assert got.shape == (2, 3, 16)
    want = np.fft.fft(xb, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# Planar API (the TPU-native path)
# ---------------------------------------------------------------------------


def test_planar_matches_complex():
    rng = np.random.default_rng(RNG_SEED)
    x = _rand(48, rng).astype(np.complex64)
    plan = ft.create_fft_f32(48)
    ore, oim = plan.fft_planar(np.real(x), np.imag(x))
    got = np.asarray(ore) + 1j * np.asarray(oim)
    # fft_planar runs the jit/XLA path, fft(numpy) the eager-numpy host
    # path: same algorithm, different fusion/reassociation, so parity is
    # a-few-ULP-at-c64, not bitwise.
    np.testing.assert_allclose(got, np.asarray(plan.fft(x)), atol=5e-6)


def test_module_level_convenience():
    rng = np.random.default_rng(RNG_SEED)
    x = _rand(24, rng).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(ft.fft(x)), np.fft.fft(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ft.ifft(x)), np.fft.ifft(x), atol=1e-4)


def test_input_validation():
    plan = ft.create_fft_f32(8)
    with pytest.raises(ValueError):
        plan.fft(np.zeros(9, np.complex64))
    with pytest.raises(ValueError):
        plan.fft_planar(np.zeros(8, np.float32), np.zeros(7, np.float32))
    with pytest.raises(ValueError):
        ft.create_fft(0)
    with pytest.raises(ValueError):
        ft.create_fft(8, np.float32)
