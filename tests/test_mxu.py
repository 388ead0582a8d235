"""MXU (Bailey decomposition) plan family tests.

Differential strategy mirroring the reference's oracle approach
(``fourier/tests/integrity.rs``): both implementations of the MXU path — the
XLA einsum form (production default) and the fused Pallas kernels (interpret
mode on CPU) — are gated against the naive-DFT oracle and against the
Stockham reference path.
"""

import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu import Transform
from fourier_tpu.ops.dft_matrix import choose_split
from fourier_tpu.plan import BluesteinPlan, MxuFftPlan
from fourier_tpu.utils import oracle_transform

RNG_SEED = 0xBA11E7

# Covers: single-phase (<=128), two-phase pow2, pow3, pow5 (non-2^a3^b!),
# composite, and the flagship 4096.
SIZES = [1, 4, 16, 100, 128, 243, 256, 1000, 3125, 4096]


def _rand(n, rng, scale=1.0):
    return ((rng.standard_normal(n) + 1j * rng.standard_normal(n)) * scale).astype(
        np.complex64
    )


def _run(plan, x, mode):
    re, im = np.real(x).astype(np.float32), np.imag(x).astype(np.float32)
    ore, oim = plan.transform_planar(re, im, mode)
    return np.asarray(ore) + 1j * np.asarray(oim)


def test_choose_split():
    # Balanced split (minimal n1+n2), ties -> larger n2.
    assert choose_split(64) == (1, 64)
    assert choose_split(128) == (1, 128)
    assert choose_split(4096) == (64, 64)
    assert choose_split(256) == (16, 16)
    assert choose_split(243) == (9, 27)
    assert choose_split(3125) == (25, 125)
    assert choose_split(1000) == (25, 40)
    assert choose_split(16384) == (128, 128)
    assert choose_split(16381) is None  # prime > 128
    assert choose_split(128 * 128 * 2) is None  # > 16384
    for n in (4096, 256, 1000, 243):
        n1, n2 = choose_split(n)
        assert n1 * n2 == n and n1 <= 128 and n2 <= 128


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_mxu_vs_oracle(n, impl):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = MxuFftPlan.create(n, impl=impl)
    assert plan is not None
    x = _rand(n, rng)
    got = _run(plan, x, Transform.FFT)
    want = oracle_transform(x, Transform.FFT)
    assert np.max(np.abs(got - want)) < 1e-4 * max(1.0, np.max(np.abs(want)))
    xi = _rand(n, rng, scale=n)
    goti = _run(plan, xi, Transform.IFFT)
    wanti = oracle_transform(xi, Transform.IFFT)
    assert np.max(np.abs(goti - wanti)) < 1e-4 * max(1.0, np.max(np.abs(wanti)))


@pytest.mark.parametrize("mode", list(Transform))
def test_mxu_modes(mode):
    rng = np.random.default_rng(RNG_SEED)
    n = 384  # two-phase (3, 128)
    plan = MxuFftPlan.create(n)
    x = _rand(n, rng)
    got = _run(plan, x, mode)
    want = oracle_transform(x, mode)
    assert np.max(np.abs(got - want)) < 1e-4 * max(1.0, np.max(np.abs(want)))


def test_mxu_matches_stockham():
    rng = np.random.default_rng(RNG_SEED)
    n = 768
    mxu = MxuFftPlan.create(n)
    stk = ft.create_fft(n, backend="stockham")
    x = _rand(n, rng)
    np.testing.assert_allclose(
        _run(mxu, x, Transform.FFT), _run(stk, x, Transform.FFT), atol=2e-4
    )


def test_mxu_batch():
    rng = np.random.default_rng(RNG_SEED)
    n = 256
    plan = MxuFftPlan.create(n)
    xb = (rng.standard_normal((3, 5, n)) + 1j * rng.standard_normal((3, 5, n))).astype(
        np.complex64
    )
    re, im = np.real(xb).astype(np.float32), np.imag(xb).astype(np.float32)
    ore, oim = plan.transform_planar(re, im, Transform.FFT)
    got = np.asarray(ore) + 1j * np.asarray(oim)
    assert got.shape == (3, 5, n)
    want = np.fft.fft(xb, axis=-1)
    assert np.max(np.abs(got - want)) < 1e-3


def test_mxu_odd_batch_padding():
    # Batch not divisible by the tile: exercised padding path (pallas impl).
    rng = np.random.default_rng(RNG_SEED)
    n = 256
    plan = MxuFftPlan.create(n, impl="pallas", tb=4)
    xb = (rng.standard_normal((7, n)) + 1j * rng.standard_normal((7, n))).astype(
        np.complex64
    )
    re, im = np.real(xb).astype(np.float32), np.imag(xb).astype(np.float32)
    ore, oim = plan.transform_planar(re, im, Transform.FFT)
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = np.fft.fft(xb, axis=-1)
    assert np.max(np.abs(got - want)) < 1e-3


def test_bluestein_with_mxu_inner():
    rng = np.random.default_rng(RNG_SEED)
    n = 10007  # prime; inner 32768 > 16384 -> planner handles fallback,
    # but direct mxu-backed inner for a smaller prime:
    n = 1013
    plan = ft.create_fft(n, backend="mxu", cache=False)
    assert isinstance(plan, BluesteinPlan)
    assert isinstance(plan.inner, MxuFftPlan)
    x = _rand(n, rng)
    got = _run(plan, x, Transform.FFT)
    want = oracle_transform(x, Transform.FFT)
    assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.max(np.abs(want)))


def test_mxu_roundtrip():
    rng = np.random.default_rng(RNG_SEED)
    n = 4096
    plan = MxuFftPlan.create(n)
    x = _rand(n, rng)
    fwd = _run(plan, x, Transform.FFT)
    back = _run(plan, fwd, Transform.IFFT)
    assert np.max(np.abs(back - x)) < 1e-4 * max(1.0, np.max(np.abs(x)))


def test_c128_returns_none():
    assert MxuFftPlan.create(64, np.complex128) is None


# ---------------------------------------------------------------------------
# Large sizes: four-step single-chip composition
# ---------------------------------------------------------------------------


def test_four_step_local_large():
    from fourier_tpu.plan.four_step_local import FourStepLocalPlan

    rng = np.random.default_rng(RNG_SEED)
    for n in (32768, 65536, 20000):
        plan = ft.create_fft(n, backend="mxu", cache=False)
        assert isinstance(plan, FourStepLocalPlan), repr(plan)
        x = _rand(n, rng)
        got = _run(plan, x, Transform.FFT)
        want = np.fft.fft(x)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 2e-6, f"n={n} rel-L2={rel:.2e}"
        back = _run(plan, got, Transform.IFFT)
        assert np.max(np.abs(back - x)) < 1e-3


def test_four_step_local_modes_and_batch():
    rng = np.random.default_rng(RNG_SEED)
    n = 32768
    plan = ft.create_fft(n, backend="mxu")
    xb = _rand(2 * n, rng).reshape(2, n)
    re, im = np.real(xb).astype(np.float32), np.imag(xb).astype(np.float32)
    ore, oim = plan.transform_planar(re, im, Transform.SQRT_SCALED_FFT)
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = np.fft.fft(xb, axis=-1) / np.sqrt(n)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 2e-6


def test_large_prime_bluestein_inner_composite():
    # Large prime: Bluestein with a four-step/mxu inner power-of-two plan.
    from fourier_tpu.plan.four_step_local import choose_large_split

    assert choose_large_split(32768) == (128, 256)
    rng = np.random.default_rng(RNG_SEED)
    n = 10007
    plan = ft.create_fft(n, backend="mxu", cache=False)
    assert isinstance(plan, BluesteinPlan)
    x = _rand(n, rng)
    got = _run(plan, x, Transform.FFT)
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 2e-6


def test_direct_single_phase_policy():
    """Measured round-3 policy: small-factor composites and sub-crossover
    primes run one full-size DFT matmul instead of tiny-K two-phase einsums
    or Bluestein (MxuFftPlan.DIRECT_SINGLE_MAX rationale)."""
    from fourier_tpu.plan.mxu import MxuFftPlan

    # small-factor composites -> direct single phase (512's balanced split
    # is (16,32) — also tiny-K, so it flips to direct as well)
    for n in (222, 512, 625, 722):
        plan = MxuFftPlan.create(n)
        assert plan.single_phase, n
    # a >=64 factor keeps the two-phase split (K=64 contractions run near peak)
    for n in (2048, 4096):
        plan = MxuFftPlan.create(n)
        assert not plan.single_phase, n
    # primes <= crossover: planner prefers direct over Bluestein
    for n in (191, 439):
        plan = ft.create_fft(n, backend="mxu", cache=False)
        assert isinstance(plan, MxuFftPlan) and plan.single_phase, n
    # past the crossover: Bluestein again
    plan = ft.create_fft(1013, backend="mxu", cache=False)
    assert isinstance(plan, BluesteinPlan)
    # correctness of a direct prime plan
    rng = np.random.default_rng(RNG_SEED)
    x = _rand(439, rng)
    got = _run(ft.create_fft(439, backend="mxu", cache=False), x, Transform.FFT)
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 2e-6


def test_four_step_local_batch_minor():
    """transform_planar_bm: contiguous col reshape + one transpose matches
    the batch-major path and the numpy oracle for every mode."""
    import jax.numpy as jnp

    from fourier_tpu.plan.four_step_local import FourStepLocalPlan
    from fourier_tpu.plan.vpu import VpuFftPlan

    n, p, q = 12288, 96, 128
    plan = FourStepLocalPlan.create(
        n, np.complex64, p, q,
        lambda m, dt: VpuFftPlan.create(m, dt, interpret=True),
    )
    rng = np.random.default_rng(3)
    x = (
        rng.standard_normal((n, 4)) + 1j * rng.standard_normal((n, 4))
    ).astype(np.complex64)
    for mode, ref in (
        (Transform.FFT, np.fft.fft(x, axis=0)),
        (Transform.IFFT, np.fft.ifft(x, axis=0)),
        (Transform.SQRT_SCALED_FFT, np.fft.fft(x, axis=0) / np.sqrt(n)),
    ):
        ore, oim = plan.transform_planar_bm(
            jnp.asarray(x.real), jnp.asarray(x.imag), mode
        )
        got = np.asarray(ore) + 1j * np.asarray(oim)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 5e-6, (mode, rel)
