"""Fused VPU Stockham kernel tests (interpret mode on CPU).

The all-stages-in-VMEM mixed radix-64/8/4/3/2 (+in-register radix-9) kernel
(ops/pallas/stockham_vpu.py), gated
against the oracle in both its native batch-minor layout and the batch-major
adapter. TPU behavior (compile at 64 MB VMEM, 1.2e-7 rel-L2, ~680 GFLOP/s at
n=4096) was verified on hardware during development.
"""

import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu import Transform
from fourier_tpu.plan.vpu import VpuFftPlan
from fourier_tpu.utils import oracle_transform

RNG_SEED = 0x8888


def _rand(shape, rng):
    return (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex64)


def test_radix_schedule():
    from fourier_tpu.ops.pallas.stockham_vpu import radix_schedule

    assert radix_schedule(64) == [8, 8]
    assert radix_schedule(128) == [8, 8, 2]
    assert radix_schedule(256) == [8, 8, 4]
    assert radix_schedule(512) == [64, 8]
    assert radix_schedule(1024) == [64, 8, 2]
    assert radix_schedule(4096) == [64, 64]
    assert radix_schedule(8192) == [64, 64, 2]
    assert radix_schedule(16384) == [64, 64, 4]
    # mixed 2^a * 3^b (8 | n): radix-3/9 stages come last
    assert radix_schedule(96) == [8, 4, 3]
    assert radix_schedule(192) == [8, 8, 3]
    assert radix_schedule(576) == [64, 9]
    assert radix_schedule(1152) == [64, 2, 9]
    assert radix_schedule(1728) == [64, 9, 3]
    assert radix_schedule(6144) == [64, 8, 4, 3]
    # pure 3^b: two-stage in-register 27/81 schedules (measured winners, r3)
    assert radix_schedule(243) == [27, 9]
    assert radix_schedule(729) == [81, 9]
    assert radix_schedule(2187) == [81, 27]
    assert radix_schedule(6561) == [81, 81]

    # pure 5^c: measured two-stage 125/25 winners; 125 itself deliberately
    # stays on the direct-matmul path (fused (25,5) measured 330 GF vs 699)
    assert radix_schedule(125) is None
    assert radix_schedule(625) == [125, 5]
    assert radix_schedule(3125) == [125, 25]
    # 5-smooth sizes with 8 | n: greedy-large radix-5 blocks after the
    # pow2/pow3 stages
    assert radix_schedule(320) == [8, 8, 5]
    assert radix_schedule(1000) == [8, 125]
    assert radix_schedule(960) == [64, 3, 5]
    assert radix_schedule(5000) == [8, 125, 5]
    assert radix_schedule(14400) == [64, 9, 25]
    # 2^a*3^b with fewer than three 2s (and non-tabled pure powers) stay off
    # the VPU kernel (first stage must be a pow2 radix >= 8, or a tabled 3^b)
    for n in (1, 8, 16, 32, 100, 4095, 32768, 81, 12, 48, 19683):
        assert radix_schedule(n) is None
    for n in (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 12288,
              72, 96, 192, 576, 1152, 1536, 1728, 3072, 4608, 6144,
              243, 729, 2187, 6561):
        sched = radix_schedule(n)
        assert int(np.prod(sched)) == n
        # leading pow2 stage keeps strides aligned; pure 3^b sizes use the
        # measured two-stage 27/81 table instead
        assert sched[0] in (8, 64) or (n % 2 == 1 and sched[0] in (27, 81))


@pytest.mark.parametrize(
    "n", [64, 128, 256, 512, 1024, 4096, 96, 576, 1728, 243, 729, 2187,
          625, 320, 1000]
)
def test_vpu_batch_minor_vs_oracle(n):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = VpuFftPlan.create(n)
    assert plan is not None
    b = 5
    x = _rand((b, n), rng)
    re_t = np.ascontiguousarray(x.real.T).astype(np.float32)
    im_t = np.ascontiguousarray(x.imag.T).astype(np.float32)
    for mode in (Transform.FFT, Transform.IFFT):
        ore, oim = plan.transform_planar_bm(re_t, im_t, mode)
        got = (np.asarray(ore) + 1j * np.asarray(oim)).T
        want = oracle_transform(x, mode)
        tol = 1e-4 * max(1.0, np.max(np.abs(want)))
        assert np.max(np.abs(got - want)) < tol, f"n={n} {mode.name}"


@pytest.mark.parametrize("mode", list(Transform))
def test_vpu_modes(mode):
    rng = np.random.default_rng(RNG_SEED)
    n = 512
    plan = VpuFftPlan.create(n)
    x = _rand((2, n), rng)
    ore, oim = plan.transform_planar(
        x.real.astype(np.float32), x.imag.astype(np.float32), mode
    )
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = oracle_transform(x, mode)
    assert np.max(np.abs(got - want)) < 1e-4 * max(1.0, np.max(np.abs(want)))


def test_vpu_batch_major_adapter():
    rng = np.random.default_rng(RNG_SEED)
    n = 64
    plan = VpuFftPlan.create(n)
    x = _rand((3, 4, n), rng)
    ore, oim = plan.transform_planar(
        x.real.astype(np.float32), x.imag.astype(np.float32), Transform.FFT
    )
    got = np.asarray(ore) + 1j * np.asarray(oim)
    assert got.shape == (3, 4, n)
    np.testing.assert_allclose(got, np.fft.fft(x, axis=-1), atol=1e-3)


def test_vpu_matches_mxu():
    rng = np.random.default_rng(RNG_SEED)
    n = 512
    vpu = VpuFftPlan.create(n)
    mxu = ft.create_fft(n, backend="mxu", cache=False)
    x = _rand((2, n), rng)
    re, im = x.real.astype(np.float32), x.imag.astype(np.float32)
    a = np.asarray(vpu.transform_planar(re, im, Transform.FFT)[0])
    b = np.asarray(mxu.transform_planar(re, im, Transform.FFT)[0])
    np.testing.assert_allclose(a, b, atol=2e-4 * max(1.0, np.max(np.abs(b))))


def test_vpu_batch_padding():
    rng = np.random.default_rng(RNG_SEED)
    n = 64
    plan = VpuFftPlan.create(n)
    x = _rand((7, n), rng)  # 7 not a multiple of cb
    re_t = np.ascontiguousarray(x.real.T).astype(np.float32)
    im_t = np.ascontiguousarray(x.imag.T).astype(np.float32)
    ore, oim = plan.transform_planar_bm(re_t, im_t)
    got = (np.asarray(ore) + 1j * np.asarray(oim)).T
    assert got.shape == (7, n)
    np.testing.assert_allclose(got, np.fft.fft(x, axis=-1), atol=1e-3)


def test_planner_vpu_backend():
    plan = ft.create_fft(512, backend="vpu", cache=False)
    assert isinstance(plan, VpuFftPlan)
    # non-8^k sizes fall back to the mxu family
    plan2 = ft.create_fft(100, backend="vpu", cache=False)
    assert not isinstance(plan2, VpuFftPlan)


def test_vpu_unsupported_sizes():
    assert VpuFftPlan.create(100) is None
    assert VpuFftPlan.create(32) is None
    assert VpuFftPlan.create(32768) is None
    assert VpuFftPlan.create(64, np.complex128) is None


def test_bluestein_batch_minor_path():
    """Bluestein's transform_planar_bm is transpose-free with a bm-native
    (fused VPU) inner and falls back correctly for batch-major-only inners."""
    from fourier_tpu.plan.autosort import AutosortPlan
    from fourier_tpu.plan.bluestein import BluesteinPlan

    rng = np.random.default_rng(RNG_SEED)
    vpu_factory = lambda m, dt: VpuFftPlan.create(m, dt) or AutosortPlan.create(m, dt)
    for n, factory in ((73, vpu_factory), (100, None)):
        plan = BluesteinPlan.create(n, np.complex64, inner_factory=factory)
        x = rng.standard_normal((n, 5)) + 1j * rng.standard_normal((n, 5))
        for mode in (Transform.FFT, Transform.IFFT, Transform.SQRT_SCALED_FFT):
            ore, oim = plan.transform_planar_bm(
                x.real.astype(np.float32), x.imag.astype(np.float32), mode
            )
            got = np.asarray(ore) + 1j * np.asarray(oim)
            want = oracle_transform(x.T, mode).T
            tol = 3e-6 * max(1.0, float(np.max(np.abs(want))))
            assert np.max(np.abs(got - want)) < tol, (n, mode)


def test_fused_bluestein_vs_oracle():
    """One-kernel Bluestein plan: all 5 modes vs oracle, bm + batch-major."""
    from fourier_tpu.plan.bluestein_fused import VpuBluesteinPlan

    rng = np.random.default_rng(RNG_SEED)
    for n in (73, 100):
        plan = VpuBluesteinPlan.create(n)
        assert plan is not None and plan.m_inner >= 2 * n - 1
        x = rng.standard_normal((n, 5)) + 1j * rng.standard_normal((n, 5))
        re_t = x.real.astype(np.float32)
        im_t = x.imag.astype(np.float32)
        for mode in list(Transform):
            ore, oim = plan.transform_planar_bm(re_t, im_t, mode)
            got = np.asarray(ore) + 1j * np.asarray(oim)
            want = oracle_transform(x.T, mode).T
            tol = 3e-6 * max(1.0, float(np.max(np.abs(want))))
            assert np.max(np.abs(got - want)) < tol, (n, mode)
        # batch-major adapter
        ore, oim = plan._apply(
            np.ascontiguousarray(x.T.real).astype(np.float32),
            np.ascontiguousarray(x.T.imag).astype(np.float32),
            Transform.FFT,
        )
        got = (np.asarray(ore) + 1j * np.asarray(oim)).T
        np.testing.assert_allclose(got, np.fft.fft(x, axis=0), atol=1e-3)


def test_fused_bluestein_planner_selection_and_serialize(tmp_path):
    from fourier_tpu.plan.bluestein_fused import VpuBluesteinPlan
    from fourier_tpu.plan.serialize import load_plan, save_plan

    # primes above the direct-matmul crossover select the one-kernel plan
    plan = ft.create_fft(1013, backend="vpu", cache=False)
    assert isinstance(plan, VpuBluesteinPlan) and plan.m_inner == 2048
    # under the crossover: direct matmul wins (measured)
    from fourier_tpu.plan.mxu import MxuFftPlan

    plan2 = ft.create_fft(439, backend="vpu", cache=False)
    assert isinstance(plan2, MxuFftPlan) and plan2.single_phase
    # serialize roundtrip (small size so interpret execution is fast)
    small = VpuBluesteinPlan.create(73)
    path = str(tmp_path / "fb.npz")
    save_plan(small, path)
    loaded = load_plan(path)
    assert type(loaded) is VpuBluesteinPlan and loaded.size == 73
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((73, 3)) + 1j * rng.standard_normal((73, 3))
    a = loaded.transform_planar_bm(
        x.real.astype(np.float32), x.imag.astype(np.float32)
    )
    b = small.transform_planar_bm(
        x.real.astype(np.float32), x.imag.astype(np.float32)
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
