"""Fused-VPU dd (c128) kernel + plan tests (interpret mode on CPU).

The dd twin of test_vpu.py: the all-stages-in-VMEM Pallas kernel over four
f32 planes must meet the c128 gate (<=1e-12 rel-L2, BASELINE.md) against the
f64 oracle, compose as a Bluestein inner plan, respect the batch-minor/
batch-major adapters, and round-trip through plan serialization. On-chip
(Mosaic, barrier-free EFTs) accuracy is verified separately on real TPU.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fourier_tpu import Transform
from fourier_tpu.ops.pallas import stockham_vpu_dd as kern
from fourier_tpu.precision import DdFftPlan, VpuDdFftPlan
from fourier_tpu.precision import ddreal as dd
from fourier_tpu.utils import oracle_transform

RNG_SEED = 0xDDF
GATE = 1e-12  # BASELINE.md c128 gate (rel-L2)


def _rand(shape, rng):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def _to_planes(x):
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    return tuple(jnp.asarray(p) for p in (rh, rl, ih, il))


def _from_planes(rh, rl, ih, il):
    f64 = lambda p: np.asarray(p, np.float64)
    return (f64(rh) + f64(rl)) + 1j * (f64(ih) + f64(il))


# ---------------------------------------------------------------------------
# Schedule
# ---------------------------------------------------------------------------


def test_schedule_products():
    for n in (64, 96, 128, 192, 384, 512, 1152, 1536, 3072, 4096):
        sched = kern.radix_schedule_dd(n)
        assert sched is not None, n
        assert int(np.prod(sched)) == n
        assert sched[0] == 8  # tile-aligned first stage
        assert all(r in (2, 3, 4, 8) for r in sched)


def test_schedule_pow5():
    # measured winners (round 3): 625 two-stage radix-25; mixed 5-smooth
    # sizes take 25/5 stages after the aligned pow2/pow3 ones; 125 stays on
    # the fused dd Bluestein (measured slower fused)
    assert list(kern.radix_schedule_dd(625)) == [25, 25]
    assert kern.radix_schedule_dd(125) is None
    assert kern.radix_schedule_dd(3125) is None
    assert list(kern.radix_schedule_dd(1000)) == [8, 25, 5]
    assert list(kern.radix_schedule_dd(320)) == [8, 8, 5]
    assert list(kern.radix_schedule_dd(960)) == [8, 8, 3, 5]


@pytest.mark.parametrize("n", [32, 48, 81, 2187, 100, 6144, 8192, 16384, 12])
def test_schedule_rejects(n):
    # <64, >4096 (VMEM: see radix_schedule_dd), pow2 part < 8 (except the
    # measured pow3 wins 243/729), not 2^a*3^b; 2187's three-stage schedule
    # measured slower than XLA dd and stays rejected.
    assert kern.radix_schedule_dd(n) is None


def test_schedule_pow3():
    # Measured two-stage in-register schedules (round 3): one interleave pass.
    assert list(kern.radix_schedule_dd(243)) == [27, 9]
    assert list(kern.radix_schedule_dd(729)) == [27, 27]


# ---------------------------------------------------------------------------
# Accuracy vs the f64 oracle (interpret mode)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [64, 96, 128, 243, 384, 512, 729, 1536,
                               320, 625])
@pytest.mark.parametrize("mode", [Transform.FFT, Transform.IFFT])
def test_vpu_dd_vs_oracle(n, mode):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = VpuDdFftPlan.create(n)
    assert plan is not None and plan.interpret
    x = _rand((2, n), rng)
    outs = plan.transform_planar_dd(*_to_planes(x), mode)
    got = _from_planes(*outs)
    want = oracle_transform(x, mode)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < GATE, f"n={n} mode={mode.name} rel-L2={rel:.2e}"


@pytest.mark.parametrize("mode", list(Transform))
def test_vpu_dd_modes(mode):
    rng = np.random.default_rng(RNG_SEED)
    n = 192
    plan = VpuDdFftPlan.create(n)
    x = _rand(n, rng)
    got = _from_planes(*plan.transform_planar_dd(*_to_planes(x), mode))
    want = oracle_transform(x, mode)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < GATE


def test_vpu_dd_batch_major_leading_dims():
    rng = np.random.default_rng(RNG_SEED)
    n = 128
    plan = VpuDdFftPlan.create(n)
    x = _rand((2, 3, n), rng)
    got = _from_planes(*plan.transform_planar_dd(*_to_planes(x)))
    want = np.fft.fft(x)
    assert got.shape == x.shape
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < GATE


def test_vpu_dd_batch_minor_padding():
    """Native (n, B) path with B not a multiple of cb (pad + slice)."""
    rng = np.random.default_rng(RNG_SEED)
    n = 64
    plan = VpuDdFftPlan.create(n)
    assert plan.cb == 128
    b = 37
    x = _rand((b, n), rng)
    planes_bm = tuple(p.T for p in _to_planes(x))
    outs = plan.transform_planar_dd_bm(*planes_bm)
    assert outs[0].shape == (n, b)
    got = _from_planes(*(o.T for o in outs))
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < GATE


def test_vpu_dd_eager_numpy_fallback():
    """numpy inputs route through the exact-IEEE eager dd path."""
    rng = np.random.default_rng(RNG_SEED)
    n = 96
    plan = VpuDdFftPlan.create(n)
    x = _rand(n, rng)
    got = plan.fft(x)
    want = np.fft.fft(x)
    assert isinstance(got, np.ndarray)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < GATE


def test_vpu_dd_roundtrip():
    rng = np.random.default_rng(RNG_SEED)
    n = 768
    plan = VpuDdFftPlan.create(n)
    x = _rand((3, n), rng)
    mid = plan.transform_planar_dd(*_to_planes(x), Transform.FFT)
    back = _from_planes(*plan.transform_planar_dd(*mid, Transform.IFFT))
    assert np.max(np.abs(back - x)) < 1e-12


# ---------------------------------------------------------------------------
# Composition: Bluestein inner, planner, serialization
# ---------------------------------------------------------------------------


def test_bluestein_with_vpu_dd_inner():
    """DdFftPlan(prime) with the fused kernel as its power-of-two inner."""
    rng = np.random.default_rng(RNG_SEED)
    n = 101  # inner m = next_pow2(201) = 256, vpu-dd supported
    plan = DdFftPlan(
        n, inner_factory=lambda m: VpuDdFftPlan.create(m) or DdFftPlan(m)
    )
    assert isinstance(plan.inner, VpuDdFftPlan)
    x = _rand(n, rng)
    got = _from_planes(*plan.transform_planar_dd(*_to_planes(x)))
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < GATE


def test_planner_dd_tpu_resolution(monkeypatch):
    """On a TPU backend, auto-dd resolves to the fused kernel (or a
    Bluestein composition whose inner is the fused kernel)."""
    import jax

    from fourier_tpu.plan import planner

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    plan = planner._create_dd(512)
    assert isinstance(plan, VpuDdFftPlan)
    # not 8|2^a*3^b: small enough for the one-kernel fused dd Bluestein
    # (inner m=256 <= MAX_INNER); larger off-family sizes compose a
    # DdFftPlan Bluestein around a fused inner.
    from fourier_tpu.precision.dd_bluestein import VpuDdBluesteinPlan

    comp = planner._create_dd(100)
    assert isinstance(comp, VpuDdBluesteinPlan)
    big = planner._create_dd(1418)  # inner m=4096: above the fused
    assert isinstance(big, DdFftPlan)  # Bluestein ceiling -> composed plan


def test_planner_dd_cpu_resolution():
    from fourier_tpu.plan import planner

    plan = planner._create_dd(512)
    assert isinstance(plan, DdFftPlan)


def test_vpu_dd_serialize_roundtrip(tmp_path):
    from fourier_tpu.plan.serialize import load_plan, save_plan

    rng = np.random.default_rng(RNG_SEED)
    n = 384
    plan = VpuDdFftPlan.create(n)
    path = os.path.join(tmp_path, "vpu_dd.npz")
    save_plan(plan, path)
    loaded = load_plan(path)
    assert isinstance(loaded, VpuDdFftPlan)
    assert (loaded.size, loaded.cb, loaded.interpret) == (
        plan.size, plan.cb, plan.interpret
    )
    x = _rand(n, rng)
    a = _from_planes(*plan.transform_planar_dd(*_to_planes(x)))
    b = _from_planes(*loaded.transform_planar_dd(*_to_planes(x)))
    np.testing.assert_array_equal(a, b)
