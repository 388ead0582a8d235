"""VpuDdBluesteinPlan: one-kernel fused dd Bluestein (c128 split-less sizes).

Accuracy is validated in Pallas interpret mode at small inner sizes (the
kernel pipeline is size-uniform: chirp -> pad -> fwd stages -> w -> inv
stages -> chirp); the large-inner configurations are exercised on the real
chip by the bench suite. Reference parity: the Bluestein algorithm semantics
(``bluesteins.rs:18-61``); the single-kernel fusion is this framework's own
TPU design (docs/DESIGN.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fourier_tpu import Transform
from fourier_tpu.precision import ddreal as dd
from fourier_tpu.precision.dd_bluestein import VpuDdBluesteinPlan

GATE = 1e-12
RNG_SEED = 0xDDB1


def _to_planes(x):
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    return tuple(jnp.asarray(p) for p in (rh, rl, ih, il))


def _join(planes):
    rh, rl, ih, il = (np.asarray(p, np.float64) for p in planes)
    return (rh + rl) + 1j * (ih + il)


@pytest.mark.parametrize("n", [17, 29])
@pytest.mark.parametrize("mode", [Transform.FFT, Transform.SQRT_SCALED_IFFT])
def test_fused_dd_bluestein_vs_oracle(n, mode):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = VpuDdBluesteinPlan.create(n, interpret=True)
    assert plan is not None and plan.m_inner == 64
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    got = _join(plan.transform_planar_dd(*_to_planes(x), mode))
    if mode.is_forward:
        want = np.fft.fft(x)
    else:
        want = np.fft.ifft(x) * n
    scale = mode.scale(n)
    if scale is not None:
        want = want * scale
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < GATE, f"n={n} mode={mode.name} rel-L2={rel:.2e}"


def test_roundtrip_batch_minor():
    n = 17
    rng = np.random.default_rng(RNG_SEED)
    plan = VpuDdBluesteinPlan.create(n, interpret=True)
    x = rng.standard_normal((n, 5)) + 1j * rng.standard_normal((n, 5))
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    planes = tuple(jnp.asarray(p) for p in (rh, rl, ih, il))
    mid = plan.transform_planar_dd_bm(*planes, Transform.FFT)
    back = plan.transform_planar_dd_bm(*mid, Transform.IFFT)
    got = _join(back)
    assert np.max(np.abs(got - x)) < GATE


def test_create_eligibility():
    # inner next_pow2(2n-1) must have a fused dd schedule and fit MAX_INNER.
    for n in (17, 125, 191, 625, 1013):
        plan = VpuDdBluesteinPlan.create(n, interpret=True)
        assert plan is not None, n
        assert plan.m_inner <= VpuDdBluesteinPlan.MAX_INNER
    # above the inner ceiling: next_pow2(2*3125-1) = 8192
    assert VpuDdBluesteinPlan.create(3125, interpret=True) is None
    assert VpuDdBluesteinPlan.create(1, interpret=True) is None


def test_serialize_roundtrip(tmp_path):
    from fourier_tpu.plan.serialize import load_plan, save_plan

    plan = VpuDdBluesteinPlan.create(29, interpret=True)
    path = tmp_path / "ddblu.ftp"
    save_plan(plan, path)
    loaded = load_plan(path)
    assert isinstance(loaded, VpuDdBluesteinPlan)
    assert loaded.size == 29 and loaded.m_inner == plan.m_inner
    np.testing.assert_array_equal(
        np.asarray(loaded.chirps_fwd[0][0]), np.asarray(plan.chirps_fwd[0][0])
    )
