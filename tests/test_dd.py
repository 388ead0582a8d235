"""Double-word f32 (c128 emulation) path tests.

The TPU f64 story (BASELINE.md: c128 via two-f32 emulation, <=1e-12 rel-L2):
error-free-transform primitives, dd complex ops, and full plans vs the f64
oracle. The eager-numpy pipeline is strict IEEE f32 so results here match the
device path (verified on real TPU at 2-4e-15 during development).
"""

import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu import Transform
from fourier_tpu.precision import DdFftPlan
from fourier_tpu.precision import ddcplx
from fourier_tpu.precision import ddreal as dd
from fourier_tpu.utils import oracle_transform

RNG_SEED = 0xDD

GATE = 1e-12  # BASELINE.md c128 gate (rel-L2)


def _rand(n, rng):
    return rng.standard_normal(n) + 1j * rng.standard_normal(n)


# ---------------------------------------------------------------------------
# Primitives: error-free transformations
# ---------------------------------------------------------------------------


def test_two_sum_exact():
    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal(4096).astype(np.float32)
    b = (rng.standard_normal(4096) * 1e-4).astype(np.float32)
    s, e = dd.two_sum(a, b)
    exact = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_array_equal(s.astype(np.float64) + e.astype(np.float64), exact)


def test_two_prod_exact():
    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal(4096).astype(np.float32)
    b = rng.standard_normal(4096).astype(np.float32)
    p, e = dd.two_prod(a, b)
    exact = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_array_equal(p.astype(np.float64) + e.astype(np.float64), exact)


def test_scalar_split_is_12_bit():
    for c in (np.sqrt(2) / 2, -0.5, 1.0 / 3.0, np.pi):
        hi, lo = dd._split_scalar_f32(c)
        # hi must be exactly representable with <= 12 mantissa bits:
        # multiplying by 2^12 / its exponent yields an integer.
        m, ex = np.frexp(np.float32(hi))
        assert float(m * 4096) == int(m * 4096)
        assert abs(hi + lo - float(np.float32(c))) < 1e-12


def test_dd_mul_accuracy():
    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal(1000)
    b = rng.standard_normal(1000)
    x = dd.from_f64(a)
    y = dd.from_f64(b)
    got = dd.to_f64(dd.mul(x, y))
    assert np.max(np.abs(got - a * b) / np.abs(a * b)) < 1e-13


def test_ddcplx_mul_const():
    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal(1000)
    b = rng.standard_normal(1000)
    v = (dd.from_f64(a), dd.from_f64(b))
    c = np.sqrt(2) / 2
    (rh, rl), (ih, il) = ddcplx.mul_const(v, c, -c)
    got = dd.to_f64((rh, rl)) + 1j * dd.to_f64((ih, il))
    want = (a + 1j * b) * complex(c, -c)
    assert np.max(np.abs(got - want)) < 1e-13 * np.max(np.abs(want))


# ---------------------------------------------------------------------------
# Full plans vs oracle (c128 gate)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 4, 8, 16, 27, 32, 48, 64, 73, 100])
def test_dd_plan_vs_oracle(n):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = DdFftPlan(n)
    x = _rand(n, rng)
    for mode in (Transform.FFT, Transform.IFFT):
        got = plan.transform(x, mode)
        want = oracle_transform(x, mode)
        rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-300)
        assert rel < GATE, f"n={n} mode={mode.name} rel-L2={rel:.2e}"


@pytest.mark.parametrize("mode", list(Transform))
def test_dd_modes(mode):
    rng = np.random.default_rng(RNG_SEED)
    n = 36
    plan = DdFftPlan(n)
    x = _rand(n, rng)
    got = plan.transform(x, mode)
    want = oracle_transform(x, mode)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < GATE


def test_dd_batch():
    rng = np.random.default_rng(RNG_SEED)
    n = 24
    plan = DdFftPlan(n)
    xb = _rand((4, n), rng)
    got = plan.fft(xb)
    want = np.fft.fft(xb, axis=-1)
    assert np.max(np.abs(got - want)) < 1e-11


def test_dd_jit_parity():
    """The jit (device) path must match the eager numpy path."""
    rng = np.random.default_rng(RNG_SEED)
    n = 32
    plan = DdFftPlan(n)
    x = _rand(n, rng)
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    orh, orl, oih, oil = plan.transform_planar_dd(rh, rl, ih, il, Transform.FFT)
    got = (
        np.asarray(orh, np.float64) + np.asarray(orl, np.float64)
    ) + 1j * (np.asarray(oih, np.float64) + np.asarray(oil, np.float64))
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < GATE


def test_mul_f32_jit_inexact_constant():
    """Regression: XLA:CPU fma-contraction must not break the scale EFT.

    jax 0.9 XLA:CPU strips optimization_barrier before codegen and contracts
    ``p + e`` into ``fma(x, c, e)``, so the sum and residual paths of fast2sum
    saw different product roundings — scaled modes (1/96, 1/sqrt(n), ...)
    degraded to ~5e-8. ``_opaque`` now uses lax.reduce_precision, which
    survives to codegen. Eager numpy was always exact; this pins the jit path.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(RNG_SEED)
    a = rng.standard_normal(256)
    xh, xl = dd.from_f64(a)
    for c in (1.0 / 96.0, 1.0 / np.sqrt(192.0), 1.0 / 3.0):
        sh, sl = dd.const(c)
        jh, jl = jax.jit(lambda h, l: dd.mul_f32((h, l), sh))(
            jnp.asarray(xh), jnp.asarray(xl)
        )
        got = np.asarray(jh, np.float64) + np.asarray(jl, np.float64)
        want = (xh.astype(np.float64) + xl.astype(np.float64)) * sh
        rel = np.max(np.abs(got - want) / np.abs(want))
        assert rel < 1e-13, f"c={c}: rel={rel:.2e}"


def test_dd_jit_scaled_modes():
    """jit parity for modes with inexact scale constants (regression twin)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(RNG_SEED)
    n = 96
    plan = DdFftPlan(n)
    x = _rand(n, rng)
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    for mode in (Transform.IFFT, Transform.SQRT_SCALED_FFT):
        outs = plan.transform_planar_dd(
            jnp.asarray(rh), jnp.asarray(rl), jnp.asarray(ih), jnp.asarray(il),
            mode,
        )
        got = (
            np.asarray(outs[0], np.float64) + np.asarray(outs[1], np.float64)
        ) + 1j * (
            np.asarray(outs[2], np.float64) + np.asarray(outs[3], np.float64)
        )
        want = oracle_transform(x, mode)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < GATE, f"mode={mode.name}: rel={rel:.2e}"


def test_planner_dd_backend():
    plan = ft.create_fft(48, np.complex128, backend="dd", cache=False)
    assert isinstance(plan, DdFftPlan)
    with pytest.raises(ValueError):
        ft.create_fft(48, np.complex64, backend="dd", cache=False)


def test_dd_roundtrip():
    rng = np.random.default_rng(RNG_SEED)
    n = 64
    plan = DdFftPlan(n)
    x = _rand(n, rng)
    back = plan.ifft(plan.fft(x))
    assert np.max(np.abs(back - x)) < 1e-12


@pytest.mark.parametrize("n", [64, 73, 125, 1024])
def test_dd_plans_are_callable(n):
    """Every dd plan family supports plan(x) like the c64 FftPlan base
    (plan/base.py:95) — uniform call surface across dtypes."""
    rng = np.random.default_rng(RNG_SEED + n)
    x = _rand(n, rng)
    plan = ft.create_fft_f64(n)
    got = plan(x)
    want = plan.fft(x)
    assert np.array_equal(got, want)
    inv = plan(x, Transform.IFFT)
    assert np.array_equal(inv, plan.ifft(x))
