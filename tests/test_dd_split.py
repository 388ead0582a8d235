"""DdSplit plans: radix-2 DIT over a fused dd half (8192/16384) and the
radix-3/5 generalization (2187 = 3*729, 3125 = 5*625).

The combine math is unit-tested against the numpy f64 oracle with XLA dd
subs (fast on CPU); the fused-kernel sub itself is covered by
test_vpu_dd.py. Serialization round-trip included — the split plan rides
inside Bluestein inners for every c128 size in (2048, 4096].
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fourier_tpu import Transform
from fourier_tpu.precision import ddreal as dd
from fourier_tpu.precision.dd_plan import DdFftPlan
from fourier_tpu.precision.dd_split import (
    DdSplitPow2Plan,
    DdSplitRadixPlan,
    _radix_twiddle_tables,
    _twiddle_tables,
)
GATE = 1e-12
RNG_SEED = 0xD512


def fft_oracle(x, mode):
    """Mode-aware numpy.fft oracle.

    The repo's naive-DFT oracle is the wrong tool at these sizes: its
    np.exp(j*j*pi/n) phase argument reaches ~n^2 and carries ~3e-12 of
    rounding by n=8192 — above the gate itself — while np.fft (pocketfft)
    stays at ~5e-15. Measured: the split plan agrees with np.fft to 5.5e-15
    at 8192 but with the naive oracle only to 1.1e-12.
    """
    mode = Transform(mode)
    y = np.fft.fft(x) if mode.is_forward else np.fft.ifft(x) * x.shape[-1]
    scale = mode.scale(x.shape[-1])
    return y if scale is None else y * scale


def _to_planes(x):
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    return tuple(jnp.asarray(p) for p in (rh, rl, ih, il))


def _from_value(v):
    (rh, rl), (ih, il) = v
    f = lambda p: np.asarray(p, np.float64)
    return (f(rh) + f(rl)) + 1j * (f(ih) + f(il))


def _xla_half_plan(n):
    """Split plan with XLA dd halves: exercises the combine, fast on CPU."""
    if n == 8192:
        half = DdFftPlan(4096)
    else:
        half = DdSplitPow2Plan(
            n // 2, DdFftPlan(n // 4), *_twiddle_tables(n // 4)
        )
    return DdSplitPow2Plan(n, half, *_twiddle_tables(n // 2))


# All five modes at 8192; two (one per direction, incl. a scaled one) at
# 16384 — each 16384 case costs minutes of eager XLA dd on the 1-core CI
# host and the combine logic is size-uniform.
@pytest.mark.parametrize(
    "n,mode",
    [(8192, m) for m in Transform]
    + [(16384, Transform.FFT), (16384, Transform.SQRT_SCALED_IFFT)],
)
def test_split_vs_oracle(n, mode):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = _xla_half_plan(n)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    pl = _to_planes(x)
    got = _from_value(plan._apply_dd(((pl[0], pl[1]), (pl[2], pl[3])), mode))
    want = fft_oracle(x, mode)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < GATE, f"n={n} mode={mode.name} rel-L2={rel:.2e}"


def test_create_sizes():
    # Halves must reach a fused plan (2^a*3^b, 8|n, 64..4096) recursively.
    for n in (6144, 8192, 12288, 16384):
        plan = DdSplitPow2Plan.create(n)
        assert plan is not None, n
        assert plan.size == n
    assert DdSplitPow2Plan.create(32768) is None  # above MAX_SPLIT_SIZE
    assert DdSplitPow2Plan.create(8191) is None  # odd
    # 10000 would need FOUR split levels to reach fused-625 (5000, 2500,
    # 1250 all unfused) — past MAX_DEPTH. The single-combine radix-5 split
    # covers it instead (sub 2000 carries a fused [8,2,25,5] schedule).
    assert DdSplitPow2Plan.create(10000) is None
    radix = DdSplitRadixPlan.create(10000)
    assert radix is not None and radix.radix == 5 and radix.sub.size == 2000


def test_eager_numpy_fallback():
    rng = np.random.default_rng(RNG_SEED)
    plan = DdSplitPow2Plan.create(8192)
    x = rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
    got = plan.fft(x)
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < GATE


# Radix-3/5 split (DdSplitRadixPlan): all five modes at 2187, two at 3125
# (size-uniform combine; each XLA dd sub application costs ~10s on the
# 1-core CI host).
@pytest.mark.parametrize(
    "n,r,mode",
    [(2187, 3, m) for m in Transform]
    + [(3125, 5, Transform.FFT), (3125, 5, Transform.SQRT_SCALED_IFFT)],
)
def test_split_radix_vs_oracle(n, r, mode):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = DdSplitRadixPlan(
        n, r, DdFftPlan(n // r), *_radix_twiddle_tables(n, r)
    )
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    pl = _to_planes(x)
    got = _from_value(plan._apply_dd(((pl[0], pl[1]), (pl[2], pl[3])), mode))
    want = fft_oracle(x, mode)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < GATE, f"n={n} mode={mode.name} rel-L2={rel:.2e}"


def test_split_radix_create_sizes():
    # Needs a fused dd quotient: 2187/3 = 729 and 3125/5 = 625 are tabled.
    for n, r in ((2187, 3), (3125, 5)):
        plan = DdSplitRadixPlan.create(n)
        assert plan is not None and plan.radix == r, n
    assert DdSplitRadixPlan.create(2189) is None  # prime
    assert DdSplitRadixPlan.create(1013) is None  # prime
    assert DdSplitRadixPlan.create(6561) is None  # 6561/3 = 2187 not fused


def test_split_radix_serialize_roundtrip(tmp_path):
    from fourier_tpu.plan.serialize import load_plan, save_plan

    plan = DdSplitRadixPlan(
        2187, 3, DdFftPlan(729), *_radix_twiddle_tables(2187, 3)
    )
    path = tmp_path / "split3.ftp"
    save_plan(plan, path)
    loaded = load_plan(path)
    assert isinstance(loaded, DdSplitRadixPlan)
    assert loaded.size == 2187 and loaded.radix == 3
    np.testing.assert_array_equal(
        np.asarray(loaded.tw_fwd[0][0]), np.asarray(plan.tw_fwd[0][0])
    )


def test_serialize_roundtrip(tmp_path):
    from fourier_tpu.plan.serialize import load_plan, save_plan

    plan = DdSplitPow2Plan.create(8192)
    path = tmp_path / "split.ftp"
    save_plan(plan, path)
    loaded = load_plan(path)
    assert isinstance(loaded, DdSplitPow2Plan)
    assert loaded.size == 8192
    np.testing.assert_array_equal(
        np.asarray(loaded.tw_fwd[0]), np.asarray(plan.tw_fwd[0])
    )


def test_bm_entry_under_jit():
    """transform_planar_dd_bm must be traceable with the PLAN as a jit
    argument: plans are registered pytrees, so the twiddle tables arrive
    as tracers (regression: the combine wrapper read a table's shape via
    np.asarray, which throws TracerArrayConversionError — exactly the
    regime the bench suite's scanned step runs in)."""
    import jax

    n, r = 24, 3
    plan = DdSplitRadixPlan(
        n, r, DdFftPlan(n // r), *_radix_twiddle_tables(n, r)
    )
    rng = np.random.default_rng(RNG_SEED + n)
    x = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    planes = tuple(jnp.asarray(p) for p in (rh, rl, ih, il))

    @jax.jit
    def step(p, a, b, c, d):
        return p.transform_planar_dd_bm(a, b, c, d, Transform.FFT)

    orh, orl, oih, oil = step(plan, *planes)
    got = (
        np.asarray(orh, np.float64) + np.asarray(orl, np.float64)
    ) + 1j * (np.asarray(oih, np.float64) + np.asarray(oil, np.float64))
    want = np.fft.fft(x, axis=0)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < GATE, f"rel-L2={rel:.2e}"
