"""DdMxuDirectPlan: c128 DFT via error-free bf16 chunk matmuls (MXU path).

The decomposition's exactness argument (integer chunk products accumulated
within f32's 2^24 window) is backend-independent, so the CPU runs the same
XLA graph the TPU does — these tests are the real numerical contract, not an
interpret-mode approximation. Gate: the BASELINE.md c128 bound (1e-12
rel-L2); measured headroom is ~10x at n=1013.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fourier_tpu import Transform
from fourier_tpu.precision import ddreal as dd
from fourier_tpu.precision.dd_mxu import DdMxuDirectPlan

GATE = 1e-12
RNG_SEED = 0x3A41
RNG = np.random.default_rng


def _to_planes(x):
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    return tuple(jnp.asarray(p) for p in (rh, rl, ih, il))


def _join(planes):
    rh, rl, ih, il = (np.asarray(p, np.float64) for p in planes)
    return (rh + rl) + 1j * (ih + il)


def _oracle(x, mode):
    mode = Transform(mode)
    y = np.fft.fft(x) if mode.is_forward else np.fft.ifft(x) * x.shape[-1]
    scale = mode.scale(x.shape[-1])
    return y if scale is None else y * scale


@pytest.mark.parametrize("n", [5, 53, 125, 243, 1013])
@pytest.mark.parametrize("mode", [Transform.FFT, Transform.SQRT_SCALED_IFFT])
def test_mxu_dd_vs_oracle(n, mode):
    rng = RNG(RNG_SEED + n)
    plan = DdMxuDirectPlan.create(n)
    assert plan is not None
    x = rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
    got = _join(plan.transform_planar_dd(*_to_planes(x), mode))
    want = _oracle(x, mode)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < GATE, f"n={n} mode={mode.name} rel-L2={rel:.2e}"


@pytest.mark.parametrize(
    "name",
    ["all_ones", "spike", "wide_range", "tiny", "huge"],
)
def test_mxu_dd_adversarial(name):
    """The exactness guarantee must hold beyond random data: coherent sums
    (the worst case for f32 accumulation), extreme dynamic range, and
    magnitudes far from 1 (exercises the per-row power-of-two scaling)."""
    n = 625
    rng = RNG(RNG_SEED)
    x = {
        "all_ones": np.ones((3, n)) * (1 + 1j),
        "spike": np.eye(1, n, 7) * (1e8 + 1j) * np.ones((3, 1)),
        "wide_range": rng.standard_normal((3, n))
        * 10.0 ** rng.integers(-12, 12, (3, n))
        + 1j * rng.standard_normal((3, n)),
        "tiny": (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n)))
        * 1e-20,
        "huge": (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n)))
        * 1e18,
    }[name].astype(np.complex128)
    plan = DdMxuDirectPlan.create(n)
    got = _join(plan.transform_planar_dd(*_to_planes(x), Transform.FFT))
    want = np.fft.fft(x)
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-300)
    assert rel < GATE, f"{name}: rel-L2={rel:.2e}"


def test_roundtrip():
    n = 53
    rng = RNG(RNG_SEED)
    plan = DdMxuDirectPlan.create(n)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    mid = plan.transform_planar_dd(*_to_planes(x), Transform.FFT)
    back = plan.transform_planar_dd(*mid, Transform.IFFT)
    assert np.max(np.abs(_join(back) - x)) < GATE


def test_create_bounds():
    assert DdMxuDirectPlan.create(1024) is not None
    assert DdMxuDirectPlan.create(1025) is None  # exactness bound
    assert DdMxuDirectPlan.create(1) is None


def test_chunk_exactness():
    """Chunks must be bf16-exact and reconstruct the dd value to ~2^-49."""
    import ml_dtypes

    from fourier_tpu.precision.dd_mxu import BITS, _chunks_dd

    rng = RNG(RNG_SEED)
    # |x| < 1 is the caller's contract (per-row power-of-two pre-scaling);
    # include values right at the edge.
    v = rng.uniform(-1.0, 1.0, 4096)
    v[:4] = [0.5, -0.999999999999, 2.0**-30, 1.0 - 2.0**-24]
    hi, lo = dd.from_f64(v)
    chunks = _chunks_dd(jnp.asarray(hi), jnp.asarray(lo), jnp)
    total = np.zeros_like(v)
    for j, c in enumerate(chunks):
        c = np.asarray(c)
        scale = 2.0 ** (BITS * (j + 1))
        m = c * scale
        # integer chunks; 2^BITS at the |x|->1 edge (chunk 0) and up to
        # 64 + 8 on the lo-straddling chunk — all within bf16's 8-bit
        # significand, which is what exactness requires.
        assert np.all(m == np.round(m)) and np.abs(m).max() <= 2**BITS
        assert np.all(
            c.astype(ml_dtypes.bfloat16).astype(np.float32) == c
        )
        total += c.astype(np.float64)
    # Reconstruction floor: the single f32 lo-fold rounds at ~2^-46 absolute
    # (the straddling chunk's residual has ulp 2^-46 at |x| -> 1); everything
    # else in the chunk cascade is exact.
    assert np.abs(total - v).max() < 2.0**-45


def test_serialize_roundtrip(tmp_path):
    from fourier_tpu.plan.serialize import load_plan, save_plan

    plan = DdMxuDirectPlan.create(53)
    path = tmp_path / "mxu_dd.ftp"
    save_plan(plan, path)
    loaded = load_plan(path)
    assert isinstance(loaded, DdMxuDirectPlan)
    assert loaded.size == 53
    np.testing.assert_array_equal(
        np.asarray(loaded.tables.u[0]), np.asarray(plan.tables.u[0])
    )
