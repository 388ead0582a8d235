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
from fourier_tpu.parallel.sharded import (
    Fft2dPlan,
    Fft3dPlan,
    FourStepPlan,
    batched_transform,
    batched_transform_dd,
)

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
    with pytest.raises(ValueError):
        Fft2dPlan(16, 16, mesh, pipeline_chunks=3)  # 3 does not divide 16/8


# ---------------------------------------------------------------------------
# First-class plan surface: batch dims, complex API, pytree, pipelining, dd
# ---------------------------------------------------------------------------


def test_four_step_batch_dims_and_complex_api():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1 = n2 = 16
    x = (
        rng.standard_normal((3, n1 * n2)) + 1j * rng.standard_normal((3, n1 * n2))
    ).astype(np.complex64)
    plan = FourStepPlan(n1, n2, mesh, natural_order=True)
    got = plan.fft(x)
    want = np.fft.fft(x, axis=-1)
    assert got.shape == x.shape
    assert np.max(np.abs(got - want)) < 1e-3 * np.max(np.abs(want))
    back = plan.ifft(got)
    np.testing.assert_allclose(back, x, atol=2e-4 * np.max(np.abs(x)))


def test_fft2d_batch_dims_and_complex_api():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1, n2 = 16, 32
    x = (
        rng.standard_normal((2, n1, n2)) + 1j * rng.standard_normal((2, n1, n2))
    ).astype(np.complex64)
    plan = Fft2dPlan(n1, n2, mesh)
    got = plan.fft(x)
    want = np.fft.fft2(x, axes=(-2, -1))
    assert got.shape == x.shape
    assert np.max(np.abs(got - want)) < 1e-3 * np.max(np.abs(want))


@pytest.mark.parametrize("chunks", [2, 4])
def test_four_step_pipelined_equivalence(chunks):
    """pipeline_chunks must reproduce the monolithic transpose exactly."""
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1, n2 = 16, 32
    re, im = _rand_planar((n1, n2), rng)
    base = FourStepPlan(n1, n2, mesh, natural_order=True)
    piped = FourStepPlan(
        n1, n2, mesh, natural_order=True, pipeline_chunks=chunks
    )
    bre, bim = base.fft_planar(re, im)
    pre, pim = piped.fft_planar(re, im)
    np.testing.assert_array_equal(np.asarray(bre), np.asarray(pre))
    np.testing.assert_array_equal(np.asarray(bim), np.asarray(pim))


@pytest.mark.parametrize("chunks", [2, 4])
def test_fft2d_pipelined_equivalence(chunks):
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1, n2 = 32, 16
    re, im = _rand_planar((n1, n2), rng)
    base = Fft2dPlan(n1, n2, mesh)
    piped = Fft2dPlan(n1, n2, mesh, pipeline_chunks=chunks)
    bre, bim = base.fft_planar(re, im)
    pre, pim = piped.fft_planar(re, im)
    np.testing.assert_array_equal(np.asarray(bre), np.asarray(pre))
    np.testing.assert_array_equal(np.asarray(bim), np.asarray(pim))


def test_sharded_plans_are_pytrees():
    mesh = _mesh()
    plan2d = Fft2dPlan(16, 16, mesh)
    leaves, treedef = jax.tree_util.tree_flatten(plan2d)
    again = jax.tree_util.tree_unflatten(treedef, leaves)
    assert again.n1 == 16 and again.mesh is mesh
    plan4 = FourStepPlan(16, 16, mesh)
    leaves, treedef = jax.tree_util.tree_flatten(plan4)
    assert all(hasattr(l, "dtype") for l in leaves)
    again = jax.tree_util.tree_unflatten(treedef, leaves)
    assert again.size == 256 and again.natural_order is plan4.natural_order


def test_fft2d_jit_with_plan_argument():
    """A sharded plan passes through jit as a pytree argument."""
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1 = n2 = 16
    re, im = _rand_planar((n1, n2), rng)
    plan = Fft2dPlan(n1, n2, mesh)

    @jax.jit
    def run(p, a, b):
        return p.fft_planar(a, b)

    ore, oim = run(plan, re, im)
    sre, sim = plan.fft_planar(re, im)
    np.testing.assert_allclose(np.asarray(ore), np.asarray(sre), atol=1e-5)
    np.testing.assert_allclose(np.asarray(oim), np.asarray(sim), atol=1e-5)


def test_sharded_plan_serialize_roundtrip(tmp_path):
    from fourier_tpu.plan.serialize import load_plan, save_plan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1, n2 = 16, 32
    plan = Fft2dPlan(n1, n2, mesh, pipeline_chunks=2)
    path = str(tmp_path / "fft2d.npz")
    save_plan(plan, path)
    with pytest.raises(ValueError):
        load_plan(path)  # sharded plans need a mesh to rebind
    with pytest.raises(ValueError):
        load_plan(path, mesh=Mesh(np.array(jax.devices()[:4]), ("fft",)))
    again = load_plan(path, mesh=mesh)
    re, im = _rand_planar((n1, n2), rng)
    ore, oim = plan.fft_planar(re, im)
    lre, lim = again.fft_planar(re, im)
    np.testing.assert_array_equal(np.asarray(ore), np.asarray(lre))
    np.testing.assert_array_equal(np.asarray(oim), np.asarray(lim))

    plan4 = FourStepPlan(16, 16, mesh, natural_order=True)
    path4 = str(tmp_path / "fourstep.npz")
    save_plan(plan4, path4)
    again4 = load_plan(path4, mesh=mesh)
    fre, fim = _rand_planar((16, 16), rng)
    np.testing.assert_array_equal(
        np.asarray(plan4.fft_planar(fre, fim)[0]),
        np.asarray(again4.fft_planar(fre, fim)[0]),
    )


# ---------------------------------------------------------------------------
# c128 across the sharded surface (dd 4-plane and native-f64 2-plane)
# ---------------------------------------------------------------------------


def _rand_c128(shape, rng):
    return (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex128)


def test_batched_transform_dd_matches_single():
    # n=32 keeps this a pure-Stockham dd plan: a Bluestein size here would
    # compile a dd inner FFT through shard_map (minutes on the CPU mesh);
    # dd-Bluestein coverage lives in test_dd.py / test_ndim.py (eager numpy).
    from fourier_tpu.precision import DdFftPlan
    from fourier_tpu.precision import ddreal as dd

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh("batch")
    plan = DdFftPlan(32)
    x = _rand_c128((16, 32), rng)
    rh, rl = dd.from_f64(x.real)
    ih, il = dd.from_f64(x.imag)
    orh, orl, oih, oil = batched_transform_dd(
        plan, rh, rl, ih, il, mesh, axis="batch"
    )
    got = dd.to_f64((np.asarray(orh), np.asarray(orl))) + 1j * dd.to_f64(
        (np.asarray(oih), np.asarray(oil))
    )
    want = np.fft.fft(x, axis=-1)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)


def test_fft2d_c128_dd():
    """Sharded 2-D c128 via the 4-plane dd path meets the 1e-12 gate.

    One pipelined configuration at a small size: dd graphs through shard_map
    are compile-heavy on the CPU mesh, and pipelined-vs-monolithic exactness
    is already covered (cheaply) by the c64 equivalence tests.
    """
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1 = n2 = 16
    x = _rand_c128((n1, n2), rng)
    plan = Fft2dPlan(
        n1, n2, mesh, dtype=np.complex128, backend="dd",
        pipeline_chunks=2,
    )
    assert plan.is_dd and plan.nplanes == 4
    got = plan.fft(x)
    want = np.fft.fft2(x)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)
    back = plan.ifft(got)
    assert np.linalg.norm(back - x) < 1e-12 * np.linalg.norm(x)


def test_four_step_c128_dd_natural_order():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1 = n2 = 16
    x = _rand_c128(n1 * n2, rng)
    plan = FourStepPlan(
        n1, n2, mesh, dtype=np.complex128, backend="dd", natural_order=True
    )
    got = plan.fft(x)
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)


def test_fft2d_c128_native_f64():
    """On an x64 host c128 sharded plans run 2-plane native f64."""
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    n1, n2 = 16, 16
    x = _rand_c128((n1, n2), rng)
    plan = Fft2dPlan(n1, n2, mesh, dtype=np.complex128, backend="stockham")
    assert not plan.is_dd
    got = plan.fft(x)
    want = np.fft.fft2(x)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)


def test_dd_plane_api_mismatch_raises():
    mesh = _mesh()
    plan = Fft2dPlan(16, 16, mesh, dtype=np.complex128, backend="dd")
    with pytest.raises(TypeError):
        plan.transform_planar(np.zeros((16, 16), np.float32),
                              np.zeros((16, 16), np.float32))
    plan_c64 = Fft2dPlan(16, 16, mesh)
    with pytest.raises(TypeError):
        plan_c64.transform_planar_dd(
            *(np.zeros((16, 16), np.float32),) * 4
        )


# ---------------------------------------------------------------------------
# 3-D pencil/slab decomposition over a 2-D (or 1-D) mesh
# ---------------------------------------------------------------------------


def _mesh2(shape=(2, 4), axes=("x", "y")):
    devs = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, axes)


@pytest.mark.parametrize("dims", [(8, 8, 8), (4, 8, 16)])
@pytest.mark.parametrize("mode", [Transform.FFT, Transform.IFFT])
def test_fft3d_pencil_vs_numpy(dims, mode):
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    n0, n1, n2 = dims
    x = (
        rng.standard_normal(dims) + 1j * rng.standard_normal(dims)
    ).astype(np.complex64)
    plan = Fft3dPlan(n0, n1, n2, mesh)
    got = plan.transform(x, mode)
    want = np.fft.fftn(x) if mode is Transform.FFT else np.fft.ifftn(x)
    assert got.shape == dims
    assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.max(np.abs(want)))


def test_fft3d_spectral_layout_roundtrip():
    """spectral_output + from_spectral: same logical arrays, fewer collectives."""
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    dims = (8, 8, 8)
    x = (
        rng.standard_normal(dims) + 1j * rng.standard_normal(dims)
    ).astype(np.complex64)
    natural = Fft3dPlan(*dims, mesh)
    spectral = Fft3dPlan(*dims, mesh, spectral_output=True)
    # The spectral-layout output is the SAME logical spectrum.
    ys = spectral.fft(x)
    yn = natural.fft(x)
    np.testing.assert_allclose(ys, yn, atol=1e-4 * np.max(np.abs(yn)))
    # Inverse consuming the spectral layout directly returns the signal.
    back = spectral.transform(ys, Transform.IFFT, from_spectral=True)
    assert np.max(np.abs(back - x)) < 1e-3 * np.max(np.abs(x))


def test_fft3d_slab_one_mesh_axis():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    dims = (16, 16, 4)
    x = (
        rng.standard_normal(dims) + 1j * rng.standard_normal(dims)
    ).astype(np.complex64)
    plan = Fft3dPlan(*dims, mesh, axes=("fft",))
    got = plan.fft(x)
    want = np.fft.fftn(x)
    assert np.max(np.abs(got - want)) < 1e-3 * np.max(np.abs(want))


def test_fft3d_batch_dims_and_planar_api():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    dims = (8, 8, 8)
    x = (
        rng.standard_normal((2,) + dims) + 1j * rng.standard_normal((2,) + dims)
    ).astype(np.complex64)
    plan = Fft3dPlan(*dims, mesh)
    ore, oim = plan.fft_planar(
        np.real(x).astype(np.float32), np.imag(x).astype(np.float32)
    )
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = np.fft.fftn(x, axes=(-3, -2, -1))
    assert got.shape == x.shape
    assert np.max(np.abs(got - want)) < 1e-3 * np.max(np.abs(want))
    back = plan.ifft(got)
    np.testing.assert_allclose(back, x, atol=2e-4 * np.max(np.abs(x)))


def test_fft3d_c128_dd():
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    dims = (16, 8, 8)
    x = _rand_c128(dims, rng)
    plan = Fft3dPlan(*dims, mesh, dtype=np.complex128, backend="dd")
    assert plan.is_dd and plan.nplanes == 4
    got = plan.fft(x)
    want = np.fft.fftn(x)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)


def test_fft3d_validation_and_pytree(tmp_path):
    from fourier_tpu.plan.serialize import load_plan, save_plan

    mesh = _mesh2()
    with pytest.raises(ValueError):
        Fft3dPlan(7, 8, 8, mesh)  # n0=7 not divisible by |x|=2
    with pytest.raises(ValueError):
        Fft3dPlan(8, 8, 6, mesh)  # n2=6 not divisible by |y|=4
    with pytest.raises(ValueError):
        Fft3dPlan(8, 8, 8, mesh, axes=("x", "y", "z"))
    plan = Fft3dPlan(8, 8, 8, mesh)
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    again = jax.tree_util.tree_unflatten(treedef, leaves)
    assert again.size == 512 and again.mesh is mesh and again.axes == ("x", "y")
    path = str(tmp_path / "fft3d.npz")
    save_plan(plan, path)
    with pytest.raises(ValueError):
        load_plan(path)  # needs a mesh to rebind
    loaded = load_plan(path, mesh=mesh)
    rng = np.random.default_rng(RNG_SEED)
    re, im = _rand_planar((8, 8, 8), rng)
    np.testing.assert_array_equal(
        np.asarray(plan.fft_planar(re, im)[0]),
        np.asarray(loaded.fft_planar(re, im)[0]),
    )


# -- batch-sharded real transforms ---------------------------------------------


def test_batched_rfft_matches_single():
    from fourier_tpu.parallel import batched_irfft, batched_rfft
    from fourier_tpu.rfft import RfftPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh("batch")
    n, B = 96, 4 * len(jax.devices())
    plan = RfftPlan(n)
    x = rng.standard_normal((B, n)).astype(np.float32)
    re, im = batched_rfft(plan, x, mesh, axis="batch")
    got = np.asarray(re) + 1j * np.asarray(im)
    want = np.fft.rfft(x)
    assert np.linalg.norm(got - want) <= 1e-5 * np.linalg.norm(want)
    back = np.asarray(batched_irfft(plan, re, im, mesh, axis="batch"))
    assert np.linalg.norm(back - x) <= 1e-5 * np.linalg.norm(x)


def test_batched_rfft_odd_n():
    from fourier_tpu.parallel import batched_rfft
    from fourier_tpu.rfft import RfftPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh("batch")
    n, B = 27, 2 * len(jax.devices())
    plan = RfftPlan(n)
    x = rng.standard_normal((B, n)).astype(np.float32)
    re, im = batched_rfft(plan, x, mesh, axis="batch")
    got = np.asarray(re) + 1j * np.asarray(im)
    want = np.fft.rfft(x)
    assert np.linalg.norm(got - want) <= 1e-5 * np.linalg.norm(want)


def test_batched_rfft_dd_matches_numpy():
    from fourier_tpu.parallel import batched_irfft_dd, batched_rfft_dd
    from fourier_tpu.precision import ddreal as dd
    from fourier_tpu.rfft import RfftPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh("batch")
    n, B = 64, 2 * len(jax.devices())
    plan = RfftPlan(n, np.complex128, backend="dd")
    assert plan.dd
    x = rng.standard_normal((B, n))
    xh, xl = dd.from_f64(x)
    planes = batched_rfft_dd(plan, xh, xl, mesh, axis="batch")
    got = dd.to_f64((np.asarray(planes[0]), np.asarray(planes[1]))) + 1j * (
        dd.to_f64((np.asarray(planes[2]), np.asarray(planes[3])))
    )
    want = np.fft.rfft(x)
    assert np.linalg.norm(got - want) <= 1e-12 * np.linalg.norm(want)
    bh, bl = batched_irfft_dd(plan, *planes, mesh=mesh, axis="batch")
    back = dd.to_f64((np.asarray(bh), np.asarray(bl)))
    assert np.linalg.norm(back - x) <= 1e-12 * np.linalg.norm(x)


# ---------------------------------------------------------------------------
# Real-input 3-D FFT (pencil/slab)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dims", [(8, 8, 16), (4, 8, 9)])
def test_rfft3d_pencil_vs_numpy(dims):
    """Forward matches np.fft.rfftn (incl. padded-spectral-axis crop and an
    odd n2); inverse reproduces the input."""
    from fourier_tpu.parallel import Rfft3dPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    plan = Rfft3dPlan(*dims, mesh)
    x = rng.standard_normal(dims).astype(np.float32)
    got = plan.rfft(x)
    want = np.fft.rfftn(x)
    assert got.shape == want.shape == (*dims[:2], dims[2] // 2 + 1)
    assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.max(np.abs(want)))
    back = plan.irfft(got)
    assert back.shape == x.shape
    assert np.max(np.abs(back - x)) < 1e-4


def test_rfft3d_planar_pad_contract():
    """Planar surface carries the zero pad tail; pad bins are exactly zero."""
    from fourier_tpu.parallel import Rfft3dPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()  # (2, 4): n2=16 -> out_len 9, n2p 12
    plan = Rfft3dPlan(8, 8, 16, mesh)
    assert (plan.out_len, plan.n2p) == (9, 12)
    x = rng.standard_normal((8, 8, 16)).astype(np.float32)
    re, im = plan.rfft_planar(x)
    assert re.shape == (8, 8, 12)
    assert np.all(np.asarray(re)[..., 9:] == 0)
    assert np.all(np.asarray(im)[..., 9:] == 0)
    back = plan.irfft_planar(re, im)
    assert np.max(np.abs(np.asarray(back) - x)) < 1e-4


def test_rfft3d_spectral_layout_roundtrip():
    """spectral_output + from_spectral: 4 collectives per roundtrip instead
    of 8, same logical arrays."""
    from fourier_tpu.parallel import Rfft3dPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    dims = (8, 8, 16)
    spectral = Rfft3dPlan(*dims, mesh, spectral_output=True)
    x = rng.standard_normal(dims).astype(np.float32)
    re, im = spectral.rfft_planar(x)
    got = (np.asarray(re) + 1j * np.asarray(im))[..., : spectral.out_len]
    want = np.fft.rfftn(x)
    assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.max(np.abs(want)))
    back = spectral.irfft_planar(re, im, from_spectral=True)
    assert np.max(np.abs(np.asarray(back) - x)) < 1e-4


def test_rfft3d_slab_and_batch_dims():
    from fourier_tpu.parallel import Rfft3dPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh("fft")  # 1-D mesh: slab decomposition, no padding
    dims = (8, 8, 10)
    plan = Rfft3dPlan(*dims, mesh, axes=("fft",))
    assert plan.n2p == plan.out_len == 6
    x = rng.standard_normal((2, *dims)).astype(np.float32)  # leading batch
    got = plan.rfft(x)
    want = np.fft.rfftn(x, axes=(-3, -2, -1))
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.max(np.abs(want)))
    back = plan.irfft(got)
    assert np.max(np.abs(back - x)) < 1e-4


def test_rfft3d_c128_dd():
    from fourier_tpu.parallel import Rfft3dPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    dims = (4, 8, 16)
    plan = Rfft3dPlan(*dims, mesh, dtype=np.complex128, backend="dd")
    assert plan.is_dd
    x = rng.standard_normal(dims)
    got = plan.rfft(x)
    want = np.fft.rfftn(x)
    assert np.max(np.abs(got - want)) < 1e-12 * max(1.0, np.max(np.abs(want)))
    back = plan.irfft(got)
    assert np.max(np.abs(back - x)) < 1e-12


def test_rfft3d_validation_and_pytree():
    from fourier_tpu.parallel import Rfft3dPlan

    mesh = _mesh2()
    with pytest.raises(ValueError):
        Rfft3dPlan(7, 8, 8, mesh)  # n0 % |x|
    with pytest.raises(ValueError):
        Rfft3dPlan(8, 6, 8, mesh)  # n1 % |y|
    with pytest.raises(ValueError):
        Rfft3dPlan(8, 8, 8, mesh, axes=("x", "y", "z"))
    plan = Rfft3dPlan(8, 8, 16, mesh)
    with pytest.raises(ValueError):
        plan.rfft_planar(np.zeros((8, 8, 12), np.float32))
    with pytest.raises(ValueError):
        plan.irfft_planar(
            np.zeros((8, 8, 9), np.float32), np.zeros((8, 8, 9), np.float32)
        )  # spectrum planes must carry the pad tail
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert (rebuilt.n2p, rebuilt.out_len) == (plan.n2p, plan.out_len)

    # jit with the plan as a pytree argument
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((8, 8, 16)).astype(np.float32)

    @jax.jit
    def fwd(p, xx):
        return p.rfft_planar(xx)

    re, im = fwd(plan, x)
    got = (np.asarray(re) + 1j * np.asarray(im))[..., : plan.out_len]
    want = np.fft.rfftn(x)
    assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.max(np.abs(want)))


def test_rfft3d_serialize_roundtrip(tmp_path):
    from fourier_tpu.parallel import Rfft3dPlan
    from fourier_tpu.plan.serialize import load_plan, save_plan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    plan = Rfft3dPlan(8, 8, 16, mesh)
    path = str(tmp_path / "rfft3d.npz")
    save_plan(plan, path)
    again = load_plan(path, mesh=mesh)
    x = rng.standard_normal((8, 8, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(plan.rfft_planar(x)[0]),
        np.asarray(again.rfft_planar(x)[0]),
    )


@pytest.mark.parametrize("chunks", [2, 4])
def test_fft3d_pipelined_equivalence(chunks):
    """3-D pencil pipeline_chunks must reproduce the monolithic legs
    (chunk axis is uninvolved in the transpose -> same values)."""
    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    dims = (8, 8, 16)
    x = (
        rng.standard_normal(dims) + 1j * rng.standard_normal(dims)
    ).astype(np.complex64)
    base = Fft3dPlan(*dims, mesh)
    piped = Fft3dPlan(*dims, mesh, pipeline_chunks=chunks)
    want = base.fft(x)
    got = piped.fft(x)
    np.testing.assert_allclose(got, want, atol=1e-5 * np.max(np.abs(want)))
    # spectral legs too
    bs = Fft3dPlan(*dims, mesh, spectral_output=True)
    ps = Fft3dPlan(*dims, mesh, spectral_output=True,
                   pipeline_chunks=chunks)
    re, im = np.real(x).astype(np.float32), np.imag(x).astype(np.float32)
    wre, wim = bs.transform_planar(re, im)
    gre, gim = ps.transform_planar(re, im)
    np.testing.assert_allclose(np.asarray(gre), np.asarray(wre), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gim), np.asarray(wim), atol=1e-3)
    bre, bim = ps.transform_planar(gre, gim, Transform.IFFT,
                                   from_spectral=True)
    np.testing.assert_allclose(np.asarray(bre), re, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bim), im, atol=1e-4)


@pytest.mark.parametrize("chunks", [2, 4])
def test_rfft3d_pipelined_equivalence(chunks):
    from fourier_tpu.parallel import Rfft3dPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh2()
    dims = (8, 8, 16)
    x = rng.standard_normal(dims).astype(np.float32)
    base = Rfft3dPlan(*dims, mesh)
    piped = Rfft3dPlan(*dims, mesh, pipeline_chunks=chunks)
    wre, wim = base.rfft_planar(x)
    gre, gim = piped.rfft_planar(x)
    np.testing.assert_allclose(np.asarray(gre), np.asarray(wre), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gim), np.asarray(wim), atol=1e-4)
    back = piped.irfft_planar(gre, gim)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_spectral_layout_halves_collectives_in_hlo():
    """The spectral-layout contract is verified in the COMPILED HLO: a
    filter-in-spectral-space roundtrip contains exactly half the all-to-all
    ops of the natural-layout roundtrip (4 logical collectives vs 8)."""
    from fourier_tpu.parallel import Rfft3dPlan

    mesh = _mesh2()
    x = np.random.default_rng(RNG_SEED).standard_normal((8, 8, 16)).astype(
        np.float32
    )
    natural = Rfft3dPlan(8, 8, 16, mesh)
    spectral = Rfft3dPlan(8, 8, 16, mesh, spectral_output=True)

    def count_a2a(fn, *args):
        return jax.jit(fn).lower(*args).compile().as_text().count("all-to-all")

    def rt_natural(v):
        re, im = natural.rfft_planar(v)
        return natural.irfft_planar(re, im)

    def rt_spectral(v):
        re, im = spectral.rfft_planar(v)
        return spectral.irfft_planar(re, im, from_spectral=True)

    n_nat = count_a2a(rt_natural, x)
    n_spec = count_a2a(rt_spectral, x)
    assert n_nat > 0 and n_spec > 0
    assert n_nat == 2 * n_spec, (n_nat, n_spec)


# ---------------------------------------------------------------------------
# Real-input 2-D FFT (row-sharded)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n2", [32, 21])
def test_rfft2d_vs_numpy(n2):
    from fourier_tpu.parallel import Rfft2dPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    plan = Rfft2dPlan(16, n2, mesh)
    x = rng.standard_normal((16, n2)).astype(np.float32)
    got = plan.rfft(x)
    want = np.fft.rfft2(x)
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.max(np.abs(want)))
    back = plan.irfft(got)
    assert np.max(np.abs(back - x)) < 1e-4


def test_rfft2d_transposed_roundtrip_and_batch():
    from fourier_tpu.parallel import Rfft2dPlan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    plan = Rfft2dPlan(16, 32, mesh, transposed_output=True)
    x = rng.standard_normal((3, 16, 32)).astype(np.float32)
    re, im = plan.rfft_planar(x)
    assert re.shape == (3, plan.n2p, 16)  # transposed layout
    got = np.swapaxes(np.asarray(re) + 1j * np.asarray(im), -1, -2)
    want = np.fft.rfft2(x, axes=(-2, -1))
    assert np.max(
        np.abs(got[..., : plan.out_len] - want)
    ) < 1e-3 * max(1.0, np.max(np.abs(want)))
    back = plan.irfft_planar(re, im, from_transposed=True)
    assert np.max(np.abs(np.asarray(back) - x)) < 1e-4


def test_rfft2d_dd_and_serialize(tmp_path):
    from fourier_tpu.parallel import Rfft2dPlan
    from fourier_tpu.plan.serialize import load_plan, save_plan

    rng = np.random.default_rng(RNG_SEED)
    mesh = _mesh()
    plan = Rfft2dPlan(8, 24, mesh, dtype=np.complex128, backend="dd")
    assert plan.is_dd
    x = rng.standard_normal((8, 24))
    got = plan.rfft(x)
    want = np.fft.rfft2(x)
    assert np.max(np.abs(got - want)) < 1e-12 * max(1.0, np.max(np.abs(want)))
    back = plan.irfft(got)
    assert np.max(np.abs(back - x)) < 1e-12

    c64 = Rfft2dPlan(8, 24, mesh)
    path = str(tmp_path / "rfft2d.npz")
    save_plan(c64, path)
    again = load_plan(path, mesh=mesh)
    xs = rng.standard_normal((8, 24)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(c64.rfft_planar(xs)[0]),
        np.asarray(again.rfft_planar(xs)[0]),
    )
