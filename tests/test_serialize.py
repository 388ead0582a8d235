"""Static/serialized-plan parity tests (the static_fft analog).

Mirrors the reference's static-plan tests (``integrity.rs:234-254``): plans at
size 64 (pure autosort) and size 73 (prime -> Bluestein with nested inner
plan), {f32, f64} x {forward, inverse}, must reproduce the oracle after a
serialize/deserialize roundtrip. Also covers AOT export of the jitted execute
function — the trace-time analog of the reference's compile-time planner.
"""

import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu import Transform
from fourier_tpu.plan import MxuFftPlan
from fourier_tpu.plan.serialize import load_plan, plan_to_bytes, save_plan
from fourier_tpu.utils import oracle_transform

RNG_SEED = 0x57A71C


def _rand(n, rng, dtype):
    return ((rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(dtype)


@pytest.mark.parametrize("n", [64, 73])  # autosort | Bluestein (integrity.rs:234-254)
@pytest.mark.parametrize(
    "dtype,tol", [(np.complex64, 1e-4), (np.complex128, 1e-10)]
)
def test_saved_plan_matches_oracle(tmp_path, n, dtype, tol):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = ft.create_fft(n, dtype, cache=False)
    path = str(tmp_path / "plan.npz")
    save_plan(plan, path)
    loaded = load_plan(path)
    assert type(loaded) is type(plan)
    assert loaded.size == n
    x = _rand(n, rng, dtype)
    for mode in (Transform.FFT, Transform.IFFT):
        got = loaded.transform(x, mode)
        want = oracle_transform(x, mode)
        assert np.max(np.abs(np.asarray(got) - want)) < tol * max(
            1.0, np.max(np.abs(want))
        )
        # and bit-identical to the original plan's output
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(plan.transform(x, mode))
        )


def test_mxu_plan_roundtrip(tmp_path):
    rng = np.random.default_rng(RNG_SEED)
    plan = MxuFftPlan.create(384)
    path = str(tmp_path / "mxu.npz")
    save_plan(plan, path)
    loaded = load_plan(path)
    assert loaded.n1 == plan.n1 and loaded.n2 == plan.n2
    x = _rand(384, rng, np.complex64)
    np.testing.assert_array_equal(
        np.asarray(loaded.fft(x)), np.asarray(plan.fft(x))
    )


def test_plan_to_bytes():
    plan = ft.create_fft(48, cache=False)
    blob = plan_to_bytes(plan)
    assert isinstance(blob, bytes) and len(blob) > 0


def test_vpu_plan_roundtrip(tmp_path):
    from fourier_tpu.plan.vpu import VpuFftPlan

    rng = np.random.default_rng(RNG_SEED)
    plan = VpuFftPlan.create(192)  # mixed-radix schedule [8, 8, 3]
    path = str(tmp_path / "vpu.npz")
    save_plan(plan, path)
    loaded = load_plan(path)
    assert type(loaded) is VpuFftPlan and loaded.size == 192
    x = _rand(192, rng, np.complex64)
    np.testing.assert_array_equal(
        np.asarray(loaded.fft(x)), np.asarray(plan.fft(x))
    )


def test_load_plan_is_pickle_free(tmp_path):
    """Plan files carry no pickle: unknown classes are rejected by name and
    the npz is loaded with allow_pickle=False (ADVICE round 1)."""
    import json

    plan = ft.create_fft(48, cache=False)
    path = str(tmp_path / "plan.npz")
    save_plan(plan, path)
    with np.load(path, allow_pickle=False) as data:  # must not raise
        structure = json.loads(bytes(data["structure"].tobytes()))
    structure["__plan__"] = "os.system"  # hostile class name
    tampered = {f"leaf_{i}": data[f"leaf_{i}"] for i in []}
    with np.load(path, allow_pickle=False) as data:
        tampered = {k: data[k] for k in data.files if k.startswith("leaf_")}
    tampered["structure"] = np.frombuffer(
        json.dumps(structure).encode(), dtype=np.uint8
    )
    tampered["version"] = np.array([2])
    bad = str(tmp_path / "bad.npz")
    with open(bad, "wb") as f:
        np.savez_compressed(f, **tampered)
    with pytest.raises(ValueError, match="unknown plan class"):
        load_plan(bad)


@pytest.mark.parametrize("n", [64, 73])  # autosort | Bluestein (integrity.rs:234-254)
def test_export_compiled_parity(tmp_path, n):
    """The public static_fft deliverable: export_compiled/load_compiled.

    The loaded artifact executes with zero planning — parity against the
    oracle at the reference's static-plan pair of sizes.
    """
    pytest.importorskip("jax.export")
    from fourier_tpu import export_compiled, load_compiled

    rng = np.random.default_rng(RNG_SEED + n)
    plan = ft.create_fft(n, np.complex64, cache=False)
    path = str(tmp_path / "compiled.npz")
    export_compiled(plan, path, batch_shape=(4,))
    comp = load_compiled(path)
    assert comp.size == n and len(comp) == n
    assert comp.real_dtype == np.float32

    x = _rand(4 * n, rng, np.complex64).reshape(4, n)
    for mode, ref in ((Transform.FFT, np.fft.fft), (Transform.IFFT, np.fft.ifft)):
        ore, oim = comp.transform_planar(
            np.real(x), np.imag(x), mode
        )
        got = np.asarray(ore) + 1j * np.asarray(oim)
        np.testing.assert_allclose(got, ref(x, axis=-1), atol=1e-4)
        # bit-identical to the live plan's jitted output
        pre, pim = plan.transform_planar(np.real(x), np.imag(x), mode)
        np.testing.assert_array_equal(np.asarray(ore), np.asarray(pre))
        np.testing.assert_array_equal(np.asarray(oim), np.asarray(pim))

    with pytest.raises(ValueError, match="not exported"):
        comp.transform_planar(np.real(x), np.imag(x), Transform.UNSCALED_IFFT)


def test_export_compiled_symbolic_batch(tmp_path):
    """Batch-polymorphic export: one artifact serves any batch size."""
    pytest.importorskip("jax.export")
    from fourier_tpu import export_compiled, load_compiled

    plan = ft.create_fft(48, np.complex64, cache=False)
    path = str(tmp_path / "poly.npz")
    export_compiled(plan, path, batch_shape=("b",), modes=(Transform.FFT,))
    comp = load_compiled(path)
    rng = np.random.default_rng(RNG_SEED)
    for batch in (1, 3, 7):
        x = _rand(batch * 48, rng, np.complex64).reshape(batch, 48)
        ore, oim = comp.fft_planar(np.real(x), np.imag(x))
        got = np.asarray(ore) + 1j * np.asarray(oim)
        np.testing.assert_allclose(got, np.fft.fft(x, axis=-1), atol=1e-4)


def test_aot_export_roundtrip():
    """AOT-compile the execute fn, serialize, reload, run — compile-time plan."""
    jax_export = pytest.importorskip("jax.export")
    import jax
    import jax.numpy as jnp

    plan = ft.create_fft(64, np.complex64, cache=False)

    def run(re, im):
        return plan.transform_planar(re, im, Transform.FFT)

    re = jnp.zeros((4, 64), jnp.float32)
    im = jnp.zeros((4, 64), jnp.float32)
    exported = jax_export.export(jax.jit(run))(re, im)
    blob = exported.serialize()
    assert isinstance(blob, (bytes, bytearray))
    reloaded = jax_export.deserialize(blob)

    rng = np.random.default_rng(RNG_SEED)
    x = _rand((4 * 64), rng, np.complex64).reshape(4, 64)
    ore, oim = reloaded.call(
        jnp.asarray(np.real(x)), jnp.asarray(np.imag(x))
    )
    got = np.asarray(ore) + 1j * np.asarray(oim)
    np.testing.assert_allclose(got, np.fft.fft(x, axis=-1), atol=1e-4)
