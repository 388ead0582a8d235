"""Native C/C++ core differential tests (ctypes over the C ABI).

The FFI analog of the reference's ctest suite (fourier-ffi/test.c, test.cpp),
plus cross-checks of the native core against the Python oracle and the JAX
Stockham path — the native and JAX implementations must agree on every size
family and mode.
"""

import shutil
import subprocess

import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu import Transform
from fourier_tpu.utils import oracle_transform

ffi = pytest.importorskip("fourier_tpu.ffi")

if shutil.which("cmake") is None or shutil.which("ninja") is None:
    pytest.skip("cmake/ninja unavailable", allow_module_level=True)

try:
    ffi.load_library()
except (subprocess.CalledProcessError, OSError) as e:  # pragma: no cover
    pytest.skip(f"native library build failed: {e}", allow_module_level=True)

RNG_SEED = 0xC0FFEE


def _rand(n, rng, dtype=np.complex128):
    return ((rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(dtype)


@pytest.mark.parametrize("n", [1, 2, 4, 24, 64, 73, 100, 243, 1013])
@pytest.mark.parametrize("dtype,tol", [(np.complex64, 1e-4), (np.complex128, 1e-10)])
def test_native_vs_oracle(n, dtype, tol):
    rng = np.random.default_rng(RNG_SEED + n)
    plan = ffi.NativeFftPlan(n, dtype)
    x = _rand(n, rng, dtype)
    got = plan.fft(x)
    want = oracle_transform(x, Transform.FFT)
    assert np.max(np.abs(got - want)) < tol * max(1.0, np.max(np.abs(want)))
    goti = plan.ifft(x)
    wanti = oracle_transform(x, Transform.IFFT)
    assert np.max(np.abs(goti - wanti)) < tol


@pytest.mark.parametrize("mode", list(Transform))
def test_native_modes(mode):
    rng = np.random.default_rng(RNG_SEED)
    n = 96
    plan = ffi.NativeFftPlan(n, np.complex128)
    x = _rand(n, rng)
    got = plan.transform(x, int(mode))
    want = oracle_transform(x, mode)
    assert np.max(np.abs(got - want)) < 1e-10 * max(1.0, np.max(np.abs(want)))


def test_native_matches_jax_path():
    rng = np.random.default_rng(RNG_SEED)
    for n in (64, 73, 100):
        native = ffi.NativeFftPlan(n, np.complex64)
        jplan = ft.create_fft(n, np.complex64, backend="stockham")
        x = _rand(n, rng, np.complex64)
        np.testing.assert_allclose(
            native.fft(x), np.asarray(jplan.fft(x)), atol=1e-4
        )


def test_native_in_place():
    rng = np.random.default_rng(RNG_SEED)
    n = 48
    plan = ffi.NativeFftPlan(n, np.complex128)
    x = _rand(n, rng)
    buf = x.copy()
    plan.transform_in_place(buf, int(Transform.FFT))
    np.testing.assert_allclose(buf, np.fft.fft(x), atol=1e-10)


def test_native_batch_in_place():
    """Batched C ABI entry: one crossing transforms every row of (batch, n)."""
    rng = np.random.default_rng(RNG_SEED)
    for dtype, tol in ((np.complex64, 1e-4), (np.complex128, 1e-10)):
        n = 96
        plan = ffi.NativeFftPlan(n, dtype)
        x = np.ascontiguousarray(_rand(7 * n, rng, dtype).reshape(7, n))
        buf = x.copy()
        plan.transform_batch_in_place(buf, int(Transform.FFT))
        np.testing.assert_allclose(buf, np.fft.fft(x, axis=-1), atol=tol)
        plan.transform_batch_in_place(buf, int(Transform.IFFT))
        np.testing.assert_allclose(buf, x, atol=tol)
    with pytest.raises(ValueError):
        plan.transform_batch_in_place(buf[:, :50], int(Transform.FFT))


def test_native_errors():
    with pytest.raises(ValueError):
        ffi.NativeFftPlan(0)
    plan = ffi.NativeFftPlan(8)
    with pytest.raises(ValueError):
        plan.fft(np.zeros(9, np.complex64))


def test_plan_parity_native_vs_python():
    """The C++ planner and Python planner agree on schedule + tables.

    Runs the same checker the ctest `plan_parity` gate uses, over sizes
    {64, 73, 100, 243, 1013} x {f32, f64} (every plan family).
    """
    import os
    import sys

    ffi.build_library()
    dump_bin = ffi._BUILD_DIR / "dump_plan"
    if not dump_bin.exists():
        subprocess.run(
            ["ninja", "-C", str(ffi._BUILD_DIR), "dump_plan"],
            check=True,
            capture_output=True,
        )
    checker = ffi._FFI_DIR / "tests" / "check_plan_parity.py"
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        str(ffi._FFI_DIR.parent.parent) + os.pathsep + env.get("PYTHONPATH", "")
    )
    result = subprocess.run(
        [sys.executable, str(checker), str(dump_bin)],
        capture_output=True,
        text=True,
        env=env,
    )
    assert result.returncode == 0, result.stdout + result.stderr


def test_ctest_suite_passes():
    """Run the native ctest suite (C + C++, static + shared)."""
    build_dir = ffi._BUILD_DIR
    result = subprocess.run(
        ["ctest", "--output-on-failure"],
        cwd=build_dir,
        capture_output=True,
        text=True,
    )
    assert result.returncode == 0, result.stdout + result.stderr
