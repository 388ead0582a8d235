"""XLA-runtime-hosted native core: handlers registered via jax.ffi.

Covers the PJRT-hosted half of SURVEY.md §2.6's FFI scope: the native C++
planner/executor (ffi/src/xla_ffi.cpp) invoked as an XLA custom call from
inside jitted JAX programs — composition with jit/vmap, both dtypes, all
five Transform modes, batch semantics, and error containment.  Complements
test_ffi.py (the standalone C ABI, mirroring the reference's cdylib tests,
fourier-ffi/test.c).
"""

import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourier_tpu import Transform

if shutil.which("cmake") is None or shutil.which("ninja") is None:
    pytest.skip("cmake/ninja unavailable", allow_module_level=True)

xla_ffi = pytest.importorskip("fourier_tpu.ffi.xla")

try:
    xla_ffi.register()
except (subprocess.CalledProcessError, OSError, FileNotFoundError) as e:
    pytest.skip(f"XLA handler library unavailable: {e}", allow_module_level=True)

RNG = np.random.default_rng(0x5EED)


def _rand(shape, dtype):
    x = RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)
    return x.astype(dtype)


@pytest.mark.parametrize("n", [1, 4, 24, 64, 73, 100, 243, 1013])
@pytest.mark.parametrize(
    "dtype,tol", [(np.complex64, 1e-4), (np.complex128, 1e-12)]
)
def test_forward_vs_numpy(n, dtype, tol):
    x = _rand((5, n), dtype)
    y = np.asarray(xla_ffi.native_fft(x, Transform.FFT))
    ref = np.fft.fft(x, axis=-1)
    assert y.dtype == dtype
    assert np.linalg.norm(y - ref) <= tol * np.linalg.norm(ref)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_all_modes_roundtrip(dtype):
    n = 96
    x = _rand((n,), dtype)
    fft = lambda t: lambda a: xla_ffi.native_fft(a, t)  # noqa: E731
    tol = 1e-4 if dtype == np.complex64 else 1e-12
    nrm = np.linalg.norm(x)
    # FFT∘IFFT, SQRT_SCALED fwd∘inv, UNSCALED fwd∘inv (needs /n) all identity
    rt = np.asarray(fft(Transform.IFFT)(fft(Transform.FFT)(x)))
    assert np.linalg.norm(rt - x) <= tol * nrm
    rt = np.asarray(
        fft(Transform.SQRT_SCALED_IFFT)(fft(Transform.SQRT_SCALED_FFT)(x))
    )
    assert np.linalg.norm(rt - x) <= tol * nrm
    # UNSCALED_IFFT == n * IFFT
    a = np.asarray(fft(Transform.UNSCALED_IFFT)(x))
    b = np.asarray(fft(Transform.IFFT)(x)) * n
    assert np.linalg.norm(a - b) <= tol * np.linalg.norm(b)


def test_inside_jit_composes():
    x = _rand((4, 128), np.complex64)

    @jax.jit
    def f(a):
        y = xla_ffi.native_fft(a * 2.0, Transform.FFT)
        return jnp.abs(y).sum()

    ref = np.abs(np.fft.fft(2.0 * x, axis=-1)).sum()
    assert float(f(x)) == pytest.approx(float(ref), rel=1e-5)


def test_vmap_batches():
    x = _rand((6, 3, 64), np.complex64)
    f = jax.vmap(lambda a: xla_ffi.native_fft(a, Transform.FFT))
    y = np.asarray(f(x))
    ref = np.fft.fft(x, axis=-1)
    assert np.linalg.norm(y - ref) <= 1e-4 * np.linalg.norm(ref)


def test_agrees_with_jax_plan():
    import fourier_tpu as ft

    n = 360
    x = _rand((n,), np.complex64)
    plan = ft.create_fft_f32(n)
    a = np.asarray(plan(x))
    b = np.asarray(xla_ffi.native_fft(x, Transform.FFT))
    assert np.linalg.norm(a - b) <= 1e-4 * np.linalg.norm(b)


def test_rejects_bad_inputs():
    with pytest.raises(TypeError):
        xla_ffi.native_fft(np.ones((4,), np.float32), Transform.FFT)
    with pytest.raises(ValueError):
        xla_ffi.native_fft(np.ones((4,), np.complex64), 7)
