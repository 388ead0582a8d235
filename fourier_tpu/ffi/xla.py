"""XLA-runtime-hosted execution of the native C++ core.

Registers the native planner/executor (``src/xla_ffi.cpp``, built as
``libfourier_tpu_xla.so``) as XLA FFI custom-call targets and exposes
:func:`native_fft`, a jit-compatible function whose body executes *inside*
the XLA runtime — the PJRT-hosted half of the FFI design scoped in
SURVEY.md §2.6.  The standalone C ABI (``__init__.py`` / ``capi.cpp``)
mirrors the reference's cdylib (``fourier-ffi/src/lib.rs``); this module is
the second half: the same native core reachable from traced JAX programs,
composing with ``jit``/``vmap`` and fusing into larger XLA computations.

CPU-platform only by construction: complex dtypes do not exist on the TPU
device here (CLAUDE.md), and the native core is a host-side scalar/ILP
implementation.  On TPU, the Pallas/XLA plan families are the fast path;
this target exists for host execution, differential testing, and parity
with the reference's "call Fourier from a compiled runtime" story.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from . import build_library, _BUILD_DIR

_HANDLERS = {
    np.complex64: "fourier_tpu_xla_fft_c64",
    np.complex128: "fourier_tpu_xla_fft_c128",
}

_registered = False
_xla_lib: Optional[ctypes.CDLL] = None


def _load_xla_library() -> ctypes.CDLL:
    """Load (building if needed) the XLA-handler shared library."""
    global _xla_lib
    if _xla_lib is not None:
        return _xla_lib
    so = _BUILD_DIR / "libfourier_tpu_xla.so"
    if not so.exists():
        build_library()  # configure+ninja builds every target, incl. this one
    if not so.exists():
        raise FileNotFoundError(
            f"{so} missing: XLA FFI headers were not found at CMake configure "
            "time (jax.ffi.include_dir())"
        )
    _xla_lib = ctypes.CDLL(str(so))
    return _xla_lib


def register(platform: str = "cpu") -> None:
    """Register both dtype handlers with XLA (idempotent)."""
    global _registered
    if _registered:
        return
    import jax.ffi

    lib = _load_xla_library()
    for name in _HANDLERS.values():
        sym = getattr(lib, name)
        jax.ffi.register_ffi_target(
            name, jax.ffi.pycapsule(sym), platform=platform
        )
    _registered = True


def native_fft(x, transform) -> "jax.Array":
    """FFT of ``x`` along the last axis, executed by the native C++ core
    inside the XLA runtime.

    ``x`` must be complex64/complex128 (rank >= 1; leading axes are batch).
    ``transform`` is a :class:`fourier_tpu.Transform` (or its int ABI code
    0-4).  Jit-compatible: lowers to an XLA custom call on the host
    platform.  Matches the semantics of ``NativeFftPlan.transform``
    (``__init__.py``) and the JAX plans' 5-mode contract
    (reference fourier/src/fft.rs:5-82).
    """
    import jax
    import jax.numpy as jnp

    register()
    x = jnp.asarray(x)
    if x.dtype not in (jnp.complex64, jnp.complex128):
        raise TypeError(f"native_fft requires complex input, got {x.dtype}")
    name = _HANDLERS[np.complex64 if x.dtype == jnp.complex64 else np.complex128]
    code = int(getattr(transform, "value", transform))
    if not 0 <= code <= 4:
        raise ValueError(f"transform code {code} outside [0, 4]")
    call = jax.ffi.ffi_call(
        name,
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        vmap_method="expand_dims",
    )
    return call(x, transform=np.int32(code))
