"""ctypes bindings for the fourier-tpu native host core.

Loads the C ABI (``libfourier_tpu.so``, built by this directory's CMake) and
exposes :class:`NativeFftPlan` with the same plan-then-execute surface as the
JAX plans — used for host-side execution and for differential testing of the
native core against the JAX/oracle paths.
"""

from __future__ import annotations

import ctypes
import fcntl
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_FFI_DIR = Path(__file__).resolve().parent
_BUILD_DIR = _FFI_DIR / "build"

_lib: Optional[ctypes.CDLL] = None


def build_library(force: bool = False) -> Path:
    """Build the native library with CMake/Ninja; returns the .so path.

    Serialised across processes with an flock: parallel test workers
    (pytest-xdist) all call this at import time, and a half-finished
    concurrent build must not make one worker's module-level skip differ
    from the others' (that skew aborts xdist collection outright).
    """
    so = _BUILD_DIR / "libfourier_tpu.so"
    if so.exists() and not force:
        return so
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    lockfile = _BUILD_DIR / ".build.lock"
    with open(lockfile, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if so.exists() and not force:
                return so
            subprocess.run(
                ["cmake", "-B", str(_BUILD_DIR), "-G", "Ninja", str(_FFI_DIR)],
                check=True,
                capture_output=True,
            )
            subprocess.run(
                ["ninja", "-C", str(_BUILD_DIR)], check=True,
                capture_output=True,
            )
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
    return so


def load_library(build_if_missing: bool = True) -> ctypes.CDLL:
    """Load (building if needed) the native library and declare signatures."""
    global _lib
    if _lib is not None:
        return _lib
    so = _BUILD_DIR / "libfourier_tpu.so"
    if not so.exists():
        if not build_if_missing:
            raise FileNotFoundError(f"{so} not built; run build_library()")
        build_library()
    lib = ctypes.CDLL(str(so))
    for suffix, cplx in (("float", np.complex64), ("double", np.complex128)):
        create = getattr(lib, f"fourier_create_{suffix}")
        create.restype = ctypes.c_void_p
        create.argtypes = [ctypes.c_size_t]
        destroy = getattr(lib, f"fourier_destroy_{suffix}")
        destroy.restype = None
        destroy.argtypes = [ctypes.c_void_p]
        tip = getattr(lib, f"fourier_transform_in_place_{suffix}")
        tip.restype = None
        tip.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        top = getattr(lib, f"fourier_transform_{suffix}")
        top.restype = None
        top.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_int]
        size = getattr(lib, f"fourier_size_{suffix}")
        size.restype = ctypes.c_size_t
        size.argtypes = [ctypes.c_void_p]
        tb = getattr(lib, f"fourier_transform_batch_{suffix}")
        tb.restype = None
        tb.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                       ctypes.c_int]
    _lib = lib
    return lib


class NativeFftPlan:
    """RAII wrapper over the C ABI, mirroring the Python FftPlan surface."""

    def __init__(self, size: int, dtype=np.complex64):
        self.dtype = np.dtype(dtype)
        if self.dtype == np.dtype(np.complex64):
            self._suffix = "float"
        elif self.dtype == np.dtype(np.complex128):
            self._suffix = "double"
        else:
            raise ValueError(f"unsupported dtype {dtype}")
        self._lib = load_library()
        self._handle = getattr(self._lib, f"fourier_create_{self._suffix}")(size)
        if not self._handle:
            raise ValueError(f"native plan creation failed for size {size}")
        self.size = size

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            getattr(self._lib, f"fourier_destroy_{self._suffix}")(handle)
            self._handle = None

    def transform(self, x, transform=0) -> np.ndarray:
        """Out-of-place transform of a 1-D complex array."""
        x = np.ascontiguousarray(x, dtype=self.dtype)
        if x.shape != (self.size,):
            raise ValueError(f"expected shape ({self.size},), got {x.shape}")
        out = np.empty_like(x)
        getattr(self._lib, f"fourier_transform_{self._suffix}")(
            self._handle,
            x.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            int(transform),
        )
        return out

    def transform_in_place(self, x, transform=0) -> None:
        """In-place transform of a contiguous 1-D complex array."""
        if not isinstance(x, np.ndarray) or x.dtype != self.dtype:
            raise TypeError(f"need a {self.dtype} ndarray")
        if x.shape != (self.size,) or not x.flags.c_contiguous:
            raise ValueError("need a contiguous array of plan size")
        getattr(self._lib, f"fourier_transform_in_place_{self._suffix}")(
            self._handle, x.ctypes.data_as(ctypes.c_void_p), int(transform)
        )

    def transform_batch_in_place(self, x, transform=0) -> None:
        """In-place transform of every row of a contiguous (batch, n) array.

        One FFI crossing for the whole batch (the C core loops the rows), so
        per-call overhead doesn't pollute batched-regime measurements.
        """
        if not isinstance(x, np.ndarray) or x.dtype != self.dtype:
            raise TypeError(f"need a {self.dtype} ndarray")
        if x.ndim != 2 or x.shape[1] != self.size or not x.flags.c_contiguous:
            raise ValueError(
                f"need a contiguous (batch, {self.size}) array, got {x.shape}"
            )
        getattr(self._lib, f"fourier_transform_batch_{self._suffix}")(
            self._handle, x.ctypes.data_as(ctypes.c_void_p), x.shape[0],
            int(transform),
        )

    def fft(self, x):
        return self.transform(x, 0)

    def ifft(self, x):
        return self.transform(x, 1)
