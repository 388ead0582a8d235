"""The plan interface: plan-then-execute, the TPU-native ``Fft`` trait.

The reference's execution interface is ``trait Fft`` (``fft.rs:40-82``): a plan
object exposing ``size()``, in-place/out-of-place transforms, and fft/ifft
conveniences. In a functional JAX framework "in-place" has no meaning, so the
TPU-native shape of the same contract is: a plan is an **immutable pytree of
precomputed constants** (planar twiddle tables + static stage structure), and
execution is a **pure jit-compiled function** mapping over arbitrary leading
batch dimensions — the capability the reference exposes one transform at a time,
widened to the batched regime TPUs want.

Because this TPU backend has no complex dtype support at all, the canonical
execution API is planar: ``(re, im) = plan.transform_planar(re, im, mode)`` on
real float planes. ``plan.transform(x, mode)`` is the complex-dtype convenience
that splits/recombines at the host/CPU boundary.

Plans are registered pytrees: they pass through ``jax.jit`` / ``jax.vmap`` /
``shard_map`` like any container of arrays; jit caches compiled executables per
plan structure (size/stage layout are static metadata).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.transform import Transform


@functools.partial(jax.jit, static_argnames=("transform",))
def _execute(plan, re, im, transform: Transform):
    return plan._apply(re, im, transform)


# -- autodiff through hardware-kernel plans ---------------------------------
#
# XLA differentiates the pure-jnp families natively (both modes, verified in
# tests/test_autodiff.py), but Mosaic kernels have no AD rules. The FFT is
# LINEAR, so its reverse-mode rule needs no kernel internals: the DFT matrix
# W (W_jk = w^jk) is symmetric, and the transpose of the planar real map
# [[A, -B], [B, A]] of M = A + iB is the map of conj(M) — for W that is the
# UNSCALED inverse matrix. The VJP of a fused-kernel FFT is therefore just
# another fused-kernel call in the transposed mode:
#
#   FFT <-> UNSCALED_IFFT,  SQRT pair <-> each other,  IFFT -> FFT / N.

_TRANSPOSE_MODE = {
    Transform.FFT: (Transform.UNSCALED_IFFT, False),
    Transform.UNSCALED_IFFT: (Transform.FFT, False),
    Transform.IFFT: (Transform.FFT, True),
    Transform.SQRT_SCALED_FFT: (Transform.SQRT_SCALED_IFFT, False),
    Transform.SQRT_SCALED_IFFT: (Transform.SQRT_SCALED_FFT, False),
}


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _execute_linear(plan, re, im, transform: Transform):
    return plan._apply(re, im, transform)


def _execute_linear_fwd(plan, re, im, transform: Transform):
    return _execute_linear(plan, re, im, transform), plan


def _execute_linear_bwd(transform: Transform, plan, ct):
    ctre, ctim = ct
    tmode, scale_1n = _TRANSPOSE_MODE[Transform(transform)]
    gre, gim = plan._apply(ctre, ctim, tmode)
    if scale_1n:
        s = jnp.asarray(1.0 / plan.size).astype(gre.dtype)
        gre, gim = gre * s, gim * s
    # Plan constants (twiddle tables) get zero cotangents: nobody trains
    # twiddles, and nondiff_argnums cannot hold array-valued pytrees.
    zeros = jax.tree_util.tree_map(jnp.zeros_like, plan)
    return zeros, gre, gim


_execute_linear.defvjp(_execute_linear_fwd, _execute_linear_bwd)


@functools.partial(jax.jit, static_argnames=("transform",))
def _execute_opaque(plan, re, im, transform: Transform):
    return _execute_linear(plan, re, im, transform)


class FftPlan:
    """Base class for FFT plans (``trait Fft`` analog, ``fft.rs:40-82``)."""

    size: int
    dtype: np.dtype  # conceptual complex dtype (complex64 / complex128)

    # -- planar execution (the TPU-native path) ---------------------------

    def _apply(self, re, im, transform: Transform):
        raise NotImplementedError

    # Families whose _apply is backend-polymorphic (numpy in -> eager numpy
    # out) opt in; composite plans AND over their sub-plans. Hardware-kernel
    # families (Pallas VPU/MXU) stay False — numpy input there would run the
    # Mosaic interpreter, not the machine.
    _eager_host = False

    @property
    def eager_host_ok(self) -> bool:
        return type(self)._eager_host

    # Families whose _apply XLA cannot differentiate (Mosaic kernels) opt
    # in; transform_planar then routes through the linearity-based custom
    # VJP (_execute_linear) so grad works at full kernel speed. Composite
    # plans OR over their sub-plans.
    _ad_opaque = False

    @property
    def ad_opaque(self) -> bool:
        return type(self)._ad_opaque

    def transform_planar(
        self, re, im, transform: Transform = Transform.FFT
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Apply a transform over the last axis of planar (re, im) planes.

        Shapes (..., size); leading axes are batch dimensions. This is the
        jit-native, TPU-safe path.
        """
        re = jnp.asarray(re)
        im = jnp.asarray(im)
        if re.shape != im.shape:
            raise ValueError(f"re/im shapes differ: {re.shape} vs {im.shape}")
        if re.shape[-1] != self.size:
            raise ValueError(
                f"last axis of input has length {re.shape[-1]}, "
                f"but plan size is {self.size}"
            )
        rt = self.real_dtype
        if re.dtype != rt:
            re = re.astype(rt)
        if im.dtype != rt:
            im = im.astype(rt)
        run = _execute_opaque if self.ad_opaque else _execute
        return run(self, re, im, Transform(transform))

    # -- complex convenience (host/CPU boundary) --------------------------

    def transform(self, x, transform: Transform = Transform.FFT):
        """Out-of-place transform on a complex array (``Fft::transform``,
        ``fft.rs:51-61``).

        Accepts numpy or JAX complex arrays of shape (..., size). The split
        into planar planes happens host-side (numpy) or on a backend with
        complex support (CPU); the compute itself is always planar. Returns
        the same array kind as the input.
        """
        if isinstance(x, jax.Array):
            re, im = jnp.real(x), jnp.imag(x)
            ore, oim = self.transform_planar(re, im, transform)
            return ore + 1j * oim  # requires a complex-capable backend (CPU)
        x = np.asarray(x)
        if not np.issubdtype(x.dtype, np.complexfloating):
            x = x.astype(self.dtype)
        if self.eager_host_ok:
            # Host boundary, polymorphic family: run the eager-numpy path —
            # no trace, no per-(plan, shape) XLA compile. One-shot calls
            # (ft.fft, the scipy.fft backend) cost milliseconds, not a
            # compile; the jit path stays behind transform_planar for
            # device-resident pipelines.
            rt = self.real_dtype
            if x.shape[-1] != self.size:
                raise ValueError(
                    f"last axis of input has length {x.shape[-1]}, "
                    f"but plan size is {self.size}"
                )
            ore, oim = self._apply(
                np.ascontiguousarray(x.real, rt),
                np.ascontiguousarray(x.imag, rt),
                Transform(transform),
            )
            return (np.asarray(ore) + 1j * np.asarray(oim)).astype(self.dtype)
        ore, oim = self.transform_planar(np.real(x), np.imag(x), transform)
        return (np.asarray(ore) + 1j * np.asarray(oim)).astype(self.dtype)

    def __call__(self, x, transform: Transform = Transform.FFT):
        return self.transform(x, transform)

    def fft(self, x):
        """Forward FFT (``fft.rs:74-76``)."""
        return self.transform(x, Transform.FFT)

    def ifft(self, x):
        """Scaled (1/N) inverse FFT (``fft.rs:79-81``)."""
        return self.transform(x, Transform.IFFT)

    def fft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.FFT)

    def ifft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.IFFT)

    # -- metadata ----------------------------------------------------------

    def __len__(self) -> int:
        return self.size

    @property
    def real_dtype(self) -> np.dtype:
        return np.dtype(np.float32 if self.dtype == np.complex64 else np.float64)

    def _scale_for(self, transform: Transform) -> Optional[float]:
        return transform.scale(self.size)
