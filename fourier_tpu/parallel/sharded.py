"""Multi-chip sharded FFTs over a jax.sharding.Mesh.

The reference is strictly single-threaded/single-node (SURVEY.md §2.6: no
parallelism or communication backend exists anywhere in it); this module is the
net-new TPU capability mandated for the rebuild: the "communication backend" is
XLA collectives over ICI, driven by ``shard_map`` — never hand-rolled transport.

Three decompositions:

* **Batch sharding** (:func:`batched_transform`): the many-small-FFT regime.
  Each chip runs whole transforms on its batch shard; zero communication.

* **Four-step large 1-D FFT** (:class:`FourStepPlan`): a transform too large
  (or too latency-critical) for one chip, as N = N1*N2:
  view x[n1*N2+n2] as X[n1, n2] column-sharded; N1-point FFTs along columns
  (local), twiddle by W_N^(k1*n2) (local), **all_to_all transpose over ICI**
  to row-sharded, N2-point FFTs along rows (local). This is the classic
  four-step/six-step algorithm; the transform axis is sharded and rotated
  through the interconnect — the FFT library's "sequence parallelism"
  (SURVEY.md §5, long-context analog).

* **2-D FFT** (:class:`Fft2dPlan`): row FFTs → all_to_all transpose → column
  FFTs, for e.g. the 4096x4096-on-v5e-8 regime (BASELINE.json config 5).

Everything is planar (re, im): no complex dtypes exist on this TPU backend.
All functions are jit-compatible; collectives lower to XLA ``all-to-all`` ops
that ride ICI within a slice.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fourier_tpu.ops import cplx
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.plan.planner import create_fft
from fourier_tpu.transform import Transform


# ---------------------------------------------------------------------------
# Batch sharding (data-parallel over transforms)
# ---------------------------------------------------------------------------


def batched_transform(
    plan: FftPlan,
    re: jnp.ndarray,
    im: jnp.ndarray,
    mesh: Mesh,
    axis: str = "batch",
    transform: Transform = Transform.FFT,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-sharded batched FFT: leading axis split over mesh axis `axis`.

    Communication-free: every device runs `plan` on its local batch shard.
    """
    transform = Transform(transform)

    def local(re_l, im_l):
        return plan._apply(re_l, im_l, transform)

    spec = P(axis, *([None] * (re.ndim - 1)))
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec))
    return fn(re, im)


# ---------------------------------------------------------------------------
# Four-step decomposition: large 1-D FFT sharded along the transform axis
# ---------------------------------------------------------------------------


def _split_twiddle(n1: int, n2: int, forward: bool, real_dtype) -> Tuple[np.ndarray, np.ndarray]:
    """Planar W_N^(±k1*n2) table of shape (n1, n2), computed in f64."""
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    j2 = np.arange(n2, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * (k1 * j2) / float(n1 * n2)
    re = np.cos(theta)
    im = -np.sin(theta) if forward else np.sin(theta)
    return re.astype(real_dtype), im.astype(real_dtype)


class FourStepPlan:
    """Large 1-D FFT of size n1*n2 sharded over a mesh axis.

    Derivation (standard four-step): with n = n1*N2 + n2 and k = k1 + N1*k2,
      X[k1 + N1*k2] = sum_{n2} W_N2^(n2*k2) * [ W_N^(n2*k1)
                        * sum_{n1} x[n1*N2 + n2] * W_N1^(n1*k1) ].
    Step 1 runs column FFTs (local: columns are whole on each device), step 2
    the split twiddle (local), step 3 the all_to_all transpose (the only
    communication), step 4 row FFTs (local).

    Output element k1 + N1*k2 is Y[k1, k2]: "transposed" digit order. With
    ``natural_order=True`` a second all_to_all + local transpose returns the
    flat natural-order spectrum, contiguously sharded.
    """

    def __init__(
        self,
        n1: int,
        n2: int,
        mesh: Mesh,
        axis: str = "fft",
        dtype=np.complex64,
        natural_order: bool = False,
    ):
        self.n1, self.n2 = int(n1), int(n2)
        self.size = self.n1 * self.n2
        self.mesh = mesh
        self.axis = axis
        self.dtype = np.dtype(dtype)
        self.natural_order = natural_order
        nshards = mesh.shape[axis]
        if self.n1 % nshards or self.n2 % nshards:
            raise ValueError(
                f"n1={n1} and n2={n2} must both be divisible by mesh axis "
                f"size {nshards}"
            )
        self.col_plan = create_fft(self.n1, self.dtype)
        self.row_plan = create_fft(self.n2, self.dtype)
        real = self.col_plan.real_dtype
        tf = _split_twiddle(self.n1, self.n2, True, real)
        ti = _split_twiddle(self.n1, self.n2, False, real)
        self.tw_fwd = (jnp.asarray(tf[0]), jnp.asarray(tf[1]))
        self.tw_inv = (jnp.asarray(ti[0]), jnp.asarray(ti[1]))

    def _local_steps(self, re_l, im_l, twr_l, twi_l, transform: Transform):
        forward = transform.is_forward
        # Step 1: N1-point FFTs along axis 0 (batch = local columns).
        # Unscaled in both directions; normalization is applied once, globally.
        mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
        re_t, im_t = re_l.T, im_l.T  # (n2_loc, n1)
        re_t, im_t = self.col_plan._apply(re_t, im_t, mode)
        re_l, im_l = re_t.T, im_t.T  # (n1, n2_loc)
        # Step 2: split twiddle W_N^(±k1*n2) — local shard passed in.
        re_l, im_l = cplx.mul((re_l, im_l), (twr_l, twi_l))
        # Step 3: all_to_all transpose over ICI: (n1, n2_loc) -> (n1_loc, n2).
        re_l = jax.lax.all_to_all(re_l, self.axis, split_axis=0, concat_axis=1, tiled=True)
        im_l = jax.lax.all_to_all(im_l, self.axis, split_axis=0, concat_axis=1, tiled=True)
        # Step 4: N2-point FFTs along axis 1 (rows whole now).
        re_l, im_l = self.row_plan._apply(re_l, im_l, mode)
        # Global normalization.
        scale = transform.scale(self.size)
        if scale is not None:
            s = jnp.asarray(scale, dtype=re_l.dtype)
            re_l, im_l = re_l * s, im_l * s
        if self.natural_order:
            # Y (n1_loc, n2) -> column-sharded Y (n1, n2_loc), then local
            # transpose gives Z = Y^T row-sharded: flat Z is the natural-order
            # spectrum, contiguously sharded over the mesh axis.
            re_l = jax.lax.all_to_all(re_l, self.axis, split_axis=1, concat_axis=0, tiled=True)
            im_l = jax.lax.all_to_all(im_l, self.axis, split_axis=1, concat_axis=0, tiled=True)
            re_l, im_l = re_l.T, im_l.T  # (n2_loc, n1)
            re_l = re_l.reshape(-1)
            im_l = im_l.reshape(-1)
        return re_l, im_l

    def transform_planar(self, re, im, transform: Transform = Transform.FFT):
        """Transform planar input of shape (n1, n2) (= x.reshape(n1, n2)).

        Input must be (or will be) sharded column-wise: P(None, axis).
        Returns (n1, n2) matrix Y with X[k1 + n1*k2] = Y[k1, k2] row-sharded
        when natural_order=False, else the flat (size,) natural-order spectrum.
        """
        transform = Transform(transform)
        in_spec = P(None, self.axis)
        if self.natural_order:
            out_spec = P(self.axis)
        else:
            out_spec = P(self.axis, None)
        fn = shard_map(
            functools.partial(self._local_steps, transform=transform),
            mesh=self.mesh,
            in_specs=(in_spec, in_spec, in_spec, in_spec),
            out_specs=(out_spec, out_spec),
        )
        tw = self.tw_fwd if transform.is_forward else self.tw_inv
        return fn(re, im, tw[0], tw[1])

    def fft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.FFT)

    def ifft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.IFFT)


# ---------------------------------------------------------------------------
# 2-D FFT sharded across chips (BASELINE.json config 5)
# ---------------------------------------------------------------------------


class Fft2dPlan:
    """2-D c2c FFT of shape (n1, n2), row-sharded over a mesh axis.

    Row FFTs (local) → all_to_all transpose over ICI → column FFTs (local).
    With ``transposed_output=True`` (default False) the result is left in
    transposed layout (n2, n1) row-sharded, saving the second all_to_all —
    the standard trick when a pointwise filter + inverse FFT follows (the
    inverse then runs with the roles of the two axes swapped).
    """

    def __init__(
        self,
        n1: int,
        n2: int,
        mesh: Mesh,
        axis: str = "fft",
        dtype=np.complex64,
        transposed_output: bool = False,
    ):
        self.n1, self.n2 = int(n1), int(n2)
        self.mesh = mesh
        self.axis = axis
        self.dtype = np.dtype(dtype)
        self.transposed_output = transposed_output
        nshards = mesh.shape[axis]
        if self.n1 % nshards or self.n2 % nshards:
            raise ValueError(
                f"n1={n1} and n2={n2} must both be divisible by mesh axis "
                f"size {nshards}"
            )
        self.row_plan = create_fft(self.n2, self.dtype)
        self.col_plan = create_fft(self.n1, self.dtype)

    def _local_steps(self, re_l, im_l, transform: Transform):
        forward = transform.is_forward
        mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
        # Row FFTs: (n1_loc, n2), transform along the last axis.
        re_l, im_l = self.row_plan._apply(re_l, im_l, mode)
        # Transpose over ICI: (n1_loc, n2) -> (n1, n2_loc) -> local T (n2_loc, n1).
        re_l = jax.lax.all_to_all(re_l, self.axis, split_axis=1, concat_axis=0, tiled=True)
        im_l = jax.lax.all_to_all(im_l, self.axis, split_axis=1, concat_axis=0, tiled=True)
        re_l, im_l = re_l.T, im_l.T
        # Column FFTs (now rows of the transposed layout).
        re_l, im_l = self.col_plan._apply(re_l, im_l, mode)
        scale = transform.scale(self.n1 * self.n2)
        if scale is not None:
            s = jnp.asarray(scale, dtype=re_l.dtype)
            re_l, im_l = re_l * s, im_l * s
        if not self.transposed_output:
            # Back to natural (n1_loc, n2) layout: local T + all_to_all.
            re_l, im_l = re_l.T, im_l.T  # (n1, n2_loc)
            re_l = jax.lax.all_to_all(re_l, self.axis, split_axis=0, concat_axis=1, tiled=True)
            im_l = jax.lax.all_to_all(im_l, self.axis, split_axis=0, concat_axis=1, tiled=True)
        return re_l, im_l

    def transform_planar(self, re, im, transform: Transform = Transform.FFT):
        """2-D transform of planar (n1, n2) input, row-sharded: P(axis, None)."""
        transform = Transform(transform)
        spec = P(self.axis, None)
        fn = shard_map(
            functools.partial(self._local_steps, transform=transform),
            mesh=self.mesh,
            in_specs=(spec, spec),
            out_specs=(spec, spec),
        )
        return fn(re, im)

    def fft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.FFT)

    def ifft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.IFFT)
