"""Multi-chip sharded FFTs over a jax.sharding.Mesh.

The reference is strictly single-threaded/single-node (SURVEY.md §2.6: no
parallelism or communication backend exists anywhere in it); this module is the
net-new TPU capability mandated for the rebuild: the "communication backend" is
XLA collectives over ICI, driven by ``shard_map`` — never hand-rolled transport.

Four decompositions:

* **Batch sharding** (:func:`batched_transform` / :func:`batched_transform_dd`):
  the many-small-FFT regime. Each chip runs whole transforms on its batch
  shard; zero communication.

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

* **3-D FFT** (:class:`Fft3dPlan`): pencil decomposition over a **2-D mesh**
  (slab over a 1-D mesh) — per-axis local FFTs threaded through per-mesh-axis
  all_to_alls, with a ``spectral_output``/``from_spectral`` layout contract
  that halves the collective count of a filter-in-spectral-space roundtrip.

* **Real-input 3-D FFT** (:class:`Rfft3dPlan`): the pseudospectral-solver
  kernel — r2c along the pencils first, so every collective and c2c leg
  runs on the halved one-sided spectrum (padded to shard evenly); same
  spectral-layout contract as :class:`Fft3dPlan`.

* **Real-input 2-D FFT** (:class:`Rfft2dPlan`): the r2c twin of
  :class:`Fft2dPlan` — half the transpose bytes, with a
  ``transposed_output``/``from_transposed`` contract that drops the
  restoring collectives of a filter roundtrip.

Both sharded plan classes are first-class plans: registered pytrees with the
``FftPlan`` convenience surface (complex ``transform``/``fft``/``ifft``),
arbitrary leading batch dimensions, save/load support
(:mod:`fourier_tpu.plan.serialize`), and both planar representations — 2-plane
(re, im) for c64 and native-f64 c128, 4-plane (re_hi, re_lo, im_hi, im_lo)
for double-word c128 on f32-only hardware (the reference's f64 support is
unconditional across its surface, ``fourier/src/lib.rs:49-60``; so is ours).

**Communication/compute overlap** (``pipeline_chunks > 1``): the local FFTs
feeding the transpose are split into chunks, and each chunk's ``all_to_all``
is issued as soon as that chunk's FFT finishes, so the collective for chunk i
rides ICI while chunk i+1 is still computing. XLA emits async collective
start/done pairs on TPU and overlaps them with independent compute; the
chunked form is bitwise-equivalent to the monolithic transpose (an interleave
reassembly restores the device-major layout). Everything is jit-compatible;
collectives lower to XLA ``all-to-all`` ops that ride ICI within a slice.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

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
# Plane algebra: polymorphic over the two planar representations.
# 2 planes = (re, im); 4 planes = (re_hi, re_lo, im_hi, im_lo) double-word.
# ---------------------------------------------------------------------------


def _is_dd_plan(plan) -> bool:
    """4-plane double-word plan (c128 on f32-only hardware)?"""
    return not hasattr(plan, "_apply")


def _apply_plan(plan, planes: Tuple, mode: Transform) -> Tuple:
    """Run a 1-D plan over the last axis of a plane tuple."""
    if len(planes) == 4:
        (rh, rl), (ih, il) = plan._apply_dd(
            ((planes[0], planes[1]), (planes[2], planes[3])), mode
        )
        return (rh, rl, ih, il)
    return tuple(plan._apply(planes[0], planes[1], mode))


def _cmul(planes: Tuple, tw: Tuple) -> Tuple:
    """Pointwise complex multiply by a twiddle table (same plane count)."""
    if len(planes) == 4:
        from fourier_tpu.precision import ddcplx

        (rh, rl), (ih, il) = ddcplx.mul(
            ((planes[0], planes[1]), (planes[2], planes[3])),
            ((tw[0], tw[1]), (tw[2], tw[3])),
        )
        return (rh, rl, ih, il)
    return tuple(cplx.mul((planes[0], planes[1]), (tw[0], tw[1])))


def _scale_planes(planes: Tuple, scale: Optional[float]) -> Tuple:
    if scale is None:
        return planes
    if len(planes) == 4:
        from fourier_tpu.precision import ddcplx

        (rh, rl), (ih, il) = ddcplx.scale(
            ((planes[0], planes[1]), (planes[2], planes[3])), scale
        )
        return (rh, rl, ih, il)
    s = jnp.asarray(scale, dtype=planes[0].dtype)
    return tuple(p * s for p in planes)


def _split_complex(x, nplanes: int, real_dtype) -> Tuple[np.ndarray, ...]:
    """Host-side complex -> plane tuple."""
    if nplanes == 4:
        from fourier_tpu.precision import ddreal as dd

        x = np.asarray(x, dtype=np.complex128)
        rh, rl = dd.from_f64(x.real)
        ih, il = dd.from_f64(x.imag)
        return rh, rl, ih, il
    x = np.asarray(x)
    return (np.real(x).astype(real_dtype), np.imag(x).astype(real_dtype))


def _join_complex(planes: Tuple, dtype) -> np.ndarray:
    """Plane tuple -> host-side complex."""
    if len(planes) == 4:
        from fourier_tpu.precision import ddreal as dd

        return dd.to_f64((np.asarray(planes[0]), np.asarray(planes[1]))) + (
            1j * dd.to_f64((np.asarray(planes[2]), np.asarray(planes[3])))
        )
    return (np.asarray(planes[0]) + 1j * np.asarray(planes[1])).astype(dtype)


def _a2a(p, axis_name: str, split_axis: int, concat_axis: int):
    return jax.lax.all_to_all(
        p, axis_name, split_axis=split_axis, concat_axis=concat_axis, tiled=True
    )


def _chunked_leg(planes: Tuple, fft_fn, axis_name: str, split_axis: int,
                 concat_axis: int, chunk_axis: int, chunks: int) -> Tuple:
    """Local FFTs + all_to_all with comm/compute overlap.

    The pencil pipelines chunk along an axis UNINVOLVED in the transpose
    (unlike Fft2dPlan's row case), so chunk c's collective rides ICI while
    chunk c+1's FFTs compute and reassembly is a plain concatenate — the
    chunked form is value-identical to the monolithic leg. Falls back to
    monolithic when the chunk axis extent is not divisible (per-leg extents
    differ in a 3-D pipeline; a hard error would forbid valid geometries).
    """
    extent = planes[0].shape[chunk_axis]
    if chunks <= 1 or extent % chunks:
        planes = fft_fn(planes)
        return tuple(
            _a2a(p, axis_name, split_axis, concat_axis) for p in planes
        )
    h = extent // chunks
    sent = []
    for c in range(chunks):
        chunk = tuple(
            jax.lax.slice_in_dim(p, c * h, (c + 1) * h, axis=chunk_axis)
            for p in planes
        )
        chunk = fft_fn(chunk)
        sent.append(
            tuple(_a2a(p, axis_name, split_axis, concat_axis) for p in chunk)
        )
    # fft_fn may change the plane count (r2c: 1 real plane in, 2 out) —
    # reassemble by the OUTPUT plane count.
    return tuple(
        jnp.concatenate([s[i] for s in sent], axis=chunk_axis)
        for i in range(len(sent[0]))
    )


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


def batched_transform_dd(
    plan,
    re_hi,
    re_lo,
    im_hi,
    im_lo,
    mesh: Mesh,
    axis: str = "batch",
    transform: Transform = Transform.FFT,
) -> Tuple:
    """Batch-sharded c128 FFT over 4-plane double-word data.

    The dd twin of :func:`batched_transform` (``plan`` is a
    :class:`~fourier_tpu.precision.DdFftPlan`); leading axis split over mesh
    axis `axis`, zero communication.
    """
    transform = Transform(transform)

    def local(planes):
        return _apply_plan(plan, planes, transform)

    spec = P(axis, *([None] * (re_hi.ndim - 1)))
    fn = shard_map(
        local, mesh=mesh, in_specs=((spec,) * 4,), out_specs=(spec,) * 4
    )
    return fn((re_hi, re_lo, im_hi, im_lo))


def batched_rfft(
    plan, x: jnp.ndarray, mesh: Mesh, axis: str = "batch"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-sharded real-input FFT: leading axis split over mesh axis
    ``axis``; every device runs the :class:`~fourier_tpu.rfft.RfftPlan` on
    its local shard (zero communication). Returns planar (re, im) one-sided
    spectra."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    fn = shard_map(
        plan.rfft_planar, mesh=mesh, in_specs=(spec,), out_specs=(spec, spec)
    )
    return fn(x)


def batched_irfft(
    plan, re: jnp.ndarray, im: jnp.ndarray, mesh: Mesh, axis: str = "batch"
) -> jnp.ndarray:
    """Inverse of :func:`batched_rfft` (planar one-sided spectrum in, real
    signal out), batch-sharded and communication-free."""
    spec = P(axis, *([None] * (re.ndim - 1)))
    fn = shard_map(
        plan.irfft_planar, mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )
    return fn(re, im)


def batched_rfft_dd(
    plan, xh, xl, mesh: Mesh, axis: str = "batch"
) -> Tuple:
    """Batch-sharded c128 (double-word) real-input FFT: two input limb
    planes, four output planes (re_hi, re_lo, im_hi, im_lo)."""
    spec = P(axis, *([None] * (xh.ndim - 1)))
    fn = shard_map(
        plan.rfft_planar_dd, mesh=mesh, in_specs=(spec, spec),
        out_specs=(spec,) * 4,
    )
    return fn(xh, xl)


def batched_irfft_dd(
    plan, reh, rel, imh, iml, mesh: Mesh, axis: str = "batch"
) -> Tuple:
    """Inverse of :func:`batched_rfft_dd`: four spectrum planes in, two
    real limb planes out."""
    spec = P(axis, *([None] * (reh.ndim - 1)))
    fn = shard_map(
        plan.irfft_planar_dd, mesh=mesh, in_specs=(spec,) * 4,
        out_specs=(spec,) * 2,
    )
    return fn(reh, rel, imh, iml)


# ---------------------------------------------------------------------------
# Shared machinery for the sharded plan classes
# ---------------------------------------------------------------------------


class _ShardedPlanBase:
    """Common surface of the sharded plans (``FftPlan``-style conveniences)."""

    n1: int
    n2: int
    size: int
    mesh: Mesh
    axis: str
    dtype: np.dtype
    pipeline_chunks: int

    @property
    def real_dtype(self) -> np.dtype:
        return np.dtype(np.float32 if self.dtype == np.complex64 else np.float64)

    @property
    def is_dd(self) -> bool:
        return _is_dd_plan(self.col_plan)

    @property
    def nplanes(self) -> int:
        return 4 if self.is_dd else 2

    @property
    def nshards(self) -> int:
        return self.mesh.shape[self.axis]

    def __len__(self) -> int:
        return self.size

    def _make_subplans(self):
        self.col_plan = create_fft(self.n1, self.dtype, backend=self.backend)
        self.row_plan = create_fft(self.n2, self.dtype, backend=self.backend)

    def _check_geometry(self, pipeline_major: int):
        nshards = self.nshards
        if self.n1 % nshards or self.n2 % nshards:
            raise ValueError(
                f"n1={self.n1} and n2={self.n2} must both be divisible by "
                f"mesh axis size {nshards}"
            )
        c = self.pipeline_chunks
        if c < 1:
            raise ValueError(f"pipeline_chunks must be >= 1, got {c}")
        if c > 1 and (pipeline_major // nshards) % c:
            raise ValueError(
                f"pipeline_chunks={c} must divide the local shard extent "
                f"{pipeline_major // nshards}"
            )

    # The per-plane local twiddle split table for dd / native dtypes.
    def _pack_table(self, re64: np.ndarray, im64: np.ndarray) -> Tuple:
        if self.is_dd:
            from fourier_tpu.precision import ddreal as dd

            rh, rl = dd.from_f64(re64)
            ih, il = dd.from_f64(im64)
            return tuple(jnp.asarray(p) for p in (rh, rl, ih, il))
        rt = self.real_dtype
        return (jnp.asarray(re64.astype(rt)), jnp.asarray(im64.astype(rt)))

    # -- complex convenience over the planar APIs --------------------------

    def _planar_dispatch(self, planes: Tuple, transform: Transform) -> Tuple:
        raise NotImplementedError

    def transform_planar(self, re, im, transform: Transform = Transform.FFT):
        """2-plane planar transform (c64 / native-f64 c128)."""
        if self.is_dd:
            raise TypeError(
                "this plan uses the 4-plane double-word c128 representation; "
                "call transform_planar_dd(re_hi, re_lo, im_hi, im_lo)"
            )
        return self._planar_dispatch((re, im), Transform(transform))

    def transform_planar_dd(self, re_hi, re_lo, im_hi, im_lo,
                            transform: Transform = Transform.FFT):
        """4-plane dd planar transform (c128 on f32-only hardware)."""
        if not self.is_dd:
            raise TypeError(
                "this plan uses 2-plane planar data; call transform_planar"
            )
        return self._planar_dispatch(
            (re_hi, re_lo, im_hi, im_lo), Transform(transform)
        )

    def fft_planar(self, *planes):
        return self._planar_dispatch(planes, Transform.FFT)

    def ifft_planar(self, *planes):
        return self._planar_dispatch(planes, Transform.IFFT)

    def fft(self, x):
        return self.transform(x, Transform.FFT)

    def ifft(self, x):
        return self.transform(x, Transform.IFFT)

    def __call__(self, x, transform: Transform = Transform.FFT):
        return self.transform(x, transform)


# ---------------------------------------------------------------------------
# Four-step decomposition: large 1-D FFT sharded along the transform axis
# ---------------------------------------------------------------------------


def _split_twiddle(n1: int, n2: int, forward: bool) -> Tuple[np.ndarray, np.ndarray]:
    """f64 planar W_N^(±k1*n2) table of shape (n1, n2), plan-time numpy."""
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    j2 = np.arange(n2, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * (k1 * j2) / float(n1 * n2)
    re = np.cos(theta)
    im = -np.sin(theta) if forward else np.sin(theta)
    return re, im


class FourStepPlan(_ShardedPlanBase):
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

    Planar input has shape (..., n1, n2) — leading axes are (replicated)
    batch dims; the complex convenience ``transform(x)`` takes the flat
    (..., n1*n2) signal. ``pipeline_chunks=C`` overlaps the transpose with
    the column FFTs in C chunks (identical results).
    """

    def __init__(
        self,
        n1: int,
        n2: int,
        mesh: Mesh,
        axis: str = "fft",
        dtype=np.complex64,
        natural_order: bool = False,
        pipeline_chunks: int = 1,
        backend: str = "auto",
    ):
        self.n1, self.n2 = int(n1), int(n2)
        self.size = self.n1 * self.n2
        self.mesh = mesh
        self.axis = axis
        self.dtype = np.dtype(dtype)
        self.natural_order = bool(natural_order)
        self.pipeline_chunks = int(pipeline_chunks)
        self.backend = backend
        self._make_subplans()
        self._check_geometry(pipeline_major=self.n2)
        tf = _split_twiddle(self.n1, self.n2, True)
        ti = _split_twiddle(self.n1, self.n2, False)
        self.tw_fwd = self._pack_table(*tf)
        self.tw_inv = self._pack_table(*ti)

    # -- local (per-shard) computation -------------------------------------

    def _col_fft_twiddle(self, planes: Tuple, tw: Tuple, mode: Transform):
        """Step 1 + 2 on (..., n1, cols): column FFTs then split twiddle."""
        planes = tuple(jnp.swapaxes(p, -1, -2) for p in planes)
        planes = _apply_plan(self.col_plan, planes, mode)
        planes = tuple(jnp.swapaxes(p, -1, -2) for p in planes)
        return _cmul(planes, tw)

    def _fft_twiddle_transpose(self, planes: Tuple, tw: Tuple, mode: Transform):
        """Steps 1-3, optionally chunked so all_to_all overlaps compute.

        Input (..., n1, n2_loc) column-sharded; output (..., n1_loc, n2)
        row-sharded — identical to the monolithic path for any chunking.
        """
        nb = planes[0].ndim - 2
        chunks = self.pipeline_chunks
        n2_loc = planes[0].shape[-1]
        if chunks <= 1 or n2_loc % chunks:
            planes = self._col_fft_twiddle(planes, tw, mode)
            return tuple(_a2a(p, self.axis, nb, nb + 1) for p in planes)
        w = n2_loc // chunks
        sent = []
        for c in range(chunks):
            sl = slice(c * w, (c + 1) * w)
            chunk = tuple(p[..., :, sl] for p in planes)
            twc = tuple(t[:, sl] for t in tw)
            chunk = self._col_fft_twiddle(chunk, twc, mode)
            # Issue this chunk's collective immediately: on TPU it runs
            # async over ICI while the next chunk's FFT computes.
            sent.append(tuple(_a2a(p, self.axis, nb, nb + 1) for p in chunk))
        # Interleave reassembly: chunk results are device-major along the
        # last axis ([dev d: cols c*w..(c+1)*w]); the monolithic layout is
        # [dev d: all n2_loc cols], i.e. (S, C, w) ordering.
        out = []
        nshards = self.nshards
        for i in range(len(planes)):
            rs = [
                s[i].reshape(*s[i].shape[:-1], nshards, w) for s in sent
            ]
            stacked = jnp.stack(rs, axis=-2)  # (..., n1_loc, S, C, w)
            out.append(stacked.reshape(*stacked.shape[:-3], nshards * chunks * w))
        return tuple(out)

    def _local_steps(self, planes: Tuple, tw: Tuple, transform: Transform):
        forward = transform.is_forward
        # Per-shard passes are unscaled; normalization applied once, globally.
        mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
        nb = planes[0].ndim - 2
        # Steps 1-3: column FFTs + twiddle + all_to_all transpose over ICI.
        planes = self._fft_twiddle_transpose(planes, tw, mode)
        # Step 4: N2-point FFTs along the last axis (rows whole now).
        planes = _apply_plan(self.row_plan, planes, mode)
        planes = _scale_planes(planes, transform.scale(self.size))
        if self.natural_order:
            # Y (..., n1_loc, n2) -> column-sharded Y (..., n1, n2_loc), then
            # local transpose gives Z = Y^T row-sharded: flat Z is the
            # natural-order spectrum, contiguously sharded over the mesh axis.
            planes = tuple(_a2a(p, self.axis, nb + 1, nb) for p in planes)
            planes = tuple(jnp.swapaxes(p, -1, -2) for p in planes)
            planes = tuple(p.reshape(*p.shape[:-2], -1) for p in planes)
        return planes

    def _planar_dispatch(self, planes: Tuple, transform: Transform):
        xp_planes = tuple(jnp.asarray(p) for p in planes)
        if xp_planes[0].shape[-2:] != (self.n1, self.n2):
            raise ValueError(
                f"trailing axes {xp_planes[0].shape[-2:]} do not match plan "
                f"matrix shape ({self.n1}, {self.n2})"
            )
        nb = xp_planes[0].ndim - 2
        bspec = (None,) * nb
        in_spec = P(*bspec, None, self.axis)
        tw_spec = P(None, self.axis)
        if self.natural_order:
            out_spec = P(*bspec, self.axis)
        else:
            out_spec = P(*bspec, self.axis, None)
        np_ = len(xp_planes)
        fn = shard_map(
            functools.partial(self._local_steps, transform=transform),
            mesh=self.mesh,
            in_specs=((in_spec,) * np_, (tw_spec,) * np_),
            out_specs=(out_spec,) * np_,
        )
        tw = self.tw_fwd if transform.is_forward else self.tw_inv
        return fn(xp_planes, tw)

    # -- complex convenience ------------------------------------------------

    def transform(self, x, transform: Transform = Transform.FFT):
        """Out-of-place transform of the flat (..., n1*n2) complex signal.

        Returns the flat natural-order spectrum when ``natural_order=True``,
        else the (..., n1, n2) digit-order matrix Y[k1, k2] = X[k1 + n1*k2].
        """
        transform = Transform(transform)
        x = np.asarray(x)
        if x.shape[-1] != self.size:
            raise ValueError(
                f"last axis {x.shape[-1]} != plan size {self.size}"
            )
        planes = _split_complex(x, self.nplanes, self.real_dtype)
        planes = tuple(
            p.reshape(*p.shape[:-1], self.n1, self.n2) for p in planes
        )
        out = self._planar_dispatch(planes, transform)
        return _join_complex(out, self.dtype)

    def __repr__(self):
        return (
            f"FourStepPlan(n1={self.n1}, n2={self.n2}, axis={self.axis!r}, "
            f"dtype={self.dtype.name}, natural_order={self.natural_order}, "
            f"pipeline_chunks={self.pipeline_chunks})"
        )

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        children = (self.tw_fwd, self.tw_inv, self.col_plan, self.row_plan)
        aux = (
            self.n1,
            self.n2,
            self.axis,
            self.dtype.name,
            self.natural_order,
            self.pipeline_chunks,
            self.backend,
            self.mesh,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.n1, obj.n2, obj.axis, dtype_name, obj.natural_order,
         obj.pipeline_chunks, obj.backend, obj.mesh) = aux
        obj.dtype = np.dtype(dtype_name)
        obj.size = obj.n1 * obj.n2
        obj.tw_fwd, obj.tw_inv, obj.col_plan, obj.row_plan = children
        return obj


# ---------------------------------------------------------------------------
# 2-D FFT sharded across chips (BASELINE.json config 5)
# ---------------------------------------------------------------------------


class Fft2dPlan(_ShardedPlanBase):
    """2-D c2c FFT of shape (n1, n2), row-sharded over a mesh axis.

    Row FFTs (local) → all_to_all transpose over ICI → column FFTs (local).
    With ``transposed_output=True`` (default False) the result is left in
    transposed layout (n2, n1) row-sharded, saving the second all_to_all —
    the standard trick when a pointwise filter + inverse FFT follows (the
    inverse then runs with the roles of the two axes swapped).

    Planar input has shape (..., n1, n2); leading axes are (replicated)
    batch dims. ``pipeline_chunks=C`` overlaps the transpose with the row
    FFTs in C chunks (identical results).
    """

    def __init__(
        self,
        n1: int,
        n2: int,
        mesh: Mesh,
        axis: str = "fft",
        dtype=np.complex64,
        transposed_output: bool = False,
        pipeline_chunks: int = 1,
        backend: str = "auto",
    ):
        self.n1, self.n2 = int(n1), int(n2)
        self.size = self.n1 * self.n2
        self.mesh = mesh
        self.axis = axis
        self.dtype = np.dtype(dtype)
        self.transposed_output = bool(transposed_output)
        self.pipeline_chunks = int(pipeline_chunks)
        self.backend = backend
        self._make_subplans()
        self._check_geometry(pipeline_major=self.n1)

    def _make_subplans(self):
        self.row_plan = create_fft(self.n2, self.dtype, backend=self.backend)
        self.col_plan = create_fft(self.n1, self.dtype, backend=self.backend)

    def _row_fft_transpose(self, planes: Tuple, mode: Transform):
        """Row FFTs + all_to_all transpose, optionally chunked for overlap.

        Input (..., n1_loc, n2) row-sharded; output (..., n1, n2_loc)
        column-sharded — identical to the monolithic path for any chunking.
        """
        nb = planes[0].ndim - 2
        chunks = self.pipeline_chunks
        n1_loc = planes[0].shape[-2]
        if chunks <= 1 or n1_loc % chunks:
            planes = _apply_plan(self.row_plan, planes, mode)
            return tuple(_a2a(p, self.axis, nb + 1, nb) for p in planes)
        h = n1_loc // chunks
        sent = []
        for c in range(chunks):
            chunk = tuple(p[..., c * h:(c + 1) * h, :] for p in planes)
            chunk = _apply_plan(self.row_plan, chunk, mode)
            sent.append(tuple(_a2a(p, self.axis, nb + 1, nb) for p in chunk))
        # Interleave reassembly: each chunk's rows are device-major blocks of
        # h; the monolithic layout is device-major blocks of n1_loc = C*h.
        out = []
        nshards = self.nshards
        for i in range(len(planes)):
            rs = [
                s[i].reshape(
                    *s[i].shape[:-2], nshards, h, s[i].shape[-1]
                )
                for s in sent
            ]
            stacked = jnp.stack(rs, axis=-3)  # (..., S, C, h, n2_loc)
            out.append(
                stacked.reshape(
                    *stacked.shape[:-4], nshards * chunks * h, stacked.shape[-1]
                )
            )
        return tuple(out)

    def _local_steps(self, planes: Tuple, transform: Transform):
        forward = transform.is_forward
        mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
        nb = planes[0].ndim - 2
        # Row FFTs + transpose over ICI: (..., n1_loc, n2) -> (..., n1, n2_loc)
        planes = self._row_fft_transpose(planes, mode)
        # Local transpose, then column FFTs (now rows of the transposed view).
        planes = tuple(jnp.swapaxes(p, -1, -2) for p in planes)
        planes = _apply_plan(self.col_plan, planes, mode)
        planes = _scale_planes(planes, transform.scale(self.size))
        if not self.transposed_output:
            # Back to natural (..., n1_loc, n2) layout: local T + all_to_all.
            planes = tuple(jnp.swapaxes(p, -1, -2) for p in planes)
            planes = tuple(_a2a(p, self.axis, nb, nb + 1) for p in planes)
        return planes

    def _planar_dispatch(self, planes: Tuple, transform: Transform):
        xp_planes = tuple(jnp.asarray(p) for p in planes)
        if xp_planes[0].shape[-2:] != (self.n1, self.n2):
            raise ValueError(
                f"trailing axes {xp_planes[0].shape[-2:]} do not match plan "
                f"shape ({self.n1}, {self.n2})"
            )
        nb = xp_planes[0].ndim - 2
        bspec = (None,) * nb
        spec = P(*bspec, self.axis, None)
        np_ = len(xp_planes)
        fn = shard_map(
            functools.partial(self._local_steps, transform=transform),
            mesh=self.mesh,
            in_specs=((spec,) * np_,),
            out_specs=(spec,) * np_,
        )
        return fn(xp_planes)

    # -- complex convenience ------------------------------------------------

    def transform(self, x, transform: Transform = Transform.FFT):
        """Out-of-place 2-D transform of the (..., n1, n2) complex array."""
        transform = Transform(transform)
        x = np.asarray(x)
        if x.shape[-2:] != (self.n1, self.n2):
            raise ValueError(
                f"trailing axes {x.shape[-2:]} != plan shape "
                f"({self.n1}, {self.n2})"
            )
        planes = _split_complex(x, self.nplanes, self.real_dtype)
        out = self._planar_dispatch(planes, transform)
        return _join_complex(out, self.dtype)

    def __repr__(self):
        return (
            f"Fft2dPlan(n1={self.n1}, n2={self.n2}, axis={self.axis!r}, "
            f"dtype={self.dtype.name}, "
            f"transposed_output={self.transposed_output}, "
            f"pipeline_chunks={self.pipeline_chunks})"
        )

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        children = (self.col_plan, self.row_plan)
        aux = (
            self.n1,
            self.n2,
            self.axis,
            self.dtype.name,
            self.transposed_output,
            self.pipeline_chunks,
            self.backend,
            self.mesh,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.n1, obj.n2, obj.axis, dtype_name, obj.transposed_output,
         obj.pipeline_chunks, obj.backend, obj.mesh) = aux
        obj.dtype = np.dtype(dtype_name)
        obj.size = obj.n1 * obj.n2
        obj.col_plan, obj.row_plan = children
        return obj


# ---------------------------------------------------------------------------
# 3-D FFT pencil-decomposed over a 2-D mesh (slab over a 1-D mesh)
# ---------------------------------------------------------------------------


class Fft3dPlan(_ShardedPlanBase):
    """3-D c2c FFT of shape (n0, n1, n2), pencil-decomposed over a 2-D mesh.

    The classic distributed 3-D FFT (the reference is single-node throughout,
    SURVEY.md §2.6; this is the net-new scale mandate). Natural layout shards
    n0 over mesh axis ``axes[0]`` and n1 over ``axes[1]``; each device owns a
    pencil of whole n2 lines. Pipeline (all FFTs local, all communication
    ``all_to_all`` over ICI):

      1. FFT along n2 (pencils are whole).
      2. all_to_all over ``axes[1]``: split n2, gather n1  → n1 whole.
      3. FFT along n1.
      4. all_to_all over ``axes[0]``: split n1, gather n0  → n0 whole.
      5. FFT along n0.

    This leaves the **spectral layout**: the same logical (k0, k1, k2) array
    with k1 sharded over ``axes[0]`` and k2 over ``axes[1]``. By default two
    mirror all_to_alls restore the natural layout; ``spectral_output=True``
    skips them (2 collectives instead of 4). A spectral-space pipeline then
    applies its pointwise filter there and runs the inverse with
    ``from_spectral=True``, which consumes the spectral layout directly and
    produces natural layout with 2 collectives — a filtered roundtrip costs
    4 all_to_alls total instead of 8.

    Passing a single mesh axis (``axes=("fft",)``) degenerates to the slab
    decomposition: n1 is whole everywhere and step 2 disappears.

    Planar input shape is (..., n0, n1, n2) with replicated leading batch
    dims; dd (4-plane) c128 data is supported like every sharded plan.
    """

    def __init__(
        self,
        n0: int,
        n1: int,
        n2: int,
        mesh: Mesh,
        axes=("x", "y"),
        dtype=np.complex64,
        spectral_output: bool = False,
        pipeline_chunks: int = 1,
        backend: str = "auto",
    ):
        self.n0, self.n1, self.n2 = int(n0), int(n1), int(n2)
        self.size = self.n0 * self.n1 * self.n2
        self.mesh = mesh
        if isinstance(axes, str):
            axes = (axes,)
        self.axes = tuple(axes)
        if len(self.axes) not in (1, 2):
            raise ValueError(
                f"axes must name 1 (slab) or 2 (pencil) mesh axes, got "
                f"{self.axes!r}"
            )
        self.dtype = np.dtype(dtype)
        self.spectral_output = bool(spectral_output)
        self.pipeline_chunks = int(pipeline_chunks)
        if self.pipeline_chunks < 1:
            raise ValueError(
                f"pipeline_chunks must be >= 1, got {self.pipeline_chunks}"
            )
        self.backend = backend
        self.plan0 = create_fft(self.n0, self.dtype, backend=backend)
        self.plan1 = create_fft(self.n1, self.dtype, backend=backend)
        self.plan2 = create_fft(self.n2, self.dtype, backend=backend)
        sa = mesh.shape[self.axes[0]]
        sb = mesh.shape[self.axes[1]] if len(self.axes) == 2 else 1
        if self.n0 % sa or self.n1 % sa:
            raise ValueError(
                f"n0={self.n0} and n1={self.n1} must both be divisible by "
                f"mesh axis {self.axes[0]!r} size {sa}"
            )
        if self.n1 % sb or self.n2 % sb:
            raise ValueError(
                f"n1={self.n1} and n2={self.n2} must both be divisible by "
                f"mesh axis {self.axes[1]!r} size {sb}"
            )

    @property
    def is_dd(self) -> bool:
        return _is_dd_plan(self.plan2)

    @property
    def nshards(self) -> int:
        s = self.mesh.shape[self.axes[0]]
        if len(self.axes) == 2:
            s *= self.mesh.shape[self.axes[1]]
        return s

    # -- local (per-shard) computation --------------------------------------

    def _fft_axis(self, plan, planes: Tuple, ax: int, mode: Transform):
        """Run a 1-D plan along (negative) axis `ax` of every plane."""
        if ax == -1:
            return _apply_plan(plan, planes, mode)
        planes = tuple(jnp.swapaxes(p, ax, -1) for p in planes)
        planes = _apply_plan(plan, planes, mode)
        return tuple(jnp.swapaxes(p, ax, -1) for p in planes)

    def _local_steps(self, planes: Tuple, transform: Transform,
                     from_spectral: bool):
        forward = transform.is_forward
        # Per-axis passes are unscaled; normalization applied once, globally.
        mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
        nb = planes[0].ndim - 3
        ax_a = self.axes[0]
        ax_b = self.axes[1] if len(self.axes) == 2 else None
        chunks = self.pipeline_chunks
        if from_spectral:
            # Spectral layout in (k0, k1_a, k2_b): mirror pipeline, natural
            # layout out with only 2 collectives. Each leg's all_to_all is
            # chunked along an uninvolved axis so it overlaps the next
            # chunk's FFTs (_chunked_leg).
            planes = _chunked_leg(
                planes, lambda ps: self._fft_axis(self.plan0, ps, -3, mode),
                ax_a, nb, nb + 1, nb + 2, chunks,
            )
            if ax_b is not None:
                planes = _chunked_leg(
                    planes,
                    lambda ps: self._fft_axis(self.plan1, ps, -2, mode),
                    ax_b, nb + 1, nb + 2, nb, chunks,
                )
            else:
                planes = self._fft_axis(self.plan1, planes, -2, mode)
            planes = _apply_plan(self.plan2, planes, mode)
            return _scale_planes(planes, transform.scale(self.size))
        # Natural layout in (n0_a, n1_b, n2).
        if ax_b is not None:
            planes = _chunked_leg(
                planes, lambda ps: _apply_plan(self.plan2, ps, mode),
                ax_b, nb + 2, nb + 1, nb, chunks,
            )
        else:
            planes = _apply_plan(self.plan2, planes, mode)
        planes = _chunked_leg(
            planes, lambda ps: self._fft_axis(self.plan1, ps, -2, mode),
            ax_a, nb + 1, nb, nb + 2, chunks,
        )
        planes = self._fft_axis(self.plan0, planes, -3, mode)
        planes = _scale_planes(planes, transform.scale(self.size))
        if not self.spectral_output:
            # Mirror collectives restore the natural (n0_a, n1_b, n2) layout.
            planes = tuple(_a2a(p, ax_a, nb, nb + 1) for p in planes)
            if ax_b is not None:
                planes = tuple(_a2a(p, ax_b, nb + 1, nb + 2) for p in planes)
        return planes

    def _planar_dispatch(self, planes: Tuple, transform: Transform,
                         from_spectral: bool = False):
        xp_planes = tuple(jnp.asarray(p) for p in planes)
        if xp_planes[0].shape[-3:] != (self.n0, self.n1, self.n2):
            raise ValueError(
                f"trailing axes {xp_planes[0].shape[-3:]} do not match plan "
                f"shape ({self.n0}, {self.n1}, {self.n2})"
            )
        nb = xp_planes[0].ndim - 3
        bspec = (None,) * nb
        ax_b = self.axes[1] if len(self.axes) == 2 else None
        natural = P(*bspec, self.axes[0], ax_b, None)
        spectral = P(*bspec, None, self.axes[0], ax_b)
        in_spec = spectral if from_spectral else natural
        out_spec = (
            spectral
            if (self.spectral_output and not from_spectral)
            else natural
        )
        np_ = len(xp_planes)
        fn = shard_map(
            functools.partial(
                self._local_steps, transform=transform,
                from_spectral=from_spectral,
            ),
            mesh=self.mesh,
            in_specs=((in_spec,) * np_,),
            out_specs=(out_spec,) * np_,
        )
        return fn(xp_planes)

    # -- planar surface with the spectral-layout flag ------------------------

    def transform_planar(self, re, im, transform: Transform = Transform.FFT,
                         from_spectral: bool = False):
        """2-plane planar transform; ``from_spectral=True`` consumes the
        spectral layout produced by ``spectral_output=True`` (the logical
        array is identical — only the device layout and collective count
        differ)."""
        if self.is_dd:
            raise TypeError(
                "this plan uses the 4-plane double-word c128 representation; "
                "call transform_planar_dd(re_hi, re_lo, im_hi, im_lo)"
            )
        return self._planar_dispatch(
            (re, im), Transform(transform), from_spectral
        )

    def transform_planar_dd(self, re_hi, re_lo, im_hi, im_lo,
                            transform: Transform = Transform.FFT,
                            from_spectral: bool = False):
        """4-plane dd planar transform (c128 on f32-only hardware)."""
        if not self.is_dd:
            raise TypeError(
                "this plan uses 2-plane planar data; call transform_planar"
            )
        return self._planar_dispatch(
            (re_hi, re_lo, im_hi, im_lo), Transform(transform), from_spectral
        )

    # -- complex convenience ------------------------------------------------

    def transform(self, x, transform: Transform = Transform.FFT,
                  from_spectral: bool = False):
        """Out-of-place 3-D transform of the (..., n0, n1, n2) complex array."""
        transform = Transform(transform)
        x = np.asarray(x)
        if x.shape[-3:] != (self.n0, self.n1, self.n2):
            raise ValueError(
                f"trailing axes {x.shape[-3:]} != plan shape "
                f"({self.n0}, {self.n1}, {self.n2})"
            )
        planes = _split_complex(x, self.nplanes, self.real_dtype)
        out = self._planar_dispatch(planes, transform, from_spectral)
        return _join_complex(out, self.dtype)

    def __repr__(self):
        return (
            f"Fft3dPlan(n0={self.n0}, n1={self.n1}, n2={self.n2}, "
            f"axes={self.axes!r}, dtype={self.dtype.name}, "
            f"spectral_output={self.spectral_output}, "
            f"pipeline_chunks={self.pipeline_chunks})"
        )

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        children = (self.plan0, self.plan1, self.plan2)
        aux = (
            self.n0,
            self.n1,
            self.n2,
            self.axes,
            self.dtype.name,
            self.spectral_output,
            self.pipeline_chunks,
            self.backend,
            self.mesh,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.n0, obj.n1, obj.n2, obj.axes, dtype_name, obj.spectral_output,
         obj.pipeline_chunks, obj.backend, obj.mesh) = aux
        obj.dtype = np.dtype(dtype_name)
        obj.size = obj.n0 * obj.n1 * obj.n2
        obj.plan0, obj.plan1, obj.plan2 = children
        return obj


# ---------------------------------------------------------------------------
# Real-input 2-D FFT, row-sharded (image/field-scale r2c)
# ---------------------------------------------------------------------------


class Rfft2dPlan:
    """Real-input 2-D FFT of shape (n1, n2), row-sharded over a mesh axis.

    The r2c twin of :class:`Fft2dPlan`: local rfft along rows halves the
    spectrum BEFORE any collective, so the all_to_all transpose moves
    roughly half the bytes of the c2c plan. The one-sided axis is
    zero-padded to ``n2p`` (next multiple of the mesh axis size) so it
    shards evenly — static shapes, uniform shards; pad bins stay zero and
    the inverse crops them (same contract as :class:`Rfft3dPlan`).

    ``transposed_output=True`` leaves the spectrum in transposed layout
    (..., n2p, n1) row-sharded over k2, saving the restoring all_to_all;
    the inverse consumes that layout directly with ``from_transposed=True``
    — a filter roundtrip costs 2 collectives instead of 4.

    Planar logical output is (..., n1, n2p) with bins ``[..., :out_len]``
    meaningful (numpy's rfft2 convention); :meth:`rfft`/:meth:`irfft` crop/
    pad at the host boundary. dd (limb-planar) c128 supported: 2 real limb
    planes in, 4 spectrum planes out.
    """

    def __init__(
        self,
        n1: int,
        n2: int,
        mesh: Mesh,
        axis: str = "fft",
        dtype=np.complex64,
        transposed_output: bool = False,
        backend: str = "auto",
    ):
        self.n1, self.n2 = int(n1), int(n2)
        self.size = self.n1 * self.n2
        self.mesh = mesh
        self.axis = axis
        self.dtype = np.dtype(dtype)
        self.transposed_output = bool(transposed_output)
        self.backend = backend
        from fourier_tpu.rfft import RfftPlan

        self.rplan = RfftPlan(self.n2, self.dtype, backend=backend)
        self.col_plan = create_fft(self.n1, self.dtype, backend=backend)
        s = mesh.shape[axis]
        if self.n1 % s:
            raise ValueError(
                f"n1={self.n1} must be divisible by mesh axis {axis!r} "
                f"size {s}"
            )
        self.out_len = self.n2 // 2 + 1
        self.n2p = s * ((self.out_len + s - 1) // s)

    @property
    def real_dtype(self) -> np.dtype:
        return np.dtype(np.float32 if self.dtype == np.complex64 else np.float64)

    @property
    def is_dd(self) -> bool:
        return _is_dd_plan(self.col_plan)

    @property
    def nshards(self) -> int:
        return self.mesh.shape[self.axis]

    def __len__(self) -> int:
        return self.size

    # -- local (per-shard) computation --------------------------------------

    def _local_fwd(self, planes: Tuple):
        nb = planes[0].ndim - 2
        # r2c along whole rows; zero-pad k2 to the shardable length.
        if len(planes) == 2:  # dd limb planes
            planes = self.rplan.rfft_planar_dd(planes[0], planes[1])
        else:
            planes = self.rplan.rfft_planar(planes[0])
        pad = self.n2p - self.out_len
        if pad:
            cfg = [(0, 0)] * planes[0].ndim
            cfg[-1] = (0, pad)
            planes = tuple(jnp.pad(p, cfg) for p in planes)
        # Transpose over ICI, column FFTs in the transposed view.
        planes = tuple(_a2a(p, self.axis, nb + 1, nb) for p in planes)
        planes = tuple(jnp.swapaxes(p, -1, -2) for p in planes)
        planes = _apply_plan(self.col_plan, planes, Transform.FFT)
        if self.transposed_output:
            return planes  # (..., n2p_loc, n1), row-sharded over k2
        planes = tuple(jnp.swapaxes(p, -1, -2) for p in planes)
        planes = tuple(_a2a(p, self.axis, nb, nb + 1) for p in planes)
        return planes

    def _local_inv(self, planes: Tuple, from_transposed: bool):
        nb = planes[0].ndim - 2
        if not from_transposed:
            # natural (..., n1_loc, n2p) -> transposed (..., n2p_loc, n1)
            planes = tuple(_a2a(p, self.axis, nb + 1, nb) for p in planes)
            planes = tuple(jnp.swapaxes(p, -1, -2) for p in planes)
        planes = _apply_plan(self.col_plan, planes, Transform.IFFT)  # 1/n1
        # k2 rows back together on each shard, then crop + c2r.
        planes = tuple(_a2a(p, self.axis, nb + 1, nb) for p in planes)
        planes = tuple(jnp.swapaxes(p, -1, -2) for p in planes)
        planes = tuple(p[..., : self.out_len] for p in planes)
        if len(planes) == 4:
            return self.rplan.irfft_planar_dd(*planes)  # 1/n2 inside
        return (self.rplan.irfft_planar(*planes),)

    # -- sharded dispatch ----------------------------------------------------

    def rfft_planar(self, *limbs) -> Tuple:
        """Real planes (1; dd: 2 limbs) in, one-sided spectrum planes out
        (2; dd: 4), trailing axis padded to ``n2p``."""
        planes = tuple(jnp.asarray(p) for p in limbs)
        want = 2 if self.is_dd else 1
        if len(planes) != want:
            raise ValueError(
                f"expected {want} real input plane(s), got {len(planes)}"
            )
        if planes[0].shape[-2:] != (self.n1, self.n2):
            raise ValueError(
                f"trailing axes {planes[0].shape[-2:]} != plan shape "
                f"({self.n1}, {self.n2})"
            )
        nb = planes[0].ndim - 2
        bspec = (None,) * nb
        natural = P(*bspec, self.axis, None)
        out_spec = natural  # transposed layout is also leading-axis sharded
        nout = 2 * len(planes)
        fn = shard_map(
            self._local_fwd,
            mesh=self.mesh,
            in_specs=((natural,) * len(planes),),
            out_specs=(out_spec,) * nout,
        )
        return fn(planes)

    def irfft_planar(self, *planes, from_transposed: bool = False):
        """One-sided spectrum planes in, real field plane(s) out."""
        planes = tuple(jnp.asarray(p) for p in planes)
        want = 4 if self.is_dd else 2
        if len(planes) != want:
            raise ValueError(
                f"expected {want} spectrum plane(s), got {len(planes)}"
            )
        shape = (
            (self.n2p, self.n1) if from_transposed else (self.n1, self.n2p)
        )
        if planes[0].shape[-2:] != shape:
            raise ValueError(
                f"trailing axes {planes[0].shape[-2:]} != expected {shape} "
                f"(planar spectra carry the pad tail)"
            )
        nb = planes[0].ndim - 2
        bspec = (None,) * nb
        spec = P(*bspec, self.axis, None)
        nout = len(planes) // 2
        fn = shard_map(
            functools.partial(self._local_inv, from_transposed=from_transposed),
            mesh=self.mesh,
            in_specs=((spec,) * len(planes),),
            out_specs=(spec,) * nout,
        )
        out = fn(planes)
        return out if self.is_dd else out[0]

    # -- complex convenience (numpy rfft2/irfft2 shapes) ---------------------

    def rfft(self, x) -> np.ndarray:
        """np.fft.rfft2 analog: real (..., n1, n2) in, complex
        (..., n1, n2//2+1) out."""
        x = np.asarray(x)
        if self.is_dd:
            from fourier_tpu.precision import ddreal as dd

            xh, xl = dd.from_f64(x.astype(np.float64))
            planes = self.rfft_planar(xh, xl)
        else:
            planes = self.rfft_planar(x.astype(self.real_dtype))
        out = _join_complex(planes, self.dtype)
        if self.transposed_output:
            out = np.swapaxes(out, -1, -2)
        return out[..., : self.out_len]

    def irfft(self, y) -> np.ndarray:
        """np.fft.irfft2 analog: complex (..., n1, n2//2+1) in (padded
        length accepted), real (..., n1, n2) out."""
        y = np.asarray(y)
        if y.shape[-1] == self.out_len and self.n2p != self.out_len:
            pad = [(0, 0)] * (y.ndim - 1) + [(0, self.n2p - self.out_len)]
            y = np.pad(y, pad)
        if y.shape[-2:] != (self.n1, self.n2p):
            raise ValueError(
                f"trailing axes {y.shape[-2:]} != ({self.n1}, "
                f"{self.out_len} or {self.n2p})"
            )
        planes = _split_complex(y, 4 if self.is_dd else 2, self.real_dtype)
        out = self.irfft_planar(*planes)
        if self.is_dd:
            from fourier_tpu.precision import ddreal as dd

            return dd.to_f64((np.asarray(out[0]), np.asarray(out[1])))
        return np.asarray(out)

    def __repr__(self):
        return (
            f"Rfft2dPlan(n1={self.n1}, n2={self.n2}, axis={self.axis!r}, "
            f"dtype={self.dtype.name}, out_len={self.out_len}, "
            f"n2p={self.n2p}, transposed_output={self.transposed_output})"
        )

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        children = (self.rplan, self.col_plan)
        aux = (
            self.n1,
            self.n2,
            self.axis,
            self.dtype.name,
            self.transposed_output,
            self.backend,
            self.mesh,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.n1, obj.n2, obj.axis, dtype_name, obj.transposed_output,
         obj.backend, obj.mesh) = aux
        obj.dtype = np.dtype(dtype_name)
        obj.size = obj.n1 * obj.n2
        obj.rplan, obj.col_plan = children
        s = obj.mesh.shape[obj.axis]
        obj.out_len = obj.n2 // 2 + 1
        obj.n2p = s * ((obj.out_len + s - 1) // s)
        return obj


# ---------------------------------------------------------------------------
# Real-input 3-D FFT, pencil-decomposed (the pseudospectral-solver kernel)
# ---------------------------------------------------------------------------


class Rfft3dPlan:
    """Real-input 3-D FFT of shape (n0, n1, n2), pencil-decomposed.

    The distributed r2c/c2r transform at the heart of pseudospectral solvers
    (CFD, PME electrostatics, cosmology): a real field in, the one-sided
    spectrum out, at roughly **half** the compute and interconnect traffic of
    the c2c :class:`Fft3dPlan` (the r2c leg halves the data before any
    collective runs). Reference parity: none — the reference has no real
    transforms and no parallelism; this is the net-new scale mandate
    (SURVEY.md §5) composed with the repo's own rfft surface.

    Pipeline (mesh axes ``a = axes[0]``, ``b = axes[1]``; all FFTs local, all
    communication ``all_to_all`` over ICI):

      1. r2c FFT along n2 (pencils whole): n2 real → n2h = n2//2+1 bins,
         zero-padded to ``n2p`` = next multiple of the ``b`` axis size so the
         spectral axis shards evenly (static shapes, uniform shards — the
         TPU-native answer to n2h's non-divisibility; pad bins stay zero
         through the remaining legs and the inverse crops them).
      2. all_to_all over ``b``: split k2, gather n1.
      3. c2c FFT along n1.
      4. all_to_all over ``a``: split n1, gather n0.
      5. c2c FFT along n0.

    This leaves the **spectral layout** (k0 whole, k1 sharded over ``a``, k2
    over ``b``); by default two mirror all_to_alls restore the natural
    layout, ``spectral_output=True`` skips them and the inverse's
    ``from_spectral=True`` consumes the spectral layout directly — a
    filter-in-spectral-space roundtrip costs 4 collectives instead of 8,
    exactly like :class:`Fft3dPlan`.

    Logical output is (..., n0, n1, n2p) planar with bins ``[..., :out_len]``
    meaningful (``out_len`` = n2h, numpy's rfftn convention) and the pad tail
    zero; the complex conveniences :meth:`rfft`/:meth:`irfft` crop/pad at the
    host boundary so they match ``np.fft.rfftn``/``irfftn`` shapes exactly.
    Single mesh axis (``axes=("fft",)``) degenerates to the slab
    decomposition with zero padding (n2p = n2h). dd (limb-planar) c128 is
    supported like every sharded plan: 2 real limb planes in, 4 spectrum
    planes out.
    """

    def __init__(
        self,
        n0: int,
        n1: int,
        n2: int,
        mesh: Mesh,
        axes=("x", "y"),
        dtype=np.complex64,
        spectral_output: bool = False,
        pipeline_chunks: int = 1,
        backend: str = "auto",
    ):
        self.n0, self.n1, self.n2 = int(n0), int(n1), int(n2)
        self.size = self.n0 * self.n1 * self.n2
        self.mesh = mesh
        if isinstance(axes, str):
            axes = (axes,)
        self.axes = tuple(axes)
        if len(self.axes) not in (1, 2):
            raise ValueError(
                f"axes must name 1 (slab) or 2 (pencil) mesh axes, got "
                f"{self.axes!r}"
            )
        self.dtype = np.dtype(dtype)
        self.spectral_output = bool(spectral_output)
        self.pipeline_chunks = int(pipeline_chunks)
        if self.pipeline_chunks < 1:
            raise ValueError(
                f"pipeline_chunks must be >= 1, got {self.pipeline_chunks}"
            )
        self.backend = backend
        from fourier_tpu.rfft import RfftPlan

        self.rplan = RfftPlan(self.n2, self.dtype, backend=backend)
        self.plan0 = create_fft(self.n0, self.dtype, backend=backend)
        self.plan1 = create_fft(self.n1, self.dtype, backend=backend)
        sa = mesh.shape[self.axes[0]]
        sb = mesh.shape[self.axes[1]] if len(self.axes) == 2 else 1
        if self.n0 % sa or self.n1 % sa:
            raise ValueError(
                f"n0={self.n0} and n1={self.n1} must both be divisible by "
                f"mesh axis {self.axes[0]!r} size {sa}"
            )
        if self.n1 % sb:
            raise ValueError(
                f"n1={self.n1} must be divisible by mesh axis "
                f"{self.axes[1]!r} size {sb}"
            )
        self.out_len = self.n2 // 2 + 1  # meaningful one-sided bins (numpy)
        self.n2p = sb * ((self.out_len + sb - 1) // sb)  # padded/sharded len

    @property
    def real_dtype(self) -> np.dtype:
        return np.dtype(np.float32 if self.dtype == np.complex64 else np.float64)

    @property
    def is_dd(self) -> bool:
        return _is_dd_plan(self.plan0)

    @property
    def nshards(self) -> int:
        s = self.mesh.shape[self.axes[0]]
        if len(self.axes) == 2:
            s *= self.mesh.shape[self.axes[1]]
        return s

    def __len__(self) -> int:
        return self.size

    # -- local (per-shard) computation --------------------------------------

    def _fft_axis(self, plan, planes: Tuple, ax: int, mode: Transform):
        if ax == -1:
            return _apply_plan(plan, planes, mode)
        planes = tuple(jnp.swapaxes(p, ax, -1) for p in planes)
        planes = _apply_plan(plan, planes, mode)
        return tuple(jnp.swapaxes(p, ax, -1) for p in planes)

    def _local_fwd(self, planes: Tuple):
        nb = planes[0].ndim - 3
        ax_a = self.axes[0]
        ax_b = self.axes[1] if len(self.axes) == 2 else None
        chunks = self.pipeline_chunks

        def rfft_pad(ps):
            # r2c along whole pencils; zero-pad k2 to the shardable length.
            if len(ps) == 2:  # dd limb planes
                ps = self.rplan.rfft_planar_dd(ps[0], ps[1])
            else:
                ps = self.rplan.rfft_planar(ps[0])
            pad = self.n2p - self.out_len
            if pad:
                cfg = [(0, 0)] * ps[0].ndim
                cfg[-1] = (0, pad)
                ps = tuple(jnp.pad(p, cfg) for p in ps)
            return ps

        # 1-5) r2c + the two c2c legs threaded through per-mesh-axis
        # all_to_alls; each leg's collective is chunked along an uninvolved
        # axis to overlap the next chunk's FFTs (_chunked_leg).
        if ax_b is not None:
            planes = _chunked_leg(
                planes, rfft_pad, ax_b, nb + 2, nb + 1, nb, chunks
            )
        else:
            planes = rfft_pad(planes)
        planes = _chunked_leg(
            planes,
            lambda ps: self._fft_axis(self.plan1, ps, -2, Transform.FFT),
            ax_a, nb + 1, nb, nb + 2, chunks,
        )
        planes = self._fft_axis(self.plan0, planes, -3, Transform.FFT)
        if not self.spectral_output:
            planes = tuple(_a2a(p, ax_a, nb, nb + 1) for p in planes)
            if ax_b is not None:
                planes = tuple(_a2a(p, ax_b, nb + 1, nb + 2) for p in planes)
        return planes

    def _local_inv(self, planes: Tuple, from_spectral: bool):
        nb = planes[0].ndim - 3
        ax_a = self.axes[0]
        ax_b = self.axes[1] if len(self.axes) == 2 else None
        if not from_spectral:
            # natural (k0_a, k1_b, k2p) -> spectral (k0, k1_a, k2p_b)
            if ax_b is not None:
                planes = tuple(_a2a(p, ax_b, nb + 2, nb + 1) for p in planes)
            planes = tuple(_a2a(p, ax_a, nb + 1, nb) for p in planes)
        chunks = self.pipeline_chunks
        planes = _chunked_leg(
            planes,
            lambda ps: self._fft_axis(self.plan0, ps, -3,
                                      Transform.UNSCALED_IFFT),
            ax_a, nb, nb + 1, nb + 2, chunks,
        )
        if ax_b is not None:
            planes = _chunked_leg(
                planes,
                lambda ps: self._fft_axis(self.plan1, ps, -2,
                                          Transform.UNSCALED_IFFT),
                ax_b, nb + 1, nb + 2, nb, chunks,
            )
        else:
            planes = self._fft_axis(self.plan1, planes, -2,
                                    Transform.UNSCALED_IFFT)
        # One global 1/(n0*n1); the c2r leg carries its own 1/n2 (numpy).
        planes = _scale_planes(planes, 1.0 / (self.n0 * self.n1))
        planes = tuple(p[..., : self.out_len] for p in planes)
        if len(planes) == 4:
            return self.rplan.irfft_planar_dd(*planes)
        return (self.rplan.irfft_planar(*planes),)

    # -- sharded dispatch ----------------------------------------------------

    def _specs(self, nb: int):
        bspec = (None,) * nb
        ax_b = self.axes[1] if len(self.axes) == 2 else None
        natural = P(*bspec, self.axes[0], ax_b, None)
        spectral = P(*bspec, None, self.axes[0], ax_b)
        return natural, spectral

    def rfft_planar(self, *limbs) -> Tuple:
        """Real field planes in (1 plane; dd: 2 limb planes), one-sided
        spectrum planes out (2; dd: 4), trailing axis padded to ``n2p``."""
        planes = tuple(jnp.asarray(p) for p in limbs)
        want = 2 if self.is_dd else 1
        if len(planes) != want:
            raise ValueError(
                f"expected {want} real input plane(s) for this plan, got "
                f"{len(planes)}"
            )
        if planes[0].shape[-3:] != (self.n0, self.n1, self.n2):
            raise ValueError(
                f"trailing axes {planes[0].shape[-3:]} != plan shape "
                f"({self.n0}, {self.n1}, {self.n2})"
            )
        nb = planes[0].ndim - 3
        natural, spectral = self._specs(nb)
        out_spec = spectral if self.spectral_output else natural
        nout = 2 * len(planes)
        fn = shard_map(
            self._local_fwd,
            mesh=self.mesh,
            in_specs=((natural,) * len(planes),),
            out_specs=(out_spec,) * nout,
        )
        return fn(planes)

    def irfft_planar(self, *planes, from_spectral: bool = False):
        """One-sided spectrum planes in (trailing axis ``n2p``), real field
        plane(s) out. ``from_spectral=True`` consumes the layout produced by
        ``spectral_output=True``."""
        planes = tuple(jnp.asarray(p) for p in planes)
        want = 4 if self.is_dd else 2
        if len(planes) != want:
            raise ValueError(
                f"expected {want} spectrum plane(s) for this plan, got "
                f"{len(planes)}"
            )
        if planes[0].shape[-3:] != (self.n0, self.n1, self.n2p):
            raise ValueError(
                f"trailing axes {planes[0].shape[-3:]} != spectral shape "
                f"({self.n0}, {self.n1}, {self.n2p}); the planar spectrum "
                f"carries the pad tail (crop happens in the plan)"
            )
        nb = planes[0].ndim - 3
        natural, spectral = self._specs(nb)
        in_spec = spectral if from_spectral else natural
        nout = len(planes) // 2
        fn = shard_map(
            functools.partial(self._local_inv, from_spectral=from_spectral),
            mesh=self.mesh,
            in_specs=((in_spec,) * len(planes),),
            out_specs=(natural,) * nout,
        )
        out = fn(planes)
        return out if self.is_dd else out[0]

    # -- complex convenience (numpy rfftn/irfftn shapes) ---------------------

    def rfft(self, x) -> np.ndarray:
        """np.fft.rfftn analog: real (..., n0, n1, n2) in, complex
        (..., n0, n1, n2//2+1) out (pad bins cropped at the host)."""
        x = np.asarray(x)
        if self.is_dd:
            from fourier_tpu.precision import ddreal as dd

            xh, xl = dd.from_f64(x.astype(np.float64))
            planes = self.rfft_planar(xh, xl)
        else:
            planes = self.rfft_planar(x.astype(self.real_dtype))
        out = _join_complex(planes, self.dtype)
        return out[..., : self.out_len]

    def irfft(self, y) -> np.ndarray:
        """np.fft.irfftn analog: complex (..., n0, n1, n2//2+1) in, real
        (..., n0, n1, n2) out (accepts the padded length too)."""
        y = np.asarray(y)
        if y.shape[-1] == self.out_len and self.n2p != self.out_len:
            pad = [(0, 0)] * (y.ndim - 1) + [(0, self.n2p - self.out_len)]
            y = np.pad(y, pad)
        if y.shape[-3:] != (self.n0, self.n1, self.n2p):
            raise ValueError(
                f"trailing axes {y.shape[-3:]} != ({self.n0}, {self.n1}, "
                f"{self.out_len} or {self.n2p})"
            )
        planes = _split_complex(y, 4 if self.is_dd else 2, self.real_dtype)
        out = self.irfft_planar(*planes)
        if self.is_dd:
            from fourier_tpu.precision import ddreal as dd

            return dd.to_f64((np.asarray(out[0]), np.asarray(out[1])))
        return np.asarray(out)

    def __repr__(self):
        return (
            f"Rfft3dPlan(n0={self.n0}, n1={self.n1}, n2={self.n2}, "
            f"axes={self.axes!r}, dtype={self.dtype.name}, "
            f"out_len={self.out_len}, n2p={self.n2p}, "
            f"spectral_output={self.spectral_output}, "
            f"pipeline_chunks={self.pipeline_chunks})"
        )

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        children = (self.rplan, self.plan0, self.plan1)
        aux = (
            self.n0,
            self.n1,
            self.n2,
            self.axes,
            self.dtype.name,
            self.spectral_output,
            self.pipeline_chunks,
            self.backend,
            self.mesh,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.n0, obj.n1, obj.n2, obj.axes, dtype_name, obj.spectral_output,
         obj.pipeline_chunks, obj.backend, obj.mesh) = aux
        obj.dtype = np.dtype(dtype_name)
        obj.size = obj.n0 * obj.n1 * obj.n2
        obj.rplan, obj.plan0, obj.plan1 = children
        sb = obj.mesh.shape[obj.axes[1]] if len(obj.axes) == 2 else 1
        obj.out_len = obj.n2 // 2 + 1
        obj.n2p = sb * ((obj.out_len + sb - 1) // sb)
        return obj


for _cls in (FourStepPlan, Fft2dPlan, Fft3dPlan, Rfft2dPlan, Rfft3dPlan):
    jax.tree_util.register_pytree_node(
        _cls, lambda p: p.tree_flatten(), _cls.tree_unflatten
    )
del _cls
