"""Fused-VPU double-word c128 plan: the fast dd path on TPU.

Wraps ops/pallas/stockham_vpu_dd.py as a plan with the same ``_apply_dd``
interface as :class:`~fourier_tpu.precision.dd_plan.DdFftPlan`, so it composes
with everything the XLA dd plan does: the c128 convenience API, N-D
transforms, Bluestein inner FFTs, batch sharding, and the sharded plan
classes. The native entry point is :meth:`transform_planar_dd_bm` on
batch-minor (n, B) planes; batch-major callers pay one transpose each way
(same contract as the c64 :class:`~fourier_tpu.plan.vpu.VpuFftPlan`).

Eager numpy inputs (the exact-IEEE host path ``DdFftPlan.transform`` uses)
fall back to a lazily-built XLA dd plan — the Pallas kernel is a trace-time
construct.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ops.pallas import stockham_vpu_dd as kern
from fourier_tpu.transform import Transform


@jax.tree_util.register_pytree_node_class
class VpuDdFftPlan:
    """Fused-VPU dd plan (n = 2^a*3^b, 8|n, 64..4096), batch-minor c128."""

    dtype = np.dtype(np.complex128)
    kind = "stockham-vpu-dd"

    def __init__(self, size, fwd_tables, inv_tables, cb=128, interpret=False,
                 vmem_limit_bytes=None):
        self.size = int(size)
        self.fwd_tables = tuple(fwd_tables)
        self.inv_tables = tuple(inv_tables)
        self.cb = int(cb)
        self.interpret = bool(interpret)
        self.vmem_limit_bytes = vmem_limit_bytes
        self._fallback_plan = None  # lazy eager-numpy twin

    @classmethod
    def create(cls, size: int, *, cb: Optional[int] = None,
               interpret: Optional[bool] = None,
               vmem_limit_bytes: Optional[int] = None) -> Optional["VpuDdFftPlan"]:
        if kern.radix_schedule_dd(size) is None:
            return None
        if cb is None:
            # 128 lanes always: Mosaic requires the lane-dim block be a
            # multiple of 128 (or the whole array), so cb=64 breaks for any
            # batch > 64. The VMEM budget instead caps the SIZE axis — see
            # radix_schedule_dd (n <= 4096 fits; n=8192 measures 162 MiB).
            cb = 128
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if vmem_limit_bytes is None and not interpret:
            # 96 MiB of the v5e's 128 MiB VMEM: the kernel itself needs ~40 MiB
            # scoped at n=4096/cb=128, and when the call sits inside a lax.scan
            # XLA may additionally hoist 16 MiB carry planes into VMEM (S(1))
            # on top of the kernel's scoped allocation — 64 MiB OOMs there.
            vmem_limit_bytes = 96 * 1024 * 1024
        as_j = lambda tbls: tuple(
            tuple(jnp.asarray(p) for p in t4) for t4 in tbls
        )
        return cls(
            size,
            as_j(kern.make_stage_tables_dd(size, True)),
            as_j(kern.make_stage_tables_dd(size, False)),
            cb=cb,
            interpret=interpret,
            vmem_limit_bytes=vmem_limit_bytes,
        )

    # -- batch-minor native path -------------------------------------------

    def transform_planar_dd_bm(self, rh, rl, ih, il,
                               transform: Transform = Transform.FFT):
        """Transform batch-minor (n, B) dd planes. B padded to cb."""
        transform = Transform(transform)
        planes = [jnp.asarray(p) for p in (rh, rl, ih, il)]
        if planes[0].shape[0] != self.size:
            raise ValueError(
                f"leading axis {planes[0].shape[0]} != plan size {self.size}"
            )
        b = planes[0].shape[-1]
        bp = -(-b // self.cb) * self.cb
        if bp != b:
            pad = [(0, 0), (0, bp - b)]
            planes = [jnp.pad(p, pad) for p in planes]
        tables = self.fwd_tables if transform.is_forward else self.inv_tables
        outs = kern.vpu_dd_fft_batch_minor(
            *planes, self.size, tables, transform.is_forward,
            transform.scale(self.size), cb=self.cb,
            interpret=self.interpret,
            vmem_limit_bytes=self.vmem_limit_bytes,
        )
        return tuple(o[:, :b] for o in outs)

    # -- DdFftPlan-compatible interfaces ------------------------------------

    def _apply_dd(self, value, transform: Transform):
        """((rh, rl), (ih, il)) with (..., n) planes — batch-major adapter."""
        (rh, rl), (ih, il) = value
        if isinstance(rh, np.ndarray):
            # Eager exact-IEEE host path: delegate to the XLA dd twin.
            return self._fallback()._apply_dd(value, transform)
        batch_shape = rh.shape[:-1]
        b = int(np.prod(batch_shape, initial=1))
        bm = [jnp.asarray(p).reshape(b, self.size).T for p in (rh, rl, ih, il)]
        orh, orl, oih, oil = self.transform_planar_dd_bm(*bm, transform)
        back = lambda p: p.T.reshape(*batch_shape, self.size)
        return (back(orh), back(orl)), (back(oih), back(oil))

    def transform_planar_dd(self, re_hi, re_lo, im_hi, im_lo,
                            transform: Transform = Transform.FFT):
        """jit-friendly 4-plane batch-major API (DdFftPlan-compatible)."""
        value = ((re_hi, re_lo), (im_hi, im_lo))
        (rh, rl), (ih, il) = self._apply_dd(value, Transform(transform))
        return rh, rl, ih, il

    def transform(self, x, transform: Transform = Transform.FFT) -> np.ndarray:
        """complex128 numpy convenience (exact host split/recombine)."""
        return self._fallback().transform(x, transform)

    def fft(self, x):
        return self.transform(x, Transform.FFT)

    def ifft(self, x):
        return self.transform(x, Transform.IFFT)

    def __call__(self, x, transform: Transform = Transform.FFT):
        return self.transform(x, transform)

    def _fallback(self):
        if self._fallback_plan is None:
            from fourier_tpu.precision.dd_plan import DdFftPlan

            self._fallback_plan = DdFftPlan(self.size)
        return self._fallback_plan

    def __repr__(self):
        return f"VpuDdFftPlan(size={self.size}, cb={self.cb})"

    # -- pytree --------------------------------------------------------------

    def tree_flatten(self):
        return (self.fwd_tables, self.inv_tables), (
            self.size, self.cb, self.interpret, self.vmem_limit_bytes,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        size, cb, interpret, vmem_limit_bytes = aux
        fwd, inv = children
        return cls(size, tuple(fwd), tuple(inv), cb=cb, interpret=interpret,
                   vmem_limit_bytes=vmem_limit_bytes)
