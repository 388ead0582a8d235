"""VPU-fused Stockham plan: batch-minor fast path for powers of two.

Wraps ops/pallas/stockham_vpu.py as a plan. The native entry point is
:meth:`transform_planar_bm` on batch-minor (n, B) planes — the layout that
makes chained spectral pipelines (fft -> pointwise filter -> ifft) transpose-
free end-to-end. The standard batch-major ``transform_planar`` works too, at
the cost of one XLA transpose each way.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ops.pallas import stockham_vpu
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.transform import Transform


@jax.tree_util.register_pytree_node_class
class VpuFftPlan(FftPlan):
    """Fused-VPU mixed radix-64/8/4/3/2 plan (n = 2^a*3^b, 8|n, 64..16384),
    batch-minor."""

    _ad_opaque = True  # Mosaic kernel: AD via the linear custom VJP

    def __init__(self, size, dtype, fwd_tables, inv_tables, cb=128,
                 interpret=False, vmem_limit_bytes=None):
        self.size = int(size)
        self.dtype = np.dtype(dtype)
        self.fwd_tables = tuple(fwd_tables)
        self.inv_tables = tuple(inv_tables)
        self.cb = int(cb)
        self.interpret = bool(interpret)
        self.vmem_limit_bytes = vmem_limit_bytes

    @classmethod
    def create(cls, size: int, dtype=np.complex64, *, cb: int = 128,
               interpret: Optional[bool] = None,
               vmem_limit_bytes: Optional[int] = None) -> Optional["VpuFftPlan"]:
        if np.dtype(dtype) != np.dtype(np.complex64):
            return None
        if stockham_vpu.radix_schedule(size) is None:
            return None
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if vmem_limit_bytes is None and not interpret:
            # n=4096 blocks need ~2 MB x planes x buffering: beyond the 16 MB
            # default scoped limit but fine on this chip (verified at 64 MB).
            # n > 8192 measures ~80 MiB scoped (verified on-chip at 110 MiB).
            vmem_limit_bytes = (
                64 * 1024 * 1024 if size <= 8192 else 110 * 1024 * 1024
            )
        as_j = lambda tbl: tuple(
            (jnp.asarray(tr), jnp.asarray(ti)) for tr, ti in tbl
        )
        return cls(
            size,
            dtype,
            as_j(stockham_vpu.make_stage_tables(size, True)),
            as_j(stockham_vpu.make_stage_tables(size, False)),
            cb=cb,
            interpret=interpret,
            vmem_limit_bytes=vmem_limit_bytes,
        )

    # -- batch-minor native path -------------------------------------------

    def transform_planar_bm(self, re_t, im_t,
                            transform: Transform = Transform.FFT):
        """Transform batch-minor (n, B) planar planes. B padded to cb."""
        transform = Transform(transform)
        re_t = jnp.asarray(re_t)
        im_t = jnp.asarray(im_t)
        if re_t.shape[0] != self.size:
            raise ValueError(
                f"leading axis {re_t.shape[0]} != plan size {self.size}"
            )
        b = re_t.shape[-1]
        bp = -(-b // self.cb) * self.cb
        if bp != b:
            pad = [(0, 0), (0, bp - b)]
            re_t = jnp.pad(re_t, pad)
            im_t = jnp.pad(im_t, pad)
        tables = self.fwd_tables if transform.is_forward else self.inv_tables
        ore, oim = stockham_vpu.vpu_fft_batch_minor(
            re_t, im_t, self.size, tables, transform.is_forward,
            self._scale_for(transform), cb=self.cb, interpret=self.interpret,
            vmem_limit_bytes=self.vmem_limit_bytes,
        )
        return ore[:, :b], oim[:, :b]

    # -- batch-major compatibility ----------------------------------------

    def _apply(self, re, im, transform: Transform):
        batch_shape = re.shape[:-1]
        b = int(np.prod(batch_shape, initial=1))
        re_t = jnp.asarray(re).reshape(b, self.size).T
        im_t = jnp.asarray(im).reshape(b, self.size).T
        ore, oim = self.transform_planar_bm(re_t, im_t, transform)
        return (
            ore.T.reshape(*batch_shape, self.size),
            oim.T.reshape(*batch_shape, self.size),
        )

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        return (self.fwd_tables, self.inv_tables), (
            self.size, self.dtype.name, self.cb, self.interpret,
            self.vmem_limit_bytes,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        size, dtype_name, cb, interpret, vmem_limit_bytes = aux
        fwd, inv = children
        return cls(size, np.dtype(dtype_name), tuple(fwd), tuple(inv),
                   cb=cb, interpret=interpret,
                   vmem_limit_bytes=vmem_limit_bytes)

    def __repr__(self):
        return f"VpuFftPlan(size={self.size}, cb={self.cb})"
