"""Fully-fused Bluestein plan: one Pallas kernel per transform.

The composed BluesteinPlan (plan/bluestein.py) runs five device steps per
transform — chirp multiply, zero-pad, inner forward FFT, w multiply, inner
inverse FFT, final chirp — each a separate dispatch/HBM round-trip even with
a fused inner kernel. This plan runs the WHOLE chirp-z pipeline inside one
all-stages-in-VMEM kernel (ops/pallas/stockham_vpu._bluestein_kernel), the
way the reference keeps the entire `apply` loop in cache
(``bluesteins.rs:215-259``). Eligible: c64, arbitrary n whose inner size
next_pow2(2n-1) has a fused schedule and fits VMEM (n <= 4096).

All chirp/w tables are plan-time f64 numpy (``bluesteins.rs:18-61``
semantics, including the plan-time inner FFT for the w table), narrowed to
f32 column vectors; the inner IFFT's 1/M is folded into the output chirp
table.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ops.pallas import stockham_vpu
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.plan.bluestein import _chirp_tables
from fourier_tpu.plan.factor import next_power_of_two
from fourier_tpu.transform import Transform


@jax.tree_util.register_pytree_node_class
class VpuBluesteinPlan(FftPlan):
    """One-kernel Bluestein chirp-z plan (c64, batch-minor native)."""

    _ad_opaque = True  # Mosaic kernel: AD via the linear custom VJP

    MAX_INNER = 8192  # VMEM ceiling for the double pipeline (measured)

    def __init__(self, size, m_inner, dtype, stage_tables, chirps_fwd,
                 chirps_inv, cb=128, interpret=False, vmem_limit_bytes=None):
        self.size = int(size)
        self.m_inner = int(m_inner)
        self.dtype = np.dtype(dtype)
        self.stage_tables = stage_tables  # (fwd_tables, inv_tables) for M
        self.chirps_fwd = chirps_fwd      # (xt, wt, xt_out) planar pairs
        self.chirps_inv = chirps_inv
        self.cb = int(cb)
        self.interpret = bool(interpret)
        self.vmem_limit_bytes = vmem_limit_bytes

    @staticmethod
    def choose_inner(size: int, max_inner: int) -> Optional[int]:
        """Smallest fused-schedule inner M >= 2n-1 with 8 | M.

        Bluestein's inner FFT works at ANY size >= 2n-1 — the reference pins
        next_power_of_two (bluesteins.rs:110) because that is its fast
        family, but the fused kernel's fast family is 5-smooth with 8 | M,
        which is denser: e.g. n=1418 gets M=2880 (2^6*3^2*5) instead of
        4096 — measured on-chip 365 vs 309 GF (round 4). Pure 3^b/5^c
        tabled sizes are excluded (their per-point rates are ~2-3x worse
        than 8|M schedules, never worth the smaller M).
        """
        lo = 2 * size - 1
        pow2 = next_power_of_two(lo)
        if pow2 <= 64:
            return pow2 if stockham_vpu.radix_schedule(pow2) else None
        start = -(-lo // 8) * 8
        for m in range(start, min(pow2, max_inner) + 1, 8):
            if stockham_vpu.radix_schedule(m) is not None:
                return m
        return pow2 if (
            pow2 <= max_inner and stockham_vpu.radix_schedule(pow2)
        ) else None

    @classmethod
    def create(cls, size: int, dtype=np.complex64, *, cb: int = 128,
               interpret: Optional[bool] = None,
               vmem_limit_bytes: Optional[int] = None,
               ) -> Optional["VpuBluesteinPlan"]:
        if np.dtype(dtype) != np.dtype(np.complex64) or size < 2:
            return None
        m = cls.choose_inner(size, cls.MAX_INNER)
        if m is None:
            return None
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if vmem_limit_bytes is None and not interpret:
            vmem_limit_bytes = 110 * 1024 * 1024
        as_j = lambda tbl: tuple(
            (jnp.asarray(tr), jnp.asarray(ti)) for tr, ti in tbl
        )
        stage_tables = (
            as_j(stockham_vpu.make_stage_tables(m, True)),
            as_j(stockham_vpu.make_stage_tables(m, False)),
        )
        w_fwd, w_inv, x_fwd, x_inv = _chirp_tables(size, m)
        col = lambda a: (
            jnp.asarray(a.real.astype(np.float32).reshape(-1, 1)),
            jnp.asarray(a.imag.astype(np.float32).reshape(-1, 1)),
        )
        mk = lambda x, w: (col(x), col(w), col(x / m))  # 1/M in xt_out
        return cls(
            size, m, np.dtype(dtype),
            stage_tables, mk(x_fwd, w_fwd), mk(x_inv, w_inv),
            cb=cb, interpret=interpret, vmem_limit_bytes=vmem_limit_bytes,
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
        chirps = (
            self.chirps_fwd if transform.is_forward else self.chirps_inv
        )
        ore, oim = stockham_vpu.vpu_bluestein_batch_minor(
            re_t, im_t, self.size, self.m_inner, self.stage_tables, chirps,
            self._scale_for(transform), cb=self.cb, interpret=self.interpret,
            vmem_limit_bytes=self.vmem_limit_bytes,
        )
        return ore[:, :b], oim[:, :b]

    # -- batch-major compatibility -----------------------------------------

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
        children = (self.stage_tables, self.chirps_fwd, self.chirps_inv)
        aux = (self.size, self.m_inner, self.dtype.name, self.cb,
               self.interpret, self.vmem_limit_bytes)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        size, m_inner, dtype_name, cb, interpret, vmem = aux
        stage_tables, chirps_fwd, chirps_inv = children
        return cls(size, m_inner, np.dtype(dtype_name), stage_tables,
                   chirps_fwd, chirps_inv, cb=cb, interpret=interpret,
                   vmem_limit_bytes=vmem)

    def __repr__(self):
        return (
            f"VpuBluesteinPlan(size={self.size}, inner={self.m_inner}, "
            f"cb={self.cb})"
        )
