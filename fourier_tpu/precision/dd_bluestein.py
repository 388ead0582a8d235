"""One-kernel fused dd Bluestein plan: fast c128 path for split-less sizes.

The dd twin of :class:`~fourier_tpu.plan.bluestein_fused.VpuBluesteinPlan`:
the composed c128 Bluestein (``DdFftPlan`` kind="bluestein") runs six device
steps per transform — chirp multiply, pad, inner forward FFT, w multiply,
inner inverse FFT, final chirp — and every elementwise step moves FOUR f32
planes through HBM. This plan runs the whole chirp-z pipeline inside one
all-stages-in-VMEM Pallas kernel
(:func:`~fourier_tpu.ops.pallas.stockham_vpu_dd.vpu_dd_bluestein_batch_minor`).

Eligible: c128, sizes whose inner next_pow2(2n-1) has a fused dd schedule and
fits the double-pipeline VMEM budget (inner <= MAX_INNER = 2048, i.e.
n <= 1024) — exactly the prime/pow5/composite sizes that previously paid the
composed path's dispatch/HBM tax.

All chirp/w tables are plan-time f64 numpy (``bluesteins.rs:18-61``
semantics, incl. the plan-time inner FFT for the w table), split exactly into
dd (hi, lo) f32 column pairs; the inner IFFT's 1/M is folded into the output
chirp table.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ops.pallas import stockham_vpu_dd as kern
from fourier_tpu.plan.bluestein import _chirp_tables
from fourier_tpu.plan.factor import next_power_of_two
from fourier_tpu.precision import ddreal
from fourier_tpu.transform import Transform


def _col4(a: np.ndarray):
    """f64 complex (k,) -> 4 jnp f32 (k, 1) planes (rh, rl, ih, il)."""
    rh, rl = ddreal.from_f64(a.real)
    ih, il = ddreal.from_f64(a.imag)
    return tuple(
        jnp.asarray(p.astype(np.float32).reshape(-1, 1))
        for p in (rh, rl, ih, il)
    )


@jax.tree_util.register_pytree_node_class
class VpuDdBluesteinPlan:
    """One-kernel dd Bluestein chirp-z plan (c128, batch-minor native)."""

    dtype = np.dtype(np.complex128)
    kind = "bluestein-vpu-dd"

    #: Largest inner size for the fused double pipeline. The plain dd kernel
    #: measures ~80 MiB scoped VMEM at n=4096; the Bluestein kernel's two
    #: back-to-back stage pipelines put inner=4096 over the chip's VMEM
    #: (measured round 3: Mosaic compile failure at n=1418/inner=4096), so
    #: 2048 is the ceiling. Measured wins vs the composed dd Bluestein:
    #: n=125 +11%, 625 +6%, 1013 +8% (dd is compute-bound, so fusing the
    #: elementwise passes buys less than the c64 analog's 1.9x).
    MAX_INNER = 2048

    def __init__(self, size, m_inner, stage_tables, chirps_fwd, chirps_inv,
                 cb=128, interpret=False, vmem_limit_bytes=None):
        self.size = int(size)
        self.m_inner = int(m_inner)
        self.stage_tables = stage_tables  # (fwd_tables, inv_tables) for M
        self.chirps_fwd = chirps_fwd      # (xt, wt, xt_out) 4-plane tuples
        self.chirps_inv = chirps_inv
        self.cb = int(cb)
        self.interpret = bool(interpret)
        self.vmem_limit_bytes = vmem_limit_bytes
        self._fallback_plan = None  # lazy eager-numpy twin

    @classmethod
    def create(cls, size: int, *, cb: int = 128,
               interpret: Optional[bool] = None,
               vmem_limit_bytes: Optional[int] = None,
               ) -> Optional["VpuDdBluesteinPlan"]:
        if size < 2:
            return None
        m = next_power_of_two(2 * size - 1)
        if m > cls.MAX_INNER or kern.radix_schedule_dd(m) is None:
            return None
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if vmem_limit_bytes is None and not interpret:
            vmem_limit_bytes = 110 * 1024 * 1024
        as_j = lambda tbls: tuple(
            tuple(jnp.asarray(p) for p in t4) for t4 in tbls
        )
        stage_tables = (
            as_j(kern.make_stage_tables_dd(m, True)),
            as_j(kern.make_stage_tables_dd(m, False)),
        )
        w_fwd, w_inv, x_fwd, x_inv = _chirp_tables(size, m)
        mk = lambda x, w: (_col4(x), _col4(w), _col4(x / m))  # 1/M in xt_out
        return cls(
            size, m, stage_tables, mk(x_fwd, w_fwd), mk(x_inv, w_inv),
            cb=cb, interpret=interpret, vmem_limit_bytes=vmem_limit_bytes,
        )

    # -- batch-minor native path ---------------------------------------------

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
        chirps = (
            self.chirps_fwd if transform.is_forward else self.chirps_inv
        )
        outs = kern.vpu_dd_bluestein_batch_minor(
            *planes, self.size, self.m_inner, self.stage_tables, chirps,
            transform.scale(self.size), cb=self.cb, interpret=self.interpret,
            vmem_limit_bytes=self.vmem_limit_bytes,
        )
        return tuple(o[:, :b] for o in outs)

    # -- DdFftPlan-compatible interfaces ---------------------------------------

    def _apply_dd(self, value, transform: Transform):
        """((rh, rl), (ih, il)) with (..., n) planes — batch-major adapter."""
        (rh, rl), (ih, il) = value
        if isinstance(rh, np.ndarray):
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
        return (
            f"VpuDdBluesteinPlan(size={self.size}, inner={self.m_inner}, "
            f"cb={self.cb})"
        )

    # -- pytree -----------------------------------------------------------------

    def tree_flatten(self):
        children = (self.stage_tables, self.chirps_fwd, self.chirps_inv)
        aux = (self.size, self.m_inner, self.cb, self.interpret,
               self.vmem_limit_bytes)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        size, m_inner, cb, interpret, vmem = aux
        stage_tables, chirps_fwd, chirps_inv = children
        return cls(size, m_inner, stage_tables, chirps_fwd, chirps_inv,
                   cb=cb, interpret=interpret, vmem_limit_bytes=vmem)
