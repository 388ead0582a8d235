"""Single-chip four-step composition: large transforms from two sub-plans.

The multi-chip four-step (parallel/sharded.py) shards the transform axis over
a mesh; this is its single-chip twin — a plan for n = p*q built from ANY two
plans for p and q (Stockham, MXU, or recursively another four-step):

    X[k1*q + k2] = sum_a W_p^(a*k1) * W_n^(a*k2) * sum_b x[a + p*b] * W_q^(b*k2)

i.e. reshape (q, p) -> q-point column FFTs -> dense split twiddle -> p-point
row FFTs -> transpose to natural order. Extends the MXU execution family to
any composite n up to 16384^2 (the reference's capability story caps at
single-node memory; here the planner composes until a divisor structure runs
out, then falls back to Bluestein, whose large power-of-two inner FFT also
routes through this plan).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ops import cplx
from fourier_tpu.ops.stockham_jax import xp_for
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.transform import Transform


def _split_twiddle_t(p: int, q: int, forward: bool, real_dtype):
    """Planar W_n^(±a*k2) of shape (p, q) indexed [a, k2], f64 plan time."""
    a = np.arange(p, dtype=np.float64)[:, None]
    k2 = np.arange(q, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * (a * k2) / float(p * q)
    re = np.cos(theta)
    im = -np.sin(theta) if forward else np.sin(theta)
    return re.astype(real_dtype), im.astype(real_dtype)


def choose_large_split(n: int, limit: int = 16384) -> Optional[Tuple[int, int]]:
    """Balanced divisor pair (p, q), both <= limit, or None."""
    if n <= limit:
        return None
    best = None
    best_mx = None
    q = int(np.sqrt(n))
    for cand in range(q, 0, -1):
        if n % cand == 0:
            other = n // cand
            if cand <= limit and other <= limit:
                mx = max(cand, other)
                if best_mx is None or mx < best_mx:
                    best = (cand, other)
                    best_mx = mx
                break  # first hit from sqrt downward is the most balanced
    return best


@jax.tree_util.register_pytree_node_class
class FourStepLocalPlan(FftPlan):
    """n = p*q transform composed from sub-plans for p and q."""

    def __init__(self, size, p, q, dtype, col_plan, row_plan, tw_fwd, tw_inv):
        self.size = int(size)
        self.p = int(p)
        self.q = int(q)
        self.dtype = np.dtype(dtype)
        self.col_plan = col_plan  # size q (the b-axis FFTs)
        self.row_plan = row_plan  # size p (the a-axis FFTs)
        self.tw_fwd = tw_fwd  # planar (p, q) pairs
        self.tw_inv = tw_inv

    @property
    def eager_host_ok(self) -> bool:
        return getattr(self.col_plan, "eager_host_ok", False) and getattr(
            self.row_plan, "eager_host_ok", False
        )

    @property
    def ad_opaque(self) -> bool:
        return getattr(self.col_plan, "ad_opaque", False) or getattr(
            self.row_plan, "ad_opaque", False
        )

    @classmethod
    def create(cls, size: int, dtype, p: int, q: int, plan_factory):
        """Build from `plan_factory(sub_size, dtype) -> FftPlan`."""
        assert p * q == size
        dtype = np.dtype(dtype)
        real = np.float32 if dtype == np.dtype(np.complex64) else np.float64
        col_plan = plan_factory(q, dtype)
        row_plan = plan_factory(p, dtype)
        tf = _split_twiddle_t(p, q, True, real)
        ti = _split_twiddle_t(p, q, False, real)
        return cls(
            size, p, q, dtype, col_plan, row_plan,
            (jnp.asarray(tf[0]), jnp.asarray(tf[1])),
            (jnp.asarray(ti[0]), jnp.asarray(ti[1])),
        )

    def transform_planar_bm(self, re_t, im_t,
                            transform: Transform = Transform.FFT):
        """Batch-minor (n, B) four-step: one transpose total.

        With x[a + p*b] on sublanes, the (n, B) planes reshape CONTIGUOUSLY
        to (q, p*B) for the column FFTs (no transpose), the split twiddle
        broadcasts as a (q, p, 1) table with the mode scale folded in (the
        table is 1/B the data size), one (q,p,B) -> (p,q,B) transpose feeds
        the row FFTs as (p, q*B), and the natural-order output
        X[k1*q + k2] is again a contiguous reshape. The batch-major
        ``_apply`` pays four transposes on the same data; this entry is the
        native layout for the suite's large-n rows (VERDICT r3 item 6).
        """
        transform = Transform(transform)
        if not (
            hasattr(self.col_plan, "transform_planar_bm")
            and hasattr(self.row_plan, "transform_planar_bm")
        ):
            ore, oim = self._apply(re_t.T, im_t.T, transform)
            return ore.T, oim.T
        re_t = jnp.asarray(re_t)
        im_t = jnp.asarray(im_t)
        if re_t.shape[0] != self.size:
            raise ValueError(
                f"leading axis {re_t.shape[0]} != plan size {self.size}"
            )
        b = re_t.shape[-1]
        p, q = self.p, self.q
        forward = transform.is_forward
        mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
        twr, twi = self.tw_fwd if forward else self.tw_inv  # (p, q) [a, k2]
        scale = self._scale_for(transform)
        if scale is not None:
            s = jnp.asarray(scale, dtype=twr.dtype)
            twr = twr * s
            twi = twi * s

        row_fused = self._row_fused_cfg()
        if row_fused is not None:
            # Fully fused path: the row kernel absorbs BOTH glue passes —
            # the dense split twiddle rides its entry multiply and the
            # (q,p,B)->(p,q,B) transpose happens in its grid indexing (a
            # tile-aligned (1,p,CB) read / (p,CB) natural-order store).
            from fourier_tpu.ops.pallas import stockham_vpu as _sv

            cb, interpret, vmem = row_fused
            bp = -(-b // cb) * cb
            if bp != b:
                pad = [(0, 0), (0, bp - b)]
                re_t = jnp.pad(re_t, pad)
                im_t = jnp.pad(im_t, pad)
            re = re_t.reshape(q, p * bp)
            im = im_t.reshape(q, p * bp)
            re, im = self.col_plan.transform_planar_bm(re, im, mode)
            tables = (
                self.row_plan.fwd_tables if forward
                else self.row_plan.inv_tables
            )
            ore, oim = _sv.vpu_fft_four_step_row(
                re.reshape(q, p, bp), im.reshape(q, p, bp), p, q,
                tables, (twr, twi), forward,
                cb=cb, interpret=interpret, vmem_limit_bytes=vmem,
            )
            return ore[:, :b], oim[:, :b]

        re = re_t.reshape(q, p * b)
        im = im_t.reshape(q, p * b)
        re, im = self.col_plan.transform_planar_bm(re, im, mode)  # [k2,(a,B)]
        twr_t = twr.T.reshape(q, p, 1)
        twi_t = twi.T.reshape(q, p, 1)
        re = re.reshape(q, p, b)
        im = im.reshape(q, p, b)
        re, im = re * twr_t - im * twi_t, re * twi_t + im * twr_t
        re = jnp.swapaxes(re, 0, 1).reshape(p, q * b)  # the one transpose
        im = jnp.swapaxes(im, 0, 1).reshape(p, q * b)
        re, im = self.row_plan.transform_planar_bm(re, im, mode)  # [k1,(k2,B)]
        return re.reshape(self.size, b), im.reshape(self.size, b)

    def _row_fused_cfg(self):
        """(cb, interpret, vmem_limit) when the row leg can run the fused
        four-step kernel: c64 with a VpuFftPlan row sub-plan (its stage
        tables and schedule are exactly what the kernel consumes)."""
        rp = self.row_plan
        if self.dtype != np.dtype(np.complex64):
            return None
        if not hasattr(rp, "fwd_tables") or not hasattr(rp, "cb"):
            return None
        from fourier_tpu.ops.pallas.stockham_vpu import radix_schedule

        if radix_schedule(self.p) is None:
            return None
        return rp.cb, rp.interpret, rp.vmem_limit_bytes

    def _apply(self, re, im, transform: Transform):
        transform = Transform(transform)
        forward = transform.is_forward
        xp = xp_for(re)
        re = xp.asarray(re)
        im = xp.asarray(im)
        batch_shape = re.shape[:-1]
        p, q = self.p, self.q
        # M[b, a] = x[a + p*b]: reshape (.., q, p); column FFTs run over b,
        # i.e. over the last axis of the (.., p-a, q-b) transposed view.
        re = re.reshape(*batch_shape, q, p)
        im = im.reshape(*batch_shape, q, p)
        re = xp.swapaxes(re, -1, -2)
        im = xp.swapaxes(im, -1, -2)
        mode = Transform.FFT if forward else Transform.UNSCALED_IFFT
        re, im = self.col_plan._apply(re, im, mode)  # (.., a, k2)
        tw = self.tw_fwd if forward else self.tw_inv
        re, im = cplx.mul((re, im), (xp.asarray(tw[0]), xp.asarray(tw[1])))
        re = xp.swapaxes(re, -1, -2)  # (.., k2, a)
        im = xp.swapaxes(im, -1, -2)
        re, im = self.row_plan._apply(re, im, mode)  # (.., k2, k1)
        # natural order: X[k1*q + k2] -> transpose to (.., k1, k2) and flatten
        re = xp.swapaxes(re, -1, -2).reshape(*batch_shape, self.size)
        im = xp.swapaxes(im, -1, -2).reshape(*batch_shape, self.size)
        scale = self._scale_for(transform)
        if scale is not None:
            s = xp.asarray(scale, dtype=re.dtype)
            re, im = re * s, im * s
        return re, im

    # -- pytree protocol ---------------------------------------------------

    def tree_flatten(self):
        children = (self.col_plan, self.row_plan, self.tw_fwd, self.tw_inv)
        aux = (self.size, self.p, self.q, self.dtype.name)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        size, p, q, dtype_name = aux
        col_plan, row_plan, tw_fwd, tw_inv = children
        return cls(size, p, q, np.dtype(dtype_name), col_plan, row_plan,
                   tw_fwd, tw_inv)

    def __repr__(self):
        return (
            f"FourStepLocalPlan(size={self.size}, split=({self.p},{self.q}), "
            f"col={self.col_plan!r}, row={self.row_plan!r})"
        )
