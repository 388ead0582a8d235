"""Stockham autosort plan: mixed-radix 2^a*3^b sizes.

Plan-time analog of ``Autosort`` (``autosort/mod.rs:49-135``): factorize the
size over the RADICES schedule, precompute per-stage forward and inverse twiddle
tables in f64 then narrow (``twiddle.rs:9-13``), and freeze everything into an
immutable pytree. Twiddles are stored as planar (re, im) real arrays — this TPU
backend has no complex dtype. No work buffer exists: execution is functional and
XLA owns the ping-pong buffers the reference managed by hand
(``mod.rs:337-378``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ops import stockham_jax
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.plan.factor import factorize_autosort
from fourier_tpu.transform import Transform
from fourier_tpu.twiddle import stage_twiddles

# Per-stage planar table: (re, im) arrays of shape (m, radix).
StageTw = Tuple[jnp.ndarray, jnp.ndarray]


@jax.tree_util.register_pytree_node_class
class AutosortPlan(FftPlan):
    """Immutable mixed-radix Stockham plan for sizes 2^a * 3^b."""

    _eager_host = True  # backend-polymorphic: numpy in -> eager numpy out

    def __init__(
        self,
        size: int,
        radices: Tuple[int, ...],
        dtype: np.dtype,
        fwd_twiddles: Tuple[StageTw, ...],
        inv_twiddles: Tuple[StageTw, ...],
    ):
        self.size = int(size)
        self.radices = tuple(int(r) for r in radices)
        self.dtype = np.dtype(dtype)
        self.fwd_twiddles = tuple(fwd_twiddles)
        self.inv_twiddles = tuple(inv_twiddles)

    # -- construction ------------------------------------------------------

    @classmethod
    def create(cls, size: int, dtype=np.complex64) -> Optional["AutosortPlan"]:
        """Plan `size`, or None when the size needs Bluestein
        (``Autosort::new``, ``mod.rs:104-134``)."""
        radices = factorize_autosort(size)
        if radices is None:
            return None
        dtype = np.dtype(dtype)
        real = np.float32 if dtype == np.complex64 else np.float64
        fwd, inv = [], []
        s = size
        for radix in radices:
            tf = stage_twiddles(s, radix, True)
            ti = stage_twiddles(s, radix, False)
            fwd.append(
                (jnp.asarray(tf.real.astype(real)), jnp.asarray(tf.imag.astype(real)))
            )
            inv.append(
                (jnp.asarray(ti.real.astype(real)), jnp.asarray(ti.imag.astype(real)))
            )
            s //= radix
        return cls(size, tuple(radices), dtype, tuple(fwd), tuple(inv))

    # -- execution ---------------------------------------------------------

    def _apply(self, re, im, transform: Transform):
        forward = transform.is_forward
        twiddles = self.fwd_twiddles if forward else self.inv_twiddles
        return stockham_jax.apply_stages(
            re, im, self.radices, twiddles, forward, self._scale_for(transform)
        )

    # -- pytree protocol ---------------------------------------------------

    def tree_flatten(self):
        children = (self.fwd_twiddles, self.inv_twiddles)
        aux = (self.size, self.radices, self.dtype.name)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        size, radices, dtype_name = aux
        fwd, inv = children
        return cls(size, radices, np.dtype(dtype_name), tuple(fwd), tuple(inv))

    def __repr__(self) -> str:
        return (
            f"AutosortPlan(size={self.size}, radices={self.radices}, "
            f"dtype={self.dtype.name})"
        )
