"""MXU-backed FFT plan: the fused Pallas execution path.

The production plan family on TPU hardware: holds planar DFT / split-twiddle
tables (plan-time f64 numpy, narrowed to f32 — the reference's plan/execute
split, ``twiddle.rs:9-13``) and executes through the fused Bailey kernels in
:mod:`fourier_tpu.ops.pallas.bailey`. Covers every n expressible as n1*n2 with
n1, n2 <= 128 (all n <= 128 directly; any composite up to 16384 with a
divisor pair); other sizes plan through Bluestein with an MXU inner plan or
fall back to the Stockham XLA path.

Normalization (the five ``Transform`` modes, ``fft.rs:5-16``) is folded into
the final-phase DFT matrix at trace time — a constant-folded multiply, zero
runtime cost.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ops.dft_matrix import (
    choose_pack,
    choose_split,
    dft_matrix,
    folded_phase_b,
    packed_phase_b,
    split_twiddle,
)
from fourier_tpu.ops.pallas import bailey
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.transform import Transform


def _planar(a: np.ndarray, real_dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return (
        jnp.asarray(a.real.astype(real_dtype)),
        jnp.asarray(a.imag.astype(real_dtype)),
    )


@jax.tree_util.register_pytree_node_class
class MxuFftPlan(FftPlan):
    """Fused-MXU FFT plan for n = n1*n2 (n1, n2 <= 128)."""

    _ad_opaque = True  # Pallas path has no AD rules; linear custom VJP

    def __init__(self, size, n1, n2, dtype, fwd_tables, inv_tables,
                 interpret=False, tb=None, impl="xla"):
        self.size = int(size)
        self.n1 = int(n1)
        self.n2 = int(n2)
        self.dtype = np.dtype(dtype)
        self.fwd_tables = tuple(fwd_tables)
        self.inv_tables = tuple(inv_tables)
        self.interpret = bool(interpret)
        self.tb = tb
        # 'xla': einsum forms (default — this environment's Mosaic lowers
        # in-kernel dots ~7x slower than XLA's matmuls, with ~2 ms fixed
        # per-dispatch cost); 'pallas': the fused kernels in ops/pallas/bailey.
        self.impl = impl

    @property
    def single_phase(self) -> bool:
        return self.n1 == 1

    # -- construction ------------------------------------------------------

    # Measured crossover (round 3, chained on-chip, B=65536): one full-size
    # DFT matmul beats the tiny-contraction two-phase einsums wherever both
    # split factors are small — the MXU runs K<64 contractions at ~5% of its
    # HIGHEST-precision peak (~27 TF), while an n<=768 direct matmul runs at
    # peak (191: 321 vs 117 GF; 222: 367 vs 160; 625: 248 vs 176; 722: 219
    # vs 199; crossover by 1013: 180 vs 206).
    DIRECT_SINGLE_MAX = 768

    @classmethod
    def create(cls, size: int, dtype=np.complex64, *, interpret: Optional[bool] = None,
               tb: Optional[int] = None, impl: str = "xla") -> Optional["MxuFftPlan"]:
        """Plan `size`, or None if no n1*n2 (<=128 each) split exists."""
        if size < 1:
            raise ValueError(f"FFT size must be >= 1, got {size}")
        dtype = np.dtype(dtype)
        if dtype != np.dtype(np.complex64):
            return None  # c128 runs on the Stockham path (f64 emulation later)
        split = choose_split(size)
        if split is None:
            return None
        n1, n2 = split
        if (
            n1 != 1
            and size <= cls.DIRECT_SINGLE_MAX
            and max(n1, n2) < 64
            and impl == "xla"
        ):
            n1, n2 = 1, size  # single full-size DFT matmul (see DIRECT_SINGLE_MAX)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        real = np.float32
        tables = {}
        for fwd in (True, False):
            if n1 == 1:
                d = dft_matrix(size, fwd)
                tables[fwd] = _planar(d, real)
            elif impl == "xla_packed":
                d2 = dft_matrix(n2, fwd)
                bd = packed_phase_b(n1, n2, fwd, choose_pack(n1, n2))
                tables[fwd] = _planar(d2, real) + _planar(bd, real)
            elif impl == "xla":
                # Twiddle folded into phase B (one fewer memory pass).
                d2 = dft_matrix(n2, fwd)
                df = folded_phase_b(n1, n2, fwd)
                tables[fwd] = _planar(d2, real) + _planar(df, real)
            else:
                d2 = dft_matrix(n2, fwd)
                t = split_twiddle(n1, n2, fwd)
                d1 = dft_matrix(n1, fwd)
                tables[fwd] = _planar(d2, real) + _planar(t, real) + _planar(d1, real)
        return cls(size, n1, n2, dtype, tables[True], tables[False],
                   interpret=interpret, tb=tb, impl=impl)

    @classmethod
    def create_direct(
        cls, size: int, dtype=np.complex64, *, interpret: Optional[bool] = None
    ) -> Optional["MxuFftPlan"]:
        """Single full-size DFT-matmul plan for ANY size (no split needed).

        The planner uses this for split-less sizes (primes > 128) up to
        DIRECT_SINGLE_MAX, where one at-peak matmul beats Bluestein's two
        padded inner transforms (191: 321 vs 117 GF; 439: 289 vs 161).
        """
        if size < 1:
            raise ValueError(f"FFT size must be >= 1, got {size}")
        dtype = np.dtype(dtype)
        if dtype != np.dtype(np.complex64):
            return None
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        real = np.float32
        tables = {
            fwd: _planar(dft_matrix(size, fwd), real) for fwd in (True, False)
        }
        return cls(size, 1, size, dtype, tables[True], tables[False],
                   interpret=interpret, impl="xla")

    # -- execution ---------------------------------------------------------

    def _apply(self, re, im, transform: Transform):
        transform = Transform(transform)
        forward = transform.is_forward
        tables = self.fwd_tables if forward else self.inv_tables
        re = jnp.asarray(re)
        im = jnp.asarray(im)
        batch_shape = re.shape[:-1]
        b = int(np.prod(batch_shape, initial=1))
        re2 = re.reshape(b, self.size)
        im2 = im.reshape(b, self.size)
        scale = self._scale_for(transform)
        kw = dict(interpret=self.interpret)
        if self.tb is not None:
            kw["tb"] = self.tb
        if self.single_phase:
            dre, dim = tables
            if scale is not None:
                # Trace-time constant fold: zero runtime cost.
                s = jnp.float32(scale)
                dre, dim = dre * s, dim * s
            if self.impl == "xla":
                ore, oim = bailey.xla_fft_single(re2, im2, dre, dim)
            else:
                ore, oim = bailey.mxu_fft_single(re2, im2, dre, dim, **kw)
        elif self.impl == "xla_packed":
            d2re, d2im, bdre, bdim = tables
            if scale is not None:
                s = jnp.float32(scale)
                bdre, bdim = bdre * s, bdim * s
            ore, oim = bailey.xla_fft_two_phase_packed(
                re2, im2, d2re, d2im, bdre, bdim
            )
        elif self.impl == "xla":
            d2re, d2im, dfre, dfim = tables
            if scale is not None:
                s = jnp.float32(scale)
                dfre, dfim = dfre * s, dfim * s
            ore, oim = bailey.xla_fft_two_phase_folded(
                re2, im2, d2re, d2im, dfre, dfim
            )
        else:
            d2re, d2im, tre, tim, d1re, d1im = tables
            if scale is not None:
                s = jnp.float32(scale)
                d1re, d1im = d1re * s, d1im * s
            ore, oim = bailey.mxu_fft_two_phase(
                re2, im2, d2re, d2im, tre, tim, d1re, d1im, **kw
            )
        return ore.reshape(*batch_shape, self.size), oim.reshape(*batch_shape, self.size)

    # -- pytree protocol ---------------------------------------------------

    def tree_flatten(self):
        children = (self.fwd_tables, self.inv_tables)
        aux = (self.size, self.n1, self.n2, self.dtype.name, self.interpret,
               self.tb, self.impl)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        size, n1, n2, dtype_name, interpret, tb, impl = aux
        fwd, inv = children
        return cls(size, n1, n2, np.dtype(dtype_name), tuple(fwd), tuple(inv),
                   interpret=interpret, tb=tb, impl=impl)

    def __repr__(self):
        return (
            f"MxuFftPlan(size={self.size}, split=({self.n1},{self.n2}), "
            f"dtype={self.dtype.name}, impl={self.impl})"
        )
