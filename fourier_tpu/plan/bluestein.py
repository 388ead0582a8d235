"""Bluestein chirp-z plan: arbitrary (prime/composite) sizes.

Plan-time analog of ``Bluesteins`` (``bluesteins.rs:63-131``): inner FFT size is
next_power_of_two(2n-1) (``bluesteins.rs:110``); the "w" table is the forward
FFT of the zero-padded wrap-mirrored chirp and the "x" table is the conjugate
chirp (``bluesteins.rs:18-61``). The reference executes its inner FFT *at plan
time* to build the w table (``bluesteins.rs:46-47``); here that plan-time FFT
runs in f64 numpy (outside any trace) and the result is narrowed to the plan
dtype — keeping all trig and planning out of the compiled path. All tables are
planar (re, im) real arrays (no complex dtype on this TPU backend).

Execution (``apply``, ``bluesteins.rs:215-259``): work = x⊙input zero-padded to
M, inner forward FFT, ⊙w, inner inverse FFT (1/M scaling absorbed there), then
⊙x with the mode's output normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ops import cplx
from fourier_tpu.plan.autosort import AutosortPlan
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.plan.factor import next_power_of_two
from fourier_tpu.transform import Transform
from fourier_tpu.twiddle import half_twiddle


def _chirp_tables(size: int, inner_size: int):
    """f64 (w_fwd, w_inv, x_fwd, x_inv) complex tables per ``bluesteins.rs:18-61``."""
    n, m = size, inner_size
    i = np.arange(m, dtype=np.float64)
    # Quadratic chirp index: i^2 for i < n, (i - m)^2 for i > m - n, else unused.
    d = np.where(i < n, i**2, (i - m) ** 2)
    mask = (i < n) | (i > m - n)
    chirp = np.where(mask, half_twiddle(d, n), 0.0 + 0.0j)
    w_fwd = np.fft.fft(np.conj(chirp))
    w_inv = np.fft.fft(chirp)
    j = np.arange(n, dtype=np.float64)
    x_inv = half_twiddle(-(j**2), n)  # exp(+i*pi*j^2/n)
    x_fwd = np.conj(x_inv)
    return w_fwd, w_inv, x_fwd, x_inv


@jax.tree_util.register_pytree_node_class
class BluesteinPlan(FftPlan):
    """Immutable Bluestein chirp-z plan for arbitrary sizes."""

    def __init__(self, size, dtype, inner, w_fwd, w_inv, x_fwd, x_inv):
        self.size = int(size)
        self.dtype = np.dtype(dtype)
        self.inner = inner
        self.w_fwd = w_fwd  # planar pairs: (re, im), shape (M,)
        self.w_inv = w_inv
        self.x_fwd = x_fwd  # planar pairs: (re, im), shape (n,)
        self.x_inv = x_inv

    @property
    def eager_host_ok(self) -> bool:
        # Eager-numpy host execution only if the inner plan supports it
        # (a fused Pallas inner would hit the Mosaic interpreter).
        return getattr(self.inner, "eager_host_ok", False)

    @property
    def ad_opaque(self) -> bool:
        return getattr(self.inner, "ad_opaque", False)

    @classmethod
    def create(cls, size: int, dtype=np.complex64, inner_factory=None) -> "BluesteinPlan":
        """Plan an arbitrary size. `inner_factory(size, dtype)` builds the
        power-of-two inner plan (any FftPlan; defaults to AutosortPlan) —
        the ``new_with_fft`` inner-FFT-maker pattern (``bluesteins.rs:109``).
        """
        if size < 1:
            raise ValueError(f"FFT size must be >= 1, got {size}")
        dtype = np.dtype(dtype)
        real = np.float32 if dtype == np.complex64 else np.float64
        inner_size = next_power_of_two(2 * size - 1)
        if inner_factory is None:
            inner = AutosortPlan.create(inner_size, dtype)
        else:
            inner = inner_factory(inner_size, dtype)
        assert inner is not None, "power-of-two inner size must factorize"
        tables = _chirp_tables(size, inner_size)
        planar = lambda a: (
            jnp.asarray(a.real.astype(real)),
            jnp.asarray(a.imag.astype(real)),
        )
        w_fwd, w_inv, x_fwd, x_inv = (planar(t) for t in tables)
        return cls(size, dtype, inner, w_fwd, w_inv, x_fwd, x_inv)

    @property
    def inner_size(self) -> int:
        return self.inner.size

    # -- execution ---------------------------------------------------------

    def _apply(self, re, im, transform: Transform):
        from fourier_tpu.ops.stockham_jax import xp_for

        xp = xp_for(re)
        forward = transform.is_forward
        xt = self.x_fwd if forward else self.x_inv
        wt = self.w_fwd if forward else self.w_inv
        xt = (xp.asarray(xt[0]), xp.asarray(xt[1]))
        wt = (xp.asarray(wt[0]), xp.asarray(wt[1]))
        pad_cfg = [(0, 0)] * (re.ndim - 1) + [(0, self.inner.size - self.size)]
        wre, wim = cplx.mul((re, im), xt)
        wre = xp.pad(wre, pad_cfg)
        wim = xp.pad(wim, pad_cfg)
        wre, wim = self.inner._apply(wre, wim, Transform.FFT)
        wre, wim = cplx.mul((wre, wim), wt)
        wre, wim = self.inner._apply(wre, wim, Transform.IFFT)  # absorbs 1/M
        ore, oim = cplx.mul((wre[..., : self.size], wim[..., : self.size]), xt)
        scale = self._scale_for(transform)
        if scale is not None:
            s = xp.asarray(scale, dtype=ore.dtype)
            ore, oim = ore * s, oim * s
        return ore, oim

    def transform_planar_bm(self, re_t, im_t,
                            transform: Transform = Transform.FFT):
        """Batch-minor (n, B) planar execution — transpose-free end-to-end
        when the inner plan is batch-minor native (the fused VPU kernel).

        The chirp/w pointwise passes broadcast the (n,)/(M,) tables as
        column vectors over the B lanes; the inner forward/inverse FFTs run
        through the inner plan's own batch-minor entry. Falls back to the
        batch-major path (one transpose each way) when the inner plan has no
        batch-minor entry.
        """
        transform = Transform(transform)
        re_t = jnp.asarray(re_t)
        im_t = jnp.asarray(im_t)
        if re_t.shape[0] != self.size:
            raise ValueError(
                f"leading axis {re_t.shape[0]} != plan size {self.size}"
            )
        if not hasattr(self.inner, "transform_planar_bm"):
            ore, oim = self._apply(re_t.T, im_t.T, transform)
            return ore.T, oim.T
        forward = transform.is_forward
        xt = self.x_fwd if forward else self.x_inv
        wt = self.w_fwd if forward else self.w_inv
        col = lambda p: p.reshape(-1, 1)
        xr, xi = col(xt[0]), col(xt[1])
        wr, wi = col(wt[0]), col(wt[1])
        wre = re_t * xr - im_t * xi
        wim = re_t * xi + im_t * xr
        pad = [(0, self.inner.size - self.size), (0, 0)]
        wre = jnp.pad(wre, pad)
        wim = jnp.pad(wim, pad)
        wre, wim = self.inner.transform_planar_bm(wre, wim, Transform.FFT)
        wre, wim = wre * wr - wim * wi, wre * wi + wim * wr
        wre, wim = self.inner.transform_planar_bm(
            wre, wim, Transform.IFFT
        )  # absorbs 1/M
        hre, him = wre[: self.size], wim[: self.size]
        ore = hre * xr - him * xi
        oim = hre * xi + him * xr
        scale = self._scale_for(transform)
        if scale is not None:
            s = jnp.asarray(scale, dtype=ore.dtype)
            ore, oim = ore * s, oim * s
        return ore, oim

    # -- pytree protocol ---------------------------------------------------

    def tree_flatten(self):
        children = (self.inner, self.w_fwd, self.w_inv, self.x_fwd, self.x_inv)
        aux = (self.size, self.dtype.name)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        size, dtype_name = aux
        inner, w_fwd, w_inv, x_fwd, x_inv = children
        return cls(size, np.dtype(dtype_name), inner, w_fwd, w_inv, x_fwd, x_inv)

    def __repr__(self) -> str:
        return (
            f"BluesteinPlan(size={self.size}, inner_size={self.inner.size}, "
            f"dtype={self.dtype.name})"
        )
