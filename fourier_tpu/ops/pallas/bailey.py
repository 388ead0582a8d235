"""Fused MXU FFT kernels: Bailey/four-step decomposition as dense matmuls.

This is the TPU-native replacement for the reference's hot loop — the AVX
butterfly kernels and stage driver (``autosort/mod.rs:174-404``). On TPU the
right primitive is not a vectorized butterfly but the 128x128 systolic MXU:
a length-n transform with n = n1*n2 (n1, n2 <= 128) is computed as

    X[k1*n2 + k2] = sum_a W_n1^(a*k1) * W_N^(a*k2) * sum_b x[a + n1*b] * W_n2^(b*k2)

i.e. per transform, with M = x.reshape(n2, n1) (planar re/im):

    phase A   G  = D_n2 @ M          -- MXU matmul, contraction over b
    glue      G' = G * T             -- VPU, dense (n2, n1) split twiddle
    phase B   O[k1, k2] = sum_a D_n1[k1, a] * G'[k2, a]
                                     -- dot_general over the minor axis,
                                        lands DIRECTLY in natural order

The whole transform is one fused kernel: input read once from HBM, output
written once, DFT/twiddle tables VMEM-resident across the batch grid. No
transposes, no lane shuffles, no per-stage HBM round-trips (the pure-XLA
Stockham path materializes every stage). For n <= 128 a single dense DFT
matmul per batch tile is used instead.

Everything is planar f32 (no complex dtype on this backend); complex matmuls
expand to 4 real matmuls with precision=HIGHEST (bf16x6 passes on the MXU,
f32-equivalent accuracy).

Why brute-force DFT matrices instead of radix butterflies: the MXU's f32
matmul throughput is ~10-20x the VPU's, so the 8*n*(n1+n2) matmul flops beat
5*n*log2(n) butterfly flops on wall-clock for every n <= 16384, need no
2^a*3^b restriction (any divisor split works — composite sizes come for
free), and avoid all relayout costs on the (8,128) tiled layout.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU-only installs too, but guard anyway
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_HIGHEST = jax.lax.Precision.HIGHEST


def _dg_minor(a, b):
    """(p, c) x (q, c) -> (p, q): contract both minor axes on the MXU."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGHEST,
    )


def _mm(a, b):
    """(p, c) x (c, q) -> (p, q) standard matmul on the MXU."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGHEST,
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _single_phase_kernel(dre_ref, dim_ref, xre_ref, xim_ref, ore_ref, oim_ref):
    """n <= 128: O[t, k] = sum_j D[k, j] x[t, j] — one dense DFT matmul.

    x block (TB, n); D (n, n); contraction over the minor axis of both.
    """
    xre, xim = xre_ref[...], xim_ref[...]
    dre, dim = dre_ref[...], dim_ref[...]
    ore_ref[...] = _dg_minor(xre, dre) - _dg_minor(xim, dim)
    oim_ref[...] = _dg_minor(xre, dim) + _dg_minor(xim, dre)


def _two_phase_kernel(
    tb: int,
    d2re_ref, d2im_ref, tre_ref, tim_ref, d1re_ref, d1im_ref,
    xre_ref, xim_ref, ore_ref, oim_ref,
):
    """128 < n <= 16384: per-transform two-phase MXU DFT (module docstring)."""
    d2re, d2im = d2re_ref[...], d2im_ref[...]
    tre, tim = tre_ref[...], tim_ref[...]
    d1re, d1im = d1re_ref[...], d1im_ref[...]
    for t in range(tb):  # static unroll over the batch tile
        mre, mim = xre_ref[t], xim_ref[t]
        # Phase A: G = D_n2 @ M (complex, 4 real matmuls).
        gre = _mm(d2re, mre) - _mm(d2im, mim)
        gim = _mm(d2re, mim) + _mm(d2im, mre)
        # Glue twiddle (VPU elementwise, fused).
        g2re = gre * tre - gim * tim
        g2im = gre * tim + gim * tre
        # Phase B: O[k1, k2] = sum_a D_n1[k1, a] * G'[k2, a] — natural order.
        ore_ref[t] = _dg_minor(d1re, g2re) - _dg_minor(d1im, g2im)
        oim_ref[t] = _dg_minor(d1re, g2im) + _dg_minor(d1im, g2re)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd, memory_space=_VMEM)


def _cdiv(a, b):
    return -(-a // b)


def mxu_fft_single(re, im, dre, dim, *, tb: int = 256, interpret: bool = False):
    """Batched DFT for n <= 128 via one fused MXU matmul kernel.

    re/im: (B, n) planar input. dre/dim: (n, n) planar DFT matrix (direction
    and normalization already folded in). Returns (B, n) planar output.
    """
    b, n = re.shape
    tb = min(tb, max(8, b))
    bp = _cdiv(b, tb) * tb
    if bp != b:
        pad = [(0, bp - b), (0, 0)]
        re = jnp.pad(re, pad)
        im = jnp.pad(im, pad)
    grid = (bp // tb,)
    out_shape = [jax.ShapeDtypeStruct((bp, n), jnp.float32)] * 2
    io_spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=_VMEM)
    ore, oim = pl.pallas_call(
        _single_phase_kernel,
        grid=grid,
        in_specs=[
            _const_spec((n, n)),
            _const_spec((n, n)),
            io_spec,
            io_spec,
        ],
        out_specs=[io_spec, io_spec],
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * bp * n * n, bytes_accessed=bp * n * 16, transcendentals=0
        ),
    )(dre, dim, re, im)
    return ore[:b], oim[:b]


def mxu_fft_two_phase(
    re, im, d2re, d2im, tre, tim, d1re, d1im, *, tb: int = 8, interpret: bool = False
):
    """Batched FFT for n = n1*n2 (n1, n2 <= 128) via the fused two-phase kernel.

    re/im: (B, n) planar input. Tables: D_n2 (n2, n2), split twiddle (n2, n1),
    D_n1 (n1, n1) — direction + normalization folded in by the caller.
    Returns (B, n) planar natural-order output.
    """
    b, n = re.shape
    n2 = d2re.shape[0]
    n1 = d1re.shape[0]
    assert n1 * n2 == n, (n1, n2, n)
    tb = min(tb, max(1, b))
    bp = _cdiv(b, tb) * tb
    if bp != b:
        pad = [(0, bp - b), (0, 0)]
        re = jnp.pad(re, pad)
        im = jnp.pad(im, pad)
    # M = x.reshape(n2, n1) per transform: row-major split of the flat index.
    re = re.reshape(bp, n2, n1)
    im = im.reshape(bp, n2, n1)
    grid = (bp // tb,)
    io_in = pl.BlockSpec((tb, n2, n1), lambda i: (i, 0, 0), memory_space=_VMEM)
    io_out = pl.BlockSpec((tb, n1, n2), lambda i: (i, 0, 0), memory_space=_VMEM)
    out_shape = [jax.ShapeDtypeStruct((bp, n1, n2), jnp.float32)] * 2
    ore, oim = pl.pallas_call(
        functools.partial(_two_phase_kernel, tb),
        grid=grid,
        in_specs=[
            _const_spec((n2, n2)),
            _const_spec((n2, n2)),
            _const_spec((n2, n1)),
            _const_spec((n2, n1)),
            _const_spec((n1, n1)),
            _const_spec((n1, n1)),
            io_in,
            io_in,
        ],
        out_specs=[io_out, io_out],
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * bp * n * (n1 + n2) + 14 * bp * n,
            bytes_accessed=bp * n * 16,
            transcendentals=0,
        ),
    )(d2re, d2im, tre, tim, d1re, d1im, re, im)
    ore = ore.reshape(bp, n)[:b]
    oim = oim.reshape(bp, n)[:b]
    return ore, oim


def xla_fft_single(re, im, dre, dim):
    """XLA twin of the single-phase kernel: one fused batched DFT matmul.

    Measured on this environment's chip, XLA's matmul lowering reaches
    36-92 TFLOP/s (HIGHEST) while Mosaic-compiled in-kernel dots top out
    around 5 TFLOP/s with ~2 ms fixed per-dispatch overhead — so the XLA
    form is the default production path and the Pallas kernels are kept as
    an option for environments with a healthy Mosaic matmul path.
    """
    dg = lambda x, d: jnp.einsum("tj,kj->tk", x, d, precision=_HIGHEST)
    ore = dg(re, dre) - dg(im, dim)
    oim = dg(re, dim) + dg(im, dre)
    return ore, oim


def xla_fft_two_phase_folded(re, im, d2re, d2im, dfre, dfim):
    """XLA two-phase with the glue twiddle folded into phase B.

    df has shape (n2, n1, n1): Df[k2, k1, a] = D_n1[k1, a] * W_N^(a*k2)
    (ops/dft_matrix.folded_phase_b), so twiddle + phase B run as one fused
    k2-batched contraction — one fewer full memory pass than the plain form.
    """
    b, n = re.shape
    n2 = d2re.shape[0]
    n1 = dfre.shape[1]
    mre = re.reshape(b, n2, n1)
    mim = im.reshape(b, n2, n1)
    mm = lambda d, m: jnp.einsum("kb,tba->tka", d, m, precision=_HIGHEST)
    gre = mm(d2re, mre) - mm(d2im, mim)
    gim = mm(d2re, mim) + mm(d2im, mre)
    dg = lambda d, g: jnp.einsum("kpa,tka->tpk", d, g, precision=_HIGHEST)
    ore = dg(dfre, gre) - dg(dfim, gim)
    oim = dg(dfre, gim) + dg(dfim, gre)
    return ore.reshape(b, n), oim.reshape(b, n)


def xla_fft_two_phase_packed(re, im, d2re, d2im, bdre, bdim):
    """XLA two-phase with phase B block-diagonal-packed (see packed_phase_b).

    bd has shape (n2/pack, pack*n1, pack*n1): `pack` adjacent k2's share one
    (pack*n1)-dim contraction, trading pack x flops for ~pack^2 x MXU
    utilization — the winning trade whenever n1 < 64 (the MXU runs K<64
    contractions at ~5% of its HIGHEST-precision peak; measured round 3).
    """
    b, n = re.shape
    n2 = d2re.shape[0]
    g, pn1, _ = bdre.shape
    pack = n2 // g
    n1 = pn1 // pack
    mre = re.reshape(b, n2, n1)
    mim = im.reshape(b, n2, n1)
    mm = lambda d, m: jnp.einsum("kb,tba->tka", d, m, precision=_HIGHEST)
    gre = mm(d2re, mre) - mm(d2im, mim)
    gim = mm(d2re, mim) + mm(d2im, mre)
    # (t, k2, a) -> (t, G, pack*n1): k2 = g*pack + kk, rows (kk, a) flatten
    # contiguously — a free reshape, no data movement.
    gre = gre.reshape(b, g, pn1)
    gim = gim.reshape(b, g, pn1)
    dg = lambda d, x: jnp.einsum("gPA,tgA->tgP", d, x, precision=_HIGHEST)
    yre = dg(bdre, gre) - dg(bdim, gim)
    yim = dg(bdre, gim) + dg(bdim, gre)
    # (t, G, pack*n1) == (t, k2, p); final index is j' = p*n2 + k2.
    tr = lambda y: jnp.transpose(y.reshape(b, n2, n1), (0, 2, 1)).reshape(b, n)
    return tr(yre), tr(yim)


def reference_two_phase(re, im, d2re, d2im, tre, tim, d1re, d1im):
    """XLA twin of the two-phase kernel (einsum): the default production path
    on this environment (see xla_fft_single docstring) and the differential
    oracle for the Pallas kernel."""
    b, n = re.shape
    n2, n1 = tre.shape
    mre = re.reshape(b, n2, n1)
    mim = im.reshape(b, n2, n1)
    mm = lambda d, m: jnp.einsum("kb,tba->tka", d, m, precision=_HIGHEST)
    gre = mm(d2re, mre) - mm(d2im, mim)
    gim = mm(d2re, mim) + mm(d2im, mre)
    g2re = gre * tre - gim * tim
    g2im = gre * tim + gim * tre
    dg = lambda d, g: jnp.einsum("pa,tka->tpk", d, g, precision=_HIGHEST)
    ore = dg(d1re, g2re) - dg(d1im, g2im)
    oim = dg(d1re, g2im) + dg(d1im, g2re)
    return ore.reshape(b, n), oim.reshape(b, n)
