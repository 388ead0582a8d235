"""Pure-JAX mixed-radix Stockham autosort execution path (planar re/im).

This is the framework's XLA-compiled reference execution path that the Pallas
kernels are differentially tested against. It mirrors the reference stage
driver's semantics (``autosort/mod.rs:313-404``) but is expressed the TPU-native
way: a pure function over planar (re, im) real planes of shape (..., n), the
stage loop unrolled at trace time (stage structure is a plan constant),
reshape/stack replacing the explicit strided gather/scatter, and XLA fusing the
butterfly arithmetic. Planar representation is mandatory on this TPU backend —
it has no complex dtype support at all.

Stage semantics (``make_radix_fns!``, ``autosort/mod.rs:174-310``): with current
sub-transform size `s`, stride `st`, radix `r`, m = s/r, the input viewed as
(r, m, st) at (k, i, j) is butterflied along k, output k multiplied by
W_s^(i*k) (skipped on the final stage where s == r), and written to the output
viewed as (m, r, st) at (i, k, j). Then s /= r, st *= r. The reference's
in-place ping-pong work buffer (``data_in_output``, ``mod.rs:337-378``)
disappears: XLA owns buffers for the functional form.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from fourier_tpu.ops import cplx
from fourier_tpu.ops.butterflies import apply_butterfly

# A planar twiddle table for one stage: (re, im) arrays of shape (m, radix).
StageTwiddles = Tuple[jnp.ndarray, jnp.ndarray]


def xp_for(a):
    """numpy for numpy inputs, jnp otherwise.

    The whole execute path is backend-polymorphic: the same butterfly/stage
    code runs (a) traced under jit for TPU, (b) in plain vectorized numpy for
    the exhaustive oracle sweeps (eager jax would dispatch thousands of tiny
    ops), (c) inside Pallas kernels on ref slices.
    """
    return np if isinstance(a, np.ndarray) else jnp


def apply_stages(
    re: jnp.ndarray,
    im: jnp.ndarray,
    radices: Sequence[int],
    twiddles: Sequence[StageTwiddles],
    forward: bool,
    scale: Optional[float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run all Stockham stages over the last axis of the planar input.

    Args:
      re, im: real arrays of shape (..., n).
      radices: per-stage radix list from the planner (static).
      twiddles: per-stage planar (m, radix) twiddle tables, direction-matched
        (caller picks forward or inverse tables, per ``autosort/mod.rs:152-156``).
      forward: transform direction (selects butterfly rotation sign).
      scale: final normalization factor or None (``mod.rs:381-394``).
    """
    xp = xp_for(re)
    n = re.shape[-1]
    batch_shape = re.shape[:-1]
    size = n
    stride = 1
    for radix, (tw_re, tw_im) in zip(radices, twiddles):
        m = size // radix
        vre = re.reshape(*batch_shape, radix, m, stride)
        vim = im.reshape(*batch_shape, radix, m, stride)
        parts = [(vre[..., k, :, :], vim[..., k, :, :]) for k in range(radix)]
        outs = apply_butterfly(radix, parts, forward)
        if size != radix:
            # Twiddle multiply, skipped on the final all-ones stage
            # (``mod.rs:238-242``).
            for k in range(1, radix):
                t = (
                    xp.asarray(tw_re)[:, k].reshape(m, 1),
                    xp.asarray(tw_im)[:, k].reshape(m, 1),
                )
                outs[k] = cplx.mul(outs[k], t)
        re = xp.stack([o[0] for o in outs], axis=-2).reshape(*batch_shape, n)
        im = xp.stack([o[1] for o in outs], axis=-2).reshape(*batch_shape, n)
        size = m
        stride *= radix
    if scale is not None:
        s = xp.asarray(scale, dtype=re.dtype)
        re = re * s
        im = im * s
    return re, im
