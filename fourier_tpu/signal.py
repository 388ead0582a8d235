"""FFT-based convolution: ``fftconvolve`` / ``next_fast_len``.

Beyond-reference surface (the Rust reference ships transforms only): linear
convolution via the circular-convolution theorem is the canonical use of an
FFT library, and scipy.signal.fftconvolve is its de-facto interface. Semantics
follow scipy: inputs of equal rank, convolved over ``axes`` (default all),
non-convolved axes must match; ``mode`` is full / same (same shape as ``in1``)
/ valid.

TPU-native shape: each convolved axis is zero-padded to ``next_fast_len``
(the smallest 2^a*3^b size, which is exactly the Stockham/fused-kernel family
— no Bluestein detour for a size we chose ourselves), both spectra come from
the planner's plans (fused VPU kernels on TPU), the pointwise product and the
inverse run in the same jit. c64 runs fully on device; c128 runs the
double-word N-D path with the spectral product in host f64.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.ndim import NdFftPlan, _nd_plan
from fourier_tpu.transform import Transform


def next_fast_len(n: int) -> int:
    """Smallest m >= n with m = 2^a * 3^b (the fast Stockham family).

    The reference planner's fast family is 2^a*3^b (``RADICES = [4,8,4,3,2]``,
    ``autosort/mod.rs:20-21``); everything else pays a Bluestein ~4x penalty.
    Convolution gets to pick its own padded size, so it always picks fast.
    """
    n = int(n)
    if n <= 1:
        return 1
    best = 1 << (n - 1).bit_length()  # pure power of two upper bound
    p3 = 1
    while p3 < best:
        # smallest 2^a with p3 * 2^a >= n
        need = -(-n // p3)
        m = p3 * (1 << max(0, (need - 1).bit_length()))
        if n <= m < best:
            best = m
        p3 *= 3
    return best


def _norm_axes(ndim: int, axes) -> Tuple[int, ...]:
    if axes is None:
        return tuple(range(ndim))
    if np.isscalar(axes):
        axes = (axes,)
    out = tuple(sorted(a % ndim for a in axes))
    if len(set(out)) != len(out):
        raise ValueError(f"repeated axis in axes={axes}")
    return out


def _out_slice(mode: str, s1: int, s2: int, full: int) -> slice:
    if mode == "full":
        return slice(0, full)
    if mode == "same":
        start = (s2 - 1) // 2
        return slice(start, start + s1)
    if mode == "valid":
        if s1 < s2:
            raise ValueError(
                "valid mode requires in1 to be at least as large as in2 "
                "along every convolved axis"
            )
        return slice(s2 - 1, s1)
    raise ValueError(f"mode must be full/same/valid, got {mode!r}")


@jax.jit
def _conv_planar(plan, ar, ai, br, bi):
    """fftn(a) * fftn(b) -> unscaled-ifftn, planar c64, all inside one jit."""
    fr1, fi1 = plan.transform_planar(ar, ai, Transform.FFT)
    fr2, fi2 = plan.transform_planar(br, bi, Transform.FFT)
    pr = fr1 * fr2 - fi1 * fi2
    pi = fr1 * fi2 + fi1 * fr2
    return plan.transform_planar(pr, pi, Transform.IFFT)


def fftconvolve(in1, in2, mode: str = "full",
                axes: Optional[Sequence[int]] = None,
                dtype=np.complex64) -> np.ndarray:
    """Convolve two arrays via FFT (scipy.signal.fftconvolve semantics).

    Inputs must have equal rank; convolution runs over ``axes`` (default all),
    other axes must have matching sizes (batch dims). Real inputs produce a
    real output. ``dtype=complex128`` runs the double-precision path (dd on
    f32-only hardware).
    """
    a = np.asarray(in1)
    b = np.asarray(in2)
    if a.ndim != b.ndim:
        raise ValueError("in1 and in2 must have the same rank")
    if a.ndim == 0:
        return a * b
    conv_axes = _norm_axes(a.ndim, axes)
    for ax in range(a.ndim):
        if ax not in conv_axes and a.shape[ax] != b.shape[ax]:
            raise ValueError(
                f"non-convolved axis {ax} differs: {a.shape[ax]} vs "
                f"{b.shape[ax]}"
            )
    full = {ax: a.shape[ax] + b.shape[ax] - 1 for ax in conv_axes}
    fast = {ax: next_fast_len(s) for ax, s in full.items()}

    # Move convolved axes to the end (NdFftPlan transforms trailing axes).
    order = [ax for ax in range(a.ndim) if ax not in conv_axes] + list(conv_axes)
    at = np.transpose(a, order)
    bt = np.transpose(b, order)
    k = len(conv_axes)
    pad_a = [(0, 0)] * (a.ndim - k) + [
        (0, fast[ax] - at.shape[a.ndim - k + i])
        for i, ax in enumerate(conv_axes)
    ]
    pad_b = [(0, 0)] * (a.ndim - k) + [
        (0, fast[ax] - bt.shape[a.ndim - k + i])
        for i, ax in enumerate(conv_axes)
    ]
    at = np.pad(at, pad_a)
    bt = np.pad(bt, pad_b)
    shape = tuple(fast[ax] for ax in conv_axes)

    real_out = not (
        np.issubdtype(a.dtype, np.complexfloating)
        or np.issubdtype(b.dtype, np.complexfloating)
    )
    dtype = np.dtype(dtype)
    plan = _nd_plan(shape, dtype)
    if plan.is_dd or dtype == np.dtype(np.complex128):
        # Double precision: transforms on the plan's c128 path, pointwise
        # product in host f64 (exact relative to the dd transform accuracy).
        fa = plan.fft(at.astype(np.complex128))
        fb = plan.fft(bt.astype(np.complex128))
        out = np.asarray(plan.ifft(fa * fb))
    else:
        rt = np.float32
        ore, oim = _conv_planar(
            plan,
            jnp.asarray(np.real(at).astype(rt)),
            jnp.asarray(np.imag(at).astype(rt)),
            jnp.asarray(np.real(bt).astype(rt)),
            jnp.asarray(np.imag(bt).astype(rt)),
        )
        out = np.asarray(ore).astype(np.complex64) + 1j * np.asarray(oim)

    # Slice each convolved axis to the mode's window.
    sl = [slice(None)] * a.ndim
    for i, ax in enumerate(conv_axes):
        sl[a.ndim - k + i] = _out_slice(
            mode, a.shape[ax], b.shape[ax], full[ax]
        )
    out = out[tuple(sl)]
    # Undo the axis reordering.
    inv = np.argsort(order)
    out = np.transpose(out, inv)
    return np.real(out) if real_out else out


def prev_fast_len(n: int) -> int:
    """Largest m <= n with m = 2^a * 3^b (scipy.fft.prev_fast_len analog)."""
    n = int(n)
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    best, p3 = 1, 1
    while p3 <= n:
        best = max(best, p3 << ((n // p3).bit_length() - 1))
        p3 *= 3
    return best


# -- overlap-add convolution (scipy.signal.oaconvolve) ------------------------


def _oa_lens(s1: int, s2: int) -> Tuple[int, int]:
    """Per-axis overlap-add step sizes (in1_step, in2_step).

    scipy.signal's block-size model (_calc_oa_lens): the optimal FFT block
    for overlap-add with overlap v = min(s1,s2)-1 minimizes
    (block/(block-v))*log2(block), whose stationary point is the Lambert-W
    expression below. Only the larger input is split; the smaller rides whole
    in every block. Returns whole sizes (no split) when splitting cannot win.
    """
    if s1 == s2 or s1 == 1 or s2 == 1:
        return s1, s2
    swapped = s2 > s1
    big, small = (s2, s1) if swapped else (s1, s2)
    overlap = small - 1
    from scipy.special import lambertw

    opt = -overlap * float(np.real(lambertw(-1 / (2 * np.e * overlap), k=-1)))
    block = next_fast_len(int(np.ceil(opt)))
    if block >= big:
        return s1, s2
    big_step = block - small + 1
    return (small, big_step) if swapped else (big_step, small)


def _oa_fold(y: np.ndarray, ax_n: int, ax_b: int, advance: int,
             out_len: int) -> np.ndarray:
    """Overlap-add the step axis ``ax_n`` into the block axis ``ax_b``
    (each step shifted ``advance``), cropping the result to ``out_len``."""
    y = np.moveaxis(y, (ax_n, ax_b), (0, 1))
    n, bf = y.shape[0], y.shape[1]
    out = np.zeros(((n - 1) * advance + bf,) + y.shape[2:], y.dtype)
    for i in range(n):
        out[i * advance:i * advance + bf] += y[i]
    return np.moveaxis(out[:out_len], 0, ax_b - 1)


def oaconvolve(in1, in2, mode: str = "full",
               axes: Optional[Sequence[int]] = None,
               dtype=np.complex64) -> np.ndarray:
    """Convolve via overlap-add (scipy.signal.oaconvolve semantics).

    Same contract and output as :func:`fftconvolve`; wins when the convolved
    sizes are very unequal (long signal, short kernel): the long axis is cut
    into blocks that become a BATCH dimension, so the FFT work runs as many
    small batched transforms — the fused-kernel sweet spot on TPU — instead
    of one huge padded transform.
    """
    a = np.asarray(in1)
    b = np.asarray(in2)
    if a.ndim != b.ndim:
        raise ValueError("in1 and in2 must have the same rank")
    if a.ndim == 0:
        return a * b
    conv_axes = _norm_axes(a.ndim, axes)
    for ax in range(a.ndim):
        if ax not in conv_axes and a.shape[ax] != b.shape[ax]:
            raise ValueError(
                f"non-convolved axis {ax} differs: {a.shape[ax]} vs "
                f"{b.shape[ax]}"
            )
    steps = {ax: _oa_lens(a.shape[ax], b.shape[ax]) for ax in conv_axes}
    if all(
        steps[ax] == (a.shape[ax], b.shape[ax]) for ax in conv_axes
    ):
        # No axis benefits from splitting: plain FFT convolution.
        return fftconvolve(a, b, mode, axes, dtype)

    # Move convolved axes to the end, then cut each into (nstep, step).
    order = [ax for ax in range(a.ndim) if ax not in conv_axes] + list(conv_axes)
    at = np.transpose(a, order)
    bt = np.transpose(b, order)
    k = len(conv_axes)
    nb = a.ndim - k

    def _blocked(x: np.ndarray, which: int) -> np.ndarray:
        # trailing k axes -> k leading step-count axes + k trailing block axes
        nsteps, stps = [], []
        for i, ax in enumerate(conv_axes):
            st = steps[ax][which]
            s = x.shape[nb + i]
            n = -(-s // st)
            if n * st != s:
                pad = [(0, 0)] * x.ndim
                pad[nb + i] = (0, n * st - s)
                x = np.pad(x, pad)
            nsteps.append(n)
            stps.append(st)
        # Splitting each trailing axis into (n_i, st_i) pairs is a plain
        # C-order reshape because the axes are contiguous and in order.
        x = x.reshape(x.shape[:nb] + tuple(
            v for i in range(k) for v in (nsteps[i], stps[i])
        ))
        # interleaved (n_i, st_i) pairs -> all n axes, then all st axes
        perm = (
            list(range(nb))
            + [nb + 2 * i for i in range(k)]
            + [nb + 2 * i + 1 for i in range(k)]
        )
        return np.transpose(x, perm)

    at_blk = _blocked(at, 0)
    bt_blk = _blocked(bt, 1)
    block_full = tuple(
        steps[ax][0] + steps[ax][1] - 1 for ax in conv_axes
    )
    fast = tuple(next_fast_len(s) for s in block_full)

    pad_a = [(0, 0)] * (nb + k) + [
        (0, fast[i] - at_blk.shape[nb + k + i]) for i in range(k)
    ]
    pad_b = [(0, 0)] * (nb + k) + [
        (0, fast[i] - bt_blk.shape[nb + k + i]) for i in range(k)
    ]
    at_blk = np.pad(at_blk, pad_a)
    bt_blk = np.pad(bt_blk, pad_b)

    real_out = not (
        np.issubdtype(a.dtype, np.complexfloating)
        or np.issubdtype(b.dtype, np.complexfloating)
    )
    dtype = np.dtype(dtype)
    plan = _nd_plan(fast, dtype)
    if plan.is_dd or dtype == np.dtype(np.complex128):
        fa = plan.fft(at_blk.astype(np.complex128))
        fb = plan.fft(bt_blk.astype(np.complex128))
        y = np.asarray(plan.ifft(np.asarray(fa) * np.asarray(fb)))
    else:
        rt = np.float32
        ore, oim = _conv_planar(
            plan,
            jnp.asarray(np.real(at_blk).astype(rt)),
            jnp.asarray(np.imag(at_blk).astype(rt)),
            jnp.asarray(np.real(bt_blk).astype(rt)),
            jnp.asarray(np.imag(bt_blk).astype(rt)),
        )
        y = np.asarray(ore).astype(np.complex64) + 1j * np.asarray(oim)

    # Crop block axes to the true per-block conv length, then overlap-add
    # each step axis into its block axis (advance = the split side's step).
    y = y[
        tuple([slice(None)] * (nb + k) + [slice(0, s) for s in block_full])
    ]
    for i in reversed(range(k)):
        ax = conv_axes[i]
        st1, st2 = steps[ax]
        # advance = the step of whichever input was split along this axis
        # (in1 if it needed more than one step, else in2)
        advance = st1 if -(-a.shape[ax] // st1) > 1 else st2
        full_i = a.shape[ax] + b.shape[ax] - 1
        y = _oa_fold(y, nb + i, nb + 2 * i + 1, advance, full_i)

    sl = [slice(None)] * a.ndim
    for i, ax in enumerate(conv_axes):
        sl[nb + i] = _out_slice(
            mode, a.shape[ax], b.shape[ax],
            a.shape[ax] + b.shape[ax] - 1,
        )
    y = y[tuple(sl)]
    y = np.transpose(y, np.argsort(order))
    return np.real(y) if real_out else y


# -- analytic signal / FFT resampling / correlation ---------------------------


def hilbert(x, n: Optional[int] = None, dtype=None) -> np.ndarray:
    """Analytic signal via the FFT (scipy.signal.hilbert, axis=-1).

    Zeroes negative frequencies and doubles positive ones: the imaginary
    part of the result is the Hilbert transform of ``x`` (which must be
    real). Runs one forward + one inverse batched c2c transform.
    """
    from fourier_tpu.plan.planner import create_fft
    from fourier_tpu.transform import Transform

    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.complexfloating):
        raise ValueError("x must be real")
    n = x.shape[-1] if n is None else int(n)
    if n <= 0:
        raise ValueError("n must be positive")
    from fourier_tpu.ndim import _crop_pad_axis

    x = _crop_pad_axis(x, n, x.ndim - 1)
    if dtype is None:
        dtype = np.complex128 if x.dtype == np.float64 else np.complex64
    h = np.zeros(n, np.float64)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1:n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1:(n + 1) // 2] = 2.0
    plan = create_fft(n, dtype)
    spec = np.asarray(plan.transform(x.astype(dtype), Transform.FFT)) * h
    return np.asarray(plan.transform(spec, Transform.IFFT))


def hilbert2(x, n: Optional[Sequence[int]] = None,
             axes: Tuple[int, int] = (-2, -1), dtype=None) -> np.ndarray:
    """2-D analytic signal — scipy.signal.hilbert2's "single-orthant"
    transform: per axis, bins [1, (N+1)//2) are doubled and bins from
    (N+1)//2 on (including an even-N Nyquist) are zeroed."""
    from fourier_tpu.ndim import _crop_pad_axis, _nd_plan
    from fourier_tpu.transform import Transform

    x = np.atleast_2d(np.asarray(x))
    if np.issubdtype(x.dtype, np.complexfloating):
        raise ValueError("x must be real")
    if len(axes) != 2 or (axes[0] % x.ndim) == (axes[1] % x.ndim):
        raise ValueError("axes must be two distinct axes")
    x = np.moveaxis(x, axes, (-2, -1))
    if n is None:
        shape = x.shape[-2:]
    else:
        if np.isscalar(n):
            n = (int(n), int(n))
        if len(n) != 2 or min(int(n[0]), int(n[1])) <= 0:
            raise ValueError("n must be two positive ints")
        shape = (int(n[0]), int(n[1]))
        x = _crop_pad_axis(x, shape[0], x.ndim - 2)
        x = _crop_pad_axis(x, shape[1], x.ndim - 1)
    if dtype is None:
        dtype = np.complex128 if x.dtype == np.float64 else np.complex64

    def _h1(m: int) -> np.ndarray:
        h = np.zeros(m, np.float64)
        h[0] = 1.0
        h[1:(m + 1) // 2] = 2.0
        return h

    h = np.outer(_h1(shape[0]), _h1(shape[1]))
    plan = _nd_plan(shape, dtype)
    spec = np.asarray(plan.transform(x.astype(dtype), Transform.FFT)) * h
    out = np.asarray(plan.transform(spec, Transform.IFFT))
    return np.moveaxis(out, (-2, -1), axes)


def resample(x, num: int, t=None, axis: int = -1, window=None,
             domain: str = "time", dtype=None):
    """Fourier-domain resampling to ``num`` samples (scipy.signal.resample;
    NOTE the repo-wide default ``axis=-1``, scipy defaults to 0): transform,
    crop/zero-pad the spectrum with scipy's exact unpaired-Nyquist-bin
    bookkeeping, inverse-transform at the new length."""
    from fourier_tpu.plan.planner import create_fft
    from fourier_tpu.transform import Transform

    x = np.asarray(x)
    num = int(num)
    if num <= 0:
        raise ValueError("num must be positive")
    if domain not in ("time", "freq"):
        raise ValueError(f"domain must be 'time' or 'freq', got {domain!r}")
    if axis not in (-1, x.ndim - 1):
        x = np.moveaxis(x, axis, -1)
    n = x.shape[-1]
    complex_in = np.issubdtype(x.dtype, np.complexfloating)
    if dtype is None:
        dtype = (
            np.complex128
            if x.dtype in (np.float64, np.complex128) else np.complex64
        )

    if domain == "time":
        plan = create_fft(n, dtype)
        spec = np.asarray(plan.transform(x.astype(dtype), Transform.FFT))
    else:
        spec = np.asarray(x)
    spec = spec.astype(np.complex128)
    if window is not None:
        if callable(window):
            w = np.asarray(window(np.fft.fftfreq(n)), np.float64)
        elif hasattr(window, "shape"):
            w = np.asarray(window, np.float64)
            if w.shape != (n,):
                raise ValueError(
                    f"window length {w.shape} != number of bins ({n},)"
                )
        else:
            from scipy.signal import get_window

            w = np.fft.fftshift(
                np.asarray(get_window(window, n), np.float64)
            )
        spec = spec * w

    # scipy's spectrum crop/pad: m relevant bins, m2 = one-sided count
    # (includes the unpaired Nyquist bin of the SMALLER grid).
    m = min(n, num)
    m2 = m // 2 + 1
    newspec = np.zeros(spec.shape[:-1] + (num,), np.complex128)
    newspec[..., :m2] = spec[..., :m2]
    if m2 < m:
        newspec[..., m2 - m:] = spec[..., m2 - m:]
    if m % 2 == 0:
        if num < n:
            # down: fold the old negative twin into the unpaired bin
            newspec[..., -m // 2] += spec[..., n - m // 2]
        elif n < num:
            # up: split the unpaired bin into a +/- pair
            newspec[..., m // 2] *= 0.5
            newspec[..., num - m // 2] = newspec[..., m // 2]

    plan_out = create_fft(num, dtype)
    y = np.asarray(
        plan_out.transform(newspec.astype(dtype), Transform.IFFT)
    ) * (float(num) / float(n))
    if not complex_in and domain == "time":
        y = np.real(y)
    if axis not in (-1, y.ndim - 1):
        y = np.moveaxis(y, -1, axis)
    if t is None:
        return y
    new_t = np.arange(num) * (t[1] - t[0]) * n / float(num) + t[0]
    return y, new_t


def correlate(in1, in2, mode: str = "full",
              axes: Optional[Sequence[int]] = None,
              dtype=np.complex64) -> np.ndarray:
    """Cross-correlation via FFT (scipy.signal.correlate(method='fft')):
    ``corr(a, b) = conv(a, conj(reversed(b)))`` over ``axes``."""
    b = np.asarray(in2)
    conv_axes = _norm_axes(b.ndim, axes)
    rev = tuple(
        slice(None, None, -1) if ax in conv_axes else slice(None)
        for ax in range(b.ndim)
    )
    return fftconvolve(in1, np.conj(b[rev]), mode, axes, dtype)


def correlation_lags(in1_len: int, in2_len: int,
                     mode: str = "full") -> np.ndarray:
    """Lag indices for :func:`correlate` (scipy.signal.correlation_lags)."""
    in1_len, in2_len = int(in1_len), int(in2_len)
    if mode == "full":
        return np.arange(-in2_len + 1, in1_len)
    if mode == "same":
        lags = np.arange(-in2_len + 1, in1_len)
        mid = lags.size // 2
        start = mid - in1_len // 2
        return lags[start:start + in1_len]
    if mode == "valid":
        lag_max = max(in1_len, in2_len) - min(in1_len, in2_len)
        return np.arange(lag_max + 1) - (in2_len - min(in1_len, in2_len))
    raise ValueError(f"mode must be full/same/valid, got {mode!r}")


# -- chirp z-transform (scipy.signal.czt / zoom_fft) -------------------------
#
# Beyond-reference surface built on the machinery the reference DOES have:
# the Bluestein chirp-z factorization (bluesteins.rs:63-131) generalized to
# arbitrary (m, w, a) — X_k = sum_n x_n (a w^-k)^-n = w^{k^2/2} *
# conv(x_n a^-n w^{n^2/2}, w^{-j^2/2})_k. The convolution runs at
# next_fast_len(n+m-1) (2^a 3^b, the fused-kernel family) through the
# planner's plans; all chirp tables are f64 numpy at plan time (repo
# convention: no trig inside traces). For the default w (the zoom DFT
# w = exp(-2i*pi/m)) the quadratic phase is reduced mod 2m in exact integer
# arithmetic before the f64 trig, so table accuracy does not degrade as
# j^2 grows (the naive-phase hazard documented in docs/DESIGN.md).

_CZT_CACHE: "OrderedDict" = None  # initialized lazily below


def _czt_halfpow(w, q, m: int):
    """w^{q/2} for an integer index array q (values j^2), f64 complex.

    w=None means the default zoom chirp exp(-2i*pi/m): exact integer
    reduction q mod 2m keeps the phase argument small. Arbitrary w goes
    through f64 phase/magnitude (scipy-equivalent accuracy).
    """
    if w is None:
        red = np.array([int(t) % (2 * m) for t in q], dtype=np.float64)
        return np.exp(-1j * np.pi * red / m)
    w = complex(w)
    qf = np.asarray(q, dtype=np.float64)
    out = np.exp(1j * (np.angle(w) * qf / 2.0)).astype(np.complex128)
    mag = abs(w)
    if mag != 1.0:
        out = out * np.power(mag, qf / 2.0)
    return out


class CztPlan:
    """Chirp z-transform plan: X_k = sum_n x_n (a * w^-k)^-n, k = 0..m-1.

    scipy.signal.CZT analog. Generalizes the Bluestein plan (same three
    pointwise passes around a fast-size convolution) to arbitrary output
    count ``m``, ratio ``w`` (default exp(-2i*pi/m) — the DFT/zoom chirp)
    and starting point ``a``.
    """

    def __init__(self, n: int, m: Optional[int] = None, w=None, a=1 + 0j,
                 dtype=np.complex64):
        from fourier_tpu.plan.planner import create_fft

        self.n = int(n)
        self.m = self.n if m is None else int(m)
        if self.n < 1 or self.m < 1:
            raise ValueError(f"czt needs n >= 1 and m >= 1, got {n}, {m}")
        self.w = None if w is None else complex(w)
        self.a = complex(a)
        self.dtype = np.dtype(dtype)
        n_, m_ = self.n, self.m
        L = next_fast_len(n_ + m_ - 1)
        self.inner_size = L
        self.inner = create_fft(L, self.dtype)
        j = np.arange(max(n_, m_), dtype=np.int64)
        q = (j * j).astype(object)  # exact integer squares
        half = _czt_halfpow(self.w, q, m_)  # w^{j^2/2}
        # w^{-j^2/2}: conj only on the unit circle; for |w| != 1 the
        # reciprocal magnitude matters (conj would flip phase only).
        if self.w is None or abs(abs(self.w) - 1.0) < 1e-15:
            half_neg = np.conj(half)
        else:
            half_neg = 1.0 / half
        apow = np.power(self.a, -j[:n_].astype(np.float64))
        self._u_chirp = (half[:n_] * apow).astype(np.complex128)  # a^-n w^{n^2/2}
        self._y_chirp = half[:m_].astype(np.complex128)           # w^{k^2/2}
        v = np.zeros(L, dtype=np.complex128)
        v[:m_] = half_neg[:m_]                                    # w^{-j^2/2}
        if n_ > 1:
            v[L - (n_ - 1):] = half_neg[1:n_][::-1]               # mirror tail
        self._V = np.fft.fft(v)  # plan-time inner FFT, f64 (bluesteins.rs:46)

    def __call__(self, x, *, axis: int = -1):
        x = np.asarray(x)
        cdtype = self.dtype
        x = np.moveaxis(x, axis, -1).astype(
            np.complex128 if cdtype == np.complex128 else np.complex64
        )
        if x.shape[-1] != self.n:
            raise ValueError(f"axis length {x.shape[-1]} != plan n {self.n}")
        u = (x * self._u_chirp.astype(cdtype))
        pad = [(0, 0)] * (u.ndim - 1) + [(0, self.inner_size - self.n)]
        u = np.pad(u, pad)
        U = self.inner.transform(u, Transform.FFT)
        U = U * self._V.astype(cdtype)
        conv = self.inner.transform(U, Transform.IFFT)
        out = conv[..., : self.m] * self._y_chirp.astype(cdtype)
        return np.moveaxis(out.astype(cdtype), -1, axis)

    def __repr__(self):
        return (f"CztPlan(n={self.n}, m={self.m}, w={self.w}, a={self.a}, "
                f"inner={self.inner_size}, dtype={self.dtype.name})")


def _czt_cache():
    global _CZT_CACHE
    if _CZT_CACHE is None:
        from collections import OrderedDict

        _CZT_CACHE = OrderedDict()
    return _CZT_CACHE


def czt(x, m: Optional[int] = None, w=None, a=1 + 0j, *, axis: int = -1):
    """Chirp z-transform (scipy.signal.czt semantics).

    X_k = sum_n x_n z_k^-n over z_k = a * w^-k; default w = exp(-2i*pi/m)
    makes czt(x) == fft(x). complex64 in -> complex64 out, complex128/f64
    in -> complex128 (via the double-word path on TPU).
    """
    x = np.asarray(x)
    n = x.shape[axis]
    m_ = n if m is None else int(m)
    dtype = (
        np.complex128
        if x.dtype in (np.float64, np.complex128) else np.complex64
    )
    key = (n, m_, None if w is None else complex(w), complex(a), dtype.__name__)
    cache = _czt_cache()
    if key in cache:
        cache.move_to_end(key)
        plan = cache[key]
    else:
        plan = CztPlan(n, m_, w, a, dtype)
        cache[key] = plan
        while len(cache) > 64:
            cache.popitem(last=False)
    return plan(x, axis=axis)


def zoom_fft(x, fn, m: Optional[int] = None, *, fs=2, endpoint: bool = False,
             axis: int = -1):
    """Zoomed DFT over the band ``fn = [f1, f2]`` (scipy.signal.zoom_fft).

    Evaluates the z-transform on ``m`` points of the unit-circle arc from
    f1 to f2 (sample rate ``fs``); a pure-frequency czt with
    a = exp(2i*pi*f1/fs), w = exp(-2i*pi*(f2-f1)/((m - endpoint)*fs)).
    """
    x = np.asarray(x)
    n = x.shape[axis]
    m_ = n if m is None else int(m)
    if np.isscalar(fn):
        f1, f2 = 0.0, float(fn)
    else:
        f1, f2 = (float(v) for v in fn)
    fs = float(fs)
    k = (m_ - 1) if endpoint else m_
    if k < 1:
        raise ValueError("zoom_fft needs m >= 2 with endpoint=True")
    w = np.exp(-2j * np.pi * (f2 - f1) / (k * fs))
    a = np.exp(2j * np.pi * f1 / fs)
    return czt(x, m_, w, a, axis=axis)


# -- device-resident overlap-add convolution plan ------------------------------


class ConvolvePlan:
    """Device-resident 1-D FFT convolution with a fixed kernel, jittable
    end-to-end (the :class:`~fourier_tpu.spectral.StftPlan` treatment for
    :func:`oaconvolve`).

    A registered pytree holding the kernel's block spectrum: framing is a
    static gather, the spectral product and the overlap-add fold both run on
    device, so ``jit(plan.convolve_planar)`` executes with ZERO host
    transfers — unlike the host-side :func:`oaconvolve` (scipy-compatible
    numpy fold) this plan keeps a conv-heavy pipeline resident. Blocks become
    the batch dimension on the fused kernels (the many-small-FFT regime).

    c64 runs planar f32 on the fused VPU path; ``dtype=complex128`` builds
    the double-word (dd) twin: spectrum storage, spectral product
    (``ddcplx.mul``) and fold accumulation (``ddreal.add`` two-sums) all
    device-resident — no host f64 round-trip (round-3 ``fftconvolve`` kept
    the c128 product on host; this plan is the VERDICT-r3 item-7 fix).

    Beyond-reference surface: the Rust reference ships transforms only
    (fourier/src/lib.rs:31-60); convolution plans follow this repo's own
    StftPlan precedent.
    """

    def __init__(self, kernel, mode: str = "full", dtype=np.complex64,
                 block: Optional[int] = None):
        kernel = np.asarray(kernel)
        if kernel.ndim != 1:
            raise ValueError("ConvolvePlan takes a 1-D kernel")
        if mode not in ("full", "same", "valid"):
            raise ValueError(f"mode must be full/same/valid, got {mode!r}")
        self.mode = mode
        self.dtype = np.dtype(dtype)
        if self.dtype not in (np.dtype(np.complex64), np.dtype(np.complex128)):
            raise ValueError("dtype must be complex64 or complex128")
        self.dd = self.dtype == np.dtype(np.complex128)
        self.kernel_len = int(kernel.shape[0])
        self.kernel_is_real = not np.issubdtype(
            kernel.dtype, np.complexfloating
        )
        if block is None:
            # _oa_lens' Lambert-W optimum depends only on the overlap
            # (kernel_len - 1); probe with a huge signal to get the
            # unconditional block choice.
            L = self.kernel_len
            if L <= 1:
                block = max(L, 1)
            else:
                s1_step, s2_step = _oa_lens(1 << 60, L)
                block = (
                    next_fast_len(s1_step + L - 1)
                    if s1_step < (1 << 60) else next_fast_len(2 * L)
                )
        self.block = int(block)
        if self.block < self.kernel_len:
            raise ValueError(
                f"block {self.block} < kernel length {self.kernel_len}"
            )
        self.step = self.block - self.kernel_len + 1

        from fourier_tpu.plan.planner import create_fft

        # c128 pins backend="dd" so the plan exposes _apply_dd everywhere
        # (on CPU/x64 the auto c128 plan is native-f64 Stockham, which has
        # no dd planes; the dd twin is the TPU semantics and the point of
        # this plan's device-resident c128 product).
        self.inner = create_fft(
            self.block, self.dtype, backend="dd" if self.dd else "auto"
        )
        # Kernel block spectrum, computed exactly in f64 numpy at plan time.
        kf = np.fft.fft(
            np.pad(kernel.astype(np.complex128), (0, self.block - len(kernel)))
        )
        if self.dd:
            from fourier_tpu.precision import ddreal

            self.k_spec = (
                tuple(jnp.asarray(p) for p in ddreal.from_f64(kf.real)),
                tuple(jnp.asarray(p) for p in ddreal.from_f64(kf.imag)),
            )
        else:
            self.k_spec = (
                jnp.asarray(kf.real.astype(np.float32)),
                jnp.asarray(kf.imag.astype(np.float32)),
            )

    # -- geometry ---------------------------------------------------------------

    def n_blocks(self, s1: int) -> int:
        return -(-int(s1) // self.step)

    def out_len(self, s1: int) -> int:
        full = int(s1) + self.kernel_len - 1
        return len(range(full)[_out_slice(self.mode, int(s1),
                                          self.kernel_len, full)])

    def _mode_slice(self, s1: int) -> slice:
        full = s1 + self.kernel_len - 1
        return _out_slice(self.mode, s1, self.kernel_len, full)

    # -- traceable execution ------------------------------------------------------

    def _frames(self, p, s1: int):
        """(..., s1) -> (..., n_blocks, block): step-sized cuts, zero-padded."""
        k = self.n_blocks(s1)
        pad = [(0, 0)] * (np.ndim(p) - 1) + [(0, k * self.step - s1)]
        p = jnp.pad(jnp.asarray(p), pad)
        p = p.reshape(p.shape[:-1] + (k, self.step))
        tail = [(0, 0)] * np.ndim(p)
        tail[-1] = (0, self.block - self.step)
        return jnp.pad(p, tail)

    def _fold(self, y, s1: int):
        """Overlap-add (..., n_blocks, block) -> (..., out_len) and crop.

        Chunk view: block = q*step (padded), y[..., i, j, :] lands at output
        chunk i + j, so out_chunk[m] = sum_j y[..., m - j, j, :] — a sum of q
        statically shifted copies (no scatter; XLA fuses the pads+adds).
        The folded length (k+q-1)*step always covers full = s1+L-1 because
        k*step >= s1 and (q-1)*step >= block - step = L - 1.
        """
        k = self.n_blocks(s1)
        q = -(-self.block // self.step)
        pad = [(0, 0)] * np.ndim(y)
        pad[-1] = (0, q * self.step - self.block)
        y = jnp.pad(y, pad).reshape(y.shape[:-2] + (k, q, self.step))
        out = None
        for j in range(q):
            pj = [(0, 0)] * (np.ndim(y) - 1)
            pj[-2] = (j, q - 1 - j)
            cj = jnp.pad(y[..., :, j, :], pj)  # (..., k + q - 1, step)
            out = cj if out is None else out + cj
        out = out.reshape(out.shape[:-2] + ((k + q - 1) * self.step,))
        return out[..., self._mode_slice(s1)]

    def convolve_planar(self, re, im=None):
        """Planar c64 convolution: (..., s1) plane(s) -> (..., out_len) planes.

        Fully traceable; with ``im=None`` the imaginary plane is zero (real
        input) and only the real output plane is returned.
        """
        if self.dd:
            raise TypeError("dd plan: use convolve_planar_dd")
        real_in = im is None
        s1 = int(np.shape(re)[-1])
        fre = self._frames(re, s1)
        fim = jnp.zeros_like(fre) if real_in else self._frames(im, s1)
        zr, zi = self.inner.transform_planar(fre, fim, Transform.FFT)
        kr, ki = self.k_spec
        pr = zr * kr - zi * ki
        pi = zr * ki + zi * kr
        yr, yi = self.inner.transform_planar(pr, pi, Transform.IFFT)
        if real_in and self.kernel_is_real:
            return self._fold(yr, s1)
        return self._fold(yr, s1), self._fold(yi, s1)

    def convolve_planar_dd(self, rh, rl, ih=None, il=None):
        """dd (double-word c128) convolution on 4 planes, fully on device."""
        if not self.dd:
            raise TypeError("c64 plan: use convolve_planar")
        from fourier_tpu.precision import ddcplx, ddreal

        real_in = ih is None
        s1 = int(np.shape(rh)[-1])
        frh = self._frames(rh, s1)
        frl = self._frames(
            rl if rl is not None else jnp.zeros_like(rh), s1
        )
        if real_in:
            fih = jnp.zeros_like(frh)
            fil = jnp.zeros_like(frh)
        else:
            fih = self._frames(ih, s1)
            fil = self._frames(il if il is not None else jnp.zeros_like(ih),
                               s1)
        val = ((frh, frl), (fih, fil))
        z = self.inner._apply_dd(val, Transform.FFT)
        p = ddcplx.mul(z, self.k_spec)
        y = self.inner._apply_dd(p, Transform.IFFT)
        # Fold with two-sum accumulation (_fold_dd): the q shifted copies
        # overlap across blocks, and plain f32 adds there would lose the
        # lo-limb carries the dd transform just paid for.
        (orh, orl) = self._fold_dd(y[0], s1)
        if real_in and self.kernel_is_real:
            return orh, orl
        (oih, oil) = self._fold_dd(y[1], s1)
        return orh, orl, oih, oil

    def _fold_dd(self, pair, s1: int):
        """dd fold: the q shifted copies accumulate with ddreal.add."""
        from fourier_tpu.precision import ddreal

        hi, lo = pair
        k = self.n_blocks(s1)
        q = -(-self.block // self.step)

        def chunks(y):
            pad = [(0, 0)] * np.ndim(y)
            pad[-1] = (0, q * self.step - self.block)
            return jnp.pad(y, pad).reshape(y.shape[:-2] + (k, q, self.step))

        chi, clo = chunks(hi), chunks(lo)
        out = None
        for j in range(q):
            pj = [(0, 0)] * (np.ndim(chi) - 1)
            pj[-2] = (j, q - 1 - j)
            cj = (jnp.pad(chi[..., :, j, :], pj),
                  jnp.pad(clo[..., :, j, :], pj))
            out = cj if out is None else ddreal.add(out, cj)
        flat = lambda p: p.reshape(p.shape[:-2] + ((k + q - 1) * self.step,))
        ohi, olo = flat(out[0]), flat(out[1])
        sl = self._mode_slice(s1)
        return ohi[..., sl], olo[..., sl]

    # -- numpy conveniences --------------------------------------------------------

    def convolve(self, x) -> np.ndarray:
        """numpy convenience: returns the convolution as a numpy array."""
        x = np.asarray(x)
        complex_in = np.issubdtype(x.dtype, np.complexfloating)
        if self.dd:
            from fourier_tpu.precision import ddreal

            rh, rl = ddreal.from_f64(np.real(x).astype(np.float64))
            if complex_in:
                ih, il = ddreal.from_f64(np.imag(x).astype(np.float64))
                o = self.convolve_planar_dd(
                    jnp.asarray(rh), jnp.asarray(rl),
                    jnp.asarray(ih), jnp.asarray(il))
            else:
                o = self.convolve_planar_dd(jnp.asarray(rh), jnp.asarray(rl))
            if len(o) == 2:
                return ddreal.to_f64((np.asarray(o[0]), np.asarray(o[1])))
            re = ddreal.to_f64((np.asarray(o[0]), np.asarray(o[1])))
            im = ddreal.to_f64((np.asarray(o[2]), np.asarray(o[3])))
            return re + 1j * im
        rt = np.float32
        if complex_in:
            o = self.convolve_planar(
                jnp.asarray(np.real(x).astype(rt)),
                jnp.asarray(np.imag(x).astype(rt)))
        else:
            o = self.convolve_planar(jnp.asarray(np.real(x).astype(rt)))
        if isinstance(o, tuple):
            return np.asarray(o[0]).astype(np.complex64) + 1j * np.asarray(o[1])
        return np.asarray(o)

    def __call__(self, x):
        return self.convolve(x)

    def __repr__(self):
        return (
            f"ConvolvePlan(kernel_len={self.kernel_len}, block={self.block}, "
            f"step={self.step}, mode={self.mode!r}, dtype={self.dtype.name})"
        )

    # -- pytree ---------------------------------------------------------------------

    def tree_flatten(self):
        aux = (self.mode, self.dtype.name, self.kernel_len,
               self.kernel_is_real, self.block, self.step)
        return (self.inner, self.k_spec), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.mode, dtype_name, obj.kernel_len, obj.kernel_is_real,
         obj.block, obj.step) = aux
        obj.dtype = np.dtype(dtype_name)
        obj.dd = obj.dtype == np.dtype(np.complex128)
        obj.inner, obj.k_spec = children
        return obj


jax.tree_util.register_pytree_node(
    ConvolvePlan, lambda p: p.tree_flatten(), ConvolvePlan.tree_unflatten
)
