"""Short-time Fourier analysis: ``stft`` / ``istft`` (scipy.signal semantics).

Beyond-reference surface (the Rust reference ships raw transforms only,
``fourier/src/lib.rs:24-60``): the STFT is the canonical *batched* use of an
FFT library, and this framework's fused kernels are batch-native. The TPU
shape of the computation: framing/windowing/overlap-add are cheap host-side
numpy (plan-time style data movement), while ALL the transform work runs as
ONE batched rfft/fft with the frame axis as the batch dimension — many small
transforms in one device dispatch, the regime the fused VPU kernel was
measured fastest in (docs/DESIGN.md).

Window generation is plan-time f64 numpy via scipy.signal.get_window (repo
convention: no trig inside traces). Semantics and defaults mirror
scipy.signal.stft/istft including boundary extension, padding, one/two-sided
selection, 'spectrum'/'psd' scaling, and the NOLA invertibility check.

:class:`StftPlan` is the fully device-resident variant: a registered-pytree
plan whose forward/inverse are traceable end-to-end (static-gather framing,
scatter-add weighted overlap-add), for jit pipelines that must not leave the
chip between transform and analysis.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fourier_tpu.transform import Transform

__all__ = ["stft", "istft", "check_nola", "check_cola", "periodogram",
           "welch", "csd", "coherence", "spectrogram", "StftPlan"]


def _get_window(window, nperseg: int) -> np.ndarray:
    """Resolve a scipy-style window spec to an f64 array of length nperseg."""
    if isinstance(window, (str, tuple)):
        from scipy.signal import get_window

        return np.asarray(get_window(window, nperseg), np.float64)
    win = np.asarray(window, np.float64)
    if win.ndim != 1:
        raise ValueError("window must be 1-D")
    if win.shape[0] != nperseg:
        raise ValueError(
            f"window length {win.shape[0]} != nperseg {nperseg}"
        )
    return win


def _frame(x: np.ndarray, nperseg: int, nstep: int) -> np.ndarray:
    """(..., n) -> (..., nframes, nperseg) sliding view, copied once."""
    n = x.shape[-1]
    nframes = 1 + (n - nperseg) // nstep
    idx = (
        np.arange(nperseg)[None, :] + nstep * np.arange(nframes)[:, None]
    )
    return x[..., idx]


def _detrend_frames(frames: np.ndarray, detrend) -> np.ndarray:
    if not detrend:
        return frames
    if callable(detrend):
        return detrend(frames)
    if detrend == "constant":
        return frames - frames.mean(-1, keepdims=True)
    if detrend == "linear":
        n = frames.shape[-1]
        t = np.arange(n, dtype=np.float64)
        t = t - t.mean()
        denom = (t * t).sum()
        mean = frames.mean(-1, keepdims=True)
        slope = ((frames - mean) * t).sum(-1, keepdims=True) / denom
        return frames - mean - slope * t
    raise ValueError(f"detrend must be False/'constant'/'linear'/callable, "
                     f"got {detrend!r}")


def _extend_boundary(x: np.ndarray, kind: Optional[str],
                     ext: int) -> np.ndarray:
    """scipy.signal._arraytools-style boundary extension along the last axis."""
    if kind is None or ext == 0:
        return x
    if kind == "zeros":
        pad = [(0, 0)] * (x.ndim - 1) + [(ext, ext)]
        return np.pad(x, pad)
    # Reflect about the edge sample WITHOUT repeating it (scipy's
    # even_ext/odd_ext): left mirror is x[ext..1], right is x[-2..-ext-1].
    head = x[..., ext:0:-1]
    tail = x[..., -2:-(ext + 2):-1]
    if kind == "even":
        return np.concatenate([head, x, tail], axis=-1)
    if kind == "odd":
        return np.concatenate(
            [2 * x[..., :1] - head, x, 2 * x[..., -1:] - tail], axis=-1
        )
    if kind == "constant":
        return np.concatenate(
            [np.repeat(x[..., :1], ext, -1), x,
             np.repeat(x[..., -1:], ext, -1)], axis=-1
        )
    raise ValueError(
        f"boundary must be None/'zeros'/'even'/'odd'/'constant', got {kind!r}"
    )


def _resolve_seg(n: int, nperseg: Optional[int], noverlap: Optional[int],
                 nfft: Optional[int]) -> Tuple[int, int, int]:
    nperseg = 256 if nperseg is None else int(nperseg)
    if nperseg < 1:
        raise ValueError("nperseg must be >= 1")
    if nperseg > n:
        warnings.warn(
            f"nperseg = {nperseg} is greater than input length = {n}, "
            f"using nperseg = {n}"
        )
        nperseg = n
    noverlap = nperseg // 2 if noverlap is None else int(noverlap)
    if noverlap >= nperseg:
        raise ValueError("noverlap must be less than nperseg")
    nfft = nperseg if nfft is None else int(nfft)
    if nfft < nperseg:
        raise ValueError("nfft must be >= nperseg")
    return nperseg, noverlap, nfft


def _batched_fft(frames: np.ndarray, nfft: int, onesided: bool, dtype):
    """One batched transform over the trailing axis (frame axis = batch)."""
    if onesided:
        from fourier_tpu.rfft import _rfft_plan

        return np.asarray(_rfft_plan(nfft, dtype).rfft(frames))
    from fourier_tpu.plan.planner import create_fft
    from fourier_tpu.transform import Transform

    plan = create_fft(nfft, dtype)
    return np.asarray(plan.transform(frames.astype(dtype), Transform.FFT))


def stft(x, fs: float = 1.0, window="hann", nperseg: Optional[int] = None,
         noverlap: Optional[int] = None, nfft: Optional[int] = None,
         detrend=False, return_onesided: bool = True,
         boundary: Optional[str] = "zeros", padded: bool = True,
         scaling: str = "spectrum", dtype=None):
    """Short-time Fourier transform (scipy.signal.stft semantics).

    Returns ``(f, t, Zxx)`` with ``Zxx[..., freq, time]``. The transform runs
    as one batched rfft/fft with frames as the batch dimension. ``dtype``
    picks the transform family (complex64 default; complex128 = double-word
    path), independent of scipy's input-dtype-based promotion.
    """
    x = np.asarray(x)
    if x.size == 0:
        raise ValueError("x must be non-empty")
    n_in = x.shape[-1]
    nperseg_req = 256 if nperseg is None else int(nperseg)
    nperseg, noverlap, nfft = _resolve_seg(n_in, nperseg_req, noverlap, nfft)
    nstep = nperseg - noverlap
    win = _get_window(window, nperseg)

    complex_in = np.issubdtype(x.dtype, np.complexfloating)
    onesided = return_onesided and not complex_in
    if return_onesided and complex_in:
        warnings.warn(
            "Input data is complex, switching to return_onesided=False"
        )
    if dtype is None:
        dtype = (
            np.complex128
            if x.dtype in (np.float64, np.complex128) else np.complex64
        )

    x = _extend_boundary(x, boundary, nperseg // 2)
    if padded:
        nadd = (-(x.shape[-1] - nperseg) % nstep) % nperseg
        if nadd:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, nadd)]
            x = np.pad(x, pad)

    if scaling == "spectrum":
        scale = 1.0 / win.sum()
    elif scaling == "psd":
        scale = 1.0 / np.sqrt(fs * (win * win).sum())
    else:
        raise ValueError(f"scaling must be 'spectrum' or 'psd', got "
                         f"{scaling!r}")

    frames = _frame(x, nperseg, nstep)
    frames = _detrend_frames(
        frames.astype(np.complex128 if complex_in else np.float64), detrend
    )
    frames = frames * win
    if nfft > nperseg:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, nfft - nperseg)]
        frames = np.pad(frames, pad)

    if onesided:
        rt = np.float64 if dtype == np.dtype(np.complex128) else np.float32
        z = _batched_fft(frames.real.astype(rt), nfft, True, dtype)
    else:
        z = _batched_fft(frames, nfft, False, dtype)
    z = z * scale

    if onesided:
        f = np.arange(nfft // 2 + 1, dtype=np.float64) * (fs / nfft)
    else:
        f = np.fft.fftfreq(nfft, 1.0 / fs)
    t = (
        np.arange(nperseg / 2, x.shape[-1] - nperseg / 2 + 1, nstep)
        / float(fs)
    )
    if boundary is not None:
        t -= (nperseg / 2) / float(fs)
    # (..., time, freq) -> (..., freq, time), scipy's Zxx layout
    return f, t, np.moveaxis(z, -1, -2)


# -- jittable device-resident STFT plan ---------------------------------------


class StftPlan:
    """Device-resident STFT: the whole pipeline inside one jit.

    Unlike the host-side :func:`stft` (scipy-compatible framing in numpy),
    this plan is a registered pytree whose ``stft_planar``/``istft_planar``
    are fully traceable: framing is a static gather, the window is a
    VMEM-resident constant, the transform is one batched rfft/fft (frames =
    batch lanes), and the inverse is a scatter-add weighted overlap-add with
    the OLA norm constant-folded by XLA. Semantics match
    ``stft(x, boundary=None, padded=False)``: trailing samples that do not
    fill a full segment are dropped.

    ``onesided=True`` takes/returns real signal planes; ``onesided=False``
    runs c2c on planar (re, im). c64 on TPU; complex128 runs the native-f64
    path (CPU/x64 only — the dd path has no planar rfft batching here).
    """

    def __init__(self, nperseg: int, hop: Optional[int] = None,
                 window="hann", nfft: Optional[int] = None,
                 dtype=np.complex64, onesided: bool = True,
                 scaling: Optional[str] = "spectrum", fs: float = 1.0):
        self.nperseg = int(nperseg)
        if self.nperseg < 1:
            raise ValueError("nperseg must be >= 1")
        self.hop = self.nperseg // 2 if hop is None else int(hop)
        if not 1 <= self.hop <= self.nperseg:
            raise ValueError("need 1 <= hop <= nperseg")
        self.nfft = self.nperseg if nfft is None else int(nfft)
        if self.nfft < self.nperseg:
            raise ValueError("nfft must be >= nperseg")
        self.onesided = bool(onesided)
        self.scaling = scaling
        self.fs = float(fs)
        self.dtype = np.dtype(dtype)

        win = _get_window(window, self.nperseg)
        self._win_f64 = win
        if scaling is None:
            scale = 1.0
        elif scaling == "spectrum":
            scale = 1.0 / win.sum()
        elif scaling == "psd":
            scale = 1.0 / np.sqrt(self.fs * (win * win).sum())
        else:
            raise ValueError(
                f"scaling must be None/'spectrum'/'psd', got {scaling!r}"
            )
        self.scale = float(scale)
        rt = np.float32 if self.dtype == np.dtype(np.complex64) else np.float64
        self.real_dtype = np.dtype(rt)
        self.win = jnp.asarray((win * scale).astype(rt))
        self.win_inv = jnp.asarray(win.astype(rt))  # unscaled, for WOLA
        self.invertible = check_nola(win, self.nperseg, self.nperseg - self.hop)

        if self.onesided:
            from fourier_tpu.rfft import RfftPlan

            self.inner = RfftPlan(self.nfft, self.dtype)
            if getattr(self.inner, "dd", False):
                raise ValueError(
                    "StftPlan onesided needs a native (non-dd) rfft path; "
                    "use complex64, or complex128 only with jax x64"
                )
        else:
            from fourier_tpu.plan.planner import create_fft

            self.inner = create_fft(self.nfft, self.dtype)

    # -- geometry -------------------------------------------------------------

    @property
    def n_bins(self) -> int:
        return self.nfft // 2 + 1 if self.onesided else self.nfft

    def n_frames(self, n_samples: int) -> int:
        if n_samples < self.nperseg:
            raise ValueError(
                f"signal length {n_samples} < nperseg {self.nperseg}"
            )
        return 1 + (n_samples - self.nperseg) // self.hop

    def n_samples(self, n_frames: int) -> int:
        return (int(n_frames) - 1) * self.hop + self.nperseg

    def f(self) -> np.ndarray:
        if self.onesided:
            return np.arange(self.n_bins) * (self.fs / self.nfft)
        return np.fft.fftfreq(self.nfft, 1.0 / self.fs)

    def t(self, n_samples: int) -> np.ndarray:
        k = self.n_frames(n_samples)
        return (self.nperseg / 2 + self.hop * np.arange(k)) / self.fs

    def _idx(self, n: int) -> np.ndarray:
        k = self.n_frames(n)
        return (
            np.arange(self.nperseg)[None, :]
            + self.hop * np.arange(k)[:, None]
        )

    # -- execution (traceable) -------------------------------------------------

    def _frames(self, p, idx):
        return jnp.asarray(p).astype(self.real_dtype)[..., idx] * self.win

    def stft_planar(self, x, im=None):
        """(..., n) plane(s) -> (..., n_frames, n_bins) spectrum planes.

        Real one-sided: ``stft_planar(x) -> (re, im)``. Two-sided planar:
        ``stft_planar(re, im) -> (re, im)``.
        """
        idx = self._idx(np.shape(x)[-1])
        pad = [(0, 0)] * (np.ndim(x) + 1)
        pad[-1] = (0, self.nfft - self.nperseg)
        if self.onesided:
            if im is not None:
                raise ValueError("onesided plan takes a single real plane")
            fr = jnp.pad(self._frames(x, idx), pad)
            return self.inner.rfft_planar(fr)
        fre = jnp.pad(self._frames(x, idx), pad)
        fim = (
            jnp.zeros_like(fre)
            if im is None else jnp.pad(self._frames(im, idx), pad)
        )
        return self.inner.transform_planar(fre, fim, Transform.FFT)

    def istft_planar(self, re, im):
        """(..., n_frames, n_bins) planes -> signal plane(s), WOLA inverse."""
        if not self.invertible:
            raise ValueError(
                "NOLA condition failed for this window/hop: not invertible"
            )
        k = np.shape(re)[-2]
        n = self.n_samples(k)
        idx = self._idx(n)
        inv_scale = np.float64(1.0 / self.scale)
        if self.onesided:
            frames = self.inner.irfft_planar(re, im)
        else:
            fre, fim = self.inner.transform_planar(re, im, Transform.IFFT)
        rt = self.real_dtype

        def _ola(frames):
            fr = frames[..., :self.nperseg] * (self.win_inv * rt.type(inv_scale))
            out = jnp.zeros(frames.shape[:-2] + (n,), rt)
            return out.at[..., idx].add(fr)

        norm = jnp.zeros(n, rt).at[idx.reshape(-1)].add(
            jnp.tile(
                (self.win_inv * self.win_inv).astype(rt), (idx.shape[0],)
            )
        )
        norm = jnp.where(norm > 1e-10, norm, 1.0)
        if self.onesided:
            return _ola(frames) / norm
        return _ola(fre) / norm, _ola(fim) / norm

    def __repr__(self):
        side = "onesided" if self.onesided else "twosided"
        return (
            f"StftPlan(nperseg={self.nperseg}, hop={self.hop}, "
            f"nfft={self.nfft}, {side}, dtype={self.dtype.name})"
        )

    # -- pytree ----------------------------------------------------------------

    def tree_flatten(self):
        aux = (
            self.nperseg, self.hop, self.nfft, self.onesided, self.scaling,
            self.fs, self.dtype.name, self.scale, self.invertible,
            self._win_f64.tobytes(),
        )
        return (self.inner, self.win, self.win_inv), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.nperseg, obj.hop, obj.nfft, obj.onesided, obj.scaling, obj.fs,
         dtype_name, obj.scale, obj.invertible, win_bytes) = aux
        obj.dtype = np.dtype(dtype_name)
        obj.real_dtype = np.dtype(
            np.float32 if obj.dtype == np.dtype(np.complex64) else np.float64
        )
        obj._win_f64 = np.frombuffer(win_bytes, np.float64)
        obj.inner, obj.win, obj.win_inv = children
        return obj


jax.tree_util.register_pytree_node(
    StftPlan, lambda p: p.tree_flatten(), StftPlan.tree_unflatten
)


# -- power-spectral-density family (scipy.signal.welch etc.) -----------------


def _spect_frames(x: np.ndarray, fs: float, window, nperseg: Optional[int],
                  noverlap: Optional[int], nfft: Optional[int], detrend,
                  onesided: bool, scaling: str, dtype):
    """Shared welch/spectrogram core: scaled FFT frames (..., time, freq).

    Like scipy's _spectral_helper with boundary=None, padded=False: segments
    that do not fill a full nperseg are dropped. Returns (f, t, X) where X
    carries sqrt(scale), so any conj(X)*Y product carries exactly one power
    scale factor.
    """
    n = x.shape[-1]
    nperseg, noverlap, nfft = _resolve_seg(n, nperseg, noverlap, nfft)
    nstep = nperseg - noverlap
    win = _get_window(window, nperseg)

    complex_in = np.issubdtype(x.dtype, np.complexfloating)
    onesided = onesided and not complex_in
    if dtype is None:
        dtype = (
            np.complex128
            if x.dtype in (np.float64, np.complex128) else np.complex64
        )

    if scaling == "density":
        scale = 1.0 / (fs * (win * win).sum())
    elif scaling == "spectrum":
        scale = 1.0 / win.sum() ** 2
    else:
        raise ValueError(f"scaling must be 'density' or 'spectrum', got "
                         f"{scaling!r}")
    scale = np.sqrt(scale)

    frames = _frame(x, nperseg, nstep)
    frames = _detrend_frames(
        frames.astype(np.complex128 if complex_in else np.float64), detrend
    )
    frames = frames * win
    if nfft > nperseg:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, nfft - nperseg)]
        frames = np.pad(frames, pad)
    if onesided:
        rt = np.float64 if dtype == np.dtype(np.complex128) else np.float32
        z = _batched_fft(frames.real.astype(rt), nfft, True, dtype)
        f = np.arange(nfft // 2 + 1, dtype=np.float64) * (fs / nfft)
    else:
        z = _batched_fft(frames, nfft, False, dtype)
        f = np.fft.fftfreq(nfft, 1.0 / fs)
    t = np.arange(nperseg / 2, n - nperseg / 2 + 1, nstep) / float(fs)
    return f, t, z * scale, onesided, nfft


def _onesided_double(p: np.ndarray, nfft: int) -> np.ndarray:
    """Double the shared bins of a one-sided PSD (all but DC and Nyquist)."""
    p = p.copy()
    stop = -1 if nfft % 2 == 0 else p.shape[-1]
    p[..., 1:stop] *= 2.0
    return p


def _median_bias(n: int) -> float:
    """Bias of the median of n scaled chi^2(2) variables (scipy's)."""
    ii_2 = 2 * np.arange(1.0, (n - 1) // 2 + 1)
    return float(1 + np.sum(1.0 / (ii_2 + 1) - 1.0 / ii_2))


def csd(x, y, fs: float = 1.0, window="hann", nperseg: Optional[int] = None,
        noverlap: Optional[int] = None, nfft: Optional[int] = None,
        detrend="constant", return_onesided: bool = True,
        scaling: str = "density", average: str = "mean", dtype=None):
    """Cross power spectral density via Welch's method (scipy.signal.csd).

    Returns ``(f, Pxy)`` with ``Pxy = <conj(X) * Y>`` averaged over segments
    ('mean' or bias-corrected 'median'). Both signals' segment FFTs run as
    one batched transform each. The shorter input is zero-padded.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    same = x is y or (x.shape == y.shape and np.shares_memory(x, y))
    if not same and x.shape[-1] != y.shape[-1]:
        nmax = max(x.shape[-1], y.shape[-1])
        def _padto(a):
            if a.shape[-1] == nmax:
                return a
            pad = [(0, 0)] * (a.ndim - 1) + [(0, nmax - a.shape[-1])]
            return np.pad(a, pad)
        x, y = _padto(x), _padto(y)
    f, t, zx, onesided, nfft_r = _spect_frames(
        x, fs, window, nperseg, noverlap, nfft, detrend,
        return_onesided and not np.issubdtype(y.dtype, np.complexfloating),
        scaling, dtype,
    )
    if same:
        zy = zx
    else:
        _, _, zy, _, _ = _spect_frames(
            y, fs, window, nperseg, noverlap, nfft, detrend, onesided,
            scaling, dtype,
        )
    pxy = np.conj(zx) * zy
    if onesided:
        pxy = _onesided_double(pxy, nfft_r)
    nseg = pxy.shape[-2]
    if average == "mean":
        pxy = pxy.mean(-2)
    elif average == "median":
        pxy = (
            np.median(np.real(pxy), -2) + 1j * np.median(np.imag(pxy), -2)
        ) / _median_bias(nseg)
    else:
        raise ValueError(f"average must be 'mean' or 'median', got "
                         f"{average!r}")
    return f, pxy


def welch(x, fs: float = 1.0, window="hann", nperseg: Optional[int] = None,
          noverlap: Optional[int] = None, nfft: Optional[int] = None,
          detrend="constant", return_onesided: bool = True,
          scaling: str = "density", average: str = "mean", dtype=None):
    """Power spectral density via Welch's method (scipy.signal.welch)."""
    x = np.asarray(x)
    f, pxx = csd(x, x, fs, window, nperseg, noverlap, nfft, detrend,
                 return_onesided, scaling, average, dtype)
    return f, pxx.real


def periodogram(x, fs: float = 1.0, window="boxcar",
                nfft: Optional[int] = None, detrend="constant",
                return_onesided: bool = True, scaling: str = "density",
                dtype=None):
    """Single-segment PSD estimate (scipy.signal.periodogram)."""
    x = np.asarray(x)
    return welch(x, fs, window, nperseg=x.shape[-1], noverlap=0, nfft=nfft,
                 detrend=detrend, return_onesided=return_onesided,
                 scaling=scaling, dtype=dtype)


def coherence(x, y, fs: float = 1.0, window="hann",
              nperseg: Optional[int] = None, noverlap: Optional[int] = None,
              nfft: Optional[int] = None, detrend="constant", dtype=None):
    """Magnitude-squared coherence |Pxy|^2/(Pxx*Pyy) (scipy.signal.coherence)."""
    f, pxx = welch(x, fs, window, nperseg, noverlap, nfft, detrend,
                   dtype=dtype)
    _, pyy = welch(y, fs, window, nperseg, noverlap, nfft, detrend,
                   dtype=dtype)
    _, pxy = csd(x, y, fs, window, nperseg, noverlap, nfft, detrend,
                 dtype=dtype)
    return f, np.abs(pxy) ** 2 / (pxx * pyy)


def spectrogram(x, fs: float = 1.0, window=("tukey", 0.25),
                nperseg: Optional[int] = None,
                noverlap: Optional[int] = None, nfft: Optional[int] = None,
                detrend="constant", return_onesided: bool = True,
                scaling: str = "density", mode: str = "psd", dtype=None):
    """Per-segment spectrogram (scipy.signal.spectrogram semantics).

    ``mode`` is psd / complex / magnitude / angle / phase; default overlap is
    nperseg//8 (scipy's spectrogram default, unlike stft's 50%). Returns
    ``(f, t, Sxx)`` with ``Sxx[..., freq, time]``.
    """
    x = np.asarray(x)
    if noverlap is None:
        nperseg_r, _, _ = _resolve_seg(
            x.shape[-1], 256 if nperseg is None else int(nperseg), 0, nfft
        )
        noverlap = nperseg_r // 8
    if mode == "psd":
        f, t, z, onesided, nfft_r = _spect_frames(
            x, fs, window, nperseg, noverlap, nfft, detrend,
            return_onesided, scaling, dtype,
        )
        sxx = (np.conj(z) * z).real
        if onesided:
            sxx = _onesided_double(sxx, nfft_r)
    elif mode in ("complex", "magnitude", "angle", "phase"):
        f, t, z, onesided, nfft_r = _spect_frames(
            x, fs, window, nperseg, noverlap, nfft, detrend,
            return_onesided, scaling, dtype,
        )
        if mode == "complex":
            sxx = z
        elif mode == "magnitude":
            sxx = np.abs(z)
        else:
            sxx = np.angle(z)
            if mode == "phase":
                # scipy unwraps along the FREQUENCY axis (last, pre-move)
                sxx = np.unwrap(sxx, axis=-1)
    else:
        raise ValueError(
            f"mode must be psd/complex/magnitude/angle/phase, got {mode!r}"
        )
    return f, t, np.moveaxis(sxx, -1, -2)


def _ola_win(win: np.ndarray, nstep: int, nframes: int,
             squared: bool) -> np.ndarray:
    """Overlap-add of the (squared) window across all frame positions."""
    w = win * win if squared else win
    n = (nframes - 1) * nstep + win.shape[0]
    out = np.zeros(n, np.float64)
    for i in range(nframes):
        out[i * nstep:i * nstep + win.shape[0]] += w
    return out


def check_nola(window, nperseg: int, noverlap: int, tol: float = 1e-10) -> bool:
    """Nonzero-overlap-add invertibility condition (scipy.signal.check_NOLA)."""
    nperseg, noverlap = int(nperseg), int(noverlap)
    if nperseg < 1 or not 0 <= noverlap < nperseg:
        raise ValueError("need nperseg >= 1 and 0 <= noverlap < nperseg")
    win = _get_window(window, nperseg)
    nstep = nperseg - noverlap
    binsums = np.zeros(nstep)
    w2 = win * win
    for off in range(0, nperseg, nstep):
        chunk = w2[off:off + nstep]
        binsums[:chunk.shape[0]] += chunk
    return bool(np.min(binsums) > tol * np.max(w2))


def check_cola(window, nperseg: int, noverlap: int, tol: float = 1e-10) -> bool:
    """Constant-overlap-add condition (scipy.signal.check_COLA)."""
    nperseg, noverlap = int(nperseg), int(noverlap)
    if nperseg < 1 or not 0 <= noverlap < nperseg:
        raise ValueError("need nperseg >= 1 and 0 <= noverlap < nperseg")
    win = _get_window(window, nperseg)
    nstep = nperseg - noverlap
    binsums = np.zeros(nstep)
    for off in range(0, nperseg, nstep):
        chunk = win[off:off + nstep]
        binsums[:chunk.shape[0]] += chunk
    return bool(np.max(np.abs(binsums - binsums.mean())) < tol * nperseg)


def istft(Zxx, fs: float = 1.0, window="hann", nperseg: Optional[int] = None,
          noverlap: Optional[int] = None, nfft: Optional[int] = None,
          input_onesided: bool = True, boundary: bool = True,
          scaling: str = "spectrum", dtype=None):
    """Inverse STFT via weighted overlap-add (scipy.signal.istft semantics).

    ``Zxx[..., freq, time]`` as produced by :func:`stft`; returns ``(t, x)``.
    All inverse transforms run as one batched irfft/ifft (frames = batch).
    """
    Zxx = np.asarray(Zxx)
    if Zxx.ndim < 2:
        raise ValueError("Zxx must have at least 2 dimensions (freq, time)")
    nbins, nframes = Zxx.shape[-2], Zxx.shape[-1]
    if nperseg is None:
        if nfft is not None:
            nperseg = int(nfft)
        else:
            nperseg = 2 * (nbins - 1) if input_onesided else nbins
    nperseg = int(nperseg)
    nfft = nperseg if nfft is None else int(nfft)
    if nfft < nperseg:
        raise ValueError("nfft must be >= nperseg")
    want_bins = nfft // 2 + 1 if input_onesided else nfft
    if nbins != want_bins:
        raise ValueError(
            f"frequency axis has {nbins} bins, expected {want_bins} for "
            f"nfft={nfft} ({'one' if input_onesided else 'two'}-sided)"
        )
    noverlap = nperseg // 2 if noverlap is None else int(noverlap)
    if noverlap >= nperseg:
        raise ValueError("noverlap must be less than nperseg")
    nstep = nperseg - noverlap
    win = _get_window(window, nperseg)
    if not check_nola(win, nperseg, noverlap):
        raise ValueError(
            "NOLA condition failed: STFT not invertible with this "
            "window/noverlap"
        )

    if dtype is None:
        dtype = (
            np.complex128 if Zxx.dtype == np.complex128 else np.complex64
        )
    if scaling == "spectrum":
        unscale = win.sum()
    elif scaling == "psd":
        unscale = np.sqrt(fs * (win * win).sum())
    else:
        raise ValueError(f"scaling must be 'spectrum' or 'psd', got "
                         f"{scaling!r}")

    z = np.moveaxis(Zxx, -2, -1) * unscale  # (..., time, freq)
    if input_onesided:
        from fourier_tpu.rfft import _rfft_plan

        frames = np.asarray(_rfft_plan(nfft, dtype).irfft(z))
    else:
        from fourier_tpu.plan.planner import create_fft
        from fourier_tpu.transform import Transform

        plan = create_fft(nfft, dtype)
        frames = np.asarray(plan.transform(z.astype(dtype), Transform.IFFT))
    frames = frames[..., :nperseg] * win

    n = (nframes - 1) * nstep + nperseg
    x = np.zeros(frames.shape[:-2] + (n,), frames.dtype)
    for i in range(nframes):
        x[..., i * nstep:i * nstep + nperseg] += frames[..., i, :]
    norm = _ola_win(win, nstep, nframes, squared=True)
    x = x / np.where(norm > 1e-10, norm, 1.0)

    if boundary:
        ext = nperseg // 2
        x = x[..., ext:n - ext]
    t = np.arange(x.shape[-1]) / float(fs)
    if input_onesided:
        x = np.real(x)
    return t, x
