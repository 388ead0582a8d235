"""Fast Hankel transform (FFTLog): ``fht`` / ``ifht`` / ``fhtoffset``.

Completes the scipy.fft surface: the discrete Hankel transform

    A(k) = ∫_0^∞ a(r) J_mu(kr) k dr

of a log-uniformly sampled periodic sequence, via Hamilton's FFTLog
algorithm (A. J. S. Hamilton 2000, MNRAS 312, 257): in log space the
Hankel transform is a convolution, so it reduces to one real FFT, a
pointwise multiply by analytically-known coefficients

    u_m = (k_c r_c)^{-2iy} 2^{q+2iy} Γ(x⁺+iy) / Γ(x⁻-iy),
    x± = (mu+1±q)/2,  y = πm/(n·dln),

and one inverse real FFT.  Conventions (argument names, bias/offset
semantics, output flip) follow scipy.fft.fht so this is a drop-in.

TPU shape: the coefficient table is plan-time f64 numpy (loggamma via
scipy.special — trig/gamma never trace); the two real FFTs run through
this package's rfft/irfft plans (fused VPU kernels on TPU).
"""

from __future__ import annotations

import warnings

import numpy as np

from fourier_tpu.rfft import irfft, rfft

_LN2 = float(np.log(2.0))


def fhtcoeff(n: int, dln: float, mu: float, offset: float = 0.0,
             bias: float = 0.0, inverse: bool = False) -> np.ndarray:
    """FFTLog coefficient table u_m, m = 0..n//2 (plan-time, f64)."""
    from scipy.special import loggamma, poch

    q, lnkr = float(bias), float(offset)
    xp = (mu + 1.0 + q) / 2.0
    xm = (mu + 1.0 - q) / 2.0
    y = np.pi * np.arange(n // 2 + 1, dtype=np.float64) / (n * dln)
    # log u_m = q ln2 + lnΓ(x⁺+iy) − conj(lnΓ(x⁻+iy)) + 2iy(ln2 − lnkr)
    lg = (q * _LN2 + loggamma(xp + 1j * y) - np.conj(loggamma(xm + 1j * y))
          + 2j * y * (_LN2 - lnkr))
    with np.errstate(over="ignore", invalid="ignore"):
        u = np.exp(lg)
    if n % 2 == 0:
        u.imag[-1] = 0.0  # Nyquist coefficient must be real
    if not np.isfinite(u[0]):
        # u_0 = 2^q Γ(x⁺)/Γ(x⁻) = 2^q poch(x⁻, x⁺−x⁻); poch resolves the
        # negative-integer-pole cases to the correct limit (0 or inf)
        u[0] = 2.0 ** q * poch(xm, xp - xm)
    if np.isinf(u[0]) and not inverse:
        warnings.warn("singular transform; consider changing the bias",
                      stacklevel=3)
        u = u.copy()
        u[0] = 0.0
    elif u[0] == 0 and inverse:
        warnings.warn("singular inverse transform; consider changing the "
                      "bias", stacklevel=3)
        u = u.copy()
        u[0] = np.inf
    return u


def fhtoffset(dln: float, mu: float, initial: float = 0.0,
              bias: float = 0.0) -> float:
    """Offset nearest ``initial`` satisfying Hamilton's low-ringing
    condition (u_{n/2} real at the Nyquist frequency)."""
    from scipy.special import loggamma

    q, lnkr = float(bias), float(initial)
    xp = (mu + 1.0 + q) / 2.0
    xm = (mu + 1.0 - q) / 2.0
    y = np.pi / (2.0 * dln)
    arg = ((_LN2 - lnkr) / dln
           + (loggamma(xp + 1j * y).imag + loggamma(xm + 1j * y).imag)
           / np.pi)
    return lnkr + (arg - np.round(arg)) * dln


def _bias_exp(n: int, dln: float, bias: float, offset: float = 0.0):
    j = np.arange(n, dtype=np.float64)
    j_c = (n - 1) / 2.0
    return np.exp(-bias * ((j - j_c) * dln + offset))


def _core(a: np.ndarray, u: np.ndarray, inverse: bool) -> np.ndarray:
    n = a.shape[-1]
    spec = np.asarray(rfft(a))
    spec = spec / np.conj(u) if inverse else spec * u
    out = np.asarray(irfft(spec, n))
    return out[..., ::-1]


def fht(a, dln: float, mu: float, offset: float = 0.0,
        bias: float = 0.0) -> np.ndarray:
    """Fast Hankel transform of a log-uniform sequence (scipy.fft.fht)."""
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[-1]
    if bias != 0.0:
        a = a * _bias_exp(n, dln, bias)  # a_q(r) = a(r) (r/r_c)^-q
    out = _core(a, fhtcoeff(n, dln, mu, offset, bias), inverse=False)
    if bias != 0.0:
        out = out * _bias_exp(n, dln, bias, offset)
    return out


def ifht(A, dln: float, mu: float, offset: float = 0.0,
         bias: float = 0.0) -> np.ndarray:
    """Inverse fast Hankel transform (scipy.fft.ifht)."""
    A = np.asarray(A, dtype=np.float64)
    n = A.shape[-1]
    if bias != 0.0:
        A = A / _bias_exp(n, dln, bias, offset)
    out = _core(A, fhtcoeff(n, dln, mu, offset, bias, inverse=True),
                inverse=True)
    if bias != 0.0:
        out = out / _bias_exp(n, dln, bias)
    return out
