"""Dense DFT matrix + split-twiddle generation for the MXU execution path.

The reference computes FFTs butterfly-by-butterfly on AVX lanes; on TPU the
systolic MXU is ~10-20x the VPU's f32 throughput, so the TPU-native hot path
(see ops/pallas/bailey.py) evaluates sub-DFTs as dense matmuls: n = n1*n2 with
n1, n2 <= 128, each phase a (<=128 x <=128) DFT matrix contraction, glued by
the dense split twiddle W_N^(a*k2). Everything here is plan-time f64 numpy
(the reference's plan/execute split, ``twiddle.rs:9-13``), narrowed to planar
f32/f64 pairs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def dft_matrix(n: int, forward: bool) -> np.ndarray:
    """Dense (n, n) DFT matrix D[k, j] = W_n^(±k*j), complex128."""
    k = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * (k * j) / float(n)
    d = np.cos(theta) - 1j * np.sin(theta)
    return d if forward else np.conj(d)


def folded_phase_b(n1: int, n2: int, forward: bool, scale: float = 1.0) -> np.ndarray:
    """Phase-B DFT with the glue twiddle folded in: (n2, n1, n1) complex128.

    Df[k2, k1, a] = D_n1[k1, a] * T[k2, a] * scale. Using this as a
    k2-batched contraction computes twiddle+phase-B in one fused op —
    one fewer full memory pass per transform on the XLA path.
    """
    d1 = dft_matrix(n1, forward) * scale
    t = split_twiddle(n1, n2, forward)
    return d1[None, :, :] * t[:, None, :]


def packed_phase_b(
    n1: int, n2: int, forward: bool, pack: int, scale: float = 1.0
) -> np.ndarray:
    """Block-diagonal-packed phase B: (n2/pack, pack*n1, pack*n1) complex128.

    Groups `pack` adjacent k2's so the per-group contraction is a
    (pack*n1)-dim matmul instead of a k2-batched n1-dim one: the MXU runs
    K<64 contractions at ~5% of peak, so trading pack x flops for ~pack^2 x
    utilization wins whenever pack*n1 approaches 128 (measured round 3:
    batched 27-dim 1.6 TF vs 81-packed 5.3 TF). Requires pack | n2.

    BD[g, kk*n1 + p, kk'*n1 + a] = delta(kk, kk') * Df[g*pack + kk, p, a].
    """
    assert n2 % pack == 0, (n2, pack)
    df = folded_phase_b(n1, n2, forward, scale)  # (n2, n1, n1)
    g = n2 // pack
    dfg = df.reshape(g, pack, n1, n1)  # k2 = g*pack + kk
    bd = np.zeros((g, pack * n1, pack * n1), dtype=np.complex128)
    for kk in range(pack):
        bd[:, kk * n1:(kk + 1) * n1, kk * n1:(kk + 1) * n1] = dfg[:, kk]
    return bd


def choose_pack(n1: int, n2: int, limit: int = 128) -> int:
    """Largest pack with pack | n2 and pack*n1 <= limit (1 = no packing)."""
    best = 1
    for p in range(2, n2 + 1):
        if n2 % p == 0 and p * n1 <= limit:
            best = p
    return best


def split_twiddle(n1: int, n2: int, forward: bool) -> np.ndarray:
    """Dense (n2, n1) glue twiddle T[k2, a] = W_(n1*n2)^(±a*k2), complex128.

    The four-step middle factor: X[k1*n2 + k2] =
    sum_a W_n1^(a*k1) * T[k2, a] * sum_b x[a + n1*b] * W_n2^(b*k2).
    """
    n = n1 * n2
    k2 = np.arange(n2, dtype=np.float64)[:, None]
    a = np.arange(n1, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * (a * k2) / float(n)
    t = np.cos(theta) - 1j * np.sin(theta)
    return t if forward else np.conj(t)


def choose_split(n: int, limit: int = 128) -> Optional[Tuple[int, int]]:
    """Pick (n1, n2) with n = n1*n2, both <= limit, minimizing n1 + n2.

    Returns None when no such split exists (n > limit^2, or n has no divisor
    pair within the limit — e.g. large primes, which route to Bluestein).
    The DFT-matmul flop count is 8*n*(n1+n2), so the balanced split minimizes
    work; ties resolve to the larger n2 (longer phase-A contraction).
    Measured on the target chip, (64,64) beats (32,128) for n=4096.
    """
    if n <= limit:
        return (1, n)
    best = None
    best_sum = None
    for n2 in range(limit, 0, -1):
        if n % n2 == 0:
            n1 = n // n2
            if n1 <= limit and (best_sum is None or n1 + n2 < best_sum):
                best = (n1, n2)
                best_sum = n1 + n2
    return best
