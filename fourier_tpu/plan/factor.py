"""Size factorization for the mixed-radix Stockham planner.

Reproduces the reference's radix schedule exactly (``autosort/mod.rs:20-21`` and
``autosort/mod.rs:104-134``): RADICES = [4, 8, 4, 3, 2]; at most ONE leading
radix-4 stage is peeled first (in the reference this is the stride-1 stage with
the special AVX kernel — in the TPU build it is simply the first stage of the
fused kernel), then greedily as many 8s, then 4s, then 3s, then 2s as divide the
remaining size. If the residual is not 1 the size is not a 2^a*3^b multiple and
the planner falls back to Bluestein.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

RADICES: Tuple[int, ...] = (4, 8, 4, 3, 2)


def factorize_autosort(size: int) -> Optional[List[int]]:
    """Expanded per-stage radix list for `size`, or None if not 2^a*3^b.

    The returned list is the stage application order used by the stage driver
    (``autosort/mod.rs:338``): e.g. 4096 -> [4, 8, 8, 8, 2]; 243 -> [3]*5.
    """
    if size < 1:
        raise ValueError(f"FFT size must be >= 1, got {size}")
    remaining = size
    counts = [0] * len(RADICES)
    if remaining % RADICES[0] == 0:
        remaining //= RADICES[0]
        counts[0] = 1
    for idx in range(1, len(RADICES)):
        radix = RADICES[idx]
        while remaining % radix == 0:
            remaining //= radix
            counts[idx] += 1
    if remaining != 1:
        return None
    stages: List[int] = []
    for radix, count in zip(RADICES, counts):
        stages.extend([radix] * count)
    return stages


def next_power_of_two(n: int) -> int:
    """Smallest power of two >= n (Bluestein inner size helper,
    ``bluesteins.rs:110``)."""
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()
