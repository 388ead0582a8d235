"""Comparative benchmark harness: fourier-tpu vs numpy.fft vs scipy.fft.

The fourier-bench analog (``fourier-bench/benches/fft_bench.rs``): the same
five size families — pow2 {256,512,1024}, pow3 {243,729,2187}, pow5
{125,625,3125}, composite {222,722,1418}, prime {191,439,1013} — across
{forward, inverse}, benchmarking this framework's TPU path against the host
FFTW-convention baselines (numpy.fft / scipy.fft on CPU), reporting wall time
per transform and GFLOP/s (5*N*log2(N) convention).

Because the TPU is reached over a ~6 ms-latency tunnel, device timing chains
CHAIN applications inside one jit dispatch (unitary mode keeps magnitudes
bounded); host baselines are timed directly.

Run:  python -m fourier_tpu.tools.bench_suite [--json out.json] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, List

import numpy as np

SIZE_FAMILIES = {
    "pow2": [256, 512, 1024],
    "pow3": [243, 729, 2187],
    "pow5": [125, 625, 3125],
    "composite": [222, 722, 1418],
    "prime": [191, 439, 1013],
}

CHAIN = 8
ITERS = 5


def _gflops(n: int, batch: int, seconds: float) -> float:
    return 5.0 * n * np.log2(max(n, 2)) * batch / seconds / 1e9


def bench_fourier_tpu(n: int, batch: int, forward: bool) -> float:
    """Seconds per batched transform on the default (TPU) backend."""
    import jax

    import fourier_tpu as ft
    from fourier_tpu.transform import Transform

    plan = ft.create_fft(n, np.complex64)
    mode = Transform.SQRT_SCALED_FFT if forward else Transform.SQRT_SCALED_IFFT

    @jax.jit
    def step(re, im):
        for _ in range(CHAIN):
            re, im = plan.transform_planar(re, im, mode)
        return re, im

    rng = np.random.default_rng(0)
    re = jax.numpy.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    im = jax.numpy.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    out = step(re, im)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(re, im)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (ITERS * CHAIN)


def bench_numpy(n: int, batch: int, forward: bool) -> float:
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))).astype(
        np.complex64
    )
    fn = np.fft.fft if forward else np.fft.ifft
    fn(x, axis=-1)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        fn(x, axis=-1)
    return (time.perf_counter() - t0) / ITERS


def bench_scipy(n: int, batch: int, forward: bool) -> float:
    try:
        import scipy.fft as sfft
    except ImportError:  # pragma: no cover
        return float("nan")
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))).astype(
        np.complex64
    )
    fn = sfft.fft if forward else sfft.ifft
    fn(x, axis=-1)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        fn(x, axis=-1)
    return (time.perf_counter() - t0) / ITERS


def run(batch: int = 1024, families=None, max_sizes: int = 0) -> List[Dict]:
    rows = []
    for family, sizes in SIZE_FAMILIES.items():
        if families and family not in families:
            continue
        if max_sizes:
            sizes = sizes[:max_sizes]
        for n in sizes:
            for forward in (True, False):
                row = {
                    "family": family,
                    "n": n,
                    "direction": "fft" if forward else "ifft",
                    "batch": batch,
                }
                for name, fn in (
                    ("fourier_tpu", bench_fourier_tpu),
                    ("numpy", bench_numpy),
                    ("scipy", bench_scipy),
                ):
                    try:
                        dt = fn(n, batch, forward)
                        row[f"{name}_us"] = round(dt * 1e6, 1)
                        row[f"{name}_gflops"] = round(_gflops(n, batch, dt), 1)
                    except Exception as e:  # pragma: no cover
                        row[f"{name}_error"] = str(e)[:100]
                rows.append(row)
                r = rows[-1]
                print(
                    f"{family:10s} n={n:5d} {row['direction']:4s} "
                    f"tpu={r.get('fourier_tpu_gflops', '?'):>8} GF  "
                    f"numpy={r.get('numpy_gflops', '?'):>7} GF  "
                    f"scipy={r.get('scipy_gflops', '?'):>7} GF",
                    flush=True,
                )
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", help="write results to this JSON file")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--family", action="append", help="limit to these families")
    ap.add_argument("--max-sizes", type=int, default=0,
                    help="limit sizes per family (0 = all)")
    args = ap.parse_args()
    rows = run(args.batch, families=args.family, max_sizes=args.max_sizes)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
