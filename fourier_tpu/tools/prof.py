"""Profiling entry point: run a plan in a loop for profiler attachment.

The fourier-prof analog (``fourier-prof/src/main.rs``: a CLI that builds a
plan and runs ``fft_in_place`` forever for perf/vtune attachment), TPU-native:
optionally wraps the loop in a ``jax.profiler`` trace (XLA op-level timeline,
viewable in TensorBoard/Perfetto) and prints achieved GFLOP/s + effective HBM
bandwidth per iteration — the per-kernel roofline report of SURVEY.md §5.

Run:  python -m fourier_tpu.tools.prof --size 4096 [--batch 2048]
          [--iters 100 | --forever] [--trace /tmp/jax-trace]
          [--backend auto|mxu|stockham]
"""

from __future__ import annotations

import argparse
import contextlib
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--forever", action="store_true")
    ap.add_argument("--trace", help="jax.profiler trace output directory")
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()

    import jax

    import fourier_tpu as ft
    from fourier_tpu.transform import Transform

    plan = ft.create_fft(args.size, np.complex64, backend=args.backend)
    print(f"plan: {plan!r}")

    @jax.jit
    def step(re, im):
        return plan.transform_planar(re, im, Transform.SQRT_SCALED_FFT)

    rng = np.random.default_rng(0)
    re = jax.numpy.asarray(
        rng.standard_normal((args.batch, args.size)).astype(np.float32)
    )
    im = jax.numpy.asarray(
        rng.standard_normal((args.batch, args.size)).astype(np.float32)
    )
    t0 = time.perf_counter()
    re, im = step(re, im)
    jax.block_until_ready((re, im))
    print(f"compiled + first run in {time.perf_counter() - t0:.1f} s", flush=True)

    flops = 5.0 * args.size * np.log2(max(args.size, 2)) * args.batch
    bytes_moved = 2 * args.batch * args.size * 8  # planar f32 in + out

    ctx = (
        jax.profiler.trace(args.trace)
        if args.trace
        else contextlib.nullcontext()
    )
    with ctx:
        i = 0
        t_report = time.perf_counter()
        while args.forever or i < args.iters:
            re, im = step(re, im)
            i += 1
            if i % 50 == 0 or (not args.forever and i == args.iters):
                jax.block_until_ready((re, im))
                now = time.perf_counter()
                dt = (now - t_report) / min(50, i)
                t_report = now
                print(
                    f"iter {i}: {dt * 1e6:.0f} us/iter, "
                    f"{flops / dt / 1e9:.0f} GFLOP/s, "
                    f"{bytes_moved / dt / 1e9:.0f} GB/s effective",
                    flush=True,
                )
    if args.trace:
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
