#!/usr/bin/env python
"""Headline benchmark: batched c64 FFT throughput at n=4096 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric follows BASELINE.json: batched c64 forward FFT GFLOP/s with the standard
5*N*log2(N) flop convention at n=4096. The reference publishes no absolute
numbers (BASELINE.md), so `vs_baseline` is reported against the driver's
north-star target: 70% of the single-chip HBM roofline for this kernel.

Roofline math (v5e, ~819 GB/s HBM): a fully fused out-of-place n=4096 c64
transform moves 2 * 4096 * 8 B = 64 KiB per transform and does
5 * 4096 * 12 = 245760 flops -> arithmetic intensity 3.75 flop/B ->
roofline = 3.75 * 819e9 = ~3071 GFLOP/s; the 70% target is ~2150 GFLOP/s.

Methodology: this chip is reached over a network tunnel with ~6 ms dispatch
latency, so a single dispatch per measurement would be latency-bound. We chain
CHAIN unitary (sqrt-scaled, magnitude-preserving) transforms inside one jitted
call and time whole dispatches; per-transform cost = dispatch_time / CHAIN.
"""

import json
import time

import numpy as np

N = 4096
BATCH = 2048
CHAIN = 8
WARMUP = 2
ITERS = 20
TARGET_GFLOPS = 2150.0  # 70% of v5e HBM roofline (see module docstring)


def main():
    import jax

    import fourier_tpu as ft
    from fourier_tpu.transform import Transform

    plan = ft.create_fft_f32(N)

    @jax.jit
    def step(re, im):
        for _ in range(CHAIN):
            re, im = plan.transform_planar(re, im, Transform.SQRT_SCALED_FFT)
        return re, im

    rng = np.random.default_rng(0)
    re = jax.numpy.asarray(rng.standard_normal((BATCH, N)).astype(np.float32))
    im = jax.numpy.asarray(rng.standard_normal((BATCH, N)).astype(np.float32))

    for _ in range(WARMUP):
        ore, oim = step(re, im)
    jax.block_until_ready((ore, oim))

    # Median of 3 measurement rounds: the tunnel to this chip adds ~10%
    # run-to-run jitter from external contention.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            ore, oim = step(re, im)
        jax.block_until_ready((ore, oim))
        times.append((time.perf_counter() - t0) / (ITERS * CHAIN))
    dt = sorted(times)[1]

    flops = 5.0 * N * np.log2(N) * BATCH
    gflops = flops / dt / 1e9

    print(
        json.dumps(
            {
                "metric": "batched_c64_fft_gflops_n4096",
                "value": round(float(gflops), 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(float(gflops) / TARGET_GFLOPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
