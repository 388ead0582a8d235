#!/usr/bin/env python
"""Headline benchmark: batched c64 FFT throughput at n=4096 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric follows BASELINE.json: batched c64 forward FFT GFLOP/s with the standard
5*N*log2(N) flop convention at n=4096. The reference publishes no absolute
numbers (BASELINE.md), so `vs_baseline` is reported against the driver's
north-star target: 70% of the single-chip HBM roofline for this kernel
(v5e figures: ~819 GB/s HBM -> roofline ~3071 GFLOP/s -> target ~2150).

Measured path: the fused all-stages-in-VMEM VPU Stockham kernel
(ops/pallas/stockham_vpu.py) over the framework's native batch-minor (n, B)
layout — the layout chained spectral pipelines (fft -> pointwise -> ifft) use
end-to-end with zero transposes. The batch-major MXU/XLA default path measures
~560 GFLOP/s on the same config.

Methodology: this chip sits behind a ~6 ms-latency tunnel with ~10% run-to-run
jitter and a fixed per-dispatch setup cost, so we chain CHAIN unitary
(magnitude-preserving) transforms inside one jitted dispatch — measuring the
steady-state per-transform rate a sustained pipeline sees — and report the
median of 3 measurement rounds. (Scaling at B=2048: chain 8 -> 816 GF,
16 -> 1180, 32 -> 1595, 64 -> 1885, 128 -> 1916. Batch scaling at chain 128
with the honest element-fetch sync: B=4096 -> 1788, 8192 -> 2023,
16384 -> 2258 GF — the chained pipeline carries ~95 us of per-iteration
cost beyond the kernel's 436 us device time, amortized by batch.)

The per-dispatch setup was profiled in round 2 (PROF_r2.json): ~0.4 ms of XLA
defensive input copies (eliminated by donate_argnums, and absent between
chained iterations inside one jit) plus ~0.9 ms irreducible tunnel overhead;
the kernel itself runs 436 us at this config (2.31 TF device-side). Measured
HBM streaming ceiling on this chip is ~1768 GB/s (2.2x the v5e spec figure
behind TARGET_GFLOPS); the kernel is VPU/relayout-bound, not HBM-bound.
"""

import json
import time

import numpy as np

N = 4096
# B=16384 amortizes the fixed per-iteration cost of the chained pipeline
# (measured round 3: B=4096 -> 1788 GF, 8192 -> 2023, 16384 -> 2258; the
# per-B=4096-slice time converges to the ~436 us kernel device time).
BATCH = 16384
CHAIN = 128
WARMUP = 2
ITERS = 5
TARGET_GFLOPS = 2150.0  # 70% of v5e HBM roofline (see module docstring)


def main():
    import jax

    import fourier_tpu as ft
    from fourier_tpu.transform import Transform

    # The DEFAULT planner: backend='auto' resolves to the fused VPU kernel on
    # TPU, so the headline number is what every ordinary user gets.
    plan = ft.create_fft_f32(N)
    assert hasattr(plan, "transform_planar_bm"), (
        "expected the fused batch-minor plan on TPU; got " + repr(plan)
    )

    # CHAIN dependent iterations via lax.scan: same steady-state measurement
    # as an unrolled loop (verified within run-to-run jitter), but the traced
    # graph is one iteration instead of 128 — the unrolled form's remote
    # compile occasionally exceeded the driver's timeout on this tunnel.
    @jax.jit
    def step(re_t, im_t):
        def body(carry, _):
            r, i = plan.transform_planar_bm(
                carry[0], carry[1], Transform.SQRT_SCALED_FFT
            )
            return (r, i), None

        (re_t, im_t), _ = jax.lax.scan(
            body, (re_t, im_t), None, length=CHAIN
        )
        return re_t, im_t

    rng = np.random.default_rng(0)
    # Native batch-minor layout: (n, B) planar planes.
    re_t = jax.numpy.asarray(rng.standard_normal((N, BATCH)).astype(np.float32))
    im_t = jax.numpy.asarray(rng.standard_normal((N, BATCH)).astype(np.float32))

    for _ in range(WARMUP):
        re_t, im_t = step(re_t, im_t)
    jax.block_until_ready((re_t, im_t))

    # Iterations are DEPENDENT (outputs feed back as inputs; the unitary mode
    # keeps magnitudes bounded) so no dispatch can be elided or overlapped
    # dishonestly by the runtime.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            re_t, im_t = step(re_t, im_t)
        # Hard sync via a 4-byte element fetch: on this relay,
        # block_until_ready alone has been observed to return before some
        # chained programs actually finish (round-3 finding), while a full
        # np.asarray fetch drags ~100 MB through the ~20 MB/s tunnel.
        # Fetching one element forces completion at negligible cost.
        float(re_t[0, 0])
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
