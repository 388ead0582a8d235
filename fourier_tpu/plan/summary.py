"""Plan introspection: summaries and a per-stage cost model.

The reference has no observability at all (SURVEY.md §5: no log crate, no
metrics); the TPU build's planner-level observability is this module — a
structured description of what a plan will execute (stage/phase structure,
table sizes, flop and minimum-HBM-byte counts per batched transform) plus a
human-readable render. Useful for debugging planner choices and for roofline
sanity checks (tools/prof.py reports the measured side).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np


@dataclass
class PlanSummary:
    kind: str
    size: int
    dtype: str
    flops_per_transform: float  # algorithm flops (not the 5NlogN convention)
    table_bytes: int
    min_hbm_bytes_per_transform: int  # in + out planes, perfectly fused
    stages: List[str] = field(default_factory=list)
    children: List["PlanSummary"] = field(default_factory=list)

    def render(self, indent: int = 0) -> str:
        pad = "  " * indent
        lines = [
            f"{pad}{self.kind}(n={self.size}, dtype={self.dtype}): "
            f"{self.flops_per_transform / 1e3:.1f} kflop/transform, "
            f"tables {self.table_bytes / 1024:.0f} KiB, "
            f"min-HBM {self.min_hbm_bytes_per_transform / 1024:.0f} KiB"
        ]
        for s in self.stages:
            lines.append(f"{pad}  - {s}")
        for c in self.children:
            lines.append(c.render(indent + 1))
        return "\n".join(lines)


def _element_bytes(dtype_name: str) -> int:
    return 8 if dtype_name == "complex64" else 16  # planar pairs


def summarize(plan) -> PlanSummary:
    """Build a PlanSummary for any plan family."""
    from fourier_tpu.plan.autosort import AutosortPlan
    from fourier_tpu.plan.bluestein import BluesteinPlan
    from fourier_tpu.plan.four_step_local import FourStepLocalPlan
    from fourier_tpu.plan.mxu import MxuFftPlan

    try:
        from fourier_tpu.precision.dd_plan import DdFftPlan
    except ImportError:  # pragma: no cover
        DdFftPlan = ()

    from fourier_tpu.rfft import RfftPlan

    if isinstance(plan, RfftPlan):
        inner = summarize(plan.inner)
        stages = (
            ["even/odd de-interleave (reshape)", "half-size c2c FFT",
             "Hermitian unpack + W twiddle"]
            if plan.even
            else ["zero imaginary plane", "full c2c FFT", "one-sided slice"]
        )
        return PlanSummary(
            "RealFft", plan.n, plan.dtype.name,
            inner.flops_per_transform + 8.0 * plan.n,
            inner.table_bytes, plan.n * 4 + plan.out_len * 8, stages, [inner],
        )

    n = plan.size
    eb = _element_bytes(plan.dtype.name)
    io = 2 * n * eb

    if isinstance(plan, AutosortPlan):
        flops = 0.0
        stages = []
        s = n
        for r in plan.radices:
            # butterfly ~ r*log2(r)*6-ish flops per output group; use the
            # standard per-stage estimate 6*n complex-op flops per radix pass.
            flops += 6.0 * n * np.log2(r)
            stages.append(f"radix-{r} stage (size {s} -> {s // r})")
            s //= r
        tables = sum(
            t[0].size * t[0].dtype.itemsize * 2
            for t in plan.fwd_twiddles + plan.inv_twiddles
        )
        return PlanSummary("Stockham", n, plan.dtype.name, flops, tables, io, stages)

    if isinstance(plan, MxuFftPlan):
        if plan.single_phase:
            flops = 8.0 * n * n
            stages = [f"dense {n}x{n} DFT matmul (MXU)"]
        else:
            flops = 8.0 * n * (plan.n1 + plan.n2) + 14.0 * n
            stages = [
                f"phase A: {plan.n2}-point DFT matmul, batch {plan.n1}",
                f"glue twiddle ({plan.n2}x{plan.n1})"
                + (" folded into phase B" if plan.impl == "xla" else ""),
                f"phase B: {plan.n1}-point DFT contraction, batch {plan.n2}",
            ]
        tables = sum(
            int(np.prod(t.shape)) * t.dtype.itemsize
            for t in plan.fwd_tables + plan.inv_tables
        )
        return PlanSummary(
            f"MxuBailey[{plan.impl}]", n, plan.dtype.name, flops, tables, io, stages
        )

    if isinstance(plan, BluesteinPlan):
        inner = summarize(plan.inner)
        flops = 2 * inner.flops_per_transform + 6.0 * (3 * n + plan.inner.size)
        tables = (
            sum(p.size * p.dtype.itemsize for pair in
                (plan.w_fwd, plan.w_inv, plan.x_fwd, plan.x_inv) for p in pair)
            + inner.table_bytes
        )
        stages = [
            f"chirp multiply + zero-pad to {plan.inner.size}",
            "inner forward FFT",
            "spectral multiply by w",
            "inner inverse FFT",
            "chirp multiply + normalize",
        ]
        return PlanSummary(
            "Bluestein", n, plan.dtype.name, flops, tables, io, stages, [inner]
        )

    if isinstance(plan, FourStepLocalPlan):
        col = summarize(plan.col_plan)
        row = summarize(plan.row_plan)
        flops = (
            plan.p * col.flops_per_transform
            + plan.q * row.flops_per_transform
            + 6.0 * n
        )
        tables = col.table_bytes + row.table_bytes + 2 * n * (eb // 2)
        stages = [
            f"column FFTs ({plan.q}-point x {plan.p})",
            f"dense split twiddle ({plan.p}x{plan.q})",
            f"row FFTs ({plan.p}-point x {plan.q})",
            "natural-order transpose",
        ]
        return PlanSummary(
            "FourStepLocal", n, plan.dtype.name, flops, tables, io, stages,
            [col, row],
        )

    from fourier_tpu.plan.vpu import VpuFftPlan

    if isinstance(plan, VpuFftPlan):
        from fourier_tpu.ops.pallas.stockham_vpu import radix_schedule

        sched = radix_schedule(n)
        flops = sum(6.0 * n * np.log2(r) for r in sched)
        tables = sum(
            int(np.prod(t.shape)) * t.dtype.itemsize
            for pair in plan.fwd_tables + plan.inv_tables for t in pair
        )
        stages = [f"fused VMEM radix-{r} stage" for r in sched]
        return PlanSummary(
            "VpuFused", n, plan.dtype.name, flops, tables, io, stages
        )

    from fourier_tpu.plan.bluestein_fused import VpuBluesteinPlan

    if isinstance(plan, VpuBluesteinPlan):
        from fourier_tpu.ops.pallas.stockham_vpu import radix_schedule

        m = plan.m_inner
        sched = radix_schedule(m)
        flops = 2 * sum(6.0 * m * np.log2(r) for r in sched) + 18.0 * n
        tables = sum(
            int(np.prod(np.asarray(t).shape)) * 4
            for grp in (plan.stage_tables, plan.chirps_fwd, plan.chirps_inv)
            for pair in grp for t in pair
        )
        stages = (
            ["fused VMEM chirp multiply + zero-pad"]
            + [f"fused VMEM radix-{r} stage (fwd)" for r in sched]
            + ["fused VMEM w multiply"]
            + [f"fused VMEM radix-{r} stage (inv)" for r in sched]
            + ["fused VMEM chirp multiply (1/M folded)"]
        )
        return PlanSummary(
            "VpuFusedBluestein", n, plan.dtype.name, flops, tables, io, stages
        )

    try:
        from fourier_tpu.precision.vpu_dd_plan import VpuDdFftPlan
    except ImportError:  # pragma: no cover
        VpuDdFftPlan = ()

    if VpuDdFftPlan and isinstance(plan, VpuDdFftPlan):
        from fourier_tpu.ops.pallas.stockham_vpu_dd import radix_schedule_dd

        sched = radix_schedule_dd(n)
        flops = sum(6.0 * n * np.log2(r) for r in sched) * 12
        tables = sum(
            int(np.prod(t.shape)) * t.dtype.itemsize
            for t4 in plan.fwd_tables + plan.inv_tables for t in t4
        )
        stages = [f"fused VMEM dd radix-{r} stage" for r in sched]
        return PlanSummary(
            "VpuFusedDd", n, "complex128(dd)", flops, tables, 4 * n * 4 * 2,
            stages,
        )

    try:
        from fourier_tpu.precision.dd_split import (DdSplitPow2Plan,
                                                    DdSplitRadixPlan)
    except ImportError:  # pragma: no cover
        DdSplitPow2Plan = DdSplitRadixPlan = ()

    if DdSplitPow2Plan and isinstance(
        plan, (DdSplitPow2Plan, DdSplitRadixPlan)
    ):
        r = getattr(plan, "radix", 2)
        sub = summarize(plan.half if r == 2 else plan.sub)
        # r batched sub-transforms + an O(n) dd combine: (r-1)/r of the
        # points pay a dd complex twiddle (~50 hw flops) and all points a
        # radix-r dd butterfly (~20*(r-1)/r adds each).
        flops = r * sub.flops_per_transform + 50.0 * n * (r - 1) / r + 20.0 * n
        stages = [
            f"de-interleave {r} residue classes (reshape)",
            f"batched fused dd FFT x{r} ({n // r}-point, ONE kernel call)",
            f"dd twiddle + radix-{r} combine (O(n), XLA)",
        ]
        return PlanSummary(
            f"DdSplitRadix{r}", n, "complex128(dd)", flops,
            sub.table_bytes + (r - 1) * (n // r) * 16, 4 * n * 4 * 2,
            stages, [sub],
        )

    if DdFftPlan and isinstance(plan, DdFftPlan):
        io_dd = 4 * n * 4 * 2  # four f32 planes in + out
        if plan.kind == "stockham":
            flops = sum(6.0 * n * np.log2(r) for r in plan.radices) * 10
            stages = [f"dd radix-{r} stage" for r in plan.radices]
            children = []
        else:
            inner = summarize(plan.inner)
            flops = 2 * inner.flops_per_transform + 60.0 * (3 * n + plan.inner.size)
            stages = ["dd Bluestein (chirp, inner fft/ifft, chirp)"]
            children = [inner]
        return PlanSummary(
            "DoubleDouble", n, "complex128(dd)", flops, 0, io_dd, stages, children
        )

    # -- sharded plan families (fourier_tpu.parallel) ------------------------
    try:
        from fourier_tpu.parallel.sharded import (
            Fft2dPlan, Fft3dPlan, FourStepPlan, Rfft2dPlan, Rfft3dPlan)
    except ImportError:  # pragma: no cover
        Fft2dPlan = Fft3dPlan = FourStepPlan = Rfft2dPlan = Rfft3dPlan = ()

    if FourStepPlan and isinstance(plan, FourStepPlan):
        col = summarize(plan.col_plan)
        row = summarize(plan.row_plan)
        flops = (plan.n2 * col.flops_per_transform
                 + plan.n1 * row.flops_per_transform + 6.0 * n)
        stages = [
            f"column FFTs ({plan.n1}-point, sharded over {plan.axis!r})",
            "split twiddle",
            f"all_to_all transpose over {plan.axis!r} (ICI)",
            f"row FFTs ({plan.n2}-point)",
        ]
        return PlanSummary("FourStepSharded", n, plan.dtype.name, flops,
                           col.table_bytes + row.table_bytes, io, stages,
                           [col, row])

    if Fft2dPlan and isinstance(plan, Fft2dPlan):
        col = summarize(plan.col_plan)
        row = summarize(plan.row_plan)
        flops = (plan.n1 * row.flops_per_transform
                 + plan.n2 * col.flops_per_transform)
        stages = [
            f"row FFTs ({plan.n2}-point, rows sharded over {plan.axis!r})",
            f"all_to_all transpose over {plan.axis!r} (ICI)"
            + (f", {plan.pipeline_chunks} overlapped chunks"
               if plan.pipeline_chunks > 1 else ""),
            f"column FFTs ({plan.n1}-point)",
        ] + ([] if plan.transposed_output
             else ["all_to_all layout restore (ICI)"])
        return PlanSummary("Fft2dSharded", n, plan.dtype.name, flops,
                           col.table_bytes + row.table_bytes, io, stages,
                           [row, col])

    if Rfft2dPlan and isinstance(plan, Rfft2dPlan):
        rp = summarize(plan.rplan)
        col = summarize(plan.col_plan)
        flops = (plan.n1 * rp.flops_per_transform
                 + plan.n2p * col.flops_per_transform)
        stages = [
            f"row r2c FFTs ({plan.n2}->{plan.out_len} bins, pad to "
            f"{plan.n2p})",
            f"all_to_all transpose over {plan.axis!r} (half-spectrum bytes)",
            f"column FFTs ({plan.n1}-point)",
        ] + ([] if plan.transposed_output
             else ["all_to_all layout restore (ICI)"])
        return PlanSummary("Rfft2dSharded", n, plan.dtype.name, flops,
                           rp.table_bytes + col.table_bytes,
                           n * eb // 2, stages, [rp, col])

    if Fft3dPlan and isinstance(plan, Fft3dPlan):
        subs = [summarize(p) for p in (plan.plan0, plan.plan1, plan.plan2)]
        per_line = (plan.n0 * plan.n1, plan.n0 * plan.n2, plan.n1 * plan.n2)
        flops = sum(c * s.flops_per_transform
                    for c, s in zip(per_line, subs))
        ax = "/".join(repr(a) for a in plan.axes)
        stages = [
            f"n2 FFTs ({plan.n2}-point, pencils whole)",
            f"all_to_all over {ax} (ICI)"
            + (f", {plan.pipeline_chunks} overlapped chunks"
               if plan.pipeline_chunks > 1 else ""),
            f"n1 FFTs ({plan.n1}-point)",
            "all_to_all over first mesh axis (ICI)",
            f"n0 FFTs ({plan.n0}-point)",
        ] + ([] if plan.spectral_output
             else ["mirror all_to_alls: natural layout restore"])
        return PlanSummary("Fft3dPencil", n, plan.dtype.name, flops,
                           sum(s.table_bytes for s in subs), io, stages,
                           subs)

    if Rfft3dPlan and isinstance(plan, Rfft3dPlan):
        subs = [summarize(p) for p in (plan.rplan, plan.plan1, plan.plan0)]
        flops = (plan.n0 * plan.n1 * subs[0].flops_per_transform
                 + plan.n0 * plan.n2p * subs[1].flops_per_transform
                 + plan.n1 * plan.n2p * subs[2].flops_per_transform)
        ax = "/".join(repr(a) for a in plan.axes)
        stages = [
            f"n2 r2c FFTs ({plan.n2}->{plan.out_len} bins, pad to "
            f"{plan.n2p})",
            f"all_to_all over {ax} (half-spectrum bytes)"
            + (f", {plan.pipeline_chunks} overlapped chunks"
               if plan.pipeline_chunks > 1 else ""),
            f"n1 FFTs ({plan.n1}-point)",
            "all_to_all over first mesh axis (ICI)",
            f"n0 FFTs ({plan.n0}-point)",
        ] + ([] if plan.spectral_output
             else ["mirror all_to_alls: natural layout restore"])
        return PlanSummary("Rfft3dPencil", n, plan.dtype.name, flops,
                           sum(s.table_bytes for s in subs),
                           n * eb // 2, stages, subs)

    return PlanSummary(type(plan).__name__, n, plan.dtype.name, 0.0, 0, io)


def describe(plan) -> str:
    """Human-readable multi-line plan description."""
    return summarize(plan).render()
