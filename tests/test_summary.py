"""Plan summary / cost model tests (SURVEY.md §5 observability)."""

import fourier_tpu as ft
from fourier_tpu.plan.summary import describe, summarize
from fourier_tpu.precision import DdFftPlan


def test_stockham_summary():
    plan = ft.create_fft(4096, backend="stockham", cache=False)
    s = summarize(plan)
    assert s.kind == "Stockham"
    assert s.size == 4096
    assert len(s.stages) == len(plan.radices)
    assert s.flops_per_transform > 0
    assert s.table_bytes > 0
    assert "radix-" in describe(plan)


def test_mxu_summary():
    plan = ft.create_fft(4096, backend="mxu", cache=False)
    s = summarize(plan)
    assert s.kind.startswith("MxuBailey")
    assert "phase A" in describe(plan)
    assert s.min_hbm_bytes_per_transform == 2 * 4096 * 8


def test_bluestein_summary_nested():
    plan = ft.create_fft(73, backend="stockham", cache=False)
    s = summarize(plan)
    assert s.kind == "Bluestein"
    assert len(s.children) == 1
    assert s.children[0].size == 256
    assert "inner forward FFT" in describe(plan)


def test_four_step_summary():
    plan = ft.create_fft(65536, backend="mxu", cache=False)
    s = summarize(plan)
    assert s.kind == "FourStepLocal"
    assert len(s.children) == 2


def test_dd_summary():
    plan = DdFftPlan(73)
    s = summarize(plan)
    assert s.kind == "DoubleDouble"
    assert s.children and s.children[0].kind == "DoubleDouble"


def test_summarize_new_plan_families():
    import numpy as np

    from fourier_tpu.plan.summary import describe, summarize
    from fourier_tpu.plan.vpu import VpuFftPlan
    from fourier_tpu.precision import VpuDdFftPlan
    from fourier_tpu.rfft import RfftPlan

    s = summarize(VpuFftPlan.create(4096))
    assert s.kind == "VpuFused" and s.flops_per_transform > 0
    s = summarize(VpuDdFftPlan.create(384))
    assert s.kind == "VpuFusedDd" and len(s.stages) == 4
    s = summarize(RfftPlan(64))
    assert s.kind == "RealFft" and s.children
    # dd rfft renders end-to-end (regression: plan.n vs plan.size)
    assert "RealFft" in describe(RfftPlan(100, np.complex128, backend="dd"))


def test_summarize_sharded_plans():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from fourier_tpu.parallel import (Fft2dPlan, Fft3dPlan, FourStepPlan,
                                      Rfft2dPlan, Rfft3dPlan)
    from fourier_tpu.plan.summary import summarize

    devs = np.array(jax.devices())
    mesh1 = Mesh(devs, ("fft",))
    mesh2 = Mesh(devs.reshape(2, 4), ("x", "y"))
    cases = [
        (FourStepPlan(16, 16, mesh1), "FourStepSharded"),
        (Fft2dPlan(16, 32, mesh1, pipeline_chunks=2), "Fft2dSharded"),
        (Rfft2dPlan(16, 32, mesh1), "Rfft2dSharded"),
        (Fft3dPlan(8, 8, 8, mesh2), "Fft3dPencil"),
        (Rfft3dPlan(8, 8, 16, mesh2, spectral_output=True), "Rfft3dPencil"),
    ]
    for plan, kind in cases:
        s = summarize(plan)
        assert s.kind == kind
        assert s.flops_per_transform > 0
        assert s.children  # sub-plans are summarized recursively
        assert any("all_to_all" in st for st in s.stages)
    # spectral_output drops the layout-restore stage
    s = summarize(cases[-1][0])
    assert not any("restore" in st for st in s.stages)
    s2 = summarize(cases[-2][0])
    assert any("restore" in st for st in s2.stages)
