from fourier_tpu.plan.autosort import AutosortPlan
from fourier_tpu.plan.base import FftPlan
from fourier_tpu.plan.bluestein import BluesteinPlan
from fourier_tpu.plan.factor import RADICES, factorize_autosort, next_power_of_two
from fourier_tpu.plan.planner import (
    clear_plan_cache,
    create_fft,
    create_fft_f32,
    create_fft_f64,
)

__all__ = [
    "AutosortPlan",
    "BluesteinPlan",
    "FftPlan",
    "RADICES",
    "clear_plan_cache",
    "create_fft",
    "create_fft_f32",
    "create_fft_f64",
    "factorize_autosort",
    "next_power_of_two",
]
from fourier_tpu.plan.mxu import MxuFftPlan  # noqa: E402
from fourier_tpu.plan.four_step_local import FourStepLocalPlan  # noqa: E402
from fourier_tpu.plan.vpu import VpuFftPlan  # noqa: E402
from fourier_tpu.plan.aot import (  # noqa: E402
    CompiledFft,
    export_compiled,
    load_compiled,
)
from fourier_tpu.plan.measure import (  # noqa: E402
    MeasureResult,
    export_wisdom,
    forget_wisdom,
    import_wisdom,
    measure_fft,
)

__all__ += [
    "MxuFftPlan",
    "FourStepLocalPlan",
    "VpuFftPlan",
    "CompiledFft",
    "export_compiled",
    "load_compiled",
    "MeasureResult",
    "export_wisdom",
    "forget_wisdom",
    "import_wisdom",
    "measure_fft",
]
