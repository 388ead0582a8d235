from fourier_tpu.precision.dd_plan import DdFftPlan
from fourier_tpu.precision.vpu_dd_plan import VpuDdFftPlan

__all__ = ["DdFftPlan", "VpuDdFftPlan"]
