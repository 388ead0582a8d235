from fourier_tpu.precision.dd_plan import DdFftPlan

__all__ = ["DdFftPlan"]
