from fourier_tpu.parallel.sharded import Fft2dPlan, FourStepPlan, batched_transform

__all__ = ["Fft2dPlan", "FourStepPlan", "batched_transform"]
