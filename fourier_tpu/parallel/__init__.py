from fourier_tpu.parallel.sharded import (
    Fft2dPlan,
    FourStepPlan,
    batched_transform,
    batched_transform_dd,
)

__all__ = [
    "Fft2dPlan",
    "FourStepPlan",
    "batched_transform",
    "batched_transform_dd",
]
