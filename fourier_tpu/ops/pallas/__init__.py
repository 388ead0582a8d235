from fourier_tpu.ops.pallas import bailey

__all__ = ["bailey"]
