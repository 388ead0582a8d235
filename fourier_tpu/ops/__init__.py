from fourier_tpu.ops import butterflies, stockham_jax

__all__ = ["butterflies", "stockham_jax"]
