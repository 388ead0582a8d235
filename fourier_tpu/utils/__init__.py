from fourier_tpu.utils.helpers import fftfreq, fftshift, ifftshift
from fourier_tpu.utils.reference_dft import naive_dft, oracle_transform

__all__ = ["fftfreq", "fftshift", "ifftshift", "naive_dft", "oracle_transform"]
