"""vkfft_tpu — a TPU-native FFT framework with the capability surface of
DTolm/VkFFT, designed from scratch for JAX/XLA/Pallas.

Layer map (see SURVEY.md for the reference correspondence):
  planner/   — size factorization, algorithm selection, axis plans
  luts       — host-side twiddle/chirp/Rader table factory
  ops/       — execution engines (jnp reference path, Pallas TPU kernels)
  transforms — R2C/C2R, DCT/DST I-IV, zero-padding, fused convolution
  parallel/  — multi-chip slab/pencil decompositions over jax.sharding meshes
  precision/ — double-double "fp64" arithmetic for TPU
"""
from vkfft_tpu.config import FFTConfig, Precision, TransformKind
from vkfft_tpu.errors import FFTError, FFTResult, error_string
from vkfft_tpu.api import (
    FFTApplication,
    get_application,
    fft,
    ifft,
    fft2,
    ifft2,
    fftn,
    ifftn,
)
from vkfft_tpu.transforms import (
    rfft,
    irfft,
    rfft2,
    irfft2,
    rfftn,
    irfftn,
    dct,
    idct,
    dst,
    idst,
    dctn,
    dstn,
    fftconvolve,
    ConvolutionApplication,
)

__version__ = "0.1.0"


def get_version() -> tuple[int, int, int]:
    """``VkFFTGetVersion`` analog (reference: ``vkFFT/vkFFT.h:109``)."""
    major, minor, patch = (int(v) for v in __version__.split("."))
    return major, minor, patch
