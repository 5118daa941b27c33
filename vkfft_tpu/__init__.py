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
from vkfft_tpu.pcomplex import Planar, TlSpectrum
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


def set_compute_mode(mode: str) -> None:
    """Select how the fp32 tier's MXU contractions are emulated —
    process-wide, like the reference's compile-time precision switches
    (``vkFFT/vkFFT.h:70-102``):

    - ``"fp32"``     — 6-pass bf16 HIGHEST (default; ~2e-7 relative error)
    - ``"fp32_int8"``— 6-pass int8 digit emulation: the same fp32-class
      accuracy (~3e-7) at half the MXU time on TPUs with a 2x int8 MXU
      rate (v5e+).  Also selectable via ``VKFFT_TPU_INT8_MXU=1``.
    - ``"bf16"``     — single-pass bf16 (fast, ~3e-3; the storage tiers'
      compute mode)

    bf16/f16 *storage* tiers are unaffected (always single-pass)."""
    from vkfft_tpu.ops import pallas_engine as _pe
    if mode == "fp32":
        _pe.set_matmul_precision("highest")
        _pe.set_mxu_int8(False)
    elif mode == "fp32_int8":
        _pe.set_matmul_precision("highest")
        _pe.set_mxu_int8(True)
    elif mode == "bf16":
        _pe.set_matmul_precision("default")
        _pe.set_mxu_int8(False)
    else:
        raise ValueError(f"unknown compute mode: {mode!r} "
                         "(expected fp32 | fp32_int8 | bf16)")
