"""Fused frequency-domain convolution.

TPU analog of ``PrePostProcessing/vkFFT_Convolution.h`` (scalar and 2x2/3x3
matrix kernels, multi-kernel batching, conjugate and cross-power-spectrum
options, ``appendKernelConvolution`` :125): forward transform -> per-frequency
(matrix) multiply -> inverse transform, composed so XLA fuses the pointwise
stage into the surrounding passes.  The reference fuses the multiply into the
last-axis kernel and replays the inverse plan (``vkFFT_RunApp.h:323-464``).

Like the reference, convolutions are circular; linear convolution is obtained
by configuring zero padding (``performZeropadding``, README.md:15-16).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu import api
from vkfft_tpu.config import FFTConfig
from vkfft_tpu.errors import InvalidConfigError


def fftconvolve(x, h, axes: Optional[Sequence[int]] = None, engine: Optional[str] = None):
    """Circular convolution of ``x`` with ``h`` over ``axes`` via the FFT."""
    x = jnp.asarray(x)
    h = jnp.asarray(h)
    if axes is None:
        axes = tuple(range(-h.ndim, 0))
    X = api.fftn(x, axes=axes, engine=engine)
    H = api.fftn(h, axes=axes, engine=engine)
    return api.ifftn(X * H, axes=axes, engine=engine)


class ConvolutionApplication:
    """Planned convolution app (reference: ``performConvolution`` +
    ``kernelConvolution`` app pair; config fields at vkFFT_Structs.h:209-218).

    The kernel is transformed once at construction (the reference requires the
    user to run a ``kernelConvolution=1`` app first — that step is folded in;
    pass ``kernel_in_freq_domain=True`` for a pre-transformed kernel).

    Shapes, with ``S = config.shape`` (the transform dims) and
    ``m = config.matrix_convolution``, ``K = config.number_kernels``:

      scalar conv (m == 1):
        kernel  (*S) or (coordinate_features, *S), plus a leading (K,) dim
        data    (batch..., [coordinate_features,] *S)
        output  same as data, with a leading (K,) dim when K > 1
      matrix conv (m in {2, 3}):
        kernel  ([K,] m, m, *S)   (``symmetric_kernel`` kernels pass the full
                                   matrix; the flag is a storage hint)
        data    (batch..., m, *S)
        output  (batch..., m, *S), leading (K,) when K > 1
    """

    def __init__(self, config: FFTConfig, kernel, engine: Optional[str] = None,
                 kernel_in_freq_domain: bool = False):
        if not config.convolution:
            raise InvalidConfigError("config.convolution must be True")
        self.config = config
        self.engine = engine
        m = config.matrix_convolution
        shape = config.shape
        ndim = len(shape)
        kernel = jnp.asarray(kernel)
        if not jnp.issubdtype(kernel.dtype, jnp.complexfloating):
            kernel = kernel.astype(jnp.complex64)

        if m > 1 and kernel.shape[-ndim - 2: -ndim] != (m, m):
            raise InvalidConfigError(
                f"matrix kernel must have shape (..., {m}, {m}, *{shape}), got {kernel.shape}")
        if kernel.shape[-ndim:] != shape:
            raise InvalidConfigError(
                f"kernel must end with transform shape {shape}, got {kernel.shape}")
        if config.number_kernels > 1 and kernel.shape[0] != config.number_kernels:
            raise InvalidConfigError(
                f"kernel leading dim must be number_kernels={config.number_kernels}")

        if kernel_in_freq_domain:
            self.kernel_f = kernel
        else:
            self.kernel_f = api.fftn(kernel, axes=tuple(range(-ndim, 0)), engine=engine)
        self._call = jax.jit(self._convolve)

    def _convolve(self, x):
        cfg = self.config
        ndim = len(cfg.shape)
        m = cfg.matrix_convolution
        multi = cfg.number_kernels > 1
        axes = tuple(range(-ndim, 0))

        X = api.fftn(x, axes=axes, engine=self.engine)
        Kf = self.kernel_f.astype(X.dtype)
        if cfg.conjugate_convolution == 1:
            Kf = jnp.conj(Kf)
        elif cfg.conjugate_convolution == 2:
            X = jnp.conj(X)

        freq = "uvw"[:ndim]
        if m > 1:
            if multi:
                Y = jnp.einsum(f"koi{freq},...i{freq}->k...o{freq}", Kf, X)
            else:
                Y = jnp.einsum(f"oi{freq},...i{freq}->...o{freq}", Kf, X)
        else:
            if multi:
                # broadcast kernel batch against data batch dims
                pad = X.ndim - (Kf.ndim - 1)
                Y = X[None] * Kf.reshape(Kf.shape[:1] + (1,) * pad + Kf.shape[1:])
            else:
                Y = X * Kf  # trailing-dim broadcasting covers coord features

        if cfg.cross_power_spectrum_normalization:
            mag = jnp.abs(Y)
            eps = np.asarray(1e-30, dtype=mag.dtype)
            Y = Y / jnp.maximum(mag, eps)
        return api.ifftn(Y, axes=axes, engine=self.engine)

    def __call__(self, x):
        return self._call(jnp.asarray(x))
