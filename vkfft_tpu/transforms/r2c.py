"""Real-to-complex / complex-to-real transforms.

TPU analog of the reference R2C machinery (``PrePostProcessing/vkFFT_R2C.h``:
``appendC2R_read`` :178, ``appendR2C_write`` :450, and the even-length
half-size decomposition ``vkFFT_Plan_R2C.h:30``): an even length-n real FFT is
computed as a length-n/2 complex FFT of the packed even/odd samples plus an
O(n) untangling post-pass — half the flops and bandwidth of a complex
transform, the same 2x win the reference advertises (README.md:13).

Odd lengths fall back to a complex transform of the real input (the reference
similarly restricts its fast path to even sizes).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu import api, luts


def _real_dtype(x):
    return jnp.float64 if x.dtype in (jnp.float64, jnp.complex128) else jnp.float32


def _complex_dtype(x):
    return jnp.complex128 if x.dtype in (jnp.float64, jnp.complex128) else jnp.complex64


def _move_last(x, axis):
    axis = axis % x.ndim
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    return x, axis


def _move_back(x, axis):
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, -1, axis)
    return x


def rfft(x, axis: int = -1, engine: Optional[str] = None):
    """Forward real FFT along ``axis``; returns the n//2+1 half spectrum
    (numpy ``rfft`` convention, unnormalized)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise TypeError("rfft input must be real")
    x, axis = _move_last(x, axis)
    n = x.shape[-1]
    cdt = _complex_dtype(x)
    if n % 2 or n < 4:
        y = api.fft(x.astype(cdt), engine=engine)[..., : n // 2 + 1]
        return _move_back(y, axis)
    half = n // 2
    # Pack even/odd real samples into a half-length complex sequence.
    z = (x[..., 0::2] + 1j * x[..., 1::2]).astype(cdt)
    Z = api.fft(z, engine=engine)
    # Untangle: E[k] = (Z[k]+conj(Z[-k]))/2, O[k] = (Z[k]-conj(Z[-k]))/(2i),
    # X[k] = E[k] + w_n^k O[k]  (reference post-twiddle: vkFFT_R2C.h:450).
    idx = (-jnp.arange(half + 1)) % half
    Zk = Z[..., jnp.arange(half + 1) % half]
    Zr = jnp.conj(Z[..., idx])
    E = 0.5 * (Zk + Zr)
    O = -0.5j * (Zk - Zr)
    tw = jnp.asarray(luts.r2c_post_twiddle(n).astype(cdt))
    X = E + tw * O
    return _move_back(X, axis)


def irfft(X, n: Optional[int] = None, axis: int = -1, engine: Optional[str] = None):
    """Inverse real FFT (numpy ``irfft`` convention: normalized by 1/n,
    returns a real array of length ``n``; reference C2R read pass:
    ``appendC2R_read``, vkFFT_R2C.h:178)."""
    X = jnp.asarray(X)
    X, axis = _move_last(X, axis)
    m = X.shape[-1]
    if n is None:
        n = 2 * (m - 1)
    rdt = _real_dtype(X)
    cdt = _complex_dtype(X)
    if n % 2 or n < 4:
        # rebuild the full Hermitian spectrum and run a complex inverse
        tail = jnp.conj(X[..., 1 : n - m + 1][..., ::-1])
        full = jnp.concatenate([X.astype(cdt), tail.astype(cdt)], axis=-1)
        y = api.ifft(full, engine=engine)
        return _move_back(jnp.real(y).astype(rdt), axis)
    half = n // 2
    X = X.astype(cdt)
    # Retangle into the half-length spectrum: Z[k] = E[k] + i*O[k] with
    # E[k] = (X[k]+conj(X[half-k]))/2, O[k] = w_n^{-k} (X[k]-conj(X[half-k]))/2.
    k = jnp.arange(half)
    Xk = X[..., :half]
    Xr = jnp.conj(X[..., half - k])
    E = 0.5 * (Xk + Xr)
    tw = jnp.asarray(np.conj(luts.r2c_post_twiddle(n))[:half].astype(np.complex128)).astype(cdt)
    O = 0.5 * tw * (Xk - Xr)
    Z = E + 1j * O
    z = api.ifft(Z, engine=engine)
    out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).reshape(*z.shape[:-1], n)
    return _move_back(out.astype(rdt), axis)


def rfftn(x, axes: Optional[Sequence[int]] = None, engine: Optional[str] = None):
    """N-D real FFT: real transform along the last given axis, complex along
    the rest (numpy convention)."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    y = rfft(x, axis=axes[-1], engine=engine)
    for a in axes[:-1]:
        y = api.fftn(y, axes=(a,), engine=engine)
    return y


def irfftn(X, s: Optional[Sequence[int]] = None, axes: Optional[Sequence[int]] = None,
           engine: Optional[str] = None):
    X = jnp.asarray(X)
    if axes is None:
        axes = tuple(range(X.ndim))
    axes = tuple(a % X.ndim for a in axes)
    n_last = None if s is None else s[-1]
    for a in axes[:-1]:
        X = api.ifftn(X, axes=(a,), engine=engine)
    return irfft(X, n=n_last, axis=axes[-1], engine=engine)


def rfft2(x, axes=(-2, -1), engine: Optional[str] = None):
    return rfftn(x, axes=axes, engine=engine)


def irfft2(X, s=None, axes=(-2, -1), engine: Optional[str] = None):
    return irfftn(X, s=s, axes=axes, engine=engine)
