"""Real-to-real transforms: DCT and DST types I-IV.

TPU analog of the reference's biggest codegen file
(``PrePostProcessing/vkFFT_R2R.h``, 4213 LoC): each DCT/DST type maps onto the
C2C core with O(n) pre/post passes —

  DCT-I   : 2n-2 symmetric extension          (``appendDCTI_read``  :1339)
  DCT-II  : even/odd permutation + rotation   (``appendDCTII_read_III_write`` :1541)
  DCT-III : inverse of the DCT-II mapping     (``appendDCTII_write_III_read`` :1731)
  DCT-IV  : half-sample-shifted 2n transform  (``appendDCTIV_even_read`` :2318)
  DST-I   : 2n+2 odd extension
  DST-II/III/IV : sign/reversal identities on the DCT of the same type

Conventions match scipy.fft with ``norm=None`` (the de-facto FFTW
``REDFT/RODT`` conventions the reference's FFTW-based precision suite checks
against, ``sample_16_precision_VkFFT_double_dct.cpp``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu import api
from vkfft_tpu.errors import InvalidConfigError


def _move_last(x, axis):
    axis = axis % x.ndim
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    return x, axis


def _move_back(x, axis):
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, -1, axis)
    return x


def _cdt(x):
    return jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64


def _rdt(x):
    return x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32


# ---------------------------------------------------------------------------
# DCT kernels along the last axis (input real, (..., n))
# ---------------------------------------------------------------------------

def _dct1(x, engine):
    n = x.shape[-1]
    if n < 2:
        raise InvalidConfigError("DCT-I requires n >= 2")
    # Even extension of length 2n-2: [x0..x_{n-1}, x_{n-2}..x_1].
    ext = jnp.concatenate([x, x[..., 1:-1][..., ::-1]], axis=-1)
    E = api.fft(ext.astype(_cdt(x)), engine=engine)
    return jnp.real(E[..., :n])


def _dct2(x, engine):
    n = x.shape[-1]
    # v = [x0, x2, x4, ..., x5, x3, x1]
    v = jnp.concatenate([x[..., 0::2], x[..., 1::2][..., ::-1]], axis=-1)
    V = api.fft(v.astype(_cdt(x)), engine=engine)
    k = np.arange(n)
    tw = np.exp(-0.5j * np.pi * k / n)
    return 2.0 * jnp.real(jnp.asarray(tw.astype(np.complex128)).astype(V.dtype) * V)


def _dct3(x, engine):
    # DCT-III(c) = 2n * inverse-of-DCT-II(c); derivation in transforms notes:
    # with u[k] = (c[k] - i c[n-k])/2 (u[0]=c[0]/2), V[k] = u[k] e^{i pi k/2n},
    # v = n*ifft(V), then un-permute even/odds.
    n = x.shape[-1]
    cdt = _cdt(x)
    c = x.astype(cdt)
    k = np.arange(n)
    c_rev = jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., 1:][..., ::-1]], axis=-1)
    u = 0.5 * (c - 1j * c_rev)
    tw = np.exp(0.5j * np.pi * k / n)
    V = u * jnp.asarray(tw.astype(np.complex128)).astype(cdt)
    v = api.ifft(V, engine=engine) * n  # unnormalized inverse DFT
    half = (n + 1) // 2
    out = jnp.zeros_like(x)
    out = out.at[..., 0::2].set(jnp.real(v[..., :half]))
    out = out.at[..., 1::2].set(jnp.real(v[..., half:][..., ::-1]))
    return 2.0 * out


def _dct4(x, engine):
    # Half-sample shift via a 2n transform: with w[j] = x[j] e^{-i pi j/(2n)}
    # zero-padded to 2n, DCT4[k] = 2 Re(e^{-i pi (2k+1)/(4n)} W[k]).
    n = x.shape[-1]
    cdt = _cdt(x)
    j = np.arange(n)
    pre = np.exp(-0.5j * np.pi * j / n)
    w = x.astype(cdt) * jnp.asarray(pre.astype(np.complex128)).astype(cdt)
    w = jnp.pad(w, [(0, 0)] * (x.ndim - 1) + [(0, n)])
    W = api.fft(w, engine=engine)[..., :n]
    k = np.arange(n)
    post = np.exp(-0.25j * np.pi * (2 * k + 1) / n)
    return 2.0 * jnp.real(jnp.asarray(post.astype(np.complex128)).astype(cdt) * W)


def _dst1(x, engine):
    n = x.shape[-1]
    # Odd extension of length 2n+2: [0, x0..x_{n-1}, 0, -x_{n-1}..-x0];
    # DST1[k] = i * E[k+1].
    zeros = jnp.zeros_like(x[..., :1])
    ext = jnp.concatenate([zeros, x, zeros, -x[..., ::-1]], axis=-1)
    E = api.fft(ext.astype(_cdt(x)), engine=engine)
    return jnp.real(1j * E[..., 1 : n + 1])


def _alt_sign(x):
    n = x.shape[-1]
    s = np.ones(n)
    s[1::2] = -1.0
    return x * jnp.asarray(s, dtype=x.dtype)


def _dst2(x, engine):
    # DST-II(x)[k] = DCT-II(x')[n-1-k] with x'[j] = (-1)^j x[j].
    return _dct2(_alt_sign(x), engine)[..., ::-1]


def _dst3(x, engine):
    # DST-III(x)[k] = (-1)^k DCT-III(reverse(x))[k].
    return _alt_sign(_dct3(x[..., ::-1], engine))


def _dst4(x, engine):
    # DST-IV(x)[k] = DCT-IV(x')[n-1-k] with x'[j] = (-1)^j x[j].
    return _dct4(_alt_sign(x), engine)[..., ::-1]


_DCT = {1: _dct1, 2: _dct2, 3: _dct3, 4: _dct4}
_DST = {1: _dst1, 2: _dst2, 3: _dst3, 4: _dst4}


def dct(x, type: int = 2, axis: int = -1, engine: Optional[str] = None):
    """DCT-I/II/III/IV along ``axis`` (scipy ``norm=None`` convention)."""
    if type not in _DCT:
        raise InvalidConfigError(f"DCT type must be 1..4, got {type}")
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise TypeError("dct input must be real")
    x = x.astype(_rdt(x))
    x, axis = _move_last(x, axis)
    y = _DCT[type](x, engine)
    return _move_back(y.astype(x.dtype), axis)


def dst(x, type: int = 2, axis: int = -1, engine: Optional[str] = None):
    """DST-I/II/III/IV along ``axis`` (scipy ``norm=None`` convention)."""
    if type not in _DST:
        raise InvalidConfigError(f"DST type must be 1..4, got {type}")
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise TypeError("dst input must be real")
    x = x.astype(_rdt(x))
    x, axis = _move_last(x, axis)
    y = _DST[type](x, engine)
    return _move_back(y.astype(x.dtype), axis)


_DCT_INV = {1: 1, 2: 3, 3: 2, 4: 4}


def _inv_scale(n, type):
    # scale such that idct(dct(x)) == x for norm=None conventions
    return {1: 1.0 / (2 * (n - 1)), 2: 1.0 / (2 * n), 3: 1.0 / (2 * n), 4: 1.0 / (2 * n)}[type]


def idct(y, type: int = 2, axis: int = -1, engine: Optional[str] = None):
    """Inverse DCT: idct(dct(x, type), type) == x."""
    y = jnp.asarray(y)
    n = y.shape[axis % y.ndim]
    out = dct(y, type=_DCT_INV[type], axis=axis, engine=engine)
    return out * np.asarray(_inv_scale(n, type), dtype=out.dtype)


def idst(y, type: int = 2, axis: int = -1, engine: Optional[str] = None):
    """Inverse DST: idst(dst(x, type), type) == x."""
    y = jnp.asarray(y)
    n = y.shape[axis % y.ndim]
    scale = {1: 1.0 / (2 * (n + 1)), 2: 1.0 / (2 * n), 3: 1.0 / (2 * n), 4: 1.0 / (2 * n)}[type]
    out = dst(y, type=_DCT_INV[type], axis=axis, engine=engine)
    return out * np.asarray(scale, dtype=out.dtype)


def dctn(x, type: int = 2, axes: Optional[Sequence[int]] = None, engine: Optional[str] = None):
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    for a in axes:
        x = dct(x, type=type, axis=a, engine=engine)
    return x


def dstn(x, type: int = 2, axes: Optional[Sequence[int]] = None, engine: Optional[str] = None):
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    for a in axes:
        x = dst(x, type=type, axis=a, engine=engine)
    return x
