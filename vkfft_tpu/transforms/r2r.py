"""Real-to-real transforms: DCT and DST types I-IV (planar-internal).

TPU analog of the reference's biggest codegen file
(``PrePostProcessing/vkFFT_R2R.h``, 4213 LoC): each DCT/DST type maps onto the
C2C core with O(n) pre/post passes —

  DCT-I   : 2n-2 symmetric extension          (``appendDCTI_read``  :1339)
  DCT-II  : even/odd permutation + rotation   (``appendDCTII_read_III_write`` :1541)
  DCT-III : inverse of the DCT-II mapping     (``appendDCTII_write_III_read`` :1731)
  DCT-IV  : half-sample-shifted 2n transform  (``appendDCTIV_even_read`` :2318)
  DST-I   : 2n+2 odd extension
  DST-II/III/IV : sign/reversal identities on the DCT of the same type

All internal arithmetic is planar (re/im plane pairs) so every type runs on
complex-free TPU backends.  Conventions match scipy.fft with ``norm=None``
(the FFTW REDFT/RODFT conventions the reference's precision suite checks
against, ``sample_16_precision_VkFFT_double_dct.cpp``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu import api
from vkfft_tpu.errors import InvalidConfigError
from vkfft_tpu.pcomplex import Planar, real_planar
from vkfft_tpu.transforms import r2c as _r2c


def _rfft_p(x, engine) -> Planar:
    """Half-spectrum real FFT as a Planar pair (the packed half-size path —
    halves the cost of the real-extension DCT/DST types vs a complex FFT)."""
    y = _r2c.rfft(x, axis=-1, engine=engine)
    if isinstance(y, Planar):
        return y
    return Planar(jnp.real(y), jnp.imag(y))


def _move_last(x, axis):
    axis = axis % x.ndim
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    return x, axis


def _move_back(x, axis):
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, -1, axis)
    return x


def _rdt(x):
    return x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32


def _fft_p(p: Planar, inverse=False, engine=None) -> Planar:
    return api.fftn(p, axes=(-1,), engine=engine, inverse=inverse, normalize=False if not inverse else True)


# ---------------------------------------------------------------------------
# DCT kernels along the last axis (input real, (..., n))
# ---------------------------------------------------------------------------

def _kernel_ok(x, engine, gate) -> bool:
    if x.dtype != jnp.float32:
        return False
    if (engine or api.default_engine()) != "pallas":
        return False
    from vkfft_tpu.ops import pallas_engine as pe
    return getattr(pe, gate)(x.shape[-1])


def _dct1(x, engine):
    n = x.shape[-1]
    if n < 2:
        raise InvalidConfigError("DCT-I requires n >= 2")
    if _kernel_ok(x, engine, "use_dct1_kernel"):
        # in-kernel form (reference appendDCTI_read, vkFFT_R2R.h:1339): the
        # 2n-2 extension stays virtual — one real read + one real write
        from vkfft_tpu.ops import pallas_engine as pe
        lead = x.shape[:-1]
        return pe.dct1_lines(x.reshape(-1, n)).reshape(*lead, n)
    # even extension of length 2n-2; its rfft has exactly n bins
    ext = jnp.concatenate([x, x[..., 1:-1][..., ::-1]], axis=-1)
    E = _rfft_p(ext, engine)
    return E.re


def _dct_kernel_ok(n: int, dtype, engine) -> bool:
    """Gate for the in-kernel DCT-II/III path (permutation + half-size real
    FFT + unfold + rotation all inside one kernel — the reference's in-kernel
    R2R forms, ``vkFFT_R2R.h:1541/1731``; one real read + one real write)."""
    if dtype != jnp.float32:
        return False
    if (engine or api.default_engine()) != "pallas":
        return False
    from vkfft_tpu.ops import pallas_engine as pe
    return pe.use_dct_kernel(n)


def _dct2(x, engine):
    n = x.shape[-1]
    if _dct_kernel_ok(n, x.dtype, engine):
        from vkfft_tpu.ops import pallas_engine as pe
        lead = x.shape[:-1]
        return pe.dct2_lines(x.reshape(-1, n)).reshape(*lead, n)
    v = jnp.concatenate([x[..., 0::2], x[..., 1::2][..., ::-1]], axis=-1)
    # half-spectrum rfft + Hermitian unfold: V[k] = conj(V[n-k]) for k > n/2
    H = _rfft_p(v, engine)
    k = np.arange(n)
    idx = np.where(k <= n // 2, k, n - k)
    sgn = np.where(k <= n // 2, 1.0, -1.0)
    Vr = H.re[..., idx]
    Vi = H.im[..., idx] * jnp.asarray(sgn).astype(x.dtype)
    twr = jnp.asarray(np.cos(0.5 * np.pi * k / n)).astype(x.dtype)
    twi = jnp.asarray(np.sin(-0.5 * np.pi * k / n)).astype(x.dtype)
    # 2 Re(e^{-i pi k/2n} V[k])
    return 2.0 * (twr * Vr - twi * Vi)


def _dct3(x, engine):
    # DCT-III(c) = 2n * inverse-of-DCT-II(c): u[k] = (c[k] - i c[n-k])/2
    # (u[0] = c[0]/2), V = u * e^{i pi k/2n}, v = n*ifft(V), un-permute.
    n = x.shape[-1]
    if _dct_kernel_ok(n, x.dtype, engine):
        from vkfft_tpu.ops import pallas_engine as pe
        lead = x.shape[:-1]
        return pe.dct3_lines(x.reshape(-1, n)).reshape(*lead, n)
    k = np.arange(n)
    c_rev = jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., 1:][..., ::-1]], axis=-1)
    u = Planar(x * np.float32(0.5), c_rev * np.float32(-0.5))
    twr = jnp.asarray(np.cos(0.5 * np.pi * k / n)).astype(x.dtype)
    twi = jnp.asarray(np.sin(0.5 * np.pi * k / n)).astype(x.dtype)
    V = Planar(u.re * twr - u.im * twi, u.re * twi + u.im * twr)
    v = _fft_p(V, inverse=True, engine=engine)  # normalized by 1/n
    vr = v.re * np.asarray(n, x.dtype)          # unnormalized inverse DFT
    half = (n + 1) // 2
    # even/odd interleave via stack+reshape, never a strided scatter
    # (XLA scatters serialize on TPU — round 4)
    a = vr[..., :half]
    b = vr[..., half:][..., ::-1]
    if n % 2:
        b = jnp.concatenate([b, jnp.zeros_like(b[..., :1])], axis=-1)
    out = jnp.stack([a, b], axis=-1).reshape(*vr.shape[:-1], 2 * half)
    return 2.0 * out[..., :n]


def _dct4(x, engine):
    n = x.shape[-1]
    if _kernel_ok(x, engine, "use_dct4_kernel"):
        # in-kernel odd-bins-of-4n form (reference appendDCTIV_even_read/
        # _write + the odd path, vkFFT_R2R.h:2318/2946/3261): pre-rotation,
        # 2n-point pipeline, post-rotation in one kernel, any length
        from vkfft_tpu.ops import pallas_engine as pe
        lead = x.shape[:-1]
        return pe.dct4_lines(x.reshape(-1, n)).reshape(*lead, n)
    if n % 2 == 0 and n >= 4:
        return _dct4_even(x, engine)
    return _dct4_odd(x, engine)


def _dct4_even(x, engine):
    """Even-length DCT-IV via one n/2 complex FFT (the reference's N/2 trick,
    ``appendDCTIV_even_read``/``_write``, vkFFT_R2R.h:2318,2946).

    Derivation: with v_j = x[2j] + i*x[n-1-2j] and a_j = pi(4j+1)/(4n),
    pairing even and reversed-odd samples collapses the cosine sum to
      y[2t]   = 2 Re(e^{-i pi t/n} W[t])
      y[2t+1] = 2 Re(e^{+i pi (t+1)/n} W[(m-t-1) mod m])
    where W = FFT_m(v * e^{-i a}) and m = n/2."""
    n = x.shape[-1]
    m = n // 2
    j = np.arange(m)
    ar = np.cos(np.pi * (4 * j + 1) / (4 * n))
    ai = -np.sin(np.pi * (4 * j + 1) / (4 * n))
    vr = x[..., 0::2]
    vi = x[..., n - 1 - 2 * j]          # x[n-1-2j]
    pre_r = jnp.asarray(ar).astype(x.dtype)
    pre_i = jnp.asarray(ai).astype(x.dtype)
    w = Planar(vr * pre_r - vi * pre_i, vr * pre_i + vi * pre_r)
    W = _fft_p(w, engine=engine)
    t = np.arange(m)
    # even outputs
    er = np.cos(np.pi * t / n)
    ei = -np.sin(np.pi * t / n)
    y_even = 2.0 * (jnp.asarray(er).astype(x.dtype) * W.re
                    - jnp.asarray(ei).astype(x.dtype) * W.im)
    # odd outputs: index (m - t - 1) mod m, phase e^{+i pi (t+1)/n}
    idx = (m - t - 1) % m
    orr = np.cos(np.pi * (t + 1) / n)
    oi = np.sin(np.pi * (t + 1) / n)
    Wr = W.re[..., idx]
    Wi = W.im[..., idx]
    y_odd = 2.0 * (jnp.asarray(orr).astype(x.dtype) * Wr
                   - jnp.asarray(oi).astype(x.dtype) * Wi)
    out = jnp.stack([y_even, y_odd], axis=-1).reshape(*x.shape[:-1], n)
    return out


def _dct4_odd(x, engine):
    # Half-sample shift via a 2n transform: w[j] = x[j] e^{-i pi j/(2n)}
    # zero-padded to 2n; DCT4[k] = 2 Re(e^{-i pi (2k+1)/(4n)} W[k]).
    n = x.shape[-1]
    j = np.arange(n)
    pre_r = jnp.asarray(np.cos(0.5 * np.pi * j / n)).astype(x.dtype)
    pre_i = jnp.asarray(np.sin(-0.5 * np.pi * j / n)).astype(x.dtype)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n)]
    w = Planar(jnp.pad(x * pre_r, pad), jnp.pad(x * pre_i, pad))
    W = _fft_p(w, engine=engine)[..., :n]
    k = np.arange(n)
    post_r = jnp.asarray(np.cos(0.25 * np.pi * (2 * k + 1) / n)).astype(x.dtype)
    post_i = jnp.asarray(np.sin(-0.25 * np.pi * (2 * k + 1) / n)).astype(x.dtype)
    return 2.0 * (post_r * W.re - post_i * W.im)


def _dst1(x, engine):
    n = x.shape[-1]
    if _kernel_ok(x, engine, "use_dst1_kernel"):
        # in-kernel form: the 2n+2 odd extension stays virtual
        from vkfft_tpu.ops import pallas_engine as pe
        lead = x.shape[:-1]
        return pe.dst1_lines(x.reshape(-1, n)).reshape(*lead, n)
    zeros = jnp.zeros_like(x[..., :1])
    # odd extension of length 2n+2; rfft has n+2 bins, we need 1..n
    ext = jnp.concatenate([zeros, x, zeros, -x[..., ::-1]], axis=-1)
    E = _rfft_p(ext, engine)
    # DST1[k] = Re(i * E[k+1]) = -Im(E[k+1])
    return -E.im[..., 1 : n + 1]


def _alt_sign(x):
    n = x.shape[-1]
    s = np.ones(n, dtype=np.float64)
    s[1::2] = -1.0
    return x * jnp.asarray(s).astype(x.dtype)


def _dst2(x, engine):
    n = x.shape[-1]
    if _dct_kernel_ok(n, x.dtype, engine):
        # sign flip + reversal fold into the DCT-II kernel (no XLA passes)
        from vkfft_tpu.ops import pallas_engine as pe
        lead = x.shape[:-1]
        return pe.dst2_lines(x.reshape(-1, n)).reshape(*lead, n)
    return _dct2(_alt_sign(x), engine)[..., ::-1]


def _dst3(x, engine):
    n = x.shape[-1]
    if _dct_kernel_ok(n, x.dtype, engine):
        from vkfft_tpu.ops import pallas_engine as pe
        lead = x.shape[:-1]
        return pe.dst3_lines(x.reshape(-1, n)).reshape(*lead, n)
    return _alt_sign(_dct3(x[..., ::-1], engine))


def _dst4(x, engine):
    n = x.shape[-1]
    if _kernel_ok(x, engine, "use_dct4_kernel"):
        # the DCT-IV kernel with the imaginary-part output combine
        from vkfft_tpu.ops import pallas_engine as pe
        lead = x.shape[:-1]
        return pe.dst4_lines(x.reshape(-1, n)).reshape(*lead, n)
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


def idct(y, type: int = 2, axis: int = -1, engine: Optional[str] = None):
    """Inverse DCT: idct(dct(x, type), type) == x."""
    y = jnp.asarray(y)
    n = y.shape[axis % y.ndim]
    scale = {1: 1.0 / (2 * (n - 1)), 2: 1.0 / (2 * n),
             3: 1.0 / (2 * n), 4: 1.0 / (2 * n)}[type]
    out = dct(y, type=_DCT_INV[type], axis=axis, engine=engine)
    return out * np.asarray(scale, dtype=out.dtype)


def idst(y, type: int = 2, axis: int = -1, engine: Optional[str] = None):
    """Inverse DST: idst(dst(x, type), type) == x."""
    y = jnp.asarray(y)
    n = y.shape[axis % y.ndim]
    scale = {1: 1.0 / (2 * (n + 1)), 2: 1.0 / (2 * n),
             3: 1.0 / (2 * n), 4: 1.0 / (2 * n)}[type]
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
