"""Real-to-complex / complex-to-real transforms (planar-internal).

TPU analog of the reference R2C machinery (``PrePostProcessing/vkFFT_R2C.h``:
``appendC2R_read`` :178, ``appendR2C_write`` :450, and the even-length
half-size decomposition ``vkFFT_Plan_R2C.h:30``): an even length-n real FFT is
computed as a length-n/2 complex FFT of the packed even/odd samples plus an
O(n) untangling post-pass — half the flops and bandwidth of a complex
transform, the same 2x win the reference advertises (README.md:13).

All internal arithmetic is planar (re/im plane pairs), so the full surface
runs on complex-free TPU backends; on complex-capable backends the public
functions still accept and return complex arrays.  Odd lengths fall back to a
complex transform of the real input (the reference similarly restricts its
fast path to even sizes).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu import api, luts
from vkfft_tpu.pcomplex import (
    Planar,
    from_complex,
    planar_table,
    real_planar,
    to_complex,
)


def _wants_complex_out(x) -> bool:
    """Emit complex arrays when the backend supports them and the caller
    passed a plain array (numpy-style usage)."""
    return not isinstance(x, Planar) and api.complex_supported()


def _move_last(x, axis):
    axis = axis % x.ndim
    if axis != x.ndim - 1:
        if isinstance(x, Planar):
            x = Planar(jnp.moveaxis(x.re, axis, -1), jnp.moveaxis(x.im, axis, -1))
        else:
            x = jnp.moveaxis(x, axis, -1)
    return x, axis


def _move_back(x, axis, ndim):
    if axis != ndim - 1:
        if isinstance(x, Planar):
            x = Planar(jnp.moveaxis(x.re, -1, axis), jnp.moveaxis(x.im, -1, axis))
        else:
            x = jnp.moveaxis(x, -1, axis)
    return x


def _fftn_p(p: Planar, axes, inverse=False, engine=None) -> Planar:
    out = api.fftn(p, axes=axes, engine=engine, inverse=inverse)
    return out


def _r2c_kernel_ok(n: int, dtype, engine: Optional[str]) -> bool:
    """Gate for the single-kernel R2C/C2R path (pack + stages + untangle all
    inside one Pallas kernel — the reference's in-kernel form,
    ``appendR2C_write`` vkFFT_R2C.h:450 / ``appendC2R_read`` :178 — so a
    real transform moves half the bytes of a complex one)."""
    if dtype != jnp.float32:
        return False
    if (engine or api.default_engine()) != "pallas":
        return False
    from vkfft_tpu.ops import pallas_engine as pe
    return pe.use_r2c_kernel(n)


def _rfft_kernel_path(xr, n: int, engine: Optional[str]):
    """(…, n) real -> (…, n//2+1) Planar half spectrum via one kernel, or
    None when the gate rejects the configuration."""
    if not _r2c_kernel_ok(n, xr.dtype, engine):
        return None
    from vkfft_tpu.ops import pallas_engine as pe
    lead = xr.shape[:-1]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    ar, ai = pe.rfft_lines_planar(xr.reshape(b, n))
    h = n // 2 + 1
    return Planar(ar.reshape(*lead, h), ai.reshape(*lead, h))


def _rfft_merged(xr, engine) -> Planar:
    """Merged-sequences R2C (reference merged-row trick,
    ``vkFFT_R2C.h:27-177`` / ``disableMergeSequencesR2C``,
    ``vkFFT_Structs.h``): two real lines ride one complex FFT —
    z = x_a + i·x_b, one C2C transform, Hermitian split recovers both half
    spectra.  Halves the FFT work for lengths the packed even-n
    decomposition cannot take (odd / prime n), at O(n) split cost."""
    lead = xr.shape[:-1]
    n = xr.shape[-1]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    flat = xr.reshape(b, n)
    if b % 2:
        flat = jnp.concatenate([flat, jnp.zeros((1, n), flat.dtype)], axis=0)
    z = Planar(flat[0::2], flat[1::2])
    Z = _fftn_p(z, axes=(-1,), engine=engine)
    h = n // 2 + 1
    idx = (-np.arange(h)) % n
    Zk = Z[..., :h]
    Zr = Z[..., idx].conj()
    Xa = (Zk + Zr) * np.float32(0.5)      # spectrum of the even rows
    D = (Zk - Zr) * np.float32(0.5)
    Xb = Planar(D.im, -D.re)              # -i·D: spectrum of the odd rows
    pairs = Xa.shape[0]
    re = jnp.stack([Xa.re, Xb.re], axis=1).reshape(2 * pairs, h)[:b]
    im = jnp.stack([Xa.im, Xb.im], axis=1).reshape(2 * pairs, h)[:b]
    return Planar(re.reshape(*lead, h), im.reshape(*lead, h))


def _irfft_merged(p: Planar, n: int, engine) -> jnp.ndarray:
    """Inverse of the merged-sequences trick: two half spectra rebuild one
    full complex spectrum Z = F_a + i·F_b (Hermitian tails), one inverse
    C2C, and the two real lines come back as re/im planes."""
    lead = p.shape[:-1]
    m = p.shape[-1]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    flat = Planar(p.re.reshape(b, m), p.im.reshape(b, m))
    if b % 2:
        zrow = jnp.zeros((1, m), flat.re.dtype)
        flat = Planar(jnp.concatenate([flat.re, zrow], axis=0),
                      jnp.concatenate([flat.im, zrow], axis=0))
    Xa, Xb = flat[0::2], flat[1::2]
    # head k < m: Z = Xa + i·Xb;  tail k >= m: Z = conj(Xa[n-k]) + i·conj(Xb[n-k])
    head = Planar(Xa.re - Xb.im, Xa.im + Xb.re)[..., :m]
    j = np.arange(n - m, 0, -1)  # n-k for k in [m, n)
    tail = Planar(Xa.re[..., j] + Xb.im[..., j],
                  -Xa.im[..., j] + Xb.re[..., j])
    Z = Planar(jnp.concatenate([head.re, tail.re], axis=-1),
               jnp.concatenate([head.im, tail.im], axis=-1))
    z = _fftn_p(Z, axes=(-1,), inverse=True, engine=engine)
    pairs = z.shape[0]
    out = jnp.stack([z.re, z.im], axis=1).reshape(2 * pairs, n)[:b]
    return out.reshape(*lead, n)


def rfft(x, axis: int = -1, engine: Optional[str] = None):
    """Forward real FFT along ``axis``; returns the n//2+1 half spectrum
    (numpy ``rfft`` convention, unnormalized).  Returns a complex array on
    complex-capable backends, a ``Planar`` pair otherwise."""
    complex_out = _wants_complex_out(x)
    xr = x.re if isinstance(x, Planar) else jnp.asarray(x)
    if not isinstance(x, Planar) and jnp.issubdtype(xr.dtype, jnp.complexfloating):
        raise TypeError("rfft input must be real")
    xr, axis = _move_last(xr, axis)
    ndim = xr.ndim
    n = xr.shape[-1]
    X = _rfft_kernel_path(xr, n, engine)
    if X is not None:
        X = _move_back(X, axis, ndim)
        return to_complex(X) if complex_out else X
    if n % 2 or n < 4:
        lead_b = int(np.prod(xr.shape[:-1], dtype=np.int64)) if xr.ndim > 1 else 1
        if n % 2 and n >= 3 and lead_b >= 2:
            # merged sequences: two real lines per complex FFT
            X = _rfft_merged(xr, engine)
        else:
            # complex transform of the real input, truncated half-spectrum
            X = _fftn_p(real_planar(xr), axes=(-1,), engine=engine)[..., : n // 2 + 1]
    else:
        half = n // 2
        # pack even/odd samples: z = x[0::2] + i x[1::2]  (no complex dtype!)
        z = Planar(xr[..., 0::2], xr[..., 1::2])
        Z = _fftn_p(z, axes=(-1,), engine=engine)
        # untangle: E = (Z[k]+conj(Z[-k]))/2, O = -i/2 (Z[k]-conj(Z[-k])),
        # X[k] = E + w_n^k O   (reference post-twiddle: vkFFT_R2C.h:450)
        idx_k = np.arange(half + 1) % half
        idx_r = (-np.arange(half + 1)) % half
        Zk = Z[..., idx_k]
        Zr = Z[..., idx_r].conj()
        E = (Zk + Zr) * np.float32(0.5)
        D = (Zk - Zr) * np.float32(0.5)
        O = Planar(D.im, -D.re)  # -i * D
        tw = planar_table(luts.r2c_post_twiddle(n), xr.dtype)
        X = E + tw[(None,) * (ndim - 1)] * O
    X = _move_back(X, axis, ndim)
    return to_complex(X) if complex_out else X


def irfft(X, n: Optional[int] = None, axis: int = -1, engine: Optional[str] = None):
    """Inverse real FFT (numpy ``irfft`` convention: normalized by 1/n,
    returns a real array of length ``n``; reference C2R read pass:
    ``appendC2R_read``, vkFFT_R2C.h:178)."""
    if isinstance(X, Planar):
        p = X
    elif isinstance(X, np.ndarray):
        p = from_complex(X)
    else:
        Xj = jnp.asarray(X)
        p = Planar(jnp.real(Xj), jnp.imag(Xj))
    p, axis = _move_last(p, axis)
    ndim = p.ndim
    m = p.shape[-1]
    if n is None:
        n = 2 * (m - 1)
    if m == n // 2 + 1 and _r2c_kernel_ok(n, p.re.dtype, engine):
        from vkfft_tpu.ops import pallas_engine as pe
        lead = p.shape[:-1]
        b = int(np.prod(lead, dtype=np.int64)) if lead else 1
        # 1/m normalization rides the kernel's stage tables (no output
        # multiply pass — reference stageNormalization)
        y = pe.irfft_lines_planar(p.re.reshape(b, m), p.im.reshape(b, m), n,
                                  scale=1.0 / (n // 2))
        return _move_back(y.reshape(*lead, n), axis, ndim)
    if n % 2 or n < 4:
        lead_b = int(np.prod(p.shape[:-1], dtype=np.int64)) if p.ndim > 1 else 1
        if n % 2 and n >= 3 and lead_b >= 2:
            out = _irfft_merged(p, n, engine)
        else:
            # rebuild the full Hermitian spectrum, complex inverse, take re
            tail = p[..., 1 : n - m + 1][..., ::-1].conj()
            full = Planar(jnp.concatenate([p.re, tail.re], axis=-1),
                          jnp.concatenate([p.im, tail.im], axis=-1))
            y = _fftn_p(full, axes=(-1,), inverse=True, engine=engine)
            out = y.re
    else:
        half = n // 2
        k = np.arange(half)
        Xk = p[..., :half]
        Xr = p[..., half - k].conj()
        E = (Xk + Xr) * np.float32(0.5)
        tw = planar_table(np.conj(luts.r2c_post_twiddle(n))[:half], p.dtype)
        O = tw[(None,) * (ndim - 1)] * ((Xk - Xr) * np.float32(0.5))
        # Z = E + i O
        Z = Planar(E.re - O.im, E.im + O.re)
        z = _fftn_p(Z, axes=(-1,), inverse=True, engine=engine)
        # interleave: x[2j] = Re z[j], x[2j+1] = Im z[j]
        out = jnp.stack([z.re, z.im], axis=-1).reshape(*z.shape[:-1], n)
    return _move_back(out, axis, ndim)


def _r2c_pair_ok(x_shape, axes, dtype, engine):
    """True when the two minor axes can run the single-kernel 2-D real
    transform (r2c pair: one real read + one half-spectrum write)."""
    ndim = len(x_shape)
    if len(axes) < 2 or axes[-1] != ndim - 1 or (ndim - 2) not in axes:
        return False
    if dtype != jnp.float32:
        return False
    if (engine or api.default_engine()) != "pallas":
        return False
    from vkfft_tpu.ops import pallas_engine as pe
    return pe.use_r2c_pair(x_shape[-2], x_shape[-1])


def rfftn(x, axes: Optional[Sequence[int]] = None, engine: Optional[str] = None):
    """N-D real FFT: real transform along the last given axis, complex along
    the rest (numpy convention).  When the two minor axes qualify, they run
    as ONE kernel (r2c pair — half the bytes of the complex pair)."""
    complex_out = _wants_complex_out(x)
    xr = x.re if isinstance(x, Planar) else jnp.asarray(x)
    ndim = xr.ndim
    if axes is None:
        axes = tuple(range(ndim))
    axes = tuple(a % ndim for a in axes)
    if _r2c_pair_ok(xr.shape, axes, xr.dtype, engine):
        from vkfft_tpu.ops import pallas_engine as pe
        y = pe.rfft2_pair_planar(xr)
        for a in axes:
            if a < ndim - 2:
                y = _fftn_p(y, axes=(a,), engine=engine)
        return to_complex(y) if complex_out else y
    y = rfft(x, axis=axes[-1], engine=engine)
    if not isinstance(y, Planar):
        y = Planar(jnp.real(y), jnp.imag(y))
    for a in axes[:-1]:
        y = _fftn_p(y, axes=(a,), engine=engine)
    return to_complex(y) if complex_out else y


def irfftn(X, s: Optional[Sequence[int]] = None, axes: Optional[Sequence[int]] = None,
           engine: Optional[str] = None):
    if isinstance(X, np.ndarray):
        X = from_complex(X)
    elif not isinstance(X, Planar):
        Xj = jnp.asarray(X)
        X = Planar(jnp.real(Xj), jnp.imag(Xj))
    ndim = X.ndim
    if axes is None:
        axes = tuple(range(ndim))
    axes = tuple(a % ndim for a in axes)
    n_last = None if s is None else s[-1]
    m = X.shape[-1]
    nz = 2 * (m - 1) if n_last is None else n_last
    if (m == nz // 2 + 1
            and _r2c_pair_ok(X.shape[:-1] + (nz,), axes, X.re.dtype, engine)):
        from vkfft_tpu.ops import pallas_engine as pe
        for a in axes:
            if a < ndim - 2:
                X = _fftn_p(X, axes=(a,), inverse=True, engine=engine)
        return pe.irfft2_pair_planar(X.re, X.im, X.shape[-2], nz)
    for a in axes[:-1]:
        X = _fftn_p(X, axes=(a,), inverse=True, engine=engine)
    return irfft(X, n=n_last, axis=axes[-1], engine=engine)


def rfft2(x, axes=(-2, -1), engine: Optional[str] = None):
    return rfftn(x, axes=axes, engine=engine)


def irfft2(X, s=None, axes=(-2, -1), engine: Optional[str] = None):
    return irfftn(X, s=s, axes=axes, engine=engine)
