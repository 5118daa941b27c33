"""Fused frequency-domain convolution (planar-internal).

TPU analog of ``PrePostProcessing/vkFFT_Convolution.h`` (scalar and 2x2/3x3
matrix kernels, multi-kernel batching, conjugate and cross-power-spectrum
options, ``appendKernelConvolution`` :125): forward transform -> per-frequency
(matrix) multiply -> inverse transform, composed so XLA fuses the pointwise
stage into the surrounding passes.  The reference fuses the multiply into the
last-axis kernel and replays the inverse plan (``vkFFT_RunApp.h:323-464``).

All arithmetic is planar (re/im plane pairs) so convolutions run on
complex-free TPU backends; complex arrays are accepted and returned on
complex-capable ones.  Like the reference, convolutions are circular; linear
convolution is obtained by configuring zero padding (README.md:15-16).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu import api
from vkfft_tpu.config import FFTConfig
from vkfft_tpu.errors import InvalidConfigError
from vkfft_tpu.pcomplex import Planar, from_complex, real_planar, to_complex


def _as_planar(x) -> Planar:
    if isinstance(x, Planar):
        return x
    if isinstance(x, np.ndarray):
        if np.iscomplexobj(x):
            return from_complex(x)
        return real_planar(jnp.asarray(x))
    xj = jnp.asarray(x)
    if jnp.issubdtype(xj.dtype, jnp.complexfloating):
        return Planar(jnp.real(xj), jnp.imag(xj))
    return real_planar(xj)


def fftconvolve(x, h, axes: Optional[Sequence[int]] = None, engine: Optional[str] = None):
    """Circular convolution of ``x`` with ``h`` over ``axes`` via the FFT."""
    complex_out = not isinstance(x, Planar) and api.complex_supported()
    xp, hp = _as_planar(x), _as_planar(h)
    if axes is None:
        axes = tuple(range(-hp.ndim, 0))
    X = api.fftn(xp, axes=axes, engine=engine)
    H = api.fftn(hp, axes=axes, engine=engine)
    out = api.ifftn(X * H, axes=axes, engine=engine)
    return to_complex(out) if complex_out else out


def _planar_einsum(subs: str, K: Planar, X: Planar) -> Planar:
    """Complex einsum via four real einsums."""
    rr = jnp.einsum(subs, K.re, X.re)
    ii = jnp.einsum(subs, K.im, X.im)
    ri = jnp.einsum(subs, K.re, X.im)
    ir = jnp.einsum(subs, K.im, X.re)
    return Planar(rr - ii, ri + ir)


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
        kp = _as_planar(kernel)

        if m > 1 and kp.shape[-ndim - 2: -ndim] != (m, m):
            raise InvalidConfigError(
                f"matrix kernel must have shape (..., {m}, {m}, *{shape}), got {kp.shape}")
        if kp.shape[-ndim:] != shape:
            raise InvalidConfigError(
                f"kernel must end with transform shape {shape}, got {kp.shape}")
        if config.number_kernels > 1 and kp.shape[0] != config.number_kernels:
            raise InvalidConfigError(
                f"kernel leading dim must be number_kernels={config.number_kernels}")

        if kernel_in_freq_domain:
            self.kernel_f = kp
        else:
            self.kernel_f = api.fftn(kp, axes=tuple(range(-ndim, 0)), engine=engine)
        self._fused = self._plan_fused()
        self._call = jax.jit(self._convolve)

    @property
    def fusion_mode(self) -> Optional[str]:
        """Which single-kernel fusion strategy this plan selected (``'v3'``,
        ``'v3_rows'``, ``'v3_matrix'``, ``'pair'``, ``'v2_2k'``), or None for
        the unfused XLA spectrum round trip.  Inspect this (or
        ``debug.describe``) to see whether a configuration kept the fused
        fast path — degrading configs (e.g. ``number_kernels > 1``) are not
        silent."""
        return self._fused[0] if self._fused is not None else None

    def _plan_fused(self):
        """Select the in-kernel fusion strategy (the reference executes every
        convolution inside the last-axis kernel with an inline inverse,
        ``vkFFT_FFT.h:241-351``; here the single-kernel v3 paths cover 1-D
        scalar, N-D scalar (last axis fused, table row-blocked), and m x m
        matrix kernels; pre-v3 1-D sizes keep the two-kernel v2 form).

        Returns (mode, host_table) or None (XLA composition fallback)."""
        cfg = self.config
        coord_ok = cfg.coordinate_features in (1, cfg.matrix_convolution)
        if cfg.number_kernels != 1 or not coord_ok:
            return None
        # only the pair mode can elide output windows in-kernel; every other
        # fused form requires no output window
        zp_out_keep = None
        if cfg.zeropad_output is not None:
            from vkfft_tpu.api import _pair_prefix_keep
            zp_out_keep = _pair_prefix_keep(cfg.zeropad_output, cfg.shape)
            if zp_out_keep is None:
                return None
        if (self.engine or api.default_engine()) != "pallas":
            return None
        try:
            from vkfft_tpu.ops import pallas_engine as pe
            from vkfft_tpu.planner.plan import plan_axis
            from vkfft_tpu.planner.factorize import Algorithm
            shape = cfg.shape
            ndim = len(shape)
            m = cfg.matrix_convolution
            n = shape[-1]
            for s in shape:
                if plan_axis(s).algorithm is not Algorithm.DIRECT:
                    return None
            if cfg.zeropad_output is not None and ndim < 2:
                return None  # 1-D fused forms cannot elide output windows
            if not pe.use_conv_v3(n):
                # two-kernel v2 fallback for 1-D scalar only
                if (ndim == 1 and m == 1 and pe._use_v2(n)
                        and not cfg.cross_power_spectrum_normalization
                        and self.kernel_f.ndim == 1):
                    tab = (np.asarray(self.kernel_f.re, np.float64)
                           + 1j * np.asarray(self.kernel_f.im, np.float64))
                    if cfg.conjugate_convolution == 1:
                        tab = np.conj(tab)
                    return ("v2_2k", tab)
                return None
            if m == 1 and ndim == 1 and self.kernel_f.ndim == 1:
                tab = (np.asarray(self.kernel_f.re, np.float64)
                       + 1j * np.asarray(self.kernel_f.im, np.float64))
                if cfg.conjugate_convolution == 1:
                    tab = np.conj(tab)
                return ("v3_1d", tab)
            if (m == 1 and ndim >= 2 and self.kernel_f.ndim == ndim
                    and pe.use_conv_pair(shape[-2], shape[-1])):
                # single-kernel two-axis convolution: a 2-D conv is ONE
                # HBM read+write total; N-D pays only the outer strided
                # passes (fwd+mult+inv of the minor pair fused)
                tab = (np.asarray(self.kernel_f.re, np.float64)
                       + 1j * np.asarray(self.kernel_f.im, np.float64))
                if cfg.conjugate_convolution == 1:
                    tab = np.conj(tab)
                ny, nz = shape[-2], shape[-1]
                tab = tab.reshape(-1, ny, nz)
                return ("pair", (np.ascontiguousarray(tab.transpose(0, 2, 1)),
                                 zp_out_keep))
            if cfg.zeropad_output is not None:
                return None  # only the pair mode elides output windows
            if m == 1 and ndim > 1 and self.kernel_f.ndim == ndim:
                rows = int(np.prod(shape[:-1]))
                if rows % 128:
                    return None
                tab = (np.asarray(self.kernel_f.re, np.float64)
                       + 1j * np.asarray(self.kernel_f.im, np.float64))
                if cfg.conjugate_convolution == 1:
                    tab = np.conj(tab)
                # (n, rows): last-axis-major transposed spectrum
                return ("v3_rows", np.ascontiguousarray(
                    tab.reshape(rows, n).T))
            if m > 1 and ndim == 1 and self.kernel_f.ndim == 3:
                tab = (np.asarray(self.kernel_f.re, np.float64)
                       + 1j * np.asarray(self.kernel_f.im, np.float64))
                if cfg.conjugate_convolution == 1:
                    tab = np.conj(tab)
                return ("v3_mat", tab)
            return None
        except Exception:
            return None

    def _convolve(self, x: Planar) -> Planar:
        cfg = self.config
        ndim = len(cfg.shape)
        m = cfg.matrix_convolution
        multi = cfg.number_kernels > 1
        axes = tuple(range(-ndim, 0))

        pair_in = (0, 0)
        outer_in = {}
        if cfg.zeropad_input is not None:
            keep_in = None
            if self._fused is not None and self._fused[0] == "pair":
                from vkfft_tpu.api import _prefix_keep_all
                keeps = _prefix_keep_all(cfg.zeropad_input, cfg.shape)
                if keeps is not None:
                    keep_in, outer_in = keeps
            if keep_in is not None:
                # the pair kernel's read window elides the declared-zero
                # region — no masking pass (``vkFFT_Zeropad.h`` analog)
                pair_in = keep_in
            else:
                # declared-zero window mask before the forward pass (linear
                # convolution via zero padding, reference README.md:15-16)
                helper = api.get_application(FFTConfig(shape=cfg.shape),
                                             self.engine)
                x = helper._apply_zeropad(x, cfg.zeropad_input, ndim)

        if self._fused is not None and isinstance(x, Planar):
            from vkfft_tpu.ops import pallas_engine as pe
            mode, tab = self._fused
            n = cfg.shape[-1]
            total = int(np.prod(cfg.shape))
            conj_d = cfg.conjugate_convolution == 2
            xpow = bool(cfg.cross_power_spectrum_normalization)
            if mode == "v2_2k" and not conj_d and not xpow:
                lead = x.shape[:-1]
                flat = x.reshape(-1, n)
                out = pe.conv_fused_planar(flat, n, tab, normalize=True)
                return out.reshape(*lead, n)
            if mode == "v3_1d":
                lead = x.shape[:-1]
                flat = x.reshape(-1, n)
                out = pe.conv_fused_v3(flat, n, tab, scale=1.0 / n,
                                       conj_data=conj_d, xpow=xpow)
                return out.reshape(*lead, n)
            if mode == "pair":
                tab, keep_out = tab
                eng = api._engine(self.engine or api.default_engine())
                from vkfft_tpu.planner.plan import plan_axis
                ny, nz = cfg.shape[-2], cfg.shape[-1]
                off = x.ndim - ndim
                for ax in range(ndim - 2):
                    x = eng.fft_axis_p(x, off + ax, plan_axis(cfg.shape[ax]),
                                       False, in_keep=outer_in.get(ax, 0))
                x = pe.conv_fused_pair(x, ny, nz, tab, scale=1.0 / total,
                                       conj_data=conj_d, xpow=xpow,
                                       in_keep=pair_in,
                                       out_keep=keep_out or (0, 0))
                for ax in range(ndim - 3, -1, -1):
                    x = eng.fft_axis_p(x, off + ax, plan_axis(cfg.shape[ax]),
                                       True)
                if keep_out is not None:
                    from vkfft_tpu.api import _pad_planar_tail
                    x = _pad_planar_tail(x, ((keep_out[0], ny),
                                             (keep_out[1], nz)))
                return x
            if mode == "v3_rows":
                # N-D: strided forward over the outer axes, then one fused
                # last-axis kernel (forward + multiply + inline inverse),
                # then strided inverse over the outer axes — the reference's
                # kernel count (vkFFT_RunApp.h:323-464: only the last-axis
                # kernel carries the convolution).
                eng = api._engine(self.engine or api.default_engine())
                from vkfft_tpu.planner.plan import plan_axis
                rows = int(np.prod(cfg.shape[:-1]))
                off = x.ndim - ndim
                for ax in range(ndim - 1):
                    x = eng.fft_axis_p(x, off + ax, plan_axis(cfg.shape[ax]),
                                       False)
                lead = x.shape[:-1]
                flat = x.reshape(-1, n)
                out = pe.conv_fused_v3_rows(flat, n, rows, tab,
                                            scale=1.0 / total,
                                            conj_data=conj_d, xpow=xpow)
                x = out.reshape(*lead, n)
                for ax in range(ndim - 2, -1, -1):
                    x = eng.fft_axis_p(x, off + ax, plan_axis(cfg.shape[ax]),
                                       True)
                return x
            if mode == "v3_mat":
                m_ = cfg.matrix_convolution
                lead = x.shape[:-2]
                flat = x.reshape(-1, m_, n)
                out = pe.conv_fused_v3_matrix(flat, n, m_, tab,
                                              scale=1.0 / n,
                                              conj_data=conj_d, xpow=xpow)
                return out.reshape(*lead, m_, n)

        X = api.fftn(x, axes=axes, engine=self.engine)
        Kf = self.kernel_f
        if cfg.conjugate_convolution == 1:
            Kf = Kf.conj()
        elif cfg.conjugate_convolution == 2:
            X = X.conj()

        freq = "uvw"[:ndim]
        if m > 1:
            subs = (f"koi{freq},...i{freq}->k...o{freq}" if multi
                    else f"oi{freq},...i{freq}->...o{freq}")
            Y = _planar_einsum(subs, Kf, X)
        else:
            if multi:
                pad = X.ndim - (Kf.ndim - 1)
                Kb = Kf.reshape(*(Kf.shape[:1] + (1,) * pad + Kf.shape[1:]))
                Y = Planar(X.re[None], X.im[None])  # add kernel-batch dim
                Y = Kb * Y
            else:
                Y = Kf * X  # trailing-dim broadcasting covers coord features

        if cfg.cross_power_spectrum_normalization:
            mag = jnp.sqrt(Y.re * Y.re + Y.im * Y.im)
            eps = np.asarray(1e-30, dtype=mag.dtype)
            inv = 1.0 / jnp.maximum(mag, eps)
            Y = Planar(Y.re * inv, Y.im * inv)
        out = api.ifftn(Y, axes=axes, engine=self.engine)
        if cfg.zeropad_output is not None:
            helper = api.get_application(FFTConfig(shape=cfg.shape), self.engine)
            out = helper._apply_zeropad(out, cfg.zeropad_output, ndim)
        return out

    def __call__(self, x):
        complex_out = not isinstance(x, Planar) and api.complex_supported()
        out = self._call(_as_planar(x))
        return to_complex(out) if complex_out else out
