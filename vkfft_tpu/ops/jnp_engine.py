"""Reference execution engine: plan-driven mixed-radix FFT in pure jnp.

This is the TPU-framework analog of the reference's generated-kernel execution
path, expressed as traced XLA ops instead of generated source strings
(reference kernel composer: ``vkFFT_KernelsLevel2/vkFFT_FFT.h:48``).  Every
radix stage is a constant DFT-matrix contraction (MXU) plus a twiddle
elementwise multiply (VPU), which XLA fuses; the Pallas engine reproduces the
same dataflow with explicit VMEM residency.

Stockham recurrence implemented here (self-sorting, natural order in and out):
with ``L`` = product of processed radices, ``M`` = remaining length, and the
invariant

    A[k, m] = sum_p x[p*M + m] * w_L^(k*p) * w_N^(k*m),   k < L, m < M,

one radix-``r`` stage maps ``A[l, j*Mp + m'] -> A'[i*L + l, m']`` via

    A'[i*L + l, m'] = sum_j w_r^(i*j) * w_M^(i*m') * A[l, j*Mp + m'],

i.e. reshape ``(B, L, r, Mp)``, contract the DFT matrix over ``j``, multiply
the ``(r, Mp)`` twiddle, merge ``(i, l)`` with ``i`` major.  This is the same
math as the reference's staged Stockham loop (``vkFFT_FFT.h:156-239``) with
the shared-memory shuffle replaced by a layout change XLA is free to fuse.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu.planner.factorize import Algorithm
from vkfft_tpu import luts
from vkfft_tpu.planner.plan import AxisPlan, plan_axis

# Complex matmuls in fp32 must run the 6-pass bf16 decomposition to keep fp32
# accuracy on the MXU.
_PRECISION = jax.lax.Precision.HIGHEST


def _cast_tables(tables, dtype):
    return [(jnp.asarray(D.astype(dtype)), jnp.asarray(tw.astype(dtype))) for D, tw in tables]


def apply_stages(x: jax.Array, plan: AxisPlan, tables) -> jax.Array:
    """Run the Stockham core over the last axis of ``x`` (shape (B, core_n))."""
    B = x.shape[0]
    tabs = _cast_tables(tables, x.dtype)
    for stage, (D, tw) in zip(plan.stages, tabs):
        x = x.reshape(B, stage.L, stage.r, stage.Mp)
        x = jnp.einsum("ij,bljm->bilm", D, x, precision=_PRECISION)
        x = x * tw[None, :, None, :]
        x = x.reshape(B, stage.L * stage.r, stage.Mp)
    return x.reshape(B, -1)


def _fft_direct(x, plan, tabs, inverse):
    del inverse  # sign baked into the tables
    return apply_stages(x, plan, tabs["stages"])


def _fft_bluestein(x, plan, tabs, inverse):
    """Chirp-z: pad to smooth M, convolve with the chirp in frequency domain
    (reference pre/post multipliers: ``PrePostProcessing/vkFFT_Bluestein.h``)."""
    del inverse  # chirp sign baked into the tables
    B, n = x.shape
    m = plan.decomp.bluestein_size
    a, b_fft = tabs["bluestein"]
    a = jnp.asarray(a.astype(x.dtype))
    b_fft = jnp.asarray(b_fft.astype(x.dtype))
    y = x * a[None, :]
    y = jnp.pad(y, ((0, 0), (0, m - n)))
    Y = apply_stages(y, plan, tabs["stages"])
    Y = Y * b_fft[None, :]
    y = apply_stages(Y, plan, tabs["inv_stages"]) * x.dtype.type(1.0 / m)
    return y[:, :n] * a[None, :]


def _fft_rader(x, plan, tabs, inverse):
    """Rader prime FFT via length-(p-1) cyclic convolution (reference FFT-Rader
    stage: ``vkFFT_RaderKernels.h:30``). Inverse handled by conjugation."""
    if inverse:
        return jnp.conj(_fft_rader(jnp.conj(x), plan, tabs, False))
    perm, inv_perm, b_fft = tabs["rader"]
    b_fft = jnp.asarray(b_fft.astype(x.dtype))
    x0 = x[:, :1]
    X0 = jnp.sum(x, axis=1, keepdims=True)
    a = x[:, perm]
    A = apply_stages(a, plan, tabs["stages"])
    c = apply_stages(A * b_fft[None, :], plan, tabs["inv_stages"])
    c = c * x.dtype.type(1.0 / (plan.n - 1))
    # gather + concat, never scatter: XLA scatters with arbitrary indices
    # serialize on TPU (round 4, sample 7)
    order = np.argsort(inv_perm)
    return jnp.concatenate([X0, (x0 + c)[:, order]], axis=1)


def _fft_split(x, plan, tabs, inverse):
    """Cooley-Tukey split n = a*b with each factor planned recursively —
    runs Rader primes inline as stage factors of composite sizes (reference:
    ``vkFFT_Scheduler.h:2303-2404``).  With n = ja*b + jb, k = kb*a + ka:
    contract ja (may be Rader), twiddle w_n^(jb*ka), contract jb, transpose
    digits to natural order."""
    from vkfft_tpu.planner.plan import plan_axis
    a, b = plan.decomp.split
    B = x.shape[0]
    tw = jnp.asarray(tabs["split_tw"].astype(x.dtype))
    y = x.reshape(B, a, b)
    y = jnp.swapaxes(y, 1, 2).reshape(B * b, a)
    y = fft_lines(y, plan_axis(a), inverse).reshape(B, b, a)
    y = y * tw[None]
    y = jnp.swapaxes(y, 1, 2).reshape(B * a, b)
    y = fft_lines(y, plan_axis(b), inverse).reshape(B, a, b)
    return jnp.swapaxes(y, 1, 2).reshape(B, a * b)


_DISPATCH = {
    Algorithm.DIRECT: _fft_direct,
    Algorithm.BLUESTEIN: _fft_bluestein,
    Algorithm.RADER: _fft_rader,
    Algorithm.SPLIT: _fft_split,
}


def fft_lines(x: jax.Array, plan: AxisPlan, inverse: bool = False) -> jax.Array:
    """Unnormalized DFT over the last axis of a (B, n) complex array."""
    if plan.n == 1:
        return x
    tabs = luts.axis_tables(plan, inverse)
    return _DISPATCH[plan.algorithm](x, plan, tabs, inverse)


def fft_axis(x: jax.Array, axis: int, plan: AxisPlan, inverse: bool = False) -> jax.Array:
    """Unnormalized DFT along ``axis`` of an N-D complex array."""
    axis = axis % x.ndim
    if x.shape[axis] != plan.n:
        raise ValueError(f"axis {axis} has length {x.shape[axis]}, plan is for {plan.n}")
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    y = fft_lines(x.reshape(-1, plan.n), plan, inverse).reshape(shape)
    if axis != x.ndim - 1:
        y = jnp.moveaxis(y, -1, axis)
    return y


# ---------------------------------------------------------------------------
# Planar (complex-free) path — required on TPU backends without complex-dtype
# support.  Same math as above with complex packed into real ops: each stage's
# DFT contraction uses the real matrix [[Dr, -Di], [Di, Dr]] acting on
# re/im stacked along the contracted axis.
# ---------------------------------------------------------------------------

from vkfft_tpu.pcomplex import Planar, planar_table  # noqa: E402


def _pack_real(D: np.ndarray) -> np.ndarray:
    Dr, Di = np.real(D), np.imag(D)
    return np.block([[Dr, -Di], [Di, Dr]])


def apply_stages_p(x: Planar, plan: AxisPlan, tables) -> Planar:
    """Planar Stockham core over (B, core_n) planes."""
    B = x.shape[0]
    dt = x.dtype
    xr, xi = x.re, x.im
    for stage, (D, tw) in zip(plan.stages, tables):
        r, L, Mp = stage.r, stage.L, stage.Mp
        R = jnp.asarray(_pack_real(D).astype(dt))
        xr = xr.reshape(B, L, r, Mp)
        xi = xi.reshape(B, L, r, Mp)
        z = jnp.concatenate([xr, xi], axis=2)
        y = jnp.einsum("ij,bljm->bilm", R, z, precision=_PRECISION)
        yr, yi = y[:, :r], y[:, r:]
        twr = jnp.asarray(np.real(tw).astype(dt))[None, :, None, :]
        twi = jnp.asarray(np.imag(tw).astype(dt))[None, :, None, :]
        xr = yr * twr - yi * twi
        xi = yr * twi + yi * twr
        xr = xr.reshape(B, L * r, Mp)
        xi = xi.reshape(B, L * r, Mp)
    return Planar(xr.reshape(B, -1), xi.reshape(B, -1))


def _pad_tail_p(x: Planar, pad: int) -> Planar:
    if pad == 0:
        return x
    z = jnp.zeros(x.shape[:-1] + (pad,), x.dtype)
    return Planar(jnp.concatenate([x.re, z], axis=-1),
                  jnp.concatenate([x.im, z], axis=-1))


def _fft_split_p(x: Planar, plan: AxisPlan, tabs, inverse: bool) -> Planar:
    from vkfft_tpu.planner.plan import plan_axis
    a, b = plan.decomp.split
    B = x.shape[0]
    tw = planar_table(tabs["split_tw"], x.dtype)

    def swap(p, B_, d1, d2):
        return Planar(jnp.swapaxes(p.re.reshape(B_, d1, d2), 1, 2),
                      jnp.swapaxes(p.im.reshape(B_, d1, d2), 1, 2))

    y = swap(x, B, a, b).reshape(B * b, a)
    y = fft_lines_p(y, plan_axis(a), inverse).reshape(B, b, a)
    y = y * Planar(tw.re[None], tw.im[None])
    y = swap(y, B, b, a).reshape(B * a, b)
    y = fft_lines_p(y, plan_axis(b), inverse).reshape(B, a, b)
    return swap(y, B, a, b).reshape(B, a * b)


def fft_lines_p(x: Planar, plan: AxisPlan, inverse: bool = False,
                scale: float = 1.0) -> Planar:
    """Planar DFT over the last axis of (B, n) planes, scaled by ``scale``
    (default unnormalized).  On this engine the scale multiply is a plain
    XLA op — the elementwise fuser folds it into the adjacent stage, so no
    table fold is needed (unlike the Pallas engine).

    bf16/f16 planes are *storage-only* tiers (config.py:29-30): upcast to
    fp32 for every stage's arithmetic and cast back at the end, matching the
    Pallas engine's in-VMEM upcast — otherwise this fallback would silently
    compute in narrow precision."""
    if scale != 1.0:
        y = fft_lines_p(x, plan, inverse)
        return y * np.asarray(scale, dtype=y.dtype)
    if plan.n == 1:
        return x
    if x.dtype in (jnp.bfloat16, jnp.float16):
        storage = x.dtype
        y = fft_lines_p(Planar(x.re.astype(jnp.float32),
                               x.im.astype(jnp.float32)), plan, inverse)
        return Planar(y.re.astype(storage), y.im.astype(storage))
    tabs = luts.axis_tables(plan, inverse)
    alg = plan.algorithm
    if alg is Algorithm.SPLIT:
        return _fft_split_p(x, plan, tabs, inverse)
    if alg is Algorithm.DIRECT:
        return apply_stages_p(x, plan, tabs["stages"])
    if alg is Algorithm.BLUESTEIN:
        n = plan.n
        m = plan.decomp.bluestein_size
        a_t, b_t = tabs["bluestein"]
        a = planar_table(a_t, x.dtype)
        b_fft = planar_table(b_t, x.dtype)
        y = x * a[None, :]
        y = _pad_tail_p(y, m - n)
        Y = apply_stages_p(y, plan, tabs["stages"])
        y = apply_stages_p(Y * b_fft[None, :], plan, tabs["inv_stages"])
        y = y * np.asarray(1.0 / m, dtype=x.dtype)
        return y[:, :n] * a[None, :]
    # RADER via conjugation for the inverse
    if inverse:
        return fft_lines_p(x.conj(), plan, False).conj()
    p = plan.n
    perm, inv_perm, b_t = tabs["rader"]
    b_fft = planar_table(b_t, x.dtype)
    x0 = x[:, :1]
    X0 = Planar(jnp.sum(x.re, axis=1, keepdims=True),
                jnp.sum(x.im, axis=1, keepdims=True))
    a = x[:, perm]
    A = apply_stages_p(a, plan, tabs["stages"])
    c = apply_stages_p(A * b_fft[None, :], plan, tabs["inv_stages"])
    c = c * np.asarray(1.0 / (p - 1), dtype=x.dtype)
    val = x0 + c
    # gather + concat, never scatter (see _fft_rader)
    order = np.argsort(inv_perm)
    return Planar(jnp.concatenate([X0.re, val.re[:, order]], axis=1),
                  jnp.concatenate([X0.im, val.im[:, order]], axis=1))


def fft_axis_p(x: Planar, axis: int, plan: AxisPlan, inverse: bool = False,
               scale: float = 1.0, donate: bool = False, in_keep: int = 0,
               out_keep: int = 0) -> Planar:
    """Planar DFT along ``axis`` of N-D planes, scaled by ``scale``.
    ``donate`` is accepted for engine-interface parity (XLA manages the
    reference path's buffers; nothing to alias here).  ``in_keep`` /
    ``out_keep`` honor the declared-zero window contract as a mask / output
    slice (the pallas engine elides; this reference path stays correct)."""
    axis = axis % x.ndim
    if x.shape[axis] != plan.n:
        raise ValueError(f"axis {axis} has length {x.shape[axis]}, plan is for {plan.n}")
    if in_keep:
        n_ = x.shape[axis]
        shp = [1] * x.ndim
        shp[axis] = n_
        m = (jnp.arange(n_) < in_keep).reshape(shp)
        z = jnp.zeros((), x.re.dtype)
        x = Planar(jnp.where(m, x.re, z), jnp.where(m, x.im, z))
    if out_keep:
        y = fft_axis_p(x, axis, plan, inverse, scale=scale)
        return Planar(jax.lax.slice_in_dim(y.re, 0, out_keep, axis=axis),
                      jax.lax.slice_in_dim(y.im, 0, out_keep, axis=axis))
    moved = axis != x.ndim - 1
    if moved:
        x = Planar(jnp.moveaxis(x.re, axis, -1), jnp.moveaxis(x.im, axis, -1))
    shape = x.shape
    y = fft_lines_p(x.reshape(-1, plan.n), plan, inverse,
                    scale=scale).reshape(*shape)
    if moved:
        y = Planar(jnp.moveaxis(y.re, -1, axis), jnp.moveaxis(y.im, -1, axis))
    return y
