"""Pallas TPU execution engine.

This is the performance path: one fused kernel per transform keeps every stage
VMEM-resident, so a batched FFT costs exactly one HBM read + one HBM write —
the TPU realization of the reference's "single upload" regime (a VkFFT axis
whose whole sequence fits in shared memory, ``vkFFT_Scheduler.h:2590-2650``).

Algorithm: Bailey four-step with a near-square split N = N1 * N2
(N1, N2 <= 128) so each half-transform is a dense DFT-matrix matmul on the
MXU:

    x[n1, n2] --(R1: DFT over n1)--> A[k1, n2]
              --(twiddle w_N^(k1*n2), VPU)-->
              --(in-VMEM transpose)--> A^T[n2, k1]
              --(R2: DFT over n2)--> X[k2, k1]

and the (k2, k1) output block flattens to the natural frequency order
X[k2*N1 + k1], so no output reorder is needed.  Complex arithmetic is packed
into real matmuls: with z = [re; im] stacked on the contracted axis, the
complex matrix C acts as the real matrix [[Cr, -Ci], [Ci, Cr]] — one MXU op
per step instead of four (reference radix butterflies + shared-memory
shuffles: ``vkFFT_RadixKernels.h:30``, ``vkFFT_RadixShuffle.h``).

Because a dense length-m DFT costs m MACs/point and the MXU crossover against
HBM bandwidth sits near ~10^2 MACs/point in fp32, any m <= 128 rides free —
this engine needs no Rader at all for N <= 16384, and covers *every* N that
splits into two factors <= 128 (all smooth sizes and prime factors <= 127).
Bigger or unsplittable sizes fall back to the jnp engine (api dispatch) or to
Bluestein composition over this core.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkfft_tpu import luts
from vkfft_tpu.planner.factorize import Algorithm, prime_factors
from vkfft_tpu.planner.plan import AxisPlan

# Matmul precision for the fp32 tier.  Mosaic only lowers DEFAULT and
# HIGHEST; HIGHEST (6-pass bf16) gives full fp32 accuracy and the flop cost
# is managed by keeping stage radix sums small (3-factor splits).
_PRECISION = jax.lax.Precision.HIGHEST
MAX_FACTOR = 128
MAX_SINGLE_KERNEL_N = MAX_FACTOR * MAX_FACTOR

# Interpreter mode for CPU testing (set by tests / auto-detected off-TPU).
_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def set_matmul_precision(level: str) -> None:
    """'highest' (6-pass bf16, full fp32, default) or 'default' (1-pass
    bf16 — the bf16-tier compute mode)."""
    global _PRECISION
    _PRECISION = {"default": jax.lax.Precision.DEFAULT,
                  "highest": jax.lax.Precision.HIGHEST}[level]
    _build_fft_call.cache_clear()
    _build_fft_call_v2.cache_clear()
    _build_fft_call_v3.cache_clear()


def set_mxu_int8(value: bool) -> None:
    """Toggle the 6-pass int8 MXU emulation for fp32-tier v3-family
    kernels (fp32-class accuracy at half the bf16-HIGHEST MXU time on
    MXUs with 2x int8 rate; see experiments/e18_int8_mxu.py)."""
    global _V3_MXU_INT8
    _V3_MXU_INT8 = bool(value)
    for b in (_build_fft_call_v2, _build_fft_call_v3, _build_r2c_call,
              _build_strided_call, _build_conv_inv_call, _build_conv_v3_call,
              _build_pair_call, _build_conv_pair_call, _build_dct_call,
              _build_r2c_pair_call):
        b.cache_clear()



def _mxu_passes(prec) -> int:
    """Effective bf16-pass-equivalents per MXU MAC, for cost estimates:
    HIGHEST = 6 bf16 passes; int8 emulation (fp32 tier only) = 6 int8
    passes at 2x rate = 3; DEFAULT (storage tiers) = 1."""
    if prec is not jax.lax.Precision.HIGHEST:
        return 1
    return 3 if _V3_MXU_INT8 else 6


@functools.lru_cache(maxsize=1024)
def split_two_factors(n: int) -> Optional[tuple[int, int]]:
    """Best (N1, N2) with N1*N2 == n, both <= MAX_FACTOR, near-square with
    N2 >= N1 (N2 feeds the lane dimension of step A, so bigger is better).
    Analog of the reference's 2-upload axisSplit sqrt search
    (``vkFFT_Scheduler.h:2710-2888``)."""
    if n > MAX_SINGLE_KERNEL_N:
        return None
    if n <= MAX_FACTOR:
        return (1, n)
    best = None
    for n1 in range(2, MAX_FACTOR + 1):
        if n % n1 == 0:
            n2 = n // n1
            if n2 <= MAX_FACTOR and n1 <= n2:
                if best is None or abs(n1 - n2) < abs(best[0] - best[1]):
                    best = (n1, n2)
    return best


def supports(plan: AxisPlan) -> bool:
    """Whether the Pallas path can run this axis plan's core length."""
    if plan.algorithm is Algorithm.SPLIT:
        from vkfft_tpu.planner.plan import plan_axis
        a, b = plan.decomp.split
        return supports(plan_axis(a)) and supports(plan_axis(b))
    if split_two_factors(plan.core_n) is not None:
        return True
    return (split_long(plan.core_n) is not None
            or split_long3(plan.core_n) is not None)


def _pack_complex_matrix(C: np.ndarray) -> np.ndarray:
    """[[Cr, -Ci], [Ci, Cr]] — complex matmul as one real matmul."""
    Cr, Ci = np.real(C), np.imag(C)
    return np.block([[Cr, -Ci], [Ci, Cr]]).astype(np.float32)


@functools.lru_cache(maxsize=512)
def _four_step_tables(n: int, inverse: bool):
    n1, n2 = split_two_factors(n)
    D1 = luts.dft_matrix(n1, inverse) if n1 > 1 else np.ones((1, 1), dtype=complex)
    D2 = luts.dft_matrix(n2, inverse)
    sign = 2.0j if inverse else -2.0j
    k1 = np.arange(n1)[:, None]
    nn2 = np.arange(n2)[None, :]
    tw = np.exp(sign * np.pi / n * ((k1 * nn2) % n))
    return (
        _pack_complex_matrix(D1),
        _pack_complex_matrix(D2),
        np.real(tw).astype(np.float32),
        np.imag(tw).astype(np.float32),
    )


def _fft_kernel(n1, n2, gb, out_dtype, xr_ref, xi_ref, r1_ref, r2_ref,
                twr_ref, twi_ref, or_ref, oi_ref):
    """``gb`` lines per program (unrolled): blocks are (gb, N1, N2) in /
    (gb, N2, N1) out.  Line batching amortizes per-program dispatch + DMA
    latency — the analog of the reference's grouped-batch threadblocks
    (``groupedBatch``, ``vkFFT_AxisBlockSplitter.h:27-38``).

    Storage dtype may be bf16/f16 (the reference's halfPrecisionMemoryOnly
    mode, vkFFT_Structs.h:189): blocks are loaded in the narrow type and
    upcast in VMEM, halving HBM traffic while computing in fp32."""
    twr = twr_ref[:]
    twi = twi_ref[:]
    for g in range(gb):
        xr = xr_ref[g].astype(jnp.float32)
        xi = xi_ref[g].astype(jnp.float32)
        if n1 > 1:
            z = jnp.concatenate([xr, xi], axis=0)                   # (2N1, N2)
            y = jnp.dot(r1_ref[:], z, preferred_element_type=jnp.float32,
                        precision=_PRECISION)
            ar, ai = y[:n1], y[n1:]
            tr = ar * twr - ai * twi
            ti = ar * twi + ai * twr
        else:
            tr, ti = xr, xi
        tr = tr.T                                                    # (N2, N1)
        ti = ti.T
        z2 = jnp.concatenate([tr, ti], axis=0)                      # (2N2, N1)
        y2 = jnp.dot(r2_ref[:], z2, preferred_element_type=jnp.float32,
                     precision=_PRECISION)
        or_ref[g] = y2[:n2].astype(out_dtype)
        oi_ref[g] = y2[n2:].astype(out_dtype)


def _lines_per_block(n: int) -> int:
    """Lines per program: target ~512KB of planar data per block (DMA
    efficiency) while keeping in+out+temps well under VMEM."""
    bytes_per_line = 2 * n * 4
    gb = max(1, (512 * 1024) // bytes_per_line)
    return int(min(gb, 128))


@functools.lru_cache(maxsize=512)
def _build_fft_call(n: int, inverse: bool, batch: int, interpret: bool,
                    dtype_name: str = "float32"):
    """Compile-cached pallas_call for a (batch, n) planar transform —
    the XLA-trace-cache analog of the reference's compiled-kernel dictionary
    (``VkFFT_CompileKernel`` + binary cache).  ``dtype_name`` is the storage
    dtype of the data planes (float32/bfloat16/float16); compute is fp32."""
    dtype = jnp.dtype(dtype_name)
    n1, n2 = split_two_factors(n)
    r1, r2, twr, twi = _four_step_tables(n, inverse)
    gb = _lines_per_block(n)
    pad = (-batch) % gb
    padded = batch + pad

    kernel = functools.partial(_fft_kernel, n1, n2, gb, dtype)
    line_spec_in = pl.BlockSpec((gb, n1, n2), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    line_spec_out = pl.BlockSpec((gb, n2, n1), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(padded // gb,),
        in_specs=[
            line_spec_in, line_spec_in,
            const(r1.shape), const(r2.shape),
            const(twr.shape), const(twi.shape),
        ],
        out_specs=[line_spec_out, line_spec_out],
        out_shape=[
            jax.ShapeDtypeStruct((padded, n2, n1), dtype),
            jax.ShapeDtypeStruct((padded, n2, n1), dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
    )

    def run(xr, xi):
        xr = xr.reshape(batch, n1, n2)
        xi = xi.reshape(batch, n1, n2)
        if pad:
            xr = jnp.pad(xr, ((0, pad), (0, 0), (0, 0)))
            xi = jnp.pad(xi, ((0, pad), (0, 0), (0, 0)))
        orr, oi = call(xr, xi, jnp.asarray(r1), jnp.asarray(r2),
                       jnp.asarray(twr), jnp.asarray(twi))
        return (orr[:batch].reshape(batch, n), oi[:batch].reshape(batch, n))

    return run


def _use_v2(n: int) -> bool:
    s = split_lane_major(n)
    return s is not None and s[0] >= 8


def core_fft_planar(xr: jax.Array, xi: jax.Array, n: int, inverse: bool,
                    donate: bool = False, scale: float = 1.0):
    """DFT of planar lines (B, n) -> (B, n), scaled by ``scale`` (folded
    into the kernels' stage tables — in-kernel normalization, no extra HBM
    pass); storage dtype of the planes (f32/bf16/f16) is preserved, compute
    is fp32.  Dispatches to the lane-major v2 kernel when its lane fill is
    adequate, and to the two-level long-sequence path beyond the
    single-kernel range."""
    batch = xr.shape[0]
    if n > MAX_SINGLE_KERNEL_N:
        return fft_long_planar(xr, xi, n, inverse, order="natural",
                               scale=scale)
    if _use_v3(n):
        # natural-order native batch-in-lanes kernel (no reorder pass)
        return core_fft_planar_v3(xr, xi, n, inverse, donate=donate,
                                  scale=scale)
    if _use_v2(n):
        return core_fft_planar_v2(xr, xi, n, inverse, order="natural",
                                  donate=donate, scale=scale)
    run = _build_fft_call(n, inverse, batch, _INTERPRET, str(xr.dtype))
    orr, oi = run(xr, xi)
    if scale != 1.0:  # v1 fallback kernel has no table fold
        s = xr.dtype.type(scale)
        orr, oi = orr * s, oi * s
    return orr, oi


def _core_fft(x: jax.Array, n: int, inverse: bool) -> jax.Array:
    """Unnormalized DFT over (B, n) complex64 via the planar core."""
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    orr, oi = core_fft_planar(xr, xi, n, inverse)
    return jax.lax.complex(orr, oi).astype(x.dtype)


def fft_lines(x: jax.Array, plan: AxisPlan, inverse: bool = False) -> jax.Array:
    """Unnormalized DFT over the last axis of (B, n), Pallas-accelerated.

    DIRECT sizes run the fused four-step kernel; BLUESTEIN/RADER reuse it for
    their internal convolution FFTs with jnp-level pre/post passes (the
    reference similarly reuses its own generated kernels for the chirp FFT,
    ``vkFFT_RecursiveFFTGenerators.h:241``)."""
    n = plan.n
    if n == 1:
        return x
    alg = plan.algorithm
    if alg is Algorithm.SPLIT:
        from vkfft_tpu.planner.plan import plan_axis as _plan_axis
        fa, fb = plan.decomp.split
        B = x.shape[0]
        tw = jnp.asarray(luts.ct_twiddle(fa, fb, inverse).astype(np.complex64)).astype(x.dtype)
        y = jnp.swapaxes(x.reshape(B, fa, fb), 1, 2).reshape(B * fb, fa)
        y = fft_lines(y, _plan_axis(fa), inverse).reshape(B, fb, fa) * tw[None]
        y = jnp.swapaxes(y, 1, 2).reshape(B * fa, fb)
        y = fft_lines(y, _plan_axis(fb), inverse).reshape(B, fa, fb)
        return jnp.swapaxes(y, 1, 2).reshape(B, n)
    if alg is Algorithm.DIRECT:
        return _core_fft(x, n, inverse)
    if alg is Algorithm.BLUESTEIN:
        m = plan.decomp.bluestein_size
        a, b_fft = luts.bluestein_chirp(n, m, inverse)
        a = jnp.asarray(a.astype(np.complex64)).astype(x.dtype)
        b_fft = jnp.asarray(b_fft.astype(np.complex64)).astype(x.dtype)
        y = x * a[None, :]
        y = jnp.pad(y, ((0, 0), (0, m - n)))
        Y = _core_fft(y, m, False)
        y = _core_fft(Y * b_fft[None, :], m, True) * x.dtype.type(1.0 / m)
        return y[:, :n] * a[None, :]
    # RADER: inverse by conjugation, p-1 convolution via the core
    if inverse:
        return jnp.conj(fft_lines(jnp.conj(x), plan, False))
    p = plan.n
    perm, inv_perm, b_fft = luts.rader_tables(p)
    b_fft = jnp.asarray(b_fft.astype(np.complex64)).astype(x.dtype)
    x0 = x[:, :1]
    X0 = jnp.sum(x, axis=1, keepdims=True)
    a = x[:, perm]
    A = _core_fft(a, p - 1, False)
    c = _core_fft(A * b_fft[None, :], p - 1, True) * x.dtype.type(1.0 / (p - 1))
    # gather + concat, never scatter (see the planar branch below)
    order = np.argsort(inv_perm)
    return jnp.concatenate([X0, (x0 + c)[:, order]], axis=1)


def fft_axis(x: jax.Array, axis: int, plan: AxisPlan, inverse: bool = False) -> jax.Array:
    """Pallas DFT along ``axis``; falls back to the jnp engine for shapes the
    kernel does not support yet."""
    if not supports(plan) or x.dtype == jnp.complex128:
        from vkfft_tpu.ops import jnp_engine
        return jnp_engine.fft_axis(x, axis, plan, inverse)
    axis = axis % x.ndim
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    y = fft_lines(x.reshape(-1, plan.n), plan, inverse).reshape(shape)
    if axis != x.ndim - 1:
        y = jnp.moveaxis(y, -1, axis)
    return y


# ---------------------------------------------------------------------------
# Planar (complex-free) entry points — the native path on TPU backends
# without complex-dtype support.
# ---------------------------------------------------------------------------

from vkfft_tpu.pcomplex import Planar, planar_table  # noqa: E402


def _core_fft_p(x: Planar, n: int, inverse: bool, donate: bool = False,
                scale: float = 1.0) -> Planar:
    orr, oi = core_fft_planar(x.re, x.im, n, inverse, donate=donate,
                              scale=scale)
    return Planar(orr, oi)


def _pad_tail_p(x: Planar, pad: int) -> Planar:
    if pad == 0:
        return x
    z = jnp.zeros(x.shape[:-1] + (pad,), x.dtype)
    return Planar(jnp.concatenate([x.re, z], axis=-1),
                  jnp.concatenate([x.im, z], axis=-1))


def _conv_roundtrip_p(y: Planar, m: int, b_table: np.ndarray) -> Planar:
    """Unnormalized IDFT(DFT(y) * b) of (B, m) planes, with zero reorder
    passes either way (reference: bit-reversed-order convolutions under
    disableReorderFourStep, README.md:16).

    v3 sizes run the whole round trip as ONE fused kernel (forward stages +
    spectrum multiply + inverse stages, all VMEM-resident — the reference's
    ``appendBluesteinConvolution`` single-kernel structure,
    ``vkFFT_Bluestein.h:201``); the v2 fallback runs swapped-digit-order
    pairs with a host-permuted table."""
    if _use_v3(m):
        return conv_fused_v3(y, m, b_table)
    # NOT routed: `_v3_wide_plan` (radices up to 127, e.g. 7918 = 107*74 in
    # one fused kernel) is mathematically sound (interpret-verified) but its
    # (214, 214)-packed 6-pass contraction blew past 25 minutes of Mosaic
    # compile on hardware (e48) — same compile-explosion class as the il=8
    # conv kernels.  The v2 two-factor form stays the production route.
    if _use_v2(m):
        # 2-kernel fused form (round 5): forward-swapped kernel + one
        # multiply+inverse kernel — the spectrum multiply and its XLA glue
        # (lane pads, reshapes) measured ~40%% of the Rader round trip
        # (e46 profile of p=7919)
        return conv_fused_planar(y, m, b_table, normalize=False)
    long_ok = split_long(m)
    if (long_ok is not None and long_ok[0] % _V3_SB == 0
            and _use_v3(long_ok[1])):
        return _conv_roundtrip_long_p(y, m, b_table)
    bp = planar_table(b_table, y.dtype)
    F = _core_fft_p(y, m, False) * bp[None, :]
    return _core_fft_p(F, m, True)


def _conv_roundtrip_long_p(y: Planar, m: int, b_table: np.ndarray) -> Planar:
    """Fused long-regime circular convolution: m = Nc * Ns beyond the
    single-kernel range runs as THREE kernels — strided Nc pass (four-step
    twiddle fused on the write), ONE fused contiguous kernel doing
    [Ns-forward stages -> per-line spectrum multiply -> inline Ns-inverse
    stages], and the inverse strided Nc pass (conjugate twiddle fused on the
    read).  No reorder passes, no separate spectrum-multiply HBM pass: the
    spectrum multiply happens in the SWAPPED (kc-major) four-step layout,
    where line kc multiplies by table column T[ks, kc] = b[ks*Nc + kc]
    (reference: bit-reversed-order convolutions under
    disableReorderFourStep, README.md:16; in-kernel conv ``vkFFT_FFT.h:
    241-351``)."""
    nc, ns = split_long(m)
    B = y.shape[0]
    c1, c2 = split_lane_major(nc)
    # forward strided pass, four-step twiddle fused on the write
    fa = _sep_twiddle(c1, c2, ns, m, False)
    fb = _sep_twiddle(c2, 1, ns, m, False)
    run = _build_strided_call(nc, False, B, ns, _INTERPRET, str(y.dtype),
                              fused="post",
                              factors=(("dim1", c1), ("dim2", c2)))
    tr, ti = run(y.re.reshape(B, nc, ns), y.im.reshape(B, nc, ns),
                 jnp.asarray(fa[0]), jnp.asarray(fa[1]),
                 jnp.asarray(fb[0]), jnp.asarray(fb[1]))      # (B, kc, ns)
    # middle: one fused kernel per-line conv in swapped layout
    mid = conv_fused_v3_rows(
        Planar(tr.reshape(B * nc, ns), ti.reshape(B * nc, ns)),
        ns, nc, np.ascontiguousarray(b_table.reshape(ns, nc)))
    # inverse strided pass, conjugate twiddle fused on the read
    fa = _sep_twiddle(c2, c1, ns, m, True)
    fb = _sep_twiddle(c1, 1, ns, m, True)
    run = _build_strided_call(nc, True, B, ns, _INTERPRET, str(y.dtype),
                              fused="pre",
                              factors=(("dim1", c2), ("dim2", c1)))
    orr, oi = run(mid.re.reshape(B, nc, ns), mid.im.reshape(B, nc, ns),
                  jnp.asarray(fa[0]), jnp.asarray(fa[1]),
                  jnp.asarray(fb[0]), jnp.asarray(fb[1]))
    return Planar(orr.reshape(B, m), oi.reshape(B, m))


def _long_conv_ok(m: int) -> bool:
    """Can the 3-kernel fused long tier run a circular convolution at m?"""
    lk = split_long(m)
    return (lk is not None and lk[0] % _V3_SB == 0 and _use_v3(lk[1])
            and _use_v3(lk[0]))


def _bluestein_long_fused_p(x: Planar, n: int, m: int, inverse: bool,
                            scale: float = 1.0, in_keep: int = 0) -> Planar:
    """Long-tier Bluestein with the chirp pre/post multiplies FUSED into the
    strided kernels as separable factor tables (round 5; the reference fuses
    them into every kernel's read/write — ``appendBluesteinMultiplication``,
    ``vkFFT_Bluestein.h:32`` — the round-4 form paid 2 XLA passes of m-sized
    data per direction instead).

    Pipeline per direction (3 kernels, m never materializes unstaged):
      pad x to rows*ns (a ~few-%% XLA pad, NOT the m pad)
      -> strided(nc) [PRE: chirp factors + read-elided zero rows,
                      POST: 4-step twiddle]
      -> fused conv kernel (ns fwd stages, spectrum multiply, ns inv)
      -> strided(nc) [PRE: conj twiddle, POST: chirp factors * scale,
                      out_keep: only live rows written]
      -> crop to n."""
    nc, ns = split_long(m)
    B = x.shape[0]
    live = in_keep if 0 < in_keep < n else n   # declared-zero input tail
    rows = -(-live // ns)         # live kc rows of the (nc, ns) view
    out_rows = -(-n // ns)        # output crop still needs all n
    # the input buffer carries an 8-multiple of rows (Mosaic second-minor
    # window legality; the extra declared-zero rows are never live)
    rows_buf = min(nc, -(-rows // 8) * 8)
    padded = rows_buf * ns
    _, b_fft = luts.bluestein_chirp(n, m, inverse)
    if padded > n:
        y = _pad_tail_p(x, padded - n)
    elif padded < n:
        # the sliced-off tail [padded, n) is declared zero
        y = x[:, :padded]
    else:
        y = x

    def planes(t):
        return (jnp.asarray(np.ascontiguousarray(np.real(t), np.float32)),
                jnp.asarray(np.ascontiguousarray(np.imag(t), np.float32)))

    # forward strided pass: chirp on the read, four-step twiddle on the
    # write — both as FULL (nc, ns) rows-kind tables (KBs at the long
    # tier's small S; the separable broadcast form relayouts per block,
    # e44b measured it 3x the plain kernel)
    ch = planes(luts.bluestein_chirp_rows(n, nc, ns, inverse))
    tw = planes(luts.fourstep_twiddle_full(nc, ns, False))
    run = _build_strided_call(
        nc, False, B, ns, _INTERPRET, str(x.dtype),
        factors_pre=(("rows", nc),), factors_post=(("rows", nc),),
        in_keep=rows)
    tr, ti = run(y.re.reshape(B, rows_buf, ns), y.im.reshape(B, rows_buf, ns),
                 ch[0], ch[1], tw[0], tw[1])               # (B, nc, ns)

    # middle: fused per-line conv in the swapped (kc-major) layout
    mid = conv_fused_v3_rows(
        Planar(tr.reshape(B * nc, ns), ti.reshape(B * nc, ns)),
        ns, nc, np.ascontiguousarray((b_fft * (1.0 / m)).reshape(ns, nc)))

    # inverse strided pass: conj twiddle on the read, chirp (and the caller's
    # scale) on the write; only the live rows are written
    ch = planes(luts.bluestein_chirp_rows(n, nc, ns, inverse, scale=scale))
    tw = planes(luts.fourstep_twiddle_full(nc, ns, True))
    run = _build_strided_call(
        nc, True, B, ns, _INTERPRET, str(x.dtype),
        factors_pre=(("rows", nc),), factors_post=(("rows", nc),),
        out_keep=out_rows)
    orr, oi = run(mid.re.reshape(B, nc, ns), mid.im.reshape(B, nc, ns),
                  tw[0], tw[1], ch[0], ch[1])
    return Planar(orr.reshape(B, out_rows * ns)[:, :n],
                  oi.reshape(B, out_rows * ns)[:, :n])


def _bluestein_pair_p(x: Planar, n: int, m: int, inverse: bool,
                      scale: float = 1.0, in_keep: int = 0) -> Planar:
    """ONE-kernel long-tier Bluestein (round 5): the padded m = Nc*Ns line
    is the four-step (Nc, Ns) plane of the conv-pair kernel — chirp
    pre-multiply on read, Nc stages, inter-pass twiddle, Ns stages,
    spectrum multiply in the swapped (ks, kc) layout, inline inverse,
    conjugate twiddle, crop + chirp post-multiply on write.  The whole
    m-point convolution costs ONE HBM read+write per direction of ~n-sized
    data (the reference's in-kernel Bluestein at every size,
    ``vkFFT_Bluestein.h:32,201``); the 3-kernel tier paid ~4 m-passes."""
    nc, ns = split_long(m)
    B = x.shape[0]
    live = in_keep if 0 < in_keep < n else n
    rows = -(-live // ns)
    # the INPUT window aligns to the Nc stage-1 chunk (mp1): a sub-chunk
    # window makes the kernel pad rows in-VMEM before the pruned stage, and
    # THAT kernel form Mosaic-compiles in ~216 s vs ~3-7 s chunk-aligned
    # (e49/e49b/e49c); the extra declared-zero rows cost only DMA (compute
    # prunes by chunk anyway).  The OUTPUT window is innocent — it stays at
    # sublane (8-row) granularity (e49c: compile 6.8 s, rt 9.46 vs 9.59 ms
    # symmetric at n=10007).
    _, mp1c = _v3_first_stage(nc)
    rows_buf = min(nc, -(-rows // mp1c) * mp1c)
    padded = rows_buf * ns
    out_rows = min(nc, -(-(-(-n // ns)) // 8) * 8)
    _, b_fft = luts.bluestein_chirp(n, m, inverse)
    if padded > n:
        y = _pad_tail_p(x, padded - n)
    elif padded < n:
        y = x[:, :padded]     # the sliced-off tail is declared zero
    else:
        y = x

    def planes(t):
        return (jnp.asarray(np.ascontiguousarray(np.real(t), np.float32)),
                jnp.asarray(np.ascontiguousarray(np.imag(t), np.float32)))

    ch_in = planes(luts.bluestein_chirp_rows(n, nc, ns, inverse))
    twf = planes(luts.fourstep_twiddle_full(nc, ns, False))
    twn = planes(luts.fourstep_twiddle_full(nc, ns, True))
    ch_out = planes(luts.bluestein_chirp_rows(n, nc, ns, inverse,
                                              scale=scale))
    # swapped-layout spectrum: position (ks, kc) holds b_fft[ks*nc + kc]
    # (the four-step output digit order — same convention as
    # `_conv_roundtrip_long_p`'s middle kernel)
    Ht = (b_fft * (1.0 / m)).reshape(ns, nc)     # (ns, nc) = (ks, kc)
    hr = jnp.asarray(np.ascontiguousarray(np.real(Ht), np.float32))[None]
    hi = jnp.asarray(np.ascontiguousarray(np.imag(Ht), np.float32))[None]
    run = _build_conv_pair_call(nc, ns, B, 1, _INTERPRET, str(x.dtype),
                                1.0, False, False,
                                in_keep=(rows_buf, 0),
                                out_keep=(out_rows, 0), blu=True)
    orr, oi = run(y.re.reshape(B, rows_buf, ns),
                  y.im.reshape(B, rows_buf, ns), hr, hi,
                  ch_in[0], ch_in[1], twf[0], twf[1],
                  twn[0], twn[1], ch_out[0], ch_out[1])
    return Planar(orr.reshape(B, out_rows * ns)[:, :n],
                  oi.reshape(B, out_rows * ns)[:, :n])


def _tiny_dft_p(x: Planar, n: int, inverse: bool, scale: float) -> Planar:
    """n <= 4 DFT as inline VPU elementwise ops on (B, n) planes — a kernel
    launch here would pad the 2-4 lane dim to a full 128-lane tile (64x
    waste; round 4: the SPLIT path's fb=2 pass measured 118 ms at 64MB
    through the kernel, ~4 ms inline).  XLA fuses these butterflies into
    the neighboring passes."""
    s = np.float32(scale)
    cols = [x[:, i:i + 1] for i in range(n)]
    if n == 2:
        a, b = cols
        out = [a + b, a - b]
    elif n == 3:
        a, b, c = cols
        w = np.exp((2j if inverse else -2j) * np.pi / 3)
        bc_s, bc_d = b + c, b - c
        t1 = a + bc_s * np.float32(w.real)
        # (b - c) * i*Im(w): planar multiply by a pure-imaginary constant
        ti = np.float32(w.imag)
        rot = Planar(-bc_d.im * ti, bc_d.re * ti)
        out = [a + bc_s, t1 + rot, t1 - rot]
    else:  # n == 4
        a, b, c, d = cols
        t0, t1 = a + c, a - c
        t2, t3 = b + d, b - d
        i3 = Planar(t3.im, -t3.re) if not inverse else Planar(-t3.im, t3.re)
        out = [t0 + t2, t1 + i3, t0 - t2, t1 - i3]
    rr = jnp.concatenate([o.re for o in out], axis=1)
    ii = jnp.concatenate([o.im for o in out], axis=1)
    return Planar(rr * s, ii * s) if scale != 1.0 else Planar(rr, ii)


def fft_lines_p(x: Planar, plan: AxisPlan, inverse: bool = False,
                donate: bool = False, scale: float = 1.0) -> Planar:
    """Planar DFT over (B, n) planes, Pallas-accelerated, scaled by
    ``scale`` (unnormalized at the default 1.0).  ``donate=True`` allows
    in-place operation on DIRECT plans when the caller's planes are dead
    after the call.  ``scale`` is folded into kernel stage tables (DIRECT/
    SPLIT) or the pre/post host tables (Bluestein/Rader) — in-kernel
    normalization with no output multiply pass (stageNormalization analog,
    ``vkFFT_RadixShuffle.h:49-65``)."""
    n = plan.n
    if n == 1:
        return x * np.asarray(scale, x.dtype) if scale != 1.0 else x
    if n <= 4:
        return _tiny_dft_p(x, n, inverse, scale)
    alg = plan.algorithm
    if alg is Algorithm.SPLIT:
        from vkfft_tpu.planner.plan import plan_axis as _plan_axis
        fa, fb = plan.decomp.split
        B = x.shape[0]
        tw = planar_table(luts.ct_twiddle(fa, fb, inverse), x.dtype)

        def swap(p, B_, d1, d2):
            return Planar(jnp.swapaxes(p.re.reshape(B_, d1, d2), 1, 2),
                          jnp.swapaxes(p.im.reshape(B_, d1, d2), 1, 2))

        y = swap(x, B, fa, fb).reshape(B * fb, fa)
        y = fft_lines_p(y, _plan_axis(fa), inverse).reshape(B, fb, fa)
        y = y * Planar(tw.re[None], tw.im[None])
        y = swap(y, B, fb, fa).reshape(B * fa, fb)
        # fold the caller's scale into the second-factor pass
        y = fft_lines_p(y, _plan_axis(fb), inverse,
                        scale=scale).reshape(B, fa, fb)
        return swap(y, B, fa, fb).reshape(B, n)
    if alg is Algorithm.DIRECT:
        return _core_fft_p(x, n, inverse, donate=donate, scale=scale)
    if alg is Algorithm.BLUESTEIN:
        m = plan.decomp.bluestein_size
        if _use_v3(m):
            # single fused kernel: chirp mults + pad + crop all in-kernel
            return bluestein_fused_v3(x, n, m, inverse, scale=scale)
        if _long_conv_ok(m):
            nc_, ns_ = split_long(m)
            if nc_ * ns_ <= _CONV_PAIR_MAX_PTS:
                # ONE-kernel tier (round 5): the (Nc, Ns) four-step plane
                # runs inside the conv-pair kernel — chirps, twiddles,
                # spectrum multiply and both transforms in a single HBM
                # round trip (10007: 9.2 ms vs 11.5 three-kernel vs 17.6
                # round-4, e47)
                return _bluestein_pair_p(x, n, m, inverse, scale=scale)
            # 3-kernel long tier with the chirp mults fused into the strided
            # kernels (round 5) — no m-sized XLA passes
            return _bluestein_long_fused_p(x, n, m, inverse, scale=scale)
        a_t, b_t = luts.bluestein_chirp(n, m, inverse)
        a = planar_table(a_t, x.dtype)
        y = _pad_tail_p(x * a[None, :], m - n)
        # 1/m (and the caller's scale) ride the host-side conv table and the
        # post-chirp table — no separate scalar-multiply HBM passes
        y = _conv_roundtrip_p(y, m, b_t * (1.0 / m))
        return y[:, :n] * planar_table(a_t * scale, x.dtype)[None, :] \
            if scale != 1.0 else y[:, :n] * a[None, :]
    if inverse:
        return fft_lines_p(x.conj(), plan, False, scale=scale).conj()
    p = plan.n
    perm, inv_perm, b_t = luts.rader_tables(p)
    x0 = x[:, :1]
    s = np.asarray(scale, x.dtype)
    # output as GATHER + concat, never scatter: XLA scatters with arbitrary
    # indices serialize on TPU (round 4: sample 7 measured the .at[].set
    # form pathologically slow) — out[:, inv_perm[k]] = val[:, k] is
    # out[:, 1:] = val[:, argsort(inv_perm)] since inv_perm hits every
    # position 1..p-1 exactly once
    order = np.argsort(inv_perm)
    m = p - 1
    if not _use_v3(m) and _use_v2(m):
        # fused DC handling (round 5, e46: the Rader glue — sum-reduce,
        # x0-add, spectrum-mult passes — cost more than the gathers):
        # X0 = x0 + F[0] rides the forward kernel's k=0 bin, and the x0
        # broadcast-add is fused into the conv-inverse kernel's store
        B = x.shape[0]
        n1, n2 = split_lane_major(m)
        xg = x[:, perm]
        fr, fi = core_fft_planar_v2(xg.re, xg.im, m, False, order="swapped",
                                    donate=True)
        sum_r, sum_i = fr[:, :1], fi[:, :1]   # swapped flat 0 == k=0 bin
        run, lane, _, _, _ = _build_conv_inv_call(m, B, _INTERPRET,
                                                  str(x.dtype), with_dc=True)
        tab_sw = np.ascontiguousarray(
            (b_t * (scale / m)).reshape(n1, n2).T)            # (n2, n1)
        if lane != n1:
            tab_sw = np.pad(tab_sw, ((0, 0), (0, lane - n1)))
        cr = jnp.asarray(np.real(tab_sw).astype(np.float32))
        ci = jnp.asarray(np.imag(tab_sw).astype(np.float32))
        fr = fr.reshape(B, n2, n1)
        fi = fi.reshape(B, n2, n1)
        if lane != n1:
            fr = jnp.pad(fr, ((0, 0), (0, 0), (0, lane - n1)))
            fi = jnp.pad(fi, ((0, 0), (0, 0), (0, lane - n1)))
        dcr = x0.re * s if scale != 1.0 else x0.re
        dci = x0.im * s if scale != 1.0 else x0.im
        vr, vi = run(fr, fi, cr, ci, dcr, dci)          # (B, m) = x0*s + c
        X0r = (x0.re + sum_r) * s if scale != 1.0 else x0.re + sum_r
        X0i = (x0.im + sum_i) * s if scale != 1.0 else x0.im + sum_i
        return Planar(jnp.concatenate([X0r, vr[:, order]], axis=1),
                      jnp.concatenate([X0i, vi[:, order]], axis=1))
    X0 = Planar(jnp.sum(x.re, axis=1, keepdims=True),
                jnp.sum(x.im, axis=1, keepdims=True))
    # 1/(p-1) and the caller's scale fold into the Rader kernel spectrum;
    # the DC terms (B, 1) are scaled individually (negligible traffic)
    c = _conv_roundtrip_p(x[:, perm], p - 1, b_t * (scale / (p - 1)))
    val = (x0 * s if scale != 1.0 else x0) + c
    X0s = X0 * s if scale != 1.0 else X0
    return Planar(jnp.concatenate([X0s.re, val.re[:, order]], axis=1),
                  jnp.concatenate([X0s.im, val.im[:, order]], axis=1))


def _mask_axis_tail(x: Planar, axis: int, h: int) -> Planar:
    """Zero rows >= h along ``axis`` (elision-contract fallback: declared
    zeros are treated as zeros even when a path cannot skip the reads)."""
    n_ = x.shape[axis]
    shp = [1] * x.ndim
    shp[axis] = n_
    m = (jnp.arange(n_) < h).reshape(shp)
    z = jnp.zeros((), x.re.dtype)
    return Planar(jnp.where(m, x.re, z), jnp.where(m, x.im, z))


def _slice_axis(x: Planar, axis: int, h: int) -> Planar:
    return Planar(jax.lax.slice_in_dim(x.re, 0, h, axis=axis),
                  jax.lax.slice_in_dim(x.im, 0, h, axis=axis))


def fft_axis_p(x: Planar, axis: int, plan: AxisPlan, inverse: bool = False,
               donate: bool = False, scale: float = 1.0, in_keep: int = 0,
               out_keep: int = 0) -> Planar:
    """Planar pallas DFT along ``axis``; jnp-engine fallback for unsupported
    core sizes.

    Non-minor axes of DIRECT plans run the strided kernel in place (lanes =
    trailing batch, reference strided-kernel analog) — no moveaxis/transpose
    passes.  ``donate=True`` allows in-place kernels when the caller's planes
    are dead (e.g. intermediates between N-D axis passes).  ``scale``:
    in-kernel normalization (see ``fft_lines_p``).

    ``in_keep``/``out_keep``: prefix zero-pad elision along the transform
    axis — the strided v3 path skips the tail reads/writes in-kernel
    (``vkFFT_Zeropad.h`` analog); other paths fall back to a mask / output
    slice with the same semantics.  With ``out_keep`` the returned axis has
    that length."""
    axis = axis % x.ndim
    if not supports(plan):
        from vkfft_tpu.ops import jnp_engine
        if in_keep:
            x = _mask_axis_tail(x, axis, in_keep)
        y = jnp_engine.fft_axis_p(x, axis, plan, inverse, scale=scale)
        return _slice_axis(y, axis, out_keep) if out_keep else y
    ndim = x.ndim
    if axis <= ndim - 3 and plan.algorithm is Algorithm.DIRECT:
        # outer-axis kernel (round 5): consumes the natural rank-4
        # (P, n, R, nz) layout directly — no XLA relayout either side,
        # unlike the (P, n, S) strided view whose minor-dim merge re-tiles
        # the whole array (fact 38: 0.21 ms/direction at 256^3).  Measured
        # 0.83 ms vs 1.04 (strided kernel alone) vs 1.46 (reshape+strided)
        # for the 256^3 x-axis round trip (e43b).
        shape = x.shape
        nz_ = shape[-1]
        r_dim = int(np.prod(shape[axis + 1:-1], dtype=np.int64))
        p_ = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
        if r_dim >= 8 and outer_available(plan.n, r_dim, nz_, str(x.dtype)):
            xr = x.re.reshape(p_, shape[axis], r_dim, nz_)
            xi = x.im.reshape(p_, shape[axis], r_dim, nz_)
            orr, oi = outer_fft_planar(xr, xi, plan.n, inverse,
                                       donate=donate, scale=scale,
                                       in_keep=in_keep, out_keep=out_keep)
            out_shape = shape[:axis] + (orr.shape[1],) + shape[axis + 1:]
            return Planar(orr.reshape(out_shape), oi.reshape(out_shape))
    if axis != ndim - 1 and plan.algorithm is Algorithm.DIRECT and _use_v2(plan.n):
        shape = x.shape
        p = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
        s = int(np.prod(shape[axis + 1:], dtype=np.int64))
        # s < 128 runs with the lane dim zero-padded to one full tile
        # (Mosaic miscompiles contractions below a full lane tile); below
        # s=16 the padding waste exceeds the two moveaxis passes of the
        # contiguous fallback.
        elide_ok = _use_v3(plan.n) or not (in_keep or out_keep)
        if s >= 16 and elide_ok:
            xr = x.re.reshape(p, shape[axis], s)
            xi = x.im.reshape(p, shape[axis], s)
            orr, oi = strided_fft_planar(xr, xi, plan.n, inverse,
                                         donate=donate, scale=scale,
                                         in_keep=in_keep, out_keep=out_keep)
            out_shape = shape[:axis] + (orr.shape[1],) + shape[axis + 1:]
            return Planar(orr.reshape(out_shape), oi.reshape(out_shape))
    if (axis == ndim - 1 and (in_keep or out_keep)
            and plan.algorithm is Algorithm.DIRECT and _use_v3(plan.n)
            and x.shape[-1] == plan.n):
        # minor-axis prefix elision inside an N-D walk (round 5): the v3
        # kernel skips the declared-zero tail reads / discarded-tail writes
        # — the same elision the 1-D api route uses, now reachable per-axis
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        rr, ii = core_fft_planar_v3(flat.re, flat.im, plan.n, inverse,
                                    donate=donate, in_nonzero=in_keep,
                                    out_keep=out_keep, scale=scale)
        return Planar(rr, ii).reshape(*lead, rr.shape[-1])
    if in_keep:
        x = _mask_axis_tail(x, axis, in_keep)
    moved = axis != ndim - 1
    if moved:
        x = Planar(jnp.moveaxis(x.re, axis, -1), jnp.moveaxis(x.im, axis, -1))
    shape = x.shape
    y = fft_lines_p(x.reshape(-1, plan.n), plan, inverse,
                    donate=donate, scale=scale).reshape(*shape)
    if moved:
        y = Planar(jnp.moveaxis(y.re, -1, axis), jnp.moveaxis(y.im, -1, axis))
    return _slice_axis(y, axis, out_keep) if out_keep else y


# ---------------------------------------------------------------------------
# Kernel v2: lane-major four-step, transpose-free.
#
# Layout: a line n = n2*N1 + n1 is viewed as an (N2, N1) matrix — N1 in
# lanes (<=128), N2 in sublanes.  With output digit order k = k1*N2 + k2:
#
#   X[k1*N2 + k2] = sum_{n1} w_N1^{n1 k1} w_N^{n1 k2}
#                     [ sum_{n2} w_N2^{n2 k2} x[n2*N1 + n1] ]
#
# forward:  sublane matmul (contract n2) -> twiddle(k2, n1) -> lane matmul
#           (contract n1); output stored [k2, k1] ("swapped" digit order).
# inverse:  the mirror image — lane matmul (contract k1) -> conj twiddle ->
#           sublane matmul (contract k2); consumes swapped order, emits
#           natural order.
#
# No transposes anywhere; a forward+inverse pair (or a convolution with a
# swapped-order kernel table) is entirely reorder-free — the TPU realization
# of the reference's disableReorderFourStep contract (vkFFT_Structs.h:221).
# Natural-order standalone results add one XLA transpose pass.
#
# Complex packing: re/im stacked along the contracted dim.  Sublane side uses
# R = [[Dr, -Di], [Di, Dr]] acting on [re; im] rows; lane side uses
# M = [[Dr, Di], [-Di, Dr]] acting on [re | im] columns.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1024)
def split_lane_major(n: int) -> Optional[tuple[int, int]]:
    """(n1, n2): n1 = largest divisor of n <= 128 (lane dim), n2 = n//n1
    (sublane dim), requiring n2 <= 128."""
    best = None
    for n1 in range(min(n, MAX_FACTOR), 0, -1):
        if n % n1 == 0:
            best = (n1, n // n1)
            break
    if best is None or best[1] > MAX_FACTOR:
        return None
    return best


def _pack_lane_matrix(C: np.ndarray) -> np.ndarray:
    """[[Cr, Ci], [-Ci, Cr]] for right-multiplication of [re | im] columns."""
    Cr, Ci = np.real(C), np.imag(C)
    return np.block([[Cr, Ci], [-Ci, Cr]]).astype(np.float32)


@functools.lru_cache(maxsize=512)
def _v2_tables(n: int, inverse: bool, scale: float = 1.0):
    n1, n2 = split_lane_major(n)
    sign = 2.0j if inverse else -2.0j
    D1 = luts.dft_matrix(n1, inverse)            # lane side (n1 x n1)
    D2 = luts.dft_matrix(n2, inverse)            # sublane side (n2 x n2)
    k2 = np.arange(n2)[:, None]
    nn1 = np.arange(n1)[None, :]
    tw = np.exp(sign * np.pi / n * ((k2 * nn1) % n))   # (n2, n1): w_N^(n1*k2)
    if scale != 1.0:
        # in-kernel normalization folded into the always-applied inter-digit
        # twiddle (stageNormalization analog, vkFFT_RadixShuffle.h:49-65)
        tw = tw * scale
    return (
        _pack_complex_matrix(D2),     # (2n2, 2n2) sublane matmul
        _pack_lane_matrix(D1),        # (2n1, 2n1) lane matmul
        np.real(tw).astype(np.float32),
        np.imag(tw).astype(np.float32),
    )


def _fft_kernel_v2(n1, n2, tb, inverse, out_dtype, prec, i8,
                   xr_ref, xi_ref, *refs):
    """Batched formulation: one dot_general per step for the whole block
    (measured 2.7x faster than a per-line unrolled loop on v5e — Mosaic
    vectorizes batched contractions across the line dimension).

    Zero-pad elision rides the block shapes: a forward input block may carry
    only the nonzero sublane rows (rsub arrives column-cropped to match), and
    an inverse output block only the kept rows (rsub row-cropped) — the MXU
    rendition of the reference's read/write skipping (``vkFFT_Zeropad.h``),
    saving both HBM traffic and MACs.

    ``i8`` = None (one matrix operand per step, precision ``prec``) or
    ``(s_rsub, s_mlane)`` host scales (three int8 digit operands per step
    — the 6-pass int8 emulation, see `_int8_dot_lhsm`)."""
    if i8 is None:
        rsub_op, mlane_op = refs[0], refs[1]
        twr_ref, twi_ref, or_ref, oi_ref = refs[2:]
    else:
        rsub_op, mlane_op = refs[0:3], refs[3:6]
        twr_ref, twi_ref, or_ref, oi_ref = refs[6:]
    dims_sub = (((1,), (1,)), ((), ()))
    dims_lane = (((2,), (0,)), ((), ()))

    def dot_sub(z):
        if i8 is None:
            return jax.lax.dot_general(rsub_op[:], z, dims_sub,
                                       preferred_element_type=jnp.float32,
                                       precision=prec)
        return _int8_dot_lhsm(tuple(r[:] for r in rsub_op), i8[0], z,
                              dims_sub)

    def dot_lane(z2):
        if i8 is None:
            return jax.lax.dot_general(z2, mlane_op[:], dims_lane,
                                       preferred_element_type=jnp.float32,
                                       precision=prec)
        return _int8_dot_rhsm(z2, tuple(m[:] for m in mlane_op), i8[1],
                              dims_lane)

    twr = twr_ref[:]
    twi = twi_ref[:]
    xr = xr_ref[:].astype(jnp.float32)                   # (TB, R2<=N2, N1)
    xi = xi_ref[:].astype(jnp.float32)
    if not inverse:
        if xr.shape[1] > 1 or n2 > 1:
            z = jnp.concatenate([xr, xi], axis=1)        # (TB, 2R2, N1)
            y = dot_sub(z)                               # (2N2, TB, N1)
            ar, ai = y[:n2], y[n2:]
        else:
            ar = jnp.swapaxes(xr, 0, 1)                  # (1, TB, N1)
            ai = jnp.swapaxes(xi, 0, 1)
        tw_r = twr[:, None, :]
        tw_i = twi[:, None, :]
        tr = ar * tw_r - ai * tw_i                       # (N2, TB, N1)
        ti = ar * tw_i + ai * tw_r
        if n1 > 1:
            z2 = jnp.concatenate([tr, ti], axis=2)       # (N2, TB, 2N1)
            y2 = dot_lane(z2)                            # (N2, TB, 2N1)
            outr, outi = y2[..., :n1], y2[..., n1:]
        else:
            outr, outi = tr, ti
        or_ref[:] = jnp.swapaxes(outr, 0, 1).astype(out_dtype)   # (TB, N2, N1)
        oi_ref[:] = jnp.swapaxes(outi, 0, 1).astype(out_dtype)
    else:
        if n1 > 1:
            z2 = jnp.concatenate([xr, xi], axis=2)       # (TB, N2, 2N1)
            y2 = dot_lane(z2)                            # (TB, N2, 2N1)
            ar, ai = y2[..., :n1], y2[..., n1:]
        else:
            ar, ai = xr, xi
        tw_r = twr[None, :, :]
        tw_i = twi[None, :, :]
        tr = ar * tw_r - ai * tw_i                       # (TB, N2, N1)
        ti = ar * tw_i + ai * tw_r
        keep = or_ref.shape[1]                           # kept output rows
        if n2 > 1:
            z = jnp.concatenate([tr, ti], axis=1)        # (TB, 2N2, N1)
            y = dot_sub(z)                               # (2*keep, TB, N1)
            outr = jnp.swapaxes(y[:keep], 0, 1)
            outi = jnp.swapaxes(y[keep:], 0, 1)
        else:
            outr, outi = tr, ti
        or_ref[:] = outr.astype(out_dtype)
        oi_ref[:] = outi.astype(out_dtype)


def _v2_lines_per_block(n: int) -> int:
    # ~512KB of planar data per block (TB sweep on v5e: 64 lines at n=1024
    # beat 128/256; >=256-line blocks can exceed VMEM and crash the remote
    # compiler)
    bytes_per_line = 2 * n * 4
    return int(min(128, max(1, (512 * 1024) // bytes_per_line)))


@functools.lru_cache(maxsize=512)
def _build_fft_call_v2(n: int, inverse: bool, batch: int, interpret: bool,
                       dtype_name: str = "float32", donate: bool = False,
                       in_rows: int = 0, out_rows: int = 0,
                       scale: float = 1.0):
    """``donate=True`` aliases the input planes to the output buffers
    (in-place transform) — measured +32% bandwidth on v5e.  Only safe when
    the caller's operands are dead after the call (internal pipeline
    intermediates); XLA would otherwise insert defensive copies.

    Zero-pad elision (``vkFFT_Zeropad.h`` analog): ``in_rows`` (forward)
    reads only the first in_rows of the n2 input sublane rows — the tail
    j >= in_rows*n1 is never DMA'd and the sublane DFT matrix is
    column-cropped, cutting both bandwidth and MACs.  ``out_rows``
    (inverse) writes only the first out_rows output rows (row-cropped
    matrix) for discarded-tail outputs.  0 = full."""
    dtype = jnp.dtype(dtype_name)
    n1, n2 = split_lane_major(n)
    rsub, mlane, twr, twi = _v2_tables(n, inverse, scale)
    in_rows = in_rows or n2
    out_rows = out_rows or n2
    if not inverse and in_rows < n2:
        # crop contraction columns to the nonzero input rows
        rsub = np.concatenate([rsub[:, :in_rows],
                               rsub[:, n2:n2 + in_rows]], axis=1)
    if inverse and out_rows < n2:
        # crop output rows to the kept window
        rsub = np.concatenate([rsub[:out_rows],
                               rsub[n2:n2 + out_rows]], axis=0)
    tb = _v2_lines_per_block(n)
    pad = (-batch) % tb
    padded = batch + pad

    # Mosaic miscompiles batched (>=3D) dot_generals whose lane dimension is
    # under one full 128-lane tile (verified on v5e: internal compiler crash
    # for n1 in 8..127).  Pad the lane digit to 128: zero lanes flow through
    # the sublane matmul, the lane matmul uses a block-embedded (2*128)^2
    # matrix, and the caller slices the valid lanes back out.
    lane = 128 if (n1 < 128 and not interpret) else n1
    if lane != n1:
        m_pad = np.zeros((2 * lane, 2 * lane), dtype=np.float32)
        m_pad[:n1, :n1] = mlane[:n1, :n1]
        m_pad[:n1, lane:lane + n1] = mlane[:n1, n1:]
        m_pad[lane:lane + n1, :n1] = mlane[n1:, :n1]
        m_pad[lane:lane + n1, lane:lane + n1] = mlane[n1:, n1:]
        mlane = m_pad
        twr = np.pad(twr, ((0, 0), (0, lane - n1)))
        twi = np.pad(twi, ((0, 0), (0, lane - n1)))

    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    if _V3_MXU_INT8 and dtype == jnp.float32:
        # 6-pass int8 emulation: digit-decompose both (cropped/padded)
        # constant matrices host-side; data quantizes in-kernel
        s_r = float(np.max(np.abs(rsub))) or 1.0
        s_m = float(np.max(np.abs(mlane))) or 1.0
        i8 = (s_r, s_m)
        mat_tables = [*_int8_digits(rsub, s_r), *_int8_digits(mlane, s_m)]
    else:
        i8 = None
        mat_tables = [rsub, mlane]
    kernel = functools.partial(_fft_kernel_v2, lane, n2, tb, inverse, dtype,
                               prec, i8)
    spec_in = pl.BlockSpec((tb, in_rows, lane), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((tb, out_rows, lane), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    passes = _mxu_passes(prec)
    kw = {
        "cost_estimate": pl.CostEstimate(
            flops=2 * padded * (in_rows * n1) * (n2 + lane) * 8 * passes,
            transcendentals=0,
            bytes_accessed=dtype.itemsize * 2 * padded
            * (in_rows + out_rows) * lane),
    }
    if donate and not interpret and in_rows == n2 and out_rows == n2:
        kw["input_output_aliases"] = {0: 0, 1: 1}
    call = pl.pallas_call(
        kernel,
        grid=(padded // tb,),
        in_specs=[spec_in, spec_in] + [const(t.shape) for t in mat_tables]
        + [const(twr.shape), const(twi.shape)],
        out_specs=[spec_out, spec_out],
        out_shape=[jax.ShapeDtypeStruct((padded, out_rows, lane), dtype),
                   jax.ShapeDtypeStruct((padded, out_rows, lane), dtype)],
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        **kw,
    )

    def run(xr, xi):
        xr = xr.reshape(batch, n2, n1)
        xi = xi.reshape(batch, n2, n1)
        pads = ((0, pad), (0, 0), (0, lane - n1))
        if pad or lane != n1:
            xr = jnp.pad(xr, pads)
            xi = jnp.pad(xi, pads)
        orr, oi = call(xr, xi, *(jnp.asarray(t) for t in mat_tables),
                       jnp.asarray(twr), jnp.asarray(twi))
        if lane != n1:
            orr = orr[..., :n1]
            oi = oi[..., :n1]
        nk = out_rows * n1
        return (orr[:batch].reshape(batch, nk), oi[:batch].reshape(batch, nk))

    return run


def _v2_supported(n: int) -> bool:
    s = split_lane_major(n)
    return s is not None and n >= 2


def _swap_digits(x: jax.Array, rows: int, cols: int) -> jax.Array:
    """View flat (B, rows*cols) as [row][col] and emit [col][row] — the
    digit-order reorder between natural and swapped layouts (one XLA
    transpose pass)."""
    B = x.shape[0]
    return x.reshape(B, rows, cols).swapaxes(1, 2).reshape(B, rows * cols)


def zeropad_rows(n: int, nonzero: int) -> int:
    """Sublane rows covering a nonzero prefix [0, nonzero) of an n-length
    line in the v2 layout, or 0 when the prefix is not row-aligned (callers
    then fall back to masking).  Alignment: nonzero % n1 == 0."""
    sp = split_lane_major(n)
    if sp is None or nonzero <= 0 or nonzero >= n:
        return 0
    n1, n2 = sp
    if nonzero % n1:
        return 0
    return nonzero // n1


def core_fft_planar_v2(xr, xi, n: int, inverse: bool, order: str = "natural",
                       donate: bool = False, in_nonzero: int = 0,
                       out_keep: int = 0, scale: float = 1.0):
    """v2 core.  Forward: natural in; 'swapped' order skips the output
    reorder.  Inverse: natural out; 'swapped' means the *input* is in swapped
    order (as produced by a swapped forward).  ``donate`` transforms
    in place (caller's planes must be dead).

    Zero-pad elision (``vkFFT_Zeropad.h``): ``in_nonzero`` (forward) skips
    reading the declared-zero tail [in_nonzero, n); ``out_keep`` (inverse)
    writes only [0, out_keep) and returns planes of that length.  Both must
    be n1-row aligned (see ``zeropad_rows``)."""
    n1, n2 = split_lane_major(n)
    in_rows = zeropad_rows(n, in_nonzero) if (in_nonzero and not inverse) else 0
    out_rows = zeropad_rows(n, out_keep) if (out_keep and inverse) else 0
    run = _build_fft_call_v2(n, inverse, xr.shape[0], _INTERPRET, str(xr.dtype),
                             donate, in_rows, out_rows, scale)
    if not inverse:
        orr, oi = run(xr, xi)
        if order == "natural":
            # stored [k2][k1] -> natural flat k1*N2 + k2
            orr = _swap_digits(orr, n2, n1)
            oi = _swap_digits(oi, n2, n1)
        return orr, oi
    if order == "natural":
        # natural flat [k1][k2] -> swapped [k2][k1] expected by the kernel
        xr = _swap_digits(xr, n1, n2)
        xi = _swap_digits(xi, n1, n2)
    return run(xr, xi)


# ---------------------------------------------------------------------------
# Kernel v3: batch-in-lanes multi-stage Stockham, natural-order native.
#
# Layout: 128 lines ride the lane dimension (S = 128) and the whole length-n
# sequence sits in sublane/outer dims — the transpose-free dual of v2's
# lane-major layout.  The transform is a classic self-sorting Stockham
# pipeline: leading radix-4/2 stages run as VPU butterflies (adds + twiddle
# cmuls — a small radix padded into the 128-deep systolic array would waste
# >90% of MXU cycles), and the remaining factors run as dense DFT-matrix
# contractions on the MXU (any factor <= 64; the packed complex matrix is
# 2r <= 128 = one full contraction tile).  Output lands in natural frequency
# order with no reorder pass, unlike v2 whose natural order costs an XLA
# transpose round trip over HBM.
#
# Measured on v5e (experiments/e5_vpu_stages.py): 348 GB/s at n=1024
# (366 donated) vs 287 for the all-MXU stock variant and 215 for v2+reorder,
# at full fp32 accuracy (HIGHEST, err 1.7e-7).
#
# Reference analogs: radix stage driver ``vkFFT_RadixStage.h`` (the VPU
# butterflies mirror ``inlineRadixKernelVkFFT`` radix-2/4,
# ``vkFFT_RadixKernels.h:30``), Stockham shuffle ``vkFFT_RadixShuffle.h``
# (here: free — the stage reshape IS the shuffle).
# ---------------------------------------------------------------------------

_V3_MAX_N = 8192  # single-kernel ceiling: (1, il*128, n) f32 blocks up to
                  # ~4MB compile once the Mosaic VMEM limit is raised via
                  # CompilerParams (E12/E13 — the earlier "n=4096 crash"
                  # was the default VMEM budget, not a layout hazard)
_V3_SB = 128      # lines per block = one full lane tile
_V3_IL_OVERRIDE = None  # experiments only: force the interleave depth
_STRIDED_ILP_OVERRIDE = None  # experiments/tests: force strided il_p
_V3_MXU_SPLIT3 = False  # experiments only: 3-pass bf16 MXU emulation
# 6-pass int8 MXU emulation for the fp32 tier (see set_mxu_int8); the env
# var lets the test suite / driver sweep the whole surface in either mode.
_V3_MXU_INT8 = os.environ.get("VKFFT_TPU_INT8_MXU", "0") == "1"

# int8 emulated-f32 matmul: operands decompose into three int8 digits with
# these scales (7+8+8 = 23 bits); the six digit products with combined order
# < 3 recombine in f32 to ~2e-7 relative error (validated in
# experiments/e18_int8_mxu.py).  v5e MXU runs int8 at 2x the bf16 rate, so
# 6 int8 passes cost half of HIGHEST's 6 bf16 passes at equal accuracy.
_INT8_SCALES = (127.0, 127.0 * 254.0, 127.0 * 254.0 * 254.0)


def _int8_digits(X: np.ndarray, scale: float) -> tuple[np.ndarray, ...]:
    """Three int8 digit planes of ``X / scale`` (|X| <= scale)."""
    r = (X / scale).astype(np.float64)
    out = []
    for sc in _INT8_SCALES:
        d = np.clip(np.round(r * sc), -127, 127)
        out.append(d.astype(np.int8))
        r = r - d / sc
    return tuple(out)


def _mxu_const_arrays(Dp) -> list:
    """Kernel operand arrays for one MXU stage matrix: the f32 matrix, or
    the three int8 digit planes when the stage is digit-decomposed."""
    return list(Dp[:3]) if isinstance(Dp, tuple) else [Dp]


def _int8_quantize(z):
    """In-kernel digit decomposition of f32 data: three int8 planes plus
    the dynamic block scale."""
    s = jnp.maximum(jnp.max(jnp.abs(z)), 1e-30)
    rn = z * (1.0 / s)
    zq = []
    for sc in _INT8_SCALES:
        q = jnp.clip(jnp.round(rn * sc), -127.0, 127.0)
        zq.append(q.astype(jnp.int8))
        rn = rn - q * np.float32(1.0 / sc)
    return zq, s


def _int8_recombine(o0, o1, o2, sD, s):
    c0 = np.float32(sD / (127.0 * 127.0))
    return (o0.astype(jnp.float32) * c0
            + o1.astype(jnp.float32) * (c0 / np.float32(254.0))
            + o2.astype(jnp.float32) * (c0 / np.float32(254.0 * 254.0))) * s


def _int8_dot_lhsm(ds, sD, z, dims):
    """Emulated-f32 contraction with the constant matrix on the LHS:
    ``ds`` = three int8 digit planes of the matrix (host scale ``sD``),
    ``z`` = f32 data quantized in-kernel.  Six int8 MXU passes (2x bf16
    rate) ~= 3 bf16 passes at fp32-class accuracy (~2.6e-7)."""
    zq, s = _int8_quantize(z)
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            preferred_element_type=jnp.int32)
    o0 = dot(ds[0], zq[0])
    o1 = dot(ds[0], zq[1]) + dot(ds[1], zq[0])
    o2 = dot(ds[0], zq[2]) + dot(ds[1], zq[1]) + dot(ds[2], zq[0])
    return _int8_recombine(o0, o1, o2, sD, s)


def _int8_dot_rhsm(z, ds, sD, dims):
    """As `_int8_dot_lhsm` with the constant matrix on the RHS."""
    zq, s = _int8_quantize(z)
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            preferred_element_type=jnp.int32)
    o0 = dot(zq[0], ds[0])
    o1 = dot(zq[1], ds[0]) + dot(zq[0], ds[1])
    o2 = dot(zq[2], ds[0]) + dot(zq[1], ds[1]) + dot(zq[0], ds[2])
    return _int8_recombine(o0, o1, o2, sD, s)
_VMEM_LIMIT = 100 * 1024 * 1024  # raised Mosaic VMEM budget for big blocks


def _vmem_params(ndims: int = 1):
    """Raised VMEM budget + parallel dimension semantics: every kernel's
    grid steps write disjoint blocks, so declaring them "parallel" lets
    Mosaic pipeline across steps (round 3, e27)."""
    return pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT,
        dimension_semantics=("parallel",) * ndims)


@functools.lru_cache(maxsize=1024)
def _v3_plan(n: int) -> Optional[tuple[tuple[int, ...], tuple[int, ...]]]:
    """(vpu_radices, mxu_radices) or None.  VPU takes leading 4/2 factors
    while the remaining length keeps sublane slices >= 64 rows aligned;
    MXU stages take any factor <= 64, greedily largest-first."""
    if n < 2 or n > _V3_MAX_N:
        return None
    vpu, m = [], n
    while m % 4 == 0 and m // 4 >= 64:
        vpu.append(4)
        m //= 4
    if m % 2 == 0 and m // 2 >= 64:
        vpu.append(2)
        m //= 2
    mxu = []
    while m > 1:
        r = next((r for r in range(min(64, m), 1, -1) if m % r == 0), None)
        if r is None:
            return None  # prime factor > 64
        mxu.append(r)
        m //= r
    return tuple(vpu), tuple(mxu)


def _use_v3(n: int) -> bool:
    return _v3_plan(n) is not None


@functools.lru_cache(maxsize=1024)
def _v3_wide_plan(n: int) -> Optional[tuple[tuple[int, ...],
                                            tuple[int, ...]]]:
    """Greedy MXU plan with radices up to 127 (packed tables up to
    (254, 254) — 2x2 MXU tile groups at ~85-99%% K utilization).  Round 5:
    lets the single-kernel fused conv run sizes like the Rader p-1 = 7918
    = 107*74 whose factors exceed the standard 64-cap (the v2 two-factor
    fallback paid 4 kernels + XLA glue, e46)."""
    if n < 2 or n > _V3_MAX_N:
        return None
    if _use_v3(n):
        return _v3_plan(n)
    mxu, m = [], n
    while m > 1:
        r = next((r for r in range(min(127, m), 1, -1) if m % r == 0), None)
        if r is None:
            return None
        mxu.append(r)
        m //= r
    return (), tuple(mxu)


def _v3_tables(n: int, inverse: bool, plan=None, scale: float = 1.0,
               int8=None, in_rows: int = 0):
    """See `_v3_tables_impl`; resolves the int8-MXU flag before caching."""
    if int8 is None:
        int8 = _V3_MXU_INT8
    if int8:
        in_rows = 0   # stage pruning not wired through the digit tables
    return _v3_tables_impl(n, inverse, plan, scale, int8, in_rows)


def _v3_first_stage(n: int, plan=None) -> tuple[int, int]:
    """(r1, Mp1) of the overall first stage of the v3 pipeline for n."""
    vpu_r, mxu_r = plan if plan is not None else _v3_plan(n)
    r1 = vpu_r[0] if vpu_r else mxu_r[0]
    return r1, n // r1


def _v3_prune_q(n: int, in_rows: int, plan=None) -> int:
    """Nonzero stage-1 chunks for a declared-zero tail [in_rows, n): the
    input rows live in r1 contiguous Mp1-chunks, so only the first
    ceil(in_rows/Mp1) participate in the first butterfly/contraction — the
    TPU realization of the reference's zero-pad COMPUTE guards
    (``vkFFT_Zeropad.h:133-182`` wraps the read so downstream stages see a
    shorter sequence; README.md:14 'up to 2x').  Returns r1 (= no pruning)
    when the tail doesn't clear a whole chunk."""
    r1, mp1 = _v3_first_stage(n, plan)
    if not in_rows or in_rows >= n:
        return r1
    return min(r1, -(-in_rows // mp1))


@functools.lru_cache(maxsize=512)
def _v3_tables_impl(n: int, inverse: bool, plan=None, scale: float = 1.0,
                    int8: bool = False, in_rows: int = 0):
    """Per-stage constants.  Stage walk: L = lines done, M = remaining; a
    stage reshapes the state to (L, r, M/r) [flat, batch lanes trailing],
    butterflies/contracts r, twiddles by w_M^(k_r * m), and flattens with the
    new digit in FRONT: (r, L, M/r) — the self-sorting Stockham order.

    ``scale`` is folded into the first stage's table host-side — in-kernel
    normalization at zero runtime cost, the reference's stageNormalization
    (``vkFFT_RadixShuffle.h:49-65``) done as constant folding.

    ``in_rows``: declared-zero tail [in_rows, n) — when the FIRST stage is
    an MXU contraction, its packed matrix is pruned to the q nonzero input
    chunks (K shrinks from 2*r to 2*q: proportionally fewer MXU passes, the
    zero-pad compute guard of ``vkFFT_Zeropad.h``).  VPU first stages prune
    in the kernel body instead (`_v3_apply_stages`)."""
    vpu_r, mxu_r = plan if plan is not None else _v3_plan(n)
    sign = 2.0j if inverse else -2.0j
    vpu_tabs, mxu_tabs = [], []
    L, M = 1, n
    for r in vpu_r:
        Mp = M // r
        tw = np.exp(sign * np.pi / M * np.outer(np.arange(r), np.arange(Mp)))
        if scale != 1.0 and L == 1:
            tw = tw * scale
        vpu_tabs.append((np.real(tw).astype(np.float32),
                         np.imag(tw).astype(np.float32), r, L, Mp))
        L, M = L * r, Mp
    for r in mxu_r:
        Mp = M // r
        D = luts.dft_matrix(r, inverse)
        if scale != 1.0 and L == 1:
            D = D * scale
        Dp = np.ascontiguousarray(_pack_complex_matrix(D).T)
        if L == 1 and in_rows:
            # MXU-first stage-1 pruning: keep table rows of the q nonzero
            # input chunks ([re 0..q) | im r..r+q) in the packed layout)
            q = _v3_prune_q(n, in_rows, plan)
            if q < r:
                Dp = np.ascontiguousarray(
                    Dp[np.r_[0:q, r:r + q], :])
        if int8:
            # digit-decomposed constant matrix for the 6-pass int8 path;
            # sD rides in the tuple and is folded into the recombine
            # weights inside the kernel (host-side floats)
            sD = float(np.max(np.abs(Dp))) or 1.0
            Dp = (*_int8_digits(Dp, sD), sD)
        if Mp > 1:
            tw = np.exp(sign * np.pi / M
                        * np.outer(np.arange(r), np.arange(Mp)))
            twr = np.real(tw).astype(np.float32)
            twi = np.imag(tw).astype(np.float32)
        else:
            twr = twi = None
        mxu_tabs.append((Dp, twr, twi, r, L, Mp))
        L, M = L * r, Mp
    return vpu_tabs, mxu_tabs


def _pruned_butterfly(zr, zi, r, q, inverse):
    """Stage-1 butterfly on q < r nonzero input chunks (the declared-zero
    tail never materializes): the r digit outputs computed directly from the
    live chunks — fewer VPU adds AND no (n, S) zero-fill copy.  Matches the
    dense r=4/2 networks below with z[q:] = 0."""
    z = lambda p, j: p[:, j]
    if r == 2:          # q == 1: X = [z0, z0]
        ar = jnp.stack([z(zr, 0), z(zr, 0)], axis=0)
        ai = jnp.stack([z(zi, 0), z(zi, 0)], axis=0)
        return ar, ai
    if q == 1:          # r == 4: all four digits equal z0
        ar = jnp.stack([z(zr, 0)] * 4, axis=0)
        ai = jnp.stack([z(zi, 0)] * 4, axis=0)
        return ar, ai
    if q == 2:          # t0 = t1 = z0, t2 = t3 = z1
        s_r, s_i = z(zr, 0) + z(zr, 1), z(zi, 0) + z(zi, 1)
        d_r, d_i = z(zr, 0) - z(zr, 1), z(zi, 0) - z(zi, 1)
        if inverse:
            y1r, y1i = z(zr, 0) - z(zi, 1), z(zi, 0) + z(zr, 1)
            y3r, y3i = z(zr, 0) + z(zi, 1), z(zi, 0) - z(zr, 1)
        else:
            y1r, y1i = z(zr, 0) + z(zi, 1), z(zi, 0) - z(zr, 1)
            y3r, y3i = z(zr, 0) - z(zi, 1), z(zi, 0) + z(zr, 1)
        ar = jnp.stack([s_r, y1r, d_r, y3r], axis=0)
        ai = jnp.stack([s_i, y1i, d_i, y3i], axis=0)
        return ar, ai
    # q == 3: t0 = z0 + z2, t1 = z0 - z2, t2 = t3 = z1
    t0r, t0i = z(zr, 0) + z(zr, 2), z(zi, 0) + z(zi, 2)
    t1r, t1i = z(zr, 0) - z(zr, 2), z(zi, 0) - z(zi, 2)
    if inverse:
        y1r, y1i = t1r - z(zi, 1), t1i + z(zr, 1)
        y3r, y3i = t1r + z(zi, 1), t1i - z(zr, 1)
    else:
        y1r, y1i = t1r + z(zi, 1), t1i - z(zr, 1)
        y3r, y3i = t1r - z(zi, 1), t1i + z(zr, 1)
    ar = jnp.stack([t0r + z(zr, 1), y1r, t0r - z(zr, 1), y3r], axis=0)
    ai = jnp.stack([t0i + z(zi, 1), y1i, t0i - z(zi, 1), y3i], axis=0)
    return ar, ai


def _v3_apply_stages(xr, xi, S, table_refs, vpu_tabs, mxu_tabs, prec,
                     inverse, in_rows: int = 0):
    """Run the staged Stockham pipeline on (n, S) planes inside a kernel.
    ``table_refs`` order matches ``_v3_operand_tables``.

    ``in_rows``: the state carries only the first ceil(in_rows/Mp1) stage-1
    chunks (declared-zero tail) — the first stage prunes its butterfly /
    contraction and EXPANDS to the dense width; later stages are unchanged
    (reference zero-pad compute guards, ``vkFFT_Zeropad.h:133-182``)."""
    ti = 0
    first = True
    for (_, _, r, L0, Mp) in vpu_tabs:
        twr = table_refs[ti][:][:, None, :, None]            # (r, 1, Mp, 1)
        twi = table_refs[ti + 1][:][:, None, :, None]
        ti += 2
        q = r
        if first and in_rows:
            q = min(r, -(-in_rows // Mp))
        first = False
        if q < r:
            zr = xr.reshape(L0, q, Mp, S)
            zi = xi.reshape(L0, q, Mp, S)
            ar, ai = _pruned_butterfly(zr, zi, r, q, inverse)
            xr = (ar * twr - ai * twi).reshape(-1, S)
            xi = (ar * twi + ai * twr).reshape(-1, S)
            continue
        zr = xr.reshape(L0, r, Mp, S)
        zi = xi.reshape(L0, r, Mp, S)
        if r == 4:
            t0r, t0i = zr[:, 0] + zr[:, 2], zi[:, 0] + zi[:, 2]
            t1r, t1i = zr[:, 0] - zr[:, 2], zi[:, 0] - zi[:, 2]
            t2r, t2i = zr[:, 1] + zr[:, 3], zi[:, 1] + zi[:, 3]
            t3r, t3i = zr[:, 1] - zr[:, 3], zi[:, 1] - zi[:, 3]
            if inverse:
                y1r, y1i = t1r - t3i, t1i + t3r
                y3r, y3i = t1r + t3i, t1i - t3r
            else:
                y1r, y1i = t1r + t3i, t1i - t3r
                y3r, y3i = t1r - t3i, t1i + t3r
            # new digit in FRONT of the flattened order (r, L0, Mp)
            ar = jnp.stack([t0r + t2r, y1r, t0r - t2r, y3r], axis=0)
            ai = jnp.stack([t0i + t2i, y1i, t0i - t2i, y3i], axis=0)
        else:  # r == 2
            ar = jnp.stack([zr[:, 0] + zr[:, 1], zr[:, 0] - zr[:, 1]], axis=0)
            ai = jnp.stack([zi[:, 0] + zi[:, 1], zi[:, 0] - zi[:, 1]], axis=0)
        xr = (ar * twr - ai * twi).reshape(-1, S)
        xi = (ar * twi + ai * twr).reshape(-1, S)
    for (Dp_t, twr_t, twi_t, r, L0, Mp) in mxu_tabs:
        rq = r
        if first and in_rows:
            # stage-1 pruned contraction: K = 2q rows of the pruned packed
            # table (built by `_v3_tables(in_rows=...)`) against the q live
            # input chunks — proportionally fewer MXU passes
            rq = min(r, -(-in_rows // Mp))
        first = False
        # Merge (Mp, S) into one trailing dim for the contraction: Mosaic
        # lowers the non-leading contraction as a transpose, and a 4-D
        # transpose whose second-minor dim is a small Mp (e.g. 5) fails
        # hardware compile ("Layout with implicit dimension"); the merged
        # 3-D form (L0, 2r, Mp*S) compiles for every factorization.
        z = jnp.concatenate([xr.reshape(L0, rq, Mp * S),
                             xi.reshape(L0, rq, Mp * S)], axis=1)
        dims = (((0,), (1,)), ((), ()))
        if isinstance(Dp_t, tuple):
            # 6-pass int8 emulation (experiments/e18): quantize z into
            # three int8 digits against the block max, contract each
            # needed digit pair on the int8 MXU (2x bf16 rate), and
            # recombine the three digit-order groups in f32.
            ds = (table_refs[ti][:], table_refs[ti + 1][:],
                  table_refs[ti + 2][:])
            ti += 3
            y = _int8_dot_lhsm(ds, Dp_t[3], z, dims)
        elif _V3_MXU_SPLIT3 and prec is jax.lax.Precision.HIGHEST:
            # Manual 3-pass bf16 emulation (Mosaic does not lower
            # Precision.HIGH): split both operands into bf16 hi+lo and drop
            # the lo*lo term — half the MXU passes of HIGHEST at ~4e-6
            # relative error (vs ~2e-7 / 3e-3 for HIGHEST / DEFAULT).
            D32 = table_refs[ti][:]
            ti += 1
            Dh = D32.astype(jnp.bfloat16)
            Dl = (D32 - Dh.astype(jnp.float32)).astype(jnp.bfloat16)
            zh = z.astype(jnp.bfloat16)
            zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
            dot = functools.partial(jax.lax.dot_general,
                                    dimension_numbers=dims,
                                    preferred_element_type=jnp.float32)
            y = dot(Dh, zh) + dot(Dh, zl) + dot(Dl, zh)
        else:
            y = jax.lax.dot_general(
                table_refs[ti][:], z, dims,
                preferred_element_type=jnp.float32, precision=prec)
            ti += 1
        ar, ai = y[:r], y[r:]                                # (r, L0, Mp*S)
        if Mp == 1:
            xr = ar.reshape(-1, S)
            xi = ai.reshape(-1, S)
        else:
            twr = table_refs[ti][:][:, None, :, None]
            twi = table_refs[ti + 1][:][:, None, :, None]
            ti += 2
            ar = ar.reshape(r, L0, Mp, S)
            ai = ai.reshape(r, L0, Mp, S)
            xr = (ar * twr - ai * twi).reshape(-1, S)
            xi = (ar * twi + ai * twr).reshape(-1, S)
    return xr, xi


def _fft_kernel_v3(n, sb, il, inverse, out_dtype, prec, vpu_tabs, mxu_tabs,
                   win, in_tl, out_tl, in_rows, qrows, out_fill,
                   out_zero_win, *refs):
    if win is not None:
        # interior zero window [left, right): prefix + tail read as two
        # separately-DMA'd operands; the zero middle never leaves HBM
        xr_ref, xi_ref, xrt_ref, xit_ref = refs[:4]
        refs = refs[4:]
    else:
        xr_ref, xi_ref = refs[:2]
        refs = refs[2:]
    or_ref, oi_ref = refs[-2:]
    table_refs = refs[:-2]
    # ``il`` independent sb-line pipelines per grid step: Mosaic's scheduler
    # overlaps one chain's VPU stages (butterflies, swaps) with the other's
    # MXU contraction — measured +10-15% over a single chain (E9/E10)
    for i in range(il):
        if in_tl:
            # transposed-intermediate layout: block (1, n, gb) — the state
            # orientation, no entry transpose (round-trip/convolution
            # consumers: the fwd wrote this layout, saving both transposes)
            xr = xr_ref[0, :, i * sb:(i + 1) * sb].astype(jnp.float32)
            xi = xi_ref[0, :, i * sb:(i + 1) * sb].astype(jnp.float32)
        else:
            # transpose at STORAGE width, then widen: for bf16/f16 tiers the
            # lane<->sublane relayout moves half the bytes (round 4; no-op
            # for f32)
            xr = jnp.swapaxes(
                xr_ref[0, i * sb:(i + 1) * sb], 0, 1).astype(jnp.float32)
            xi = jnp.swapaxes(
                xi_ref[0, i * sb:(i + 1) * sb], 0, 1).astype(jnp.float32)
        if win is not None:
            left, right = win
            z = jnp.zeros((right - left, sb), jnp.float32)
            tr = jnp.swapaxes(
                xrt_ref[0, i * sb:(i + 1) * sb].astype(jnp.float32), 0, 1)
            ti = jnp.swapaxes(
                xit_ref[0, i * sb:(i + 1) * sb].astype(jnp.float32), 0, 1)
            xr = jnp.concatenate([xr, z, tr], axis=0)
            xi = jnp.concatenate([xi, z, ti], axis=0)
        elif in_rows and xr.shape[0] > qrows:
            # the DMA window was rounded up past the live chunks (lane-tile
            # legality) — the extra rows are declared zeros; trim so the
            # pruned first stage sees exactly its q chunks
            xr = xr[:qrows]
            xi = xi[:qrows]
        elif xr.shape[0] < qrows:
            # zero-pad elision: the declared-zero tail was never read from
            # HBM (``vkFFT_Zeropad.h`` analog).  With stage-1 pruning the
            # state only fills to the q live chunks (qrows = q*Mp1 <= n) —
            # the full-width zero plane is never materialized; the pruned
            # first stage expands to dense width as part of its butterfly.
            zpad = ((0, qrows - xr.shape[0]), (0, 0))
            xr = jnp.pad(xr, zpad)
            xi = jnp.pad(xi, zpad)
        xr, xi = _v3_apply_stages(xr, xi, sb, table_refs, vpu_tabs, mxu_tabs,
                                  prec, inverse, in_rows=in_rows)
        if out_tl:
            or_ref[0, :, i * sb:(i + 1) * sb] = xr.reshape(n, sb).astype(out_dtype)
            oi_ref[0, :, i * sb:(i + 1) * sb] = xi.reshape(n, sb).astype(out_dtype)
            continue
        xr = xr.reshape(n, sb)
        xi = xi.reshape(n, sb)
        if out_zero_win is not None:
            # interior declared-zero OUTPUT window restored in-kernel by the
            # same store (round 5 — replaces the XLA mask pass the inverse
            # of an interior-window plan paid; the reference's write-side
            # zero-pad guard, ``vkFFT_Zeropad.h`` write path)
            lw, rw = out_zero_win
            rows_ = jax.lax.broadcasted_iota(jnp.int32, (n, sb), 0)
            live = (rows_ < lw) | (rows_ >= rw)
            zero = jnp.float32(0)
            xr = jnp.where(live, xr, zero)
            xi = jnp.where(live, xi, zero)
        keep = out_fill or or_ref.shape[2]  # < n: discarded tail elided
        xr = xr[:keep]
        xi = xi[:keep]
        if out_fill and keep < or_ref.shape[2]:
            # declared-zero tail restored IN-KERNEL (literal zeros written
            # with the same store) — no separate XLA pad pass
            zp = ((0, or_ref.shape[2] - keep), (0, 0))
            xr = jnp.pad(xr, zp)
            xi = jnp.pad(xi, zp)
        # narrow BEFORE the exit transpose (same bytes saving on the write)
        or_ref[0, i * sb:(i + 1) * sb] = jnp.swapaxes(xr.astype(out_dtype), 0, 1)
        oi_ref[0, i * sb:(i + 1) * sb] = jnp.swapaxes(xi.astype(out_dtype), 0, 1)


@functools.lru_cache(maxsize=512)
def _build_fft_call_v3(n: int, inverse: bool, batch: int, interpret: bool,
                       dtype_name: str = "float32", donate: bool = False,
                       in_keep: int = 0, out_keep: int = 0,
                       scale: float = 1.0, in_window=None,
                       in_tl: bool = False, out_tl: bool = False,
                       force_il: int = 0, out_fill: bool = False,
                       out_zero_win=None):
    """``in_keep`` (forward): read only the first in_keep entries of each
    line — the declared-zero tail is never DMA'd.  ``out_keep`` (inverse):
    write only the first out_keep entries (the returned planes have that
    length).  Unlike v2's elision, any prefix length works — no row
    alignment requirement.  0 = full.  ``scale``: in-kernel normalization
    folded into the stage tables (no output multiply pass).

    ``in_window`` (forward): INTERIOR declared-zero window (left, right)
    with right < n — the prefix [0, left) and tail [right, n) are DMA'd as
    two operand windows and the zero middle never leaves HBM (the
    reference's arbitrary-window read guards, ``vkFFT_Zeropad.h``).
    Requires ``right % (n - right) == 0`` so the tail window lands on a
    BlockSpec block boundary (see `v3_interior_window_ok`).

    ``in_tl``/``out_tl``: transposed-intermediate layout — the operand /
    result arrays are (steps, n, gb) blocks in the kernel's state
    orientation, skipping the entry/exit lane<->sublane transposes.  A
    fwd(out_tl) + inv(in_tl) round trip (keep_intermediate_order consumers:
    convolution, fwd+inv chains) saves both transposes of the inner
    boundary — the reference's disableReorderFourStep economy
    (vkFFT_Structs.h:221)."""
    dtype = jnp.dtype(dtype_name)
    int8 = _V3_MXU_INT8 and dtype == jnp.float32
    # stage-1 compute pruning rides the read-elision window: q live chunks
    # of the first stage (q == r1 means the window is too shallow to prune)
    q1 = _v3_prune_q(n, in_keep) if (in_keep and not int8) else None
    r1, mp1 = _v3_first_stage(n)
    prune = q1 is not None and q1 < r1
    in_rows_eff = in_keep if prune else 0
    qrows = q1 * mp1 if prune else n
    vpu_tabs, mxu_tabs = _v3_tables(n, inverse, scale=scale, int8=int8,
                                    in_rows=in_rows_eff)
    sb = _V3_SB
    # interleaved independent pipelines per grid step (E9-E13: Mosaic
    # overlaps one chain's VPU work with another's MXU stage).  Round 3
    # (e26): the 4MB block budget was too tight — il=8 at n=1024 (8MB
    # blocks) measures 547 GB/s vs 509 at il=4; budget raised to 8MB
    # (n=4096 gains il=2; il=16 regresses).
    il = force_il or _V3_IL_OVERRIDE
    if not il:
        # strict <: n=1024 reaches il=8 (8MB blocks, 547 GB/s), n=4096
        # stops at il=2 (il=4 measured a 10% regression, e26/bench_r3a)
        il = 1
        # block-byte budget counts the COMPUTE width (f32): e36 measured the
        # storage-width budget REGRESSING bf16 n=4096 (il=4: 226 vs 253 at
        # il=2) — the in-kernel f32 state is what the deeper interleave
        # costs, not the narrow HBM blocks.  One measured exception: small-n
        # 16-bit tiers gain from il=16 (e36: bf16 n=256 337 vs 304 GB/s).
        il_cap = 16 if (n <= 256 and dtype.itemsize <= 2) else 8
        while (il < il_cap and n * (2 * il) * sb * 4 < (8 << 20)
               and batch >= 4 * il * sb):
            il *= 2
    gb = sb * il
    pad = (-batch) % gb
    padded = batch + pad
    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    # direction-free elision windows (round 4): in_keep = prefix of each
    # input line actually DMA'd (forward: zeropad_input; inverse: the
    # spectrum's declared-zero tail under zeropad_output), out_keep = prefix
    # of each output line actually written (forward: frequencyZeroPadding
    # write elision, vkFFT_Structs.h:264; inverse: discarded-tail writes).
    # Mosaic block legality: the minor block dim must be 128-divisible or
    # equal the array dim — unaligned read windows round UP to the next
    # lane tile (the extra columns are declared zeros; pruning still uses
    # the exact prefix).
    in_len = in_keep or n
    if in_len < n and in_len % 128:
        in_len = min(n, -(-in_len // 128) * 128)
    # out_fill: the discarded [out_keep, n) tail is not computed but IS
    # written as literal zeros by the same store (full-width output, no
    # separate XLA zero-restore pass — the declared-zero contract satisfied
    # in-kernel)
    out_len = n if out_fill else (out_keep or n)

    assert not (in_tl and (in_keep or in_window is not None)), \
        "tl input layout cannot combine with read-elision windows"
    assert not (out_tl and out_keep), \
        "tl output layout cannot combine with write-elision windows"
    win = None
    if in_window is not None and not inverse:
        win = (int(in_window[0]), int(in_window[1]))
        in_len = win[0]
    if out_zero_win is not None:
        out_zero_win = (int(out_zero_win[0]), int(out_zero_win[1]))
        assert not (out_tl or out_keep or out_fill)
    kernel = functools.partial(_fft_kernel_v3, n, sb, il, inverse, dtype,
                               prec, vpu_tabs, mxu_tabs, win, in_tl, out_tl,
                               in_rows_eff, qrows,
                               out_keep if out_fill else 0, out_zero_win)
    if in_tl:
        spec = pl.BlockSpec((1, n, gb), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        spec = pl.BlockSpec((1, gb, in_len), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    if out_tl:
        spec_out = pl.BlockSpec((1, n, gb), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        spec_out = pl.BlockSpec((1, gb, out_len), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs = [spec, spec]
    if win is not None:
        tail = n - win[1]
        blk = win[1] // tail
        spec_tail = pl.BlockSpec((1, gb, tail), lambda b: (b, 0, blk),
                                 memory_space=pltpu.VMEM)
        in_specs += [spec_tail, spec_tail]
    np_tables = []
    for twr, twi, *_ in vpu_tabs:
        in_specs += [const(twr), const(twi)]
        np_tables += [twr, twi]
    for Dp, twr, twi, r, L0, Mp in mxu_tabs:
        for d in _mxu_const_arrays(Dp):
            in_specs.append(const(d))
            np_tables.append(d)
        if Mp > 1:
            in_specs += [const(twr), const(twi)]
            np_tables += [twr, twi]

    passes = _mxu_passes(prec)
    mxu_macs = sum(r for *_, r, _, _ in mxu_tabs)
    read_len = in_len + (n - win[1] if win is not None else 0)
    kw = {
        "cost_estimate": pl.CostEstimate(
            flops=2 * padded * n * (mxu_macs * 8 * passes
                                    + len(vpu_tabs) * 20),
            transcendentals=0,
            bytes_accessed=dtype.itemsize * 2 * padded * (read_len + out_len)),
    }
    # aliasing is legal whenever operand and output ARRAYS share the full
    # (gb, n) shape — a windowed read (in_keep) still reads block i before
    # writing block i, so in-place remains safe (round 4: kills the XLA
    # loop-carry copies that single-kernel chains otherwise pay, e35)
    if donate and not interpret and out_len == n and win is None \
            and not (in_tl or out_tl):
        kw["input_output_aliases"] = {0: 0, 1: 1}
    out_block = (padded // gb, n, gb) if out_tl else (padded // gb, gb,
                                                      out_len)
    call = pl.pallas_call(
        kernel, grid=(padded // gb,),
        in_specs=in_specs, out_specs=[spec_out, spec_out],
        out_shape=[jax.ShapeDtypeStruct(out_block, dtype)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        **kw)

    def run(xr, xi):
        if in_tl:
            # operands already in the (steps, n, gb) intermediate layout
            a, b = call(xr, xi, *(jnp.asarray(t) for t in np_tables))
            if out_tl:
                return a, b
            a = a.reshape(padded, out_len)
            b = b.reshape(padded, out_len)
            return (a[:batch], b[:batch]) if pad else (a, b)
        if pad:
            xr = jnp.pad(xr, ((0, pad), (0, 0)))
            xi = jnp.pad(xi, ((0, pad), (0, 0)))
        a = xr.reshape(padded // gb, gb, xr.shape[-1])
        b = xi.reshape(padded // gb, gb, xi.shape[-1])
        ins = (a, b, a, b) if win is not None else (a, b)
        a, b = call(*ins, *(jnp.asarray(t) for t in np_tables))
        if out_tl:
            return a, b
        a = a.reshape(padded, out_len)
        b = b.reshape(padded, out_len)
        return (a[:batch], b[:batch]) if pad else (a, b)

    return run


def core_fft_planar_v3_tl(xr, xi, n: int, inverse: bool, scale: float = 1.0):
    """Transposed-intermediate round-trip halves (keep_intermediate_order /
    reference ``disableReorderFourStep``): the forward takes natural (B, n)
    planes and returns the OPAQUE (steps, n, gb) intermediate (no exit
    transpose); the inverse consumes that form and returns natural
    (B_padded, n) planes (no entry transpose) — callers slice back to the
    original batch.  Saves both lane<->sublane transposes of the inner
    boundary (e26: n=4096 round trip 439 vs ~400 GB/s natural)."""
    if not inverse:
        run = _build_fft_call_v3(n, False, xr.shape[0], _INTERPRET,
                                 str(xr.dtype), out_tl=True)
        return run(xr, xi)
    padded = xr.shape[0] * xr.shape[2]
    # the inverse must tile with the SAME gb the forward wrote (its padded
    # batch may cross an il threshold the original batch did not)
    run = _build_fft_call_v3(n, True, padded, _INTERPRET, str(xr.dtype),
                             in_tl=True, scale=scale,
                             force_il=xr.shape[2] // _V3_SB)
    return run(xr, xi)


def v3_interior_window_ok(n: int, left: int, right: int) -> bool:
    """Can the v3 kernel elide reads of an INTERIOR zero window [left, right)
    (data on both sides)?  The tail segment [right, n) must land on a
    BlockSpec block boundary: right % (n - right) == 0 — which covers the
    centered and power-of-two frequency-upsampling windows (e.g. keep n/4
    head + n/4 tail).  Both window blocks must also be Mosaic-legal lane
    tiles (128-divisible minor dims; round 4 hardware-legality audit)."""
    tail = n - right
    return (_use_v3(n) and 0 < left < right < n
            and right % tail == 0
            and left % 128 == 0 and tail % 128 == 0)


def core_fft_planar_v3(xr, xi, n: int, inverse: bool, donate: bool = False,
                       in_nonzero: int = 0, out_keep: int = 0,
                       scale: float = 1.0, in_window=None,
                       out_fill: bool = False, out_zero_window=None):
    """v3 core: natural order in, natural order out, both directions.

    ``in_nonzero``: the tail [in_nonzero, n) of each input line is declared
    zero and never read (pass full-width planes; only the prefix is DMA'd).
    ``out_keep``: only [0, out_keep) is computed into the returned planes
    (of that width).  Both windows are direction-free (round 4): forward
    out_keep is the frequencyZeroPadding write elision
    (``vkFFT_Structs.h:264``), inverse in_nonzero skips reads of the
    spectrum's declared-zero tail.  ``scale``: normalization folded into
    the stage tables — no output multiply pass.  ``in_window`` (forward):
    interior declared-zero window (left, right), right < n — both the prefix
    and the tail are read, the zero middle is never DMA'd (gate:
    `v3_interior_window_ok`)."""
    if in_window is not None and not inverse:
        run = _build_fft_call_v3(n, False, xr.shape[0], _INTERPRET,
                                 str(xr.dtype), False, scale=scale,
                                 in_window=tuple(in_window))
        return run(xr, xi)
    run = _build_fft_call_v3(n, inverse, xr.shape[0], _INTERPRET,
                             str(xr.dtype),
                             donate and (out_fill or not out_keep)
                             and out_zero_window is None
                             and xr.shape[-1] == n,
                             in_keep=in_nonzero, out_keep=out_keep,
                             scale=scale, out_fill=out_fill,
                             out_zero_win=(tuple(out_zero_window)
                                           if out_zero_window else None))
    # full-width planes welcome; the BlockSpec window DMAs only the prefix
    return run(xr, xi)


# ---------------------------------------------------------------------------
# Fused two-axis kernel: one VMEM-resident pass computes the full 2-D DFT of
# each trailing (ny, nz) plane — Y stages in the natural (y, z-in-lanes)
# layout (no transpose, like the strided kernel), an in-tile transpose, Z
# stages (y in lanes), transpose back, write.  A 2-D transform becomes ONE
# HBM read+write per direction instead of two, and a 3-D transform drops
# from 3 passes to 2 (the reference reaches its single-upload regime the
# same way for small sequences: both axes inside one shared-memory kernel,
# ``vkFFT_Scheduler.h`` numAxisUploads==1).
# ---------------------------------------------------------------------------

_PAIR_MAX_PTS = 1 << 17   # ny*nz cap: in+out f32 planes + stage temps ~<=4MB


def pair_available(ny: int, nz: int, dtype_name: str = "float32") -> bool:
    """Can the fused two-axis kernel run this (ny, nz) plane shape?"""
    return (_use_v3(ny) and _use_v3(nz)
            and ny * nz <= _PAIR_MAX_PTS
            and nz % 128 == 0 and ny % 128 == 0)


def _pair_pad_in(xr, xi, ny, nz):
    """Zero-fill a (iy, iz) read window up to the full (ny, nz) plane —
    the declared-zero region was never DMA'd (``vkFFT_Zeropad.h`` analog)."""
    iy, iz = xr.shape
    if iy < ny or iz < nz:
        pads = ((0, ny - iy), (0, nz - iz))
        xr = jnp.pad(xr, pads)
        xi = jnp.pad(xi, pads)
    return xr, xi


def _pair_fft_body(xr, xi, ny, nz, tabs, n_y_refs, vpu_y, mxu_y,
                   vpu_z, mxu_z, prec, inverse, iy=0, izp=0, oyp=0,
                   tl_in=False, tl_out=False):
    """Full 2-D DFT of one (ny, nz) plane inside a kernel: Y stages in the
    natural layout, in-tile transpose, Z stages, transpose back.

    In-kernel zero-pad COMPUTE pruning (round 4):
      ``iy``   — nonzero y-prefix: Y stage-1 prunes (`_v3_apply_stages`)
      ``izp``  — nonzero z-prefix (lane-padded): the Y stages run on the
                 NARROWED (*, izp) state (all Y work scales by izp/nz — the
                 zero z-columns stay zero through the Y transform), and the
                 Z stage-1 prune expands izp -> nz after the transpose
      ``oyp``  — inverse write window: only y < oyp rows survive, so the Z
                 stages run on the narrowed (*, oyp) state after the Y
                 stages (mirror saving).

    ``tl_in``/``tl_out`` (keep_intermediate_order pair form): the opaque
    intermediate is the (nz, ny) KERNEL-STATE orientation — a tl_out
    forward stops before the exit transpose and a tl_in inverse starts with
    the Z stages in that orientation, saving one in-tile transpose per
    direction (the 2-D disableReorderFourStep economy)."""
    if tl_in:
        xr, xi = _v3_apply_stages(xr, xi, ny, tabs[n_y_refs:], vpu_z, mxu_z,
                                  prec, inverse)
        xr = jnp.swapaxes(xr.reshape(nz, ny), 0, 1)        # (ny, nz)
        xi = jnp.swapaxes(xi.reshape(nz, ny), 0, 1)
        xr, xi = _v3_apply_stages(xr, xi, nz, tabs[:n_y_refs], vpu_y, mxu_y,
                                  prec, inverse)
        return xr.reshape(ny, nz), xi.reshape(ny, nz)
    Sy = izp or nz
    xr, xi = _v3_apply_stages(xr, xi, Sy, tabs[:n_y_refs], vpu_y, mxu_y,
                              prec, inverse, in_rows=iy)
    xr = xr.reshape(ny, Sy)
    xi = xi.reshape(ny, Sy)
    if oyp and oyp < ny:
        xr = xr[:oyp]
        xi = xi[:oyp]
    yn = oyp or ny
    xr = jnp.swapaxes(xr, 0, 1)                            # (Sy, yn)
    xi = jnp.swapaxes(xi, 0, 1)
    xr, xi = _v3_apply_stages(xr, xi, yn, tabs[n_y_refs:], vpu_z, mxu_z,
                              prec, inverse, in_rows=izp)
    if tl_out:
        return xr.reshape(nz, yn), xi.reshape(nz, yn)      # kernel state
    return (jnp.swapaxes(xr.reshape(nz, yn), 0, 1),
            jnp.swapaxes(xi.reshape(nz, yn), 0, 1))        # (yn, nz)


def _pair_kernel(ny, nz, il, out_dtype, prec, inverse, vpu_y, mxu_y, vpu_z,
                 mxu_z, n_y_refs, qy, izp, oyp, tl_in, tl_out,
                 xr_ref, xi_ref, *refs):
    or_ref, oi_ref = refs[-2:]
    tabs = refs[:-2]
    # ``il`` independent plane pipelines per grid step (round 3): Mosaic
    # overlaps one plane's VPU/transpose work with another's MXU stage —
    # same rationale as the v3 kernel's interleaving (E9/E10)
    iy_rows = qy if 0 < qy < ny else 0
    for i in range(il):
        xr, xi = xr_ref[i].astype(jnp.float32), xi_ref[i].astype(jnp.float32)
        if not tl_in:
            xr, xi = _pair_pad_in(xr, xi, qy or ny, izp or nz)
        xr, xi = _pair_fft_body(xr, xi, ny, nz, tabs, n_y_refs, vpu_y,
                                mxu_y, vpu_z, mxu_z, prec, inverse,
                                iy=iy_rows, izp=izp, oyp=oyp,
                                tl_in=tl_in, tl_out=tl_out)
        oy, oz = or_ref.shape[1:]  # < (ny, nz): discarded-tail writes elided
        or_ref[i] = xr[:oy, :oz].astype(out_dtype)
        oi_ref[i] = xi[:oy, :oz].astype(out_dtype)


def _pair_operands(vpu_tabs, mxu_tabs, const):
    """(np_tables, in_specs) for one stage set, `_build_fft_call_v3` order."""
    np_tables, specs = [], []
    for twr, twi, *_ in vpu_tabs:
        specs += [const(twr), const(twi)]
        np_tables += [twr, twi]
    for Dp, twr, twi, r, L0, Mp in mxu_tabs:
        for d in _mxu_const_arrays(Dp):
            specs.append(const(d))
            np_tables.append(d)
        if Mp > 1:
            specs += [const(twr), const(twi)]
            np_tables += [twr, twi]
    return np_tables, specs


@functools.lru_cache(maxsize=256)
def _build_pair_call(ny: int, nz: int, inverse: bool, b: int, interpret: bool,
                     dtype_name: str = "float32", scale: float = 1.0,
                     in_keep: tuple = (0, 0), out_keep: tuple = (0, 0),
                     tl_in: bool = False, tl_out: bool = False):
    """``in_keep`` (forward): read only the leading (iy, iz) window of each
    plane — the declared-zero remainder is never DMA'd.  ``out_keep``
    (inverse): write only the leading (oy, oz) window (the returned planes
    have that shape).  0 = full extent.

    ``tl_in``/``tl_out``: opaque transposed-intermediate pair form — planes
    are (nz, ny) kernel-state orientation; a tl round trip saves one
    in-tile transpose per direction (keep_intermediate_order for the N-D
    pair path)."""
    dtype = jnp.dtype(dtype_name)
    int8 = _V3_MXU_INT8 and dtype == jnp.float32
    iy = in_keep[0] or ny
    iz = in_keep[1] or nz
    oy = out_keep[0] or ny
    oz = out_keep[1] or nz
    # in-kernel compute pruning (round 4, reference vkFFT_Zeropad.h compute
    # guards): qy = Y stage-1 live-chunk rows; izp = z nonzero prefix
    # rounded to a lane-tile multiple of Z's stage-1 chunk (Y stages run on
    # the narrowed state, Z stage-1 expands); oyp = inverse write window
    # rounded likewise (Z stages run on the surviving rows only)
    qy = 0
    iy_eff = 0
    if not int8 and iy < ny:
        q1y = _v3_prune_q(ny, iy)
        r1y, mp1y = _v3_first_stage(ny)
        if q1y < r1y:
            qy, iy_eff = q1y * mp1y, iy

    def _round_win(keep, dim):
        if int8 or keep >= dim:
            return 0
        r1, mp1 = _v3_first_stage(dim)
        step = mp1
        while step % 128:
            step += mp1
        w = -(-keep // step) * step
        return 0 if w >= dim else w

    izp = _round_win(iz, nz)
    oyp = _round_win(oy, ny)
    # scale folds into the Y stage set's first stage (applied exactly once)
    vpu_y, mxu_y = _v3_tables(ny, inverse, scale=scale, int8=int8,
                              in_rows=iy_eff)
    vpu_z, mxu_z = _v3_tables(nz, inverse, int8=int8, in_rows=izp)
    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    tabs_y, specs_y = _pair_operands(vpu_y, mxu_y, const)
    tabs_z, specs_z = _pair_operands(vpu_z, mxu_z, const)
    # il interleaved plane pipelines (round 3: the single-plane kernel
    # measured 227 GB/s vs two-pass 491 — no overlap; see e22/e23)
    il = _V3_IL_OVERRIDE
    if not il:
        il = 1
        # budget counts the in+out f32 planes; stage temps ride the raised
        # VMEM limit (e23: il=4 beats il=2 at 256x256 — 2.165 vs 2.230 ms)
        while il < 8 and ny * nz * 16 * (il * 2) <= (4 << 20) and b >= il * 2:
            il *= 2
    assert not ((tl_in or tl_out) and (in_keep != (0, 0)
                                       or out_keep != (0, 0))), \
        "tl pair layouts cannot combine with elision windows"
    kernel = functools.partial(_pair_kernel, ny, nz, il, dtype, prec,
                               inverse, vpu_y, mxu_y, vpu_z, mxu_z,
                               len(tabs_y), qy, izp, oyp, tl_in, tl_out)
    pad = (-b) % il
    padded = b + pad
    in_blk = (il, nz, ny) if tl_in else (il, iy, iz)
    out_blk = (il, nz, ny) if tl_out else (il, oy, oz)
    spec_in = pl.BlockSpec(in_blk, lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec(out_blk, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    passes = _mxu_passes(prec)
    macs = (sum(r for *_, r, _, _ in mxu_y) * nz
            + sum(r for *_, r, _, _ in mxu_z) * ny)
    call = pl.pallas_call(
        kernel, grid=(padded // il,),
        in_specs=[spec_in, spec_in] + specs_y + specs_z,
        out_specs=[spec_out, spec_out],
        out_shape=[jax.ShapeDtypeStruct(
            (padded,) + tuple(out_blk[1:]), dtype)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * macs * 8 * passes,
            transcendentals=0,
            bytes_accessed=dtype.itemsize * 2 * padded * (iy * iz + oy * oz)))

    def run(xr, xi):
        if pad:
            zpad = ((0, pad), (0, 0), (0, 0))
            xr = jnp.pad(xr, zpad)
            xi = jnp.pad(xi, zpad)
        a, c = call(xr, xi, *(jnp.asarray(t) for t in tabs_y + tabs_z))
        return (a[:b], c[:b]) if pad else (a, c)

    return run


def fft_pair_tl_planar(xr, xi, ny: int, nz: int, inverse: bool,
                       scale: float = 1.0):
    """keep_intermediate_order pair round-trip halves: the forward takes
    natural (B, ny, nz) planes and returns the OPAQUE (B, nz, ny)
    kernel-state intermediate (one in-tile transpose saved); the inverse
    consumes that form and returns natural planes (the other transpose
    saved) — the 2-D disableReorderFourStep economy
    (``vkFFT_Structs.h:221``)."""
    lead = xr.shape[:-2]
    b = 1
    for d in lead:
        b *= d
    if not inverse:
        run = _build_pair_call(ny, nz, False, b, _INTERPRET, str(xr.dtype),
                               scale=scale, tl_out=True)
        a, c = run(xr.reshape(b, ny, nz), xi.reshape(b, ny, nz))
        return a.reshape(*lead, nz, ny), c.reshape(*lead, nz, ny)
    run = _build_pair_call(ny, nz, True, b, _INTERPRET, str(xr.dtype),
                           scale=scale, tl_in=True)
    a, c = run(xr.reshape(b, nz, ny), xi.reshape(b, nz, ny))
    return a.reshape(*lead, ny, nz), c.reshape(*lead, ny, nz)


def fft_pair_planar(xr, xi, ny: int, nz: int, inverse: bool,
                    scale: float = 1.0, in_keep: tuple = (0, 0),
                    out_keep: tuple = (0, 0)):
    """Fused 2-D DFT over the two minor axes of (..., ny, nz) planes.
    ``in_keep``/``out_keep``: zero-pad read/write elision windows — operands
    may be full-size planes (only the leading window is DMA'd) or
    pre-sliced (iy, iz) corners (the N-D outer-first elision path hands the
    corner straight through); the inverse's returned planes have the
    ``out_keep`` shape."""
    lead = xr.shape[:-2]
    b = 1
    for d in lead:
        b *= d
    iy = in_keep[0] or ny
    iz = in_keep[1] or nz
    ry, rz = xr.shape[-2:]   # full planes or the (iy, iz) corner
    if ((iy, iz) != (ny, nz) and (ry, rz) == (ny, nz)
            and (iy % 8 or iz % 128)):
        # Mosaic block legality: a windowed read block over FULL planes
        # needs (8, 128)-divisible window dims — slice the corner first
        # (one small XLA slice; block dims then equal the array dims).
        # The production N-D elision path hands pre-sliced corners and
        # never pays this.
        xr = xr[..., :iy, :iz]
        xi = xi[..., :iy, :iz]
        ry, rz = iy, iz
    run = _build_pair_call(ny, nz, inverse, b, _INTERPRET, str(xr.dtype),
                           scale=scale, in_keep=tuple(in_keep),
                           out_keep=tuple(out_keep))
    oy = out_keep[0] or ny
    oz = out_keep[1] or nz
    a, c = run(xr.reshape(b, ry, rz), xi.reshape(b, ry, rz))
    return a.reshape(*lead, oy, oz), c.reshape(*lead, oy, oz)


def fft_pair_p(x: Planar, ny: int, nz: int, inverse: bool,
               scale: float = 1.0, in_keep: tuple = (0, 0),
               out_keep: tuple = (0, 0)) -> Planar:
    """Planar wrapper over `fft_pair_planar` (engine interface for the
    application-level axis walk)."""
    rr, ii = fft_pair_planar(x.re, x.im, ny, nz, inverse, scale=scale,
                             in_keep=in_keep, out_keep=out_keep)
    return Planar(rr, ii)


# -- single-kernel two-axis convolution: forward pair + spectrum multiply +
#    inverse pair, all VMEM-resident.  A 2-D scalar convolution costs ONE
#    HBM read+write total (the reference's ideal: the whole convolution
#    inside one kernel, ``vkFFT_FFT.h:241-351``); for 3-D the minor-axis
#    pair fuses and only the outer axis pays strided passes.

_CONV_PAIR_MAX_PTS = 1 << 16    # tighter than _PAIR_MAX_PTS: 4 stage sets + H


def use_conv_pair(ny: int, nz: int) -> bool:
    return pair_available(ny, nz) and ny * nz <= _CONV_PAIR_MAX_PTS


def _conv_pair_kernel(ny, nz, il, out_dtype, prec, conj_data, xpow, counts,
                      stage_sets, qy, izp, blu, xr_ref, xi_ref, hr_ref,
                      hi_ref, *refs):
    (vy_f, my_f), (vz_f, mz_f), (vz_i, mz_i), (vy_i, my_i) = stage_sets
    or_ref, oi_ref = refs[-2:]
    if blu:
        # Bluestein-pair mode (round 5): the (ny, nz) plane is the FOUR-STEP
        # view of ONE m = ny*nz padded line — chirp pre/post tables on
        # read/write, the inter-pass twiddle w_m^(kc*js) between the stage
        # sets, spectrum multiply in the (ks, kc) swapped layout.  The whole
        # m-point Bluestein convolution costs ONE HBM read+write per
        # direction (the reference's in-kernel structure at EVERY size,
        # ``vkFFT_Bluestein.h:32,201``).
        (ar_ref, ai_ref, twf_r, twf_i, twn_r, twn_i,
         br_ref, bi_ref) = refs[:8]
        tabs = refs[8:-2]
    else:
        tabs = refs[:-2]
    c1, c2, c3 = counts
    # il interleaved plane pipelines per grid step (round 3 — the same
    # Mosaic-overlap rationale as the pair kernel; il=1 when per-slice
    # spectra (hp > 1) pin one h block per step)
    iy_rows = qy if 0 < qy < ny else 0
    for i in range(il):
        # in-kernel zero-pad COMPUTE pruning on the forward half (round 5,
        # the round-4 pair machinery wired through the conv form — verdict
        # item 6; reference: the zero-padded conv sample
        # ``sample_51_convolution_..._zeropadding_r2c.cpp``): the Y stages
        # run on the narrowed (*, izp) state with a pruned stage 1 (iy),
        # and the Z stage-1 prune expands izp -> nz after the transpose.
        xr, xi = _pair_pad_in(xr_ref[i].astype(jnp.float32),
                              xi_ref[i].astype(jnp.float32),
                              qy or ny, izp or nz)
        Sy = izp or nz
        if blu:
            rows_, cols_ = xr.shape
            ar = ar_ref[:rows_, :cols_]
            ai = ai_ref[:rows_, :cols_]
            xr, xi = xr * ar - xi * ai, xr * ai + xi * ar
        xr, xi = _v3_apply_stages(xr, xi, Sy, tabs[:c1], vy_f, my_f,
                                  prec, False, in_rows=iy_rows)
        xr = xr.reshape(ny, Sy)
        xi = xi.reshape(ny, Sy)
        if blu:
            fr = twf_r[:, :Sy]
            fi = twf_i[:, :Sy]
            xr, xi = xr * fr - xi * fi, xr * fi + xi * fr
        xr = jnp.swapaxes(xr, 0, 1)
        xi = jnp.swapaxes(xi, 0, 1)
        xr, xi = _v3_apply_stages(xr, xi, ny, tabs[c1:c2], vz_f, mz_f,
                                  prec, False, in_rows=izp)
        xr = xr.reshape(nz, ny)
        xi = xi.reshape(nz, ny)
        if conj_data:
            xi = -xi
        hr = hr_ref[0]
        hi = hi_ref[0]
        yr = xr * hr - xi * hi
        yi = xr * hi + xi * hr
        if xpow:
            inv = 1.0 / jnp.maximum(jnp.sqrt(yr * yr + yi * yi),
                                    np.float32(1e-30))
            yr = yr * inv
            yi = yi * inv
        yr, yi = _v3_apply_stages(yr, yi, ny, tabs[c2:c3], vz_i, mz_i,
                                  prec, True)
        yr = jnp.swapaxes(yr.reshape(nz, ny), 0, 1)
        yi = jnp.swapaxes(yi.reshape(nz, ny), 0, 1)
        if blu:
            fr = twn_r[...]
            fi = twn_i[...]
            yr, yi = yr * fr - yi * fi, yr * fi + yi * fr
        yr, yi = _v3_apply_stages(yr, yi, nz, tabs[c3:], vy_i, my_i,
                                  prec, True)
        oy, oz = or_ref.shape[1:]  # < (ny, nz): discarded-tail writes elided
        yr = yr.reshape(ny, nz)[:oy, :oz]
        yi = yi.reshape(ny, nz)[:oy, :oz]
        if blu:
            br = br_ref[:oy, :oz]
            bi = bi_ref[:oy, :oz]
            yr, yi = yr * br - yi * bi, yr * bi + yi * br
        or_ref[i] = yr.astype(out_dtype)
        oi_ref[i] = yi.astype(out_dtype)


@functools.lru_cache(maxsize=128)
def _build_conv_pair_call(ny: int, nz: int, b: int, hp: int, interpret: bool,
                          dtype_name: str, scale: float, conj_data: bool,
                          xpow: bool, in_keep: tuple = (0, 0),
                          out_keep: tuple = (0, 0), blu: bool = False):
    """``hp``: leading dim of the (hp, nz, ny) spectrum operand — 1 for a
    shared 2-D kernel, the outer-axis length for per-slice 3-D spectra.
    ``in_keep``/``out_keep``: zero-pad read/write elision windows (linear
    convolution reads only the data corner and writes only the kept corner —
    the reference's conv+zeropad composition, README.md:15-16)."""
    dtype = jnp.dtype(dtype_name)
    int8 = _V3_MXU_INT8 and dtype == jnp.float32
    iy = in_keep[0] or ny
    iz = in_keep[1] or nz
    # forward-side compute pruning (round 5 — same derivation as
    # `_build_pair_call`): qy = Y stage-1 live-chunk rows, izp = z nonzero
    # prefix rounded to a lane-tile multiple of Z's stage-1 chunk
    qy = 0
    iy_eff = 0
    if not int8 and iy < ny:
        q1y = _v3_prune_q(ny, iy)
        r1y, mp1y = _v3_first_stage(ny)
        if q1y < r1y:
            qy, iy_eff = q1y * mp1y, iy

    def _round_win(keep, dim):
        if int8 or keep >= dim:
            return 0
        r1, mp1 = _v3_first_stage(dim)
        step = mp1
        while step % 128:
            step += mp1
        w = -(-keep // step) * step
        return 0 if w >= dim else w

    izp = _round_win(iz, nz)
    sets = [_v3_tables(ny, False, int8=int8, in_rows=iy_eff),
            _v3_tables(nz, False, int8=int8, in_rows=izp),
            _v3_tables(nz, True, int8=int8),
            _v3_tables(ny, True, scale=scale, int8=int8)]
    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    np_tables, tab_specs, counts = [], [], []
    for vpu, mxu in sets:
        t, s = _pair_operands(vpu, mxu, const)
        np_tables += t
        tab_specs += s
        counts.append(len(np_tables))
    # il stays 1: interleaving measured a ~6% LOSS here (e32: 2.72 vs
    # 2.56 ms at 256x256) — the four stage sets + spectrum already fill
    # the VMEM working set; the machinery remains for experiments
    il = 1
    kernel = functools.partial(
        _conv_pair_kernel, ny, nz, il, dtype, prec, conj_data, xpow,
        tuple(counts[:3]), tuple(sets), qy, izp, blu)
    oy = out_keep[0] or ny
    oz = out_keep[1] or nz
    pad = (-b) % il
    padded = b + pad
    spec_in = pl.BlockSpec((il, iy, iz), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((il, oy, oz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, nz, ny),
                          (lambda i: (i % hp, 0, 0)) if hp > 1
                          else (lambda i: (0, 0, 0)),
                          memory_space=pltpu.VMEM)
    passes = _mxu_passes(prec)
    macs = 2 * (sum(r for *_, r, _, _ in sets[0][1]) * nz
                + sum(r for *_, r, _, _ in sets[1][1]) * ny)
    blu_specs = []
    if blu:
        # chirp-in, mid twiddle fwd, mid twiddle conj, chirp-out — four
        # full (ny, nz) complex tables as plane pairs
        plane = pl.BlockSpec((ny, nz), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        blu_specs = [plane] * 8
    call = pl.pallas_call(
        kernel, grid=(padded // il,),
        in_specs=[spec_in, spec_in, h_spec, h_spec] + blu_specs + tab_specs,
        out_specs=[spec_out, spec_out],
        out_shape=[jax.ShapeDtypeStruct((padded, oy, oz), dtype)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * macs * 8 * passes,
            transcendentals=0,
            bytes_accessed=dtype.itemsize * 2 * padded * (iy * iz + oy * oz)))

    def run(xr, xi, hr, hi, *blu_tabs):
        if pad:
            zp = ((0, pad), (0, 0), (0, 0))
            xr = jnp.pad(xr, zp)
            xi = jnp.pad(xi, zp)
        a, c = call(xr, xi, hr, hi, *blu_tabs,
                    *(jnp.asarray(t) for t in np_tables))
        return (a[:b], c[:b]) if pad else (a, c)

    return run


def conv_fused_pair(x: Planar, ny: int, nz: int, Ht, scale: float,
                    conj_data: bool = False, xpow: bool = False,
                    in_keep: tuple = (0, 0),
                    out_keep: tuple = (0, 0)) -> Planar:
    """Single-kernel circular convolution over the two minor axes of
    (..., ny, nz) planes.  ``Ht``: host complex spectrum, shape (nz, ny)
    (shared) or (P, nz, ny) with P = the size of the axis immediately
    before the pair (per-slice spectra of an N-D kernel).
    ``in_keep``/``out_keep``: elision windows — only the leading data
    corner is read / the kept corner written; the returned planes have the
    ``out_keep`` shape."""
    Ht = np.asarray(Ht)
    if Ht.ndim == 2:
        Ht = Ht[None]
    hp = Ht.shape[0]
    lead = x.shape[:-2]
    b = 1
    for d in lead:
        b *= d
    if hp > 1:
        assert b % hp == 0, (b, hp)
    iy = in_keep[0] or ny
    iz = in_keep[1] or nz
    xr, xi = x.re.reshape(b, ny, nz), x.im.reshape(b, ny, nz)
    if (iy, iz) != (ny, nz) and (iy % 8 or iz % 128):
        # Mosaic block legality (round 4): windowed read blocks over full
        # planes need (8, 128)-divisible dims — corner-slice first
        xr = xr[:, :iy, :iz]
        xi = xi[:, :iy, :iz]
    run = _build_conv_pair_call(ny, nz, b, hp, _INTERPRET, str(x.re.dtype),
                                scale, conj_data, xpow,
                                in_keep=tuple(in_keep),
                                out_keep=tuple(out_keep))
    oy = out_keep[0] or ny
    oz = out_keep[1] or nz
    hr = jnp.asarray(np.real(Ht).astype(np.float32))
    hi = jnp.asarray(np.imag(Ht).astype(np.float32))
    rr, ii = run(xr, xi, hr, hi)
    return Planar(rr.reshape(*lead, oy, oz), ii.reshape(*lead, oy, oz))


# ---------------------------------------------------------------------------
# In-kernel R2C / C2R on the v3 layout (reference: ``appendR2C_write``
# vkFFT_R2C.h:450, ``appendC2R_read`` :178 — the pack/untangle passes run
# inside the FFT kernel instead of as XLA pre/post passes, so a real
# transform moves half the bytes of a complex one — the bandwidth 2x the
# reference advertises, README.md:13).
#
# Dual-pipeline design (round 3 — replaces the reversal-matmul untangle that
# measured 3x slower than C2C, hwlogs/e19_r2c_ratio.log): the conjugate
# reversal the untangle needs is itself a DFT —
#
#     conj(Z[(m-k) % m]) = DFT(conj(z))[k]
#
# so instead of materializing the index reversal (two 6-pass HIGHEST
# permutation matmuls + roll + concats per kernel), the kernel runs the
# m-point stage pipeline once at DOUBLE lane width on [z | conj(z)] and
# recombines the two halves with per-row constant tables:
#
#   forward:  X = u (.) Z + v (.) conj(Z_rev),  u = (1 - i t)/2, v = (1 + i t)/2,
#             t_k = e^{-i pi k / m}   (+ Nyquist row X_m = Re Z_0 - Im Z_0)
#   inverse:  z = IDFT(a (.) X') + conj(IDFT(P2)),  a = (1 + i conj(t))/2,
#             P2 = b (.) X' with row 0 <- (1+i)/2 * X_m,  b = (1 - i conj(t))/2
#
# This costs one extra half-size FFT (the 2x-width pipeline) but removes all
# reversal MXU passes, and the kernel gains the same il-interleaving as v3.
# ---------------------------------------------------------------------------


def _r2c_kernel(n, m, sb, il, out_dtype, prec, packed, probe, vpu_tabs,
                mxu_tabs, x_ref, *refs):
    or_ref, oi_ref = refs[-2:]
    stage_refs = refs[:-2]
    for i in range(il):
        base = 2 * i * sb
        xa = jnp.swapaxes(
            x_ref[0, base:base + sb].astype(jnp.float32), 0, 1)      # (n, sb)
        xb = jnp.swapaxes(
            x_ref[0, base + sb:base + 2 * sb].astype(jnp.float32), 0, 1)
        if probe == "copy":            # perf floor: DMA + transposes only
            Far, Fai = xa[:m + (0 if packed else 1)], xa[:m + (0 if packed else 1)]
            Fbr, Fbi = xb[:m + (0 if packed else 1)], xb[:m + (0 if packed else 1)]
        else:
            Zr, Zi = _v3_apply_stages(xa, xb, sb, stage_refs, vpu_tabs,
                                      mxu_tabs, prec, False)
            Zr = Zr.reshape(n, sb)
            Zi = Zi.reshape(n, sb)
            if probe == "noflip":      # skip the conjugate reversal
                Vr, Vi = Zr, Zi
            else:                      # V = FFT(conj z) = conj(Z_rev)
                Vr, Vi = _v3_apply_stages(xa, -xb, sb, stage_refs, vpu_tabs,
                                          mxu_tabs, prec, False)
                Vr = Vr.reshape(n, sb)
                Vi = Vi.reshape(n, sb)
            Ar = 0.5 * (Zr + Vr)                             # F_A
            Ai = 0.5 * (Zi + Vi)
            Br = 0.5 * (Zi - Vi)                             # F_B = (Z-V)/2i
            Bi = -0.5 * (Zr - Vr)
            if packed:
                Far = Ar[:m]
                Fai = jnp.concatenate([Ar[m:m + 1], Ai[1:m]], axis=0)
                Fbr = Br[:m]
                Fbi = jnp.concatenate([Br[m:m + 1], Bi[1:m]], axis=0)
            else:
                zro = jnp.zeros((1, sb), jnp.float32)
                Far = Ar[:m + 1]
                Fai = jnp.concatenate([Ai[:m], zro], axis=0)
                Fbr = Br[:m + 1]
                Fbi = jnp.concatenate([Bi[:m], zro], axis=0)
        or_ref[0, base:base + sb] = jnp.swapaxes(Far, 0, 1).astype(out_dtype)
        oi_ref[0, base:base + sb] = jnp.swapaxes(Fai, 0, 1).astype(out_dtype)
        or_ref[0, base + sb:base + 2 * sb] = jnp.swapaxes(Fbr, 0, 1).astype(out_dtype)
        oi_ref[0, base + sb:base + 2 * sb] = jnp.swapaxes(Fbi, 0, 1).astype(out_dtype)


def _c2r_kernel(n, m, sb, il, out_dtype, prec, packed, probe, vpu_tabs,
                mxu_tabs, xr_ref, xi_ref, *refs):
    (o_ref,) = refs[-1:]
    stage_refs = refs[:-1]
    for i in range(il):
        base = 2 * i * sb
        Ar = jnp.swapaxes(xr_ref[0, base:base + sb].astype(jnp.float32), 0, 1)
        Ai = jnp.swapaxes(xi_ref[0, base:base + sb].astype(jnp.float32), 0, 1)
        Br = jnp.swapaxes(
            xr_ref[0, base + sb:base + 2 * sb].astype(jnp.float32), 0, 1)
        Bi = jnp.swapaxes(
            xi_ref[0, base + sb:base + 2 * sb].astype(jnp.float32), 0, 1)
        if probe == "copy":
            ya = jnp.concatenate([Ar, Ai], axis=0)[:n]
            yb = jnp.concatenate([Br, Bi], axis=0)[:n]
            o_ref[0, base:base + sb] = jnp.swapaxes(ya, 0, 1).astype(out_dtype)
            o_ref[0, base + sb:base + 2 * sb] = jnp.swapaxes(yb, 0, 1).astype(out_dtype)
            continue
        if packed:                     # Im(row 0) carries the Nyquist bin
            Am = Ai[:1]
            Bm = Bi[:1]
            Ai = jnp.concatenate([jnp.zeros_like(Am), Ai[1:]], axis=0)
            Bi = jnp.concatenate([jnp.zeros_like(Bm), Bi[1:]], axis=0)
        else:
            Am = Ar[m:m + 1]           # stored Im(X_m) is mathematically 0
            Bm = Br[m:m + 1]
            Ar, Ai = Ar[:m], Ai[:m]
            Br, Bi = Br[:m], Bi[:m]
        # head H = A + iB, bins 0..m (row m from the real Nyquist bins),
        # zero-extended to n rows for pipeline 1
        zros = jnp.zeros((m - 1, sb), jnp.float32)
        Hr = jnp.concatenate([Ar - Bi, Am, zros], axis=0)    # (n, sb)
        Hi = jnp.concatenate([Ai + Br, Bm, zros], axis=0)
        # pipeline 2: G = A - iB over bins 1..m-1, zero-extended; the
        # Hermitian tail of the full spectrum is conj(IDFT(G')) (a second
        # pipeline — cheaper than materializing the reversal, e24d/e24e)
        zro1 = jnp.zeros((1, sb), jnp.float32)
        Gr = jnp.concatenate([zro1, (Ar + Bi)[1:m], zro1, zros], axis=0)
        Gi = jnp.concatenate([zro1, (Ai - Br)[1:m], zro1, zros], axis=0)
        y1r, y1i = _v3_apply_stages(Hr, Hi, sb, stage_refs, vpu_tabs,
                                    mxu_tabs, prec, True)
        if probe == "noflip":
            y2r = jnp.zeros_like(y1r)
            y2i = jnp.zeros_like(y1i)
        else:
            y2r, y2i = _v3_apply_stages(Gr, Gi, sb, stage_refs, vpu_tabs,
                                        mxu_tabs, prec, True)
        ya = (y1r + y2r).reshape(n, sb)                      # line A = Re y
        yb = (y1i - y2i).reshape(n, sb)                      # line B = Im y
        o_ref[0, base:base + sb] = jnp.swapaxes(ya, 0, 1).astype(out_dtype)
        o_ref[0, base + sb:base + 2 * sb] = jnp.swapaxes(yb, 0, 1).astype(out_dtype)


@functools.lru_cache(maxsize=512)
def _build_r2c_call(n: int, batch: int, interpret: bool, inverse: bool,
                    dtype_name: str = "float32", scale: float = 1.0,
                    packed: bool = False, probe=None):
    """Forward: real (batch, n) -> planar (batch, m+1) half spectrum.
    Inverse: planar (batch, m+1) -> real (batch, n), scaled by m*scale —
    callers pass ``scale=1/m`` to get numpy-irfft normalization in-kernel
    (folded into the stage tables, no output multiply pass).

    ``packed=True``: (batch, m) spectrum planes with the real Nyquist bin
    in Im(row 0) — every HBM row stays lane-tile aligned; the round-trip
    and fused consumers use this form.

    Merged-slab pairing: lines [2i*sb, 2i*sb+sb) ride the real planes and
    [2i*sb+sb, 2i*sb+2sb) the imaginary planes of one full-n pipeline per
    step i (see the block comment at `_r2c_kernel`)."""
    dtype = jnp.dtype(dtype_name)
    m = n // 2
    # full-n stages; inverse folds scale*m/n so the public contract
    # (output scaled by m*scale) is unchanged
    vpu_tabs, mxu_tabs = _v3_tables(n, inverse,
                                    scale=scale * m / n if inverse else scale,
                                    int8=_V3_MXU_INT8 and dtype == jnp.float32)
    sb = _V3_SB
    il = _V3_IL_OVERRIDE
    if not il:
        il = 1
        while (il < 8 and n * (8 * il) * sb * 4 <= (4 << 20)
               and batch >= 4 * il * sb):
            il *= 2
    gb = 2 * sb * il
    pad = (-batch) % gb
    padded = batch + pad
    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    spec_r = pl.BlockSpec((1, gb, n), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    cw = m if packed else m + 1
    spec_c = pl.BlockSpec((1, gb, cw), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    stage_specs = []
    np_tables = []
    for s_twr, s_twi, *_ in vpu_tabs:
        stage_specs += [const(s_twr), const(s_twi)]
        np_tables += [s_twr, s_twi]
    for Dp, s_twr, s_twi, r, L0, Mp in mxu_tabs:
        for d in _mxu_const_arrays(Dp):
            stage_specs.append(const(d))
            np_tables.append(d)
        if Mp > 1:
            stage_specs += [const(s_twr), const(s_twi)]
            np_tables += [s_twr, s_twi]
    extra_specs = []

    passes = _mxu_passes(prec)
    mxu_macs = 2 * sum(r for *_, r, _, _ in mxu_tabs)   # two pipelines
    ce = pl.CostEstimate(
        flops=padded * n * (mxu_macs * 8 * passes + 40),
        transcendentals=0,
        bytes_accessed=dtype.itemsize * padded * (n + 2 * cw))

    if not inverse:
        kernel = functools.partial(_r2c_kernel, n, m, sb, il, dtype, prec,
                                   packed, probe, vpu_tabs, mxu_tabs)
        call = pl.pallas_call(
            kernel, grid=(padded // gb,),
            in_specs=[spec_r] + stage_specs + extra_specs,
            out_specs=[spec_c, spec_c],
            out_shape=[jax.ShapeDtypeStruct((padded // gb, gb, cw),
                                            dtype)] * 2,
            interpret=interpret,
        compiler_params=None if interpret else _vmem_params(), cost_estimate=ce)

        def run(x):
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0)))
            a, b = call(x.reshape(padded // gb, gb, n),
                        *(jnp.asarray(t_) for t_ in np_tables))
            a = a.reshape(padded, cw)
            b = b.reshape(padded, cw)
            return (a[:batch], b[:batch]) if pad else (a, b)
        return run

    kernel = functools.partial(_c2r_kernel, n, m, sb, il, dtype, prec,
                               packed, probe, vpu_tabs, mxu_tabs)
    call = pl.pallas_call(
        kernel, grid=(padded // gb,),
        in_specs=[spec_c, spec_c] + stage_specs + extra_specs,
        out_specs=spec_r,
        out_shape=jax.ShapeDtypeStruct((padded // gb, gb, n), dtype),
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(), cost_estimate=ce)

    def run_inv(xr, xi):
        if pad:
            xr = jnp.pad(xr, ((0, pad), (0, 0)))
            xi = jnp.pad(xi, ((0, pad), (0, 0)))
        y = call(xr.reshape(padded // gb, gb, cw),
                 xi.reshape(padded // gb, gb, cw),
                 *(jnp.asarray(t_) for t_ in np_tables))
        y = y.reshape(padded, n)
        return y[:batch] if pad else y
    return run_inv


def use_r2c_kernel(n: int) -> bool:
    """Even n with a v3 plan (the merged-slab in-kernel R2C path runs
    full-n stages — two real lines per complex pipeline)."""
    return n >= 8 and n % 2 == 0 and n <= _V3_MAX_N and _use_v3(n)


def rfft_lines_planar(x: jax.Array):
    """Real (B, n) lines -> planar (B, n//2+1) half spectrum, one kernel
    (numpy ``rfft`` values)."""
    run = _build_r2c_call(x.shape[-1], x.shape[0], _INTERPRET, False,
                          str(x.dtype))
    return run(x)


def irfft_lines_planar(xr: jax.Array, xi: jax.Array, n: int,
                       scale: float = 1.0):
    """Planar (B, n//2+1) half spectrum -> real (B, n) lines, scaled by
    (n//2)*scale — pass ``scale=1/(n//2)`` for numpy ``irfft``
    normalization folded into the kernel."""
    run = _build_r2c_call(n, xr.shape[0], _INTERPRET, True, str(xr.dtype),
                          scale=scale)
    return run(xr, xi)


def rfft_lines_packed(x: jax.Array):
    """Real (B, n) lines -> PACKED planar (B, n//2) half spectrum: bins
    0..n//2-1 with the (real) Nyquist bin stored in Im(bin 0) — the
    halfcomplex-style layout whose HBM rows stay lane-tile aligned (the
    numpy m+1 layout costs ~3x in unaligned DMA; hwlogs/e22/e23).  Use for
    round trips and fused spectrum consumers; `packed_to_numpy_layout`
    converts when the numpy layout is required."""
    run = _build_r2c_call(x.shape[-1], x.shape[0], _INTERPRET, False,
                          str(x.dtype), packed=True)
    return run(x)


def irfft_lines_packed(xr: jax.Array, xi: jax.Array, n: int,
                       scale: float = 1.0):
    """PACKED planar (B, n//2) half spectrum -> real (B, n) lines (see
    `rfft_lines_packed`); scaled by (n//2)*scale."""
    run = _build_r2c_call(n, xr.shape[0], _INTERPRET, True, str(xr.dtype),
                          scale=scale, packed=True)
    return run(xr, xi)


def packed_to_numpy_layout(xr: jax.Array, xi: jax.Array):
    """(B, m) packed half spectrum -> (B, m+1) numpy rfft layout (XLA
    concat pass — pay only when the numpy layout is actually needed)."""
    nyq = xi[:, :1]
    zero = jnp.zeros_like(nyq)
    return (jnp.concatenate([xr, nyq], axis=-1),
            jnp.concatenate([zero, xi[:, 1:], zero], axis=-1))


def numpy_to_packed_layout(xr: jax.Array, xi: jax.Array):
    """(B, m+1) numpy rfft layout -> (B, m) packed half spectrum (Nyquist
    real into Im(bin 0); the mathematically-zero Im parts of DC/Nyquist
    are dropped)."""
    return (xr[:, :-1],
            jnp.concatenate([xr[:, -1:], xi[:, 1:-1]], axis=-1))


# ---------------------------------------------------------------------------
# In-kernel DCT-II / DCT-III (reference ``appendDCTII_read_III_write`` /
# ``appendDCTII_write_III_read``, vkFFT_R2R.h:1541/1731): the even/odd
# permutation, half-size real FFT, Hermitian unfold, and rotation all run
# inside ONE kernel — a DCT moves one real read + one real write instead of
# the XLA composition's multiple gather/scatter passes.
# ---------------------------------------------------------------------------


def use_dct_kernel(n: int) -> bool:
    """Sizes whose doubled length 2n has a v3 plan (the in-kernel DCT-II/
    III forms run 2n-point pipelines — Makhoul zero-padded mapping with no
    element shuffling; round 3)."""
    return n >= 4 and 2 * n <= _V3_MAX_N and _use_v3(2 * n)


def _dct2_kernel(n, sb, il, out_dtype, prec, dst, vpu_tabs, mxu_tabs,
                 x_ref, *refs):
    """Merged-slab DCT-II / DST-II: two lines ride one 2n-point pipeline
    pair (the `_r2c_kernel` structure) on the zero-padded lines x~,
    using  DCT2_k = 2 Re(e^{-i pi k/2n} H_k)  and
           DST2_k = -2 Im(e^{-i pi (k+1)/2n} H_{k+1})
    with H = rfft_{2n}(x~) — no permutation, no reversal (the round-2
    kernel's flip matmuls cost ~0.9 ms each at n=1024, e24d)."""
    o_ref = refs[-1]
    rr_ref, ri_ref = refs[-3:-1]
    stage_refs = refs[:-3]
    M = 2 * n
    for i in range(il):
        base = 2 * i * sb
        xa = jnp.swapaxes(
            x_ref[0, base:base + sb].astype(jnp.float32), 0, 1)      # (n, sb)
        xb = jnp.swapaxes(
            x_ref[0, base + sb:base + 2 * sb].astype(jnp.float32), 0, 1)
        pads = ((0, n), (0, 0))
        xta = jnp.pad(xa, pads)
        xtb = jnp.pad(xb, pads)
        Zr, Zi = _v3_apply_stages(xta, xtb, sb, stage_refs, vpu_tabs,
                                  mxu_tabs, prec, False)
        Vr, Vi = _v3_apply_stages(xta, -xtb, sb, stage_refs, vpu_tabs,
                                  mxu_tabs, prec, False)
        Zr = Zr.reshape(M, sb)
        Zi = Zi.reshape(M, sb)
        Vr = Vr.reshape(M, sb)
        Vi = Vi.reshape(M, sb)
        Har = 0.5 * (Zr + Vr)                                # rfft(line A)
        Hai = 0.5 * (Zi + Vi)
        Hbr = 0.5 * (Zi - Vi)                                # rfft(line B)
        Hbi = -0.5 * (Zr - Vr)
        rr, ri = rr_ref[:], ri_ref[:]
        if dst:   # bins 1..n, out = -Im(rot * H)
            outa = -(rr * Hai[1:n + 1] + ri * Har[1:n + 1])
            outb = -(rr * Hbi[1:n + 1] + ri * Hbr[1:n + 1])
        else:     # bins 0..n-1, out = Re(rot * H)
            outa = rr * Har[:n] - ri * Hai[:n]
            outb = rr * Hbr[:n] - ri * Hbi[:n]
        o_ref[0, base:base + sb] = jnp.swapaxes(outa, 0, 1).astype(out_dtype)
        o_ref[0, base + sb:base + 2 * sb] = jnp.swapaxes(outb, 0, 1).astype(out_dtype)


def _dct3_kernel(n, sb, il, out_dtype, prec, dst, vpu_tabs, mxu_tabs,
                 x_ref, *refs):
    """DCT-III / DST-III: per line, c_j = x_j * rot_j zero-extended to 2n,
    one complex 2n-point pipeline,
        DCT3_k = Re(DFT_{2n}(c~)_k),   DST3_k = -Im(DFT_{2n}(c~)_k)
    (rot tables carry the 2x weights, the DST bin shift, and the halved
    end term) — no reversal, no permutation."""
    o_ref = refs[-1]
    rr_ref, ri_ref = refs[-3:-1]
    stage_refs = refs[:-3]
    for i in range(il):
        x = jnp.swapaxes(
            x_ref[0, i * sb:(i + 1) * sb].astype(jnp.float32), 0, 1)  # (n, sb)
        rr, ri = rr_ref[:], ri_ref[:]
        pads = ((1, n - 1), (0, 0)) if dst else ((0, n), (0, 0))
        cr = jnp.pad(x * rr, pads)
        ci = jnp.pad(x * ri, pads)
        Zr, Zi = _v3_apply_stages(cr, ci, sb, stage_refs, vpu_tabs,
                                  mxu_tabs, prec, False)
        M = 2 * n
        out = (-Zi.reshape(M, sb)[:n]) if dst else Zr.reshape(M, sb)[:n]
        o_ref[0, i * sb:(i + 1) * sb] = jnp.swapaxes(out, 0, 1).astype(out_dtype)


@functools.lru_cache(maxsize=256)
def _build_dct_call(n: int, batch: int, interpret: bool, type3: bool,
                    dtype_name: str = "float32", scale: float = 1.0,
                    dst: bool = False):
    dtype = jnp.dtype(dtype_name)
    int8 = _V3_MXU_INT8 and dtype == jnp.float32
    sb = _V3_SB
    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    vpu_tabs, mxu_tabs = _v3_tables(2 * n, False, scale=scale, int8=int8)
    k = np.arange(n)
    if not type3:
        # DCT-II: rot = 2 e^{-i pi k/2n}; DST-II: rot = 2 e^{-i pi(k+1)/2n}
        rot = 2.0 * np.exp(-0.5j * np.pi * (k + (1 if dst else 0)) / n)
        pairs_per_step = 2    # merged-slab: two lines per pipeline pair
        kernel_fn = _dct2_kernel
    else:
        if dst:
            # DST-III pre-rotation: c_l = x_{l-1} e^{-i pi l/2n}, l=1..n,
            # end term halved (l = n)
            l = k + 1
            rot = 2.0 * np.exp(-0.5j * np.pi * l / n)
            rot[-1] *= 0.5
        else:
            # DCT-III pre-rotation: c_j = 2 x_j e^{-i pi j/2n}, c_0 = x_0
            rot = 2.0 * np.exp(-0.5j * np.pi * k / n)
            rot[0] = 1.0
        pairs_per_step = 1    # complex input: one line per pipeline
        kernel_fn = _dct3_kernel
    extra = [np.real(rot).astype(np.float32)[:, None],
             np.imag(rot).astype(np.float32)[:, None]]
    il = _V3_IL_OVERRIDE
    if not il:
        il = 1
        while (il < 8 and 2 * n * (8 * il) * sb * 4 <= (4 << 20)
               and batch >= 4 * il * sb):
            il *= 2
    gb = pairs_per_step * sb * il
    pad = (-batch) % gb
    padded = batch + pad
    tabs, tab_specs = _pair_operands(vpu_tabs, mxu_tabs, const)
    np_tables = tabs + extra
    in_tab_specs = tab_specs + [const(a) for a in extra]
    spec = pl.BlockSpec((1, gb, n), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    passes = _mxu_passes(prec)
    macs = 2 * sum(r for *_, r, _, _ in mxu_tabs)
    ce = pl.CostEstimate(
        flops=2 * padded * n * (macs * 8 * passes + 60),
        transcendentals=0,
        bytes_accessed=dtype.itemsize * padded * n * 2)
    kernel = functools.partial(kernel_fn, n, sb, il, dtype, prec, dst,
                               vpu_tabs, mxu_tabs)
    call = pl.pallas_call(
        kernel, grid=(padded // gb,),
        in_specs=[spec] + in_tab_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((padded // gb, gb, n), dtype),
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        cost_estimate=ce)

    def run(x):
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        y = call(x.reshape(padded // gb, gb, n),
                 *(jnp.asarray(t_) for t_ in np_tables))
        y = y.reshape(padded, n)
        return y[:batch] if pad else y

    return run


def dct2_lines(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """Unnormalized DCT-II of real (B, n) lines, one kernel; ``scale``
    folds into the stage tables."""
    run = _build_dct_call(x.shape[-1], x.shape[0], _INTERPRET, False,
                          str(x.dtype), scale=scale)
    return run(x)


def dct3_lines(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """Unnormalized DCT-III of real (B, n) lines, one kernel."""
    run = _build_dct_call(x.shape[-1], x.shape[0], _INTERPRET, True,
                          str(x.dtype), scale=scale)
    return run(x)


def dst2_lines(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """Unnormalized DST-II: the DCT-II kernel with the (-1)^j input signs
    and output reversal folded in-kernel."""
    run = _build_dct_call(x.shape[-1], x.shape[0], _INTERPRET, False,
                          str(x.dtype), scale=scale, dst=True)
    return run(x)


def dst3_lines(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """Unnormalized DST-III: the DCT-III kernel with input reversal and
    (-1)^j output signs folded in-kernel."""
    run = _build_dct_call(x.shape[-1], x.shape[0], _INTERPRET, True,
                          str(x.dtype), scale=scale, dst=True)
    return run(x)


# ---------------------------------------------------------------------------
# In-kernel DCT-I / DST-I (reference ``appendDCTI_read``, vkFFT_R2R.h:1339)
# and DCT/DST-IV even (``appendDCTIV_even_read``/``_write``, :2318/:2946) —
# round-3 replacements for the XLA compositions in transforms/r2r.py, which
# paid ~3x the HBM traffic (round-2 verdict item 6).
#
# DCT-I: the length-(2n-2) symmetric extension never materializes — with
# x~ = x zero-padded to 2n-2 and H = rfft(x~) (m = n-1 dual pipeline),
#   DCT1(x)_k = 2 Re(H_k) - x_0 - (-1)^k x_{n-1},  k = 0..n-1.
# DST-I: with x~ = [0, x_0..x_{n-1}, 0...] of length 2n+2 (m = n+1),
#   DST1(x)_k = -2 Im(H_{k+1}).
# DCT-IV even (m = n/2, derivation in transforms/r2r.py _dct4_even): with
# z_a = x_{2a} + i x_{n-1-2a} and c = s (.) z, s_a = e^{-i pi(4a+1)/(4n)},
#   X_{2b}   = 2 Re(u_b C_b),                u_b = e^{-i pi b/n}
#   X_{2b+1} = 2 Re(v_b conj(D_{(b+1)%m})),  v_b = e^{+i pi(b+1)/n}
# where C = FFT_m(c) and D = FFT_m(conj(c)) = conj(C_rev) — both halves of
# ONE dual-width stage pass; the only reversal left (the odd input slice)
# is a 3-pass exact flip.  DST-IV is the same kernel with the even and
# reversed-odd input roles swapped and v negated (the identity
# DST4(x)_k = (-1)^k DCT4(rev x)_k).
# ---------------------------------------------------------------------------


def use_dct1_kernel(n: int) -> bool:
    """DCT-I sizes whose extension length 2n-2 has a v3 plan (merged-slab
    kernel — full-extension pipelines, two lines per step)."""
    return n >= 3 and (2 * n - 2) <= _V3_MAX_N and _use_v3(2 * n - 2)


def use_dst1_kernel(n: int) -> bool:
    """DST-I sizes whose extension length 2n+2 has a v3 plan."""
    return n >= 3 and (2 * n + 2) <= _V3_MAX_N and _use_v3(2 * n + 2)


def use_dct4_kernel(n: int) -> bool:
    """DCT/DST-IV sizes whose doubled length has a v3 plan (per-line
    complex-pipeline form — works for odd n too)."""
    return n >= 4 and 2 * n <= _V3_MAX_N and _use_v3(2 * n)


def _dct1_kernel(n, m, sb, il, out_dtype, prec, dst, scale, vpu_tabs,
                 mxu_tabs, x_ref, *refs):
    """Merged-slab DCT-I/DST-I: two lines per step ride one full-extension
    (M = 2m) pipeline pair (see the `_r2c_kernel` block comment); the
    symmetric/odd extension never materializes — the zero-padded line's
    rfft is corrected per line."""
    o_ref = refs[-1]
    if dst:
        stage_refs = refs[:-1]
        alt_ref = None
    else:
        alt_ref = refs[-2]
        stage_refs = refs[:-2]
    M = 2 * m
    for i in range(il):
        base = 2 * i * sb
        xa = jnp.swapaxes(
            x_ref[0, base:base + sb].astype(jnp.float32), 0, 1)      # (n, sb)
        xb = jnp.swapaxes(
            x_ref[0, base + sb:base + 2 * sb].astype(jnp.float32), 0, 1)
        pads = ((1, M - n - 1), (0, 0)) if dst else ((0, M - n), (0, 0))
        xta = jnp.pad(xa, pads)
        xtb = jnp.pad(xb, pads)
        Zr, Zi = _v3_apply_stages(xta, xtb, sb, stage_refs, vpu_tabs,
                                  mxu_tabs, prec, False)
        Vr, Vi = _v3_apply_stages(xta, -xtb, sb, stage_refs, vpu_tabs,
                                  mxu_tabs, prec, False)
        Zr = Zr.reshape(M, sb)
        Zi = Zi.reshape(M, sb)
        Vr = Vr.reshape(M, sb)
        Vi = Vi.reshape(M, sb)
        Har = 0.5 * (Zr + Vr)                                # rfft(line A)
        Hai = 0.5 * (Zi + Vi)
        Hbr = 0.5 * (Zi - Vi)                                # rfft(line B)
        Hbi = -0.5 * (Zr - Vr)
        if dst:
            outa = -2.0 * Hai[1:n + 1]
            outb = -2.0 * Hbi[1:n + 1]
        else:
            alt = alt_ref[:]
            s = np.float32(scale)
            outa = 2.0 * Har[:n] - s * xa[:1] - alt * xa[n - 1:n]
            outb = 2.0 * Hbr[:n] - s * xb[:1] - alt * xb[n - 1:n]
        o_ref[0, base:base + sb] = jnp.swapaxes(outa, 0, 1).astype(out_dtype)
        o_ref[0, base + sb:base + 2 * sb] = jnp.swapaxes(outb, 0, 1).astype(out_dtype)


@functools.lru_cache(maxsize=256)
def _build_dct1_call(n: int, batch: int, interpret: bool, dst: bool,
                     dtype_name: str = "float32", scale: float = 1.0):
    dtype = jnp.dtype(dtype_name)
    m = (n + 1) if dst else (n - 1)
    int8 = _V3_MXU_INT8 and dtype == jnp.float32
    # full-extension (2m) stages, merged-slab (two lines per step)
    vpu_tabs, mxu_tabs = _v3_tables(2 * m, False, scale=scale, int8=int8)
    sb = _V3_SB
    il = _V3_IL_OVERRIDE
    if not il:
        il = 1
        while (il < 8 and 2 * m * (8 * il) * sb * 4 <= (4 << 20)
               and batch >= 4 * il * sb):
            il *= 2
    gb = 2 * sb * il
    pad = (-batch) % gb
    padded = batch + pad
    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    tabs, tab_specs = _pair_operands(vpu_tabs, mxu_tabs, const)
    extra = []
    if not dst:
        alt = np.full(n, scale, np.float32)
        alt[1::2] = -scale
        extra.append(alt[:, None])
    np_tables = tabs + extra
    in_specs = tab_specs + [const(a) for a in extra]
    spec = pl.BlockSpec((1, gb, n), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    passes = _mxu_passes(prec)
    macs = 2 * sum(r for *_, r, _, _ in mxu_tabs)
    ce = pl.CostEstimate(
        flops=2 * padded * m * (macs * 8 * passes + 60),
        transcendentals=0,
        bytes_accessed=dtype.itemsize * padded * n * 2)
    kernel = functools.partial(_dct1_kernel, n, m, sb, il, dtype, prec,
                               dst, scale, vpu_tabs, mxu_tabs)
    call = pl.pallas_call(
        kernel, grid=(padded // gb,),
        in_specs=[spec] + in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((padded // gb, gb, n), dtype),
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        cost_estimate=ce)

    def run(x):
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        y = call(x.reshape(padded // gb, gb, n),
                 *(jnp.asarray(t_) for t_ in np_tables))
        y = y.reshape(padded, n)
        return y[:batch] if pad else y

    return run


def dct1_lines(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """Unnormalized DCT-I of real (B, n) lines in one kernel (the 2n-2
    extension stays virtual — one real read + one real write)."""
    run = _build_dct1_call(x.shape[-1], x.shape[0], _INTERPRET, False,
                           str(x.dtype), scale=scale)
    return run(x)


def dst1_lines(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """Unnormalized DST-I of real (B, n) lines in one kernel (the 2n+2 odd
    extension stays virtual)."""
    run = _build_dct1_call(x.shape[-1], x.shape[0], _INTERPRET, True,
                           str(x.dtype), scale=scale)
    return run(x)


def _dct4_kernel(n, sb, il, out_dtype, prec, dst, vpu_tabs, mxu_tabs,
                 x_ref, *refs):
    """DCT-IV / DST-IV per line via odd bins of the 4n transform (round 3,
    no-shuffle form): with c_j = x_j e^{-i pi j/(2n)} zero-extended to 2n
    and Z = FFT_{2n}(c~),
        DCT4_k = 2 Re(t_k Z_k),  DST4_k = -2 Im(t_k Z_k),
        t_k = e^{-i pi (2k+1)/(4n)}
    — one complex 2n-point pipeline per line, zero permutation/reversal
    ops (the round-2 kernel's deinterleave + flip cost ~3 ms at n=1024,
    e25)."""
    o_ref = refs[-1]
    sr_ref, si_ref, tr_ref, ti_ref = refs[-5:-1]
    stage_refs = refs[:-5]
    M = 2 * n
    for i in range(il):
        x = jnp.swapaxes(
            x_ref[0, i * sb:(i + 1) * sb].astype(jnp.float32), 0, 1)  # (n, sb)
        sr, si = sr_ref[:], si_ref[:]
        pads = ((0, n), (0, 0))
        cr = jnp.pad(x * sr, pads)
        ci = jnp.pad(x * si, pads)
        Zr, Zi = _v3_apply_stages(cr, ci, sb, stage_refs, vpu_tabs,
                                  mxu_tabs, prec, False)
        Zr = Zr.reshape(M, sb)[:n]
        Zi = Zi.reshape(M, sb)[:n]
        tr, ti = tr_ref[:], ti_ref[:]
        if dst:
            out = -2.0 * (tr * Zi + ti * Zr)
        else:
            out = 2.0 * (tr * Zr - ti * Zi)
        o_ref[0, i * sb:(i + 1) * sb] = jnp.swapaxes(out, 0, 1).astype(out_dtype)


@functools.lru_cache(maxsize=256)
def _build_dct4_call(n: int, batch: int, interpret: bool, dst: bool,
                     dtype_name: str = "float32", scale: float = 1.0):
    dtype = jnp.dtype(dtype_name)
    int8 = _V3_MXU_INT8 and dtype == jnp.float32
    vpu_tabs, mxu_tabs = _v3_tables(2 * n, False, scale=scale, int8=int8)
    j = np.arange(n)
    s = np.exp(-0.5j * np.pi * j / n)                # pre-rotation
    t = np.exp(-0.25j * np.pi * (2 * j + 1) / n)     # post-rotation
    extra = [np.real(s).astype(np.float32)[:, None],
             np.imag(s).astype(np.float32)[:, None],
             np.real(t).astype(np.float32)[:, None],
             np.imag(t).astype(np.float32)[:, None]]
    sb = _V3_SB
    il = _V3_IL_OVERRIDE
    if not il:
        il = 1
        while (il < 8 and 2 * n * (8 * il) * sb * 4 <= (4 << 20)
               and batch >= 4 * il * sb):
            il *= 2
    gb = sb * il
    pad = (-batch) % gb
    padded = batch + pad
    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    tabs, tab_specs = _pair_operands(vpu_tabs, mxu_tabs, const)
    np_tables = tabs + extra
    in_specs = tab_specs + [const(a) for a in extra]
    spec = pl.BlockSpec((1, gb, n), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    passes = _mxu_passes(prec)
    macs = 2 * sum(r for *_, r, _, _ in mxu_tabs)
    ce = pl.CostEstimate(
        flops=2 * padded * n * (macs * 8 * passes + 80),
        transcendentals=0,
        bytes_accessed=dtype.itemsize * padded * n * 2)
    kernel = functools.partial(_dct4_kernel, n, sb, il, dtype, prec,
                               dst, vpu_tabs, mxu_tabs)
    call = pl.pallas_call(
        kernel, grid=(padded // gb,),
        in_specs=[spec] + in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((padded // gb, gb, n), dtype),
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        cost_estimate=ce)

    def run(x):
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        y = call(x.reshape(padded // gb, gb, n),
                 *(jnp.asarray(t_) for t_ in np_tables))
        y = y.reshape(padded, n)
        return y[:batch] if pad else y

    return run


def dct4_lines(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """Unnormalized even-length DCT-IV of real (B, n) lines in one kernel
    (the N/2 complex trick fully in-kernel)."""
    run = _build_dct4_call(x.shape[-1], x.shape[0], _INTERPRET, False,
                           str(x.dtype), scale=scale)
    return run(x)


def dst4_lines(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """Unnormalized even-length DST-IV: the DCT-IV kernel with swapped
    even/reversed-odd input roles and negated odd-output phases."""
    run = _build_dct4_call(x.shape[-1], x.shape[0], _INTERPRET, True,
                           str(x.dtype), scale=scale)
    return run(x)


# ---------------------------------------------------------------------------
# Single-kernel 2-D real transform (r2c pair): rfft2/irfft2 of each trailing
# (ny, nz) plane in ONE VMEM-resident kernel — one real-plane read + one
# half-spectrum write, i.e. half the HBM traffic of the complex pair kernel
# on top of the pair fusion (the reference's R2C 2x, README.md:13, extended
# to both axes).  The DC and Nyquist columns of the z-half-spectrum are real
# for real input, so the Nyquist column rides the DC column's imaginary
# plane through the y stages (two real FFTs in one complex one); the unpack
# is one extra reversal matmul in-kernel.
# ---------------------------------------------------------------------------


def use_r2c_pair(ny: int, nz: int) -> bool:
    return pair_available(ny, nz)


def _r2c_pair_kernel(ny, nz, m, il, out_dtype, prec, sets, c1,
                     x_ref, *refs):
    """Merged-plane rfft2 (round 3, no-shuffle form): two real planes ride
    one complex 2-D pipeline pair as re/im —
        Z = FFT2(A + iB);  V = FFT2(A - iB) = conj(Z_rev2)
        F_A = (Z+V)/2,  F_B = (Z-V)/(2i);  keep kz <= nz/2
    replacing the round-2 kernel's packed-column + three reversal matmuls
    (the relayout cost class measured in e24)."""
    (vy, my), (vz, mz) = sets
    or_ref, oi_ref = refs[-2:]
    tabs = refs[:-2]
    for i in range(il):
        a = x_ref[2 * i].astype(jnp.float32)                 # (ny, nz)
        b = x_ref[2 * i + 1].astype(jnp.float32)
        Zr, Zi = _pair_fft_body(a, b, ny, nz, tabs, c1, vy, my, vz, mz,
                                prec, False)
        Vr, Vi = _pair_fft_body(a, -b, ny, nz, tabs, c1, vy, my, vz, mz,
                                prec, False)
        h = m + 1
        or_ref[2 * i] = (0.5 * (Zr + Vr))[:, :h].astype(out_dtype)
        oi_ref[2 * i] = (0.5 * (Zi + Vi))[:, :h].astype(out_dtype)
        or_ref[2 * i + 1] = (0.5 * (Zi - Vi))[:, :h].astype(out_dtype)
        oi_ref[2 * i + 1] = (-0.5 * (Zr - Vr))[:, :h].astype(out_dtype)


def _c2r_pair_kernel(ny, nz, m, il, out_dtype, prec, sets, c1,
                     xr_ref, xi_ref, *refs):
    """Merged-plane irfft2: H = A + iB (kz <= m), G = A - iB (kz 1..m-1),
    both zero-extended;  y = IDFT2(H') + conj(IDFT2(G'));
    plane A = Re y, plane B = Im y."""
    (vy, my), (vz, mz) = sets
    (o_ref,) = refs[-1:]
    tabs = refs[:-1]
    for i in range(il):
        Ar = xr_ref[2 * i].astype(jnp.float32)               # (ny, m+1)
        Ai = xi_ref[2 * i].astype(jnp.float32)
        Br = xr_ref[2 * i + 1].astype(jnp.float32)
        Bi = xi_ref[2 * i + 1].astype(jnp.float32)
        ztail = jnp.zeros((ny, nz - m - 1), jnp.float32)
        Hr = jnp.concatenate([Ar - Bi, ztail], axis=1)       # (ny, nz)
        Hi = jnp.concatenate([Ai + Br, ztail], axis=1)
        z1 = jnp.zeros((ny, 1), jnp.float32)
        zt2 = jnp.zeros((ny, nz - m), jnp.float32)
        Gr = jnp.concatenate([z1, (Ar + Bi)[:, 1:m], zt2], axis=1)
        Gi = jnp.concatenate([z1, (Ai - Br)[:, 1:m], zt2], axis=1)
        y1r, y1i = _pair_fft_body(Hr, Hi, ny, nz, tabs, c1, vy, my, vz, mz,
                                  prec, True)
        y2r, y2i = _pair_fft_body(Gr, Gi, ny, nz, tabs, c1, vy, my, vz, mz,
                                  prec, True)
        o_ref[2 * i] = (y1r + y2r).astype(out_dtype)         # plane A
        o_ref[2 * i + 1] = (y1i - y2i).astype(out_dtype)     # plane B


@functools.lru_cache(maxsize=128)
def _build_r2c_pair_call(ny: int, nz: int, b: int, interpret: bool,
                         inverse: bool, dtype_name: str = "float32",
                         scale_y: float = 1.0, scale_z: float = 1.0):
    """Forward: real (b, ny, nz) -> planar (b, ny, nz//2+1) half spectrum.
    Inverse: planar half spectrum -> real, with ``scale_y`` folded into the
    y stages and ``scale_z`` into the z stages (pass 1/ny and 1/(nz//2) for
    numpy ``irfft2`` normalization, all in-kernel)."""
    dtype = jnp.dtype(dtype_name)
    m = nz // 2
    int8 = _V3_MXU_INT8 and dtype == jnp.float32
    # merged-plane pipelines run full-nz stages; the public scale contract
    # (1/(nz//2) on z) halves to the true 1/nz
    set_y = _v3_tables(ny, inverse, scale=scale_y, int8=int8)
    set_z = _v3_tables(nz, inverse, scale=scale_z * m / nz if inverse
                       else scale_z, int8=int8)
    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    tabs1, specs1 = _pair_operands(set_y[0], set_y[1], const)
    tabs2, specs2 = _pair_operands(set_z[0], set_z[1], const)
    np_tables = tabs1 + tabs2
    tab_specs = specs1 + specs2
    il = 1
    while il < 4 and ny * nz * 32 * (il * 2) <= (8 << 20) and b >= il * 4:
        il *= 2
    gb = 2 * il
    pad = (-b) % gb
    padded = b + pad
    spec_r = pl.BlockSpec((gb, ny, nz), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((gb, ny, m + 1), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    passes = _mxu_passes(prec)
    macs = 2 * (sum(r for *_, r, _, _ in set_z[1]) * ny
                + sum(r for *_, r, _, _ in set_y[1]) * nz)
    ce = pl.CostEstimate(
        flops=2 * padded * macs * 8 * passes,
        transcendentals=0,
        bytes_accessed=dtype.itemsize * padded * (ny * nz + 2 * ny * (m + 1)))

    if not inverse:
        kernel = functools.partial(_r2c_pair_kernel, ny, nz, m, il, dtype,
                                   prec, (set_y, set_z), len(tabs1))
        call = pl.pallas_call(
            kernel, grid=(padded // gb,),
            in_specs=[spec_r] + tab_specs,
            out_specs=[spec_c, spec_c],
            out_shape=[jax.ShapeDtypeStruct((padded, ny, m + 1), dtype)] * 2,
            interpret=interpret,
            compiler_params=None if interpret else _vmem_params(),
            cost_estimate=ce)

        def run(x):
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
            a, c = call(x, *(jnp.asarray(t_) for t_ in np_tables))
            return (a[:b], c[:b]) if pad else (a, c)
        return run

    kernel = functools.partial(_c2r_pair_kernel, ny, nz, m, il, dtype,
                               prec, (set_y, set_z), len(tabs1))
    call = pl.pallas_call(
        kernel, grid=(padded // gb,),
        in_specs=[spec_c, spec_c] + tab_specs,
        out_specs=spec_r,
        out_shape=jax.ShapeDtypeStruct((padded, ny, nz), dtype),
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        cost_estimate=ce)

    def run_inv(xr, xi):
        if pad:
            zp = ((0, pad), (0, 0), (0, 0))
            xr = jnp.pad(xr, zp)
            xi = jnp.pad(xi, zp)
        y = call(xr, xi, *(jnp.asarray(t_) for t_ in np_tables))
        return y[:b] if pad else y
    return run_inv


def rfft2_pair_planar(x: jax.Array) -> Planar:
    """Real (..., ny, nz) -> planar (..., ny, nz//2+1) half spectrum in one
    kernel (numpy ``rfft2`` values over the two minor axes)."""
    lead = x.shape[:-2]
    ny, nz = x.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    run = _build_r2c_pair_call(ny, nz, b, _INTERPRET, False, str(x.dtype))
    ar, ai = run(x.reshape(b, ny, nz))
    h = nz // 2 + 1
    return Planar(ar.reshape(*lead, ny, h), ai.reshape(*lead, ny, h))


def irfft2_pair_planar(xr: jax.Array, xi: jax.Array, ny: int, nz: int,
                       normalize: bool = True) -> jax.Array:
    """Planar (..., ny, nz//2+1) half spectrum -> real (..., ny, nz) in one
    kernel; numpy ``irfft2`` normalization folded into the stage tables."""
    lead = xr.shape[:-2]
    b = 1
    for d in lead:
        b *= d
    sy = 1.0 / ny if normalize else 1.0
    sz = 1.0 / (nz // 2) if normalize else 1.0
    run = _build_r2c_pair_call(ny, nz, b, _INTERPRET, True, str(xr.dtype),
                               scale_y=sy, scale_z=sz)
    y = run(xr.reshape(b, ny, nz // 2 + 1), xi.reshape(b, ny, nz // 2 + 1))
    return y.reshape(*lead, ny, nz)


# ---------------------------------------------------------------------------
# Strided-axis kernel: transform a non-minor axis with the trailing batch in
# lanes — the analog of the reference's strided kernels for axes > 0
# (``appendRadixStageStrided``, ``vkFFT_RadixStage.h:300``; grouped-batch
# lanes mirror ``groupedBatch`` coalescing).
#
# Data (P, N, S): the transform axis N sits in sublane/outer dims, the
# trailing batch S in lanes.  With N = N2*N1 (n2 slow digit):
#   stage 1: contract n2  ->  k2   (3D dot_general, lhs sublane matrix)
#   twiddle (k2, n1)
#   stage 2: contract n1  ->  k1   (lhs matrix again)
# output digit order (k1, k2) == natural line order k = k1*N2 + k2, so the
# strided kernel is both transpose-free AND natural-order — no XLA moveaxis
# is needed for multi-axis transforms.
# ---------------------------------------------------------------------------

def _strided_tile_s(n: int, s: int) -> int:
    """Lanes per block: target ~256KB per plane block (n * tile_s * 4 bytes),
    at least two 128-lane tiles, whole-S when S is small — tiny transform
    lengths (e.g. the long-path carry factor) would otherwise produce
    KB-sized blocks and a dispatch-bound grid."""
    if s < 128:
        # small trailing batch: pad the lane dim to one full tile (the
        # builder's pad_s machinery zero-fills); beats the old fallback of
        # two moveaxis passes around the contiguous kernel
        return 128
    target = max(256, min(8192, (1 << 18) // (4 * n)))
    if s <= target:
        # round UP to whole lane tiles (pad_s zero-fills): an unaligned
        # tile (e.g. s=129 from a half-spectrum axis) fails Mosaic's
        # layout inference on hardware ("unsupported shape cast" — found
        # by e28's rfftn generic-route probe; interpreter mode hides it)
        return ((s + 127) // 128) * 128
    # round down to a multiple of 256 for clean lane tiles
    return max(256, (target // 256) * 256)


@functools.lru_cache(maxsize=512)
def _strided_tables(n: int, inverse: bool, scale: float = 1.0):
    n1, n2 = split_lane_major(n)  # n1 fast digit, n2 slow
    sign = 2.0j if inverse else -2.0j
    D2 = luts.dft_matrix(n2, inverse)
    D1 = luts.dft_matrix(n1, inverse)
    k2 = np.arange(n2)[:, None]
    nn1 = np.arange(n1)[None, :]
    tw = np.exp(sign * np.pi / n * ((k2 * nn1) % n))   # (n2, n1)
    if scale != 1.0:
        tw = tw * scale  # in-kernel normalization (stageNormalization analog)
    return (_pack_complex_matrix(D2), _pack_complex_matrix(D1),
            np.real(tw).astype(np.float32), np.imag(tw).astype(np.float32))


def _fused_product(factor_refs):
    """Complex product of the fused twiddle factors.  Each factor arrives as
    an (re_ref, im_ref) pair whose leading block dim is 1; shapes broadcast
    against each other (e.g. (n1, 1, ts) x (1, n2, ts) -> (n1, n2, ts)) —
    the separable form of w_N^(k*s): the exponent is linear in each digit of
    k, so the table factorizes exactly and O(N*S) twiddle storage becomes
    O((d1+d2)*S) (reference stores the full LUT_4step table,
    ``vkFFT_ManageLUT.h``)."""
    fr, fi = None, None
    for rr, ri in factor_refs:
        ar = rr[0]
        ai = ri[0]
        if fr is None:
            fr, fi = ar, ai
        else:
            fr, fi = fr * ar - fi * ai, fr * ai + fi * ar
    return fr, fi


def _strided_kernel(n1, n2, tile_s, out_dtype, prec, n_pre, n_post,
                    *refs):
    """Optional fused inter-pass twiddles for the long-sequence four-step:
    ``n_pre`` factor tables multiply the input block, ``n_post`` the output
    block, as complex products of separable twiddle-factor tables
    (reference LUT_4step fused instead of a separate elementwise pass;
    round 5: both sides at once, so the Bluestein chirp pre-mult and the
    four-step twiddle ride ONE kernel — ``vkFFT_Bluestein.h:32`` fuses the
    chirp into read/write at every size)."""
    base = 6
    (xr_ref, xi_ref, r2_ref, r1_ref, twr_ref, twi_ref) = refs[:base]
    nf = n_pre + n_post
    factor_refs = [(refs[base + 2 * i], refs[base + 2 * i + 1])
                   for i in range(nf)]
    pre_refs = factor_refs[:n_pre]
    post_refs = factor_refs[n_pre:]
    or_ref, oi_ref = refs[base + 2 * nf:]
    xr = xr_ref[0].astype(jnp.float32)        # (N2, N1, S)
    xi = xi_ref[0].astype(jnp.float32)
    if pre_refs:
        fr, fi = _fused_product(pre_refs)
        xr, xi = xr * fr - xi * fi, xr * fi + xi * fr
    if n2 > 1:
        z = jnp.concatenate([xr, xi], axis=0)              # (2N2, N1, S)
        y = jax.lax.dot_general(r2_ref[:], z, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)             # (2N2, N1, S)
        ar, ai = y[:n2], y[n2:]
    else:
        ar, ai = xr, xi
    tw_r = twr_ref[:][:, :, None]
    tw_i = twi_ref[:][:, :, None]
    tr = ar * tw_r - ai * tw_i                             # (N2, N1, S)
    ti = ar * tw_i + ai * tw_r
    if n1 > 1:
        z2 = jnp.concatenate([tr, ti], axis=1)             # (N2, 2N1, S)
        y2 = jax.lax.dot_general(r1_ref[:], z2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)            # (2N1, N2, S)
        outr, outi = y2[:n1], y2[n1:]                      # (N1, N2, S) = (k1, k2, S)
    else:
        outr = jnp.swapaxes(tr, 0, 1)
        outi = jnp.swapaxes(ti, 0, 1)
    if post_refs:
        fr, fi = _fused_product(post_refs)
        outr, outi = outr * fr - outi * fi, outr * fi + outi * fr
    or_ref[0] = outr.astype(out_dtype)
    oi_ref[0] = outi.astype(out_dtype)


def _strided_kernel_v3(n, n1, n2, tile_s, il, il_p, out_dtype, prec, n_pre,
                       n_post, pre_rows_kind, post_rows_kind, inverse,
                       vpu_tabs, mxu_tabs, n_v3, in_rows, qrows, *refs):
    """v3-stage strided kernel: the (1, n, il*tile_s) block already has the
    transform axis in sublane/outer dims and the batch in lanes — the v3
    pipeline's native layout with no transpose at all.  One full-efficiency
    K=128 packed contraction replaces the two K<=2*64 partial-tile matmuls
    of the two-factor form (measured 2x on the contiguous dual, E9).
    ``il`` independent tile_s-lane pipelines per step (round 3 — same
    Mosaic-overlap rationale as the contiguous kernel; il=1 when fused
    twiddle factors are present)."""
    xr_ref, xi_ref = refs[0], refs[1]
    v3_refs = refs[2:2 + n_v3]
    nf = n_pre + n_post
    factor_refs = [(refs[2 + n_v3 + 2 * i], refs[2 + n_v3 + 2 * i + 1])
                   for i in range(nf)]
    pre_refs = factor_refs[:n_pre]
    post_refs = factor_refs[n_pre:]
    or_ref, oi_ref = refs[-2:]
    # ``il_p`` leading-dim (P-line) interleave (round 5): when the trailing
    # batch S is too small for lane-chunk interleaving (e.g. the long
    # tiers' S = Ns), independent pipelines come from processing il_p lines
    # per grid step — same MXU/VPU-overlap rationale as ``il``
    for j, i in [(j_, i_) for j_ in range(il_p) for i_ in range(il)]:
        sl = slice(i * tile_s, (i + 1) * tile_s)
        xr = xr_ref[j, :, sl].astype(jnp.float32)            # (n, tile_s)
        xi = xi_ref[j, :, sl].astype(jnp.float32)
        if in_rows and xr.shape[0] > qrows:
            # rounded DMA window past the live chunks: trim (declared zeros)
            xr = xr[:qrows]
            xi = xi[:qrows]
        if pre_refs:
            if pre_rows_kind:
                # FULL (n, S) table, multiplied directly — no digit
                # broadcast, no minor-crossing reshape (e44b: the broadcast
                # form relayouts per block; at small S the full table is KBs)
                rr_, ri_ = pre_refs[0]
                fr = rr_[0, 0, :, sl]
                fi = ri_[0, 0, :, sl]
            else:
                fr, fi = _fused_product(pre_refs)            # (n2, n1, S)
                fr = jnp.broadcast_to(fr, (n2, n1, tile_s)).reshape(n, tile_s)
                fi = jnp.broadcast_to(fi, (n2, n1, tile_s)).reshape(n, tile_s)
            # a read-elided state carries only the live row prefix — the
            # factor tables trim to match (declared-zero rows need no mult)
            rows = xr.shape[0]
            if rows < fr.shape[0]:
                fr = fr[:rows]
                fi = fi[:rows]
            xr, xi = xr * fr - xi * fi, xr * fi + xi * fr
        if xr.shape[0] < qrows:
            # zero-pad elision: the declared-zero row tail was never DMA'd;
            # with stage-1 pruning only the q live chunks materialize
            pads = ((0, qrows - xr.shape[0]), (0, 0))
            xr = jnp.pad(xr, pads)
            xi = jnp.pad(xi, pads)
        xr, xi = _v3_apply_stages(xr, xi, tile_s, v3_refs, vpu_tabs,
                                  mxu_tabs, prec, inverse, in_rows=in_rows)
        xr = xr.reshape(n, tile_s)
        xi = xi.reshape(n, tile_s)
        keep = or_ref.shape[1]   # < n: discarded-row writes are elided
        xr = xr[:keep]
        xi = xi[:keep]
        if post_refs:
            if post_rows_kind:
                rr_, ri_ = post_refs[0]
                fr = rr_[0, 0, :, sl]
                fi = ri_[0, 0, :, sl]
            else:
                fr, fi = _fused_product(post_refs)           # (n1, n2, S)
                fr = jnp.broadcast_to(fr, (n1, n2, tile_s)).reshape(n, tile_s)
                fi = jnp.broadcast_to(fi, (n1, n2, tile_s)).reshape(n, tile_s)
            if keep < fr.shape[0]:
                fr = fr[:keep]
                fi = fi[:keep]
            xr, xi = xr * fr - xi * fi, xr * fi + xi * fr
        or_ref[j, :, sl] = xr.astype(out_dtype)
        oi_ref[j, :, sl] = xi.astype(out_dtype)


def _factor_spec(desc, n1: int, n2: int, fused: str, s: int, tile_s: int):
    """BlockSpec + full array shape for one separable twiddle factor.

    The data block the factor multiplies is (1, d1, d2, tile_s) where
    (d1, d2) = (n2, n1) for 'pre' (input layout) or (n1, n2) for 'post'
    (output layout).  Descriptors:

      ("dim1", rows)          table (rows, S): varies along block dim 1 + S
      ("dim2", rows)          table (rows, S): varies along block dim 2 + S
      ("grid_mod", na)        table (na, S): row selected by grid index
                              p %% na (the digit carried in the P dim)
      ("dim1_col", rows, nc)  table (rows, nc): column selected by the S
                              block's position, j = s_offset // (S // nc)
      ("dim2_col", rows, nc)  same along block dim 2
      ("dim12",)              table (d1, d2): bilinear in the two row
                              digits, constant over S (the chirp's
                              quadratic cross term — round 5)
      ("rows", n)             FULL (n, S) table multiplied directly onto
                              the (n, tile_s) state — no digit broadcast,
                              no minor-crossing reshape (round 5: when S is
                              small — the Bluestein long tier, S = ns — the
                              full table is KBs and the separable economy
                              costs a Mosaic relayout per block, e44b)
    """
    d1, d2 = (n2, n1) if fused == "pre" else (n1, n2)
    kind = desc[0]
    if kind == "rows":
        nrows = desc[1]
        shape = (1, 1, nrows, s)
        block = (1, 1, nrows, tile_s)
        spec = pl.BlockSpec(block, lambda b, t: (0, 0, 0, t),
                            memory_space=pltpu.VMEM)
        return spec, shape, True
    if kind == "dim12":
        shape = (1, d1, d2, 1)
        spec = pl.BlockSpec(shape, lambda b, t: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        return spec, shape, False
    if kind in ("dim1", "dim2"):
        rows = desc[1]
        assert rows == (d1 if kind == "dim1" else d2), (desc, d1, d2)
        if kind == "dim1":
            shape = (1, rows, 1, s)
            block = (1, rows, 1, tile_s)
        else:
            shape = (1, 1, rows, s)
            block = (1, 1, rows, tile_s)
        spec = pl.BlockSpec(block, lambda b, t: (0, 0, 0, t),
                            memory_space=pltpu.VMEM)
        return spec, shape, True
    if kind == "grid_mod":
        na = desc[1]
        shape = (na, 1, 1, s)
        block = (1, 1, 1, tile_s)
        spec = pl.BlockSpec(block, lambda b, t: (b % na, 0, 0, t),
                            memory_space=pltpu.VMEM)
        return spec, shape, True
    if kind in ("dim1_col", "dim2_col"):
        rows, nc = desc[1], desc[2]
        per = s // nc  # S elements per column; tile_s must divide it
        assert per % tile_s == 0, (desc, s, tile_s)
        blocks_per = per // tile_s
        if kind == "dim1_col":
            assert rows == d1, (desc, d1)
            shape = (1, rows, 1, nc)
            block = (1, rows, 1, 1)
        else:
            assert rows == d2, (desc, d2)
            shape = (1, 1, rows, nc)
            block = (1, 1, rows, 1)
        spec = pl.BlockSpec(block, lambda b, t: (0, 0, 0, t // blocks_per),
                            memory_space=pltpu.VMEM)
        return spec, shape, False
    raise ValueError(f"unknown factor descriptor {desc!r}")


@functools.lru_cache(maxsize=512)
def _build_strided_call(n: int, inverse: bool, p: int, s: int, interpret: bool,
                        dtype_name: str = "float32", fused: str = "",
                        factors: tuple = (), donate: bool = False,
                        scale: float = 1.0, in_keep: int = 0,
                        out_keep: int = 0, factors_pre: tuple = (),
                        factors_post: tuple = ()):
    """(P, n, S) planar transform over the middle axis, natural order.
    ``factors_pre``/``factors_post`` multiply the input/output block by the
    complex product of the separable twiddle factors they describe (the
    long-sequence inter-pass twiddle, reference LUT_4step; round 5: both
    sides at once so the Bluestein chirp mults fuse into the SAME kernel as
    the four-step twiddle, ``vkFFT_Bluestein.h:32``).  The legacy
    ``fused``='pre'/'post' + ``factors`` form maps onto them.  ``scale``:
    in-kernel normalization folded into the stage tables.  ``in_keep`` /
    ``out_keep`` (v3 path only): zero-pad elision — read only the first
    in_keep rows of the transform dim / write only the first out_keep rows
    (the returned planes have that extent)."""
    if fused == "pre":
        factors_pre, factors = factors, ()
    elif fused == "post":
        factors_post, factors = factors, ()
    assert not factors
    dtype = jnp.dtype(dtype_name)
    n1, n2 = split_lane_major(n)
    r2, r1, twr, twi = _strided_tables(n, inverse, scale)
    tile_s = _strided_tile_s(n, s)
    all_factors = tuple(factors_pre) + tuple(factors_post)
    # v3-stage path: block (1, n, tile_s) must stay within the tested
    # Mosaic budget (~4MB with the raised VMEM limit, E13)
    use_v3 = _use_v3(n) and n * tile_s * 4 <= (4 << 20)
    col_ncs = {d[2] for d in all_factors if d[0] in ("dim1_col", "dim2_col")}
    if col_ncs:
        # column-selected factors address the table by S-block position:
        # tile_s must divide the per-column run s // nc, and S cannot be
        # padded (padding would shift column boundaries)
        (ncol,) = col_ncs
        per = s // ncol
        assert s % ncol == 0, (s, ncol)
        t = min(tile_s, per)
        while per % t:
            t -= 1
        tile_s = t
    # il interleaved lane-chunk pipelines per step on the plain (factor-
    # free) v3 path — same Mosaic-overlap rationale and 8MB block budget
    # as the contiguous kernel (e26/e27)
    il = 1
    if _use_v3(n) and not all_factors:
        want = _V3_IL_OVERRIDE
        if want:
            il = want
        else:
            while (il < 8 and n * tile_s * (2 * il) * 4 < (8 << 20)
                   and s >= 2 * il * tile_s):
                il *= 2
    # leading-dim interleave: small-S workloads (long tiers, dd four-step)
    # cannot interleave lane chunks — overlap comes from il_p lines per
    # step instead (round 5; e44 measured the factor-bearing strided passes
    # at ~3x their il'd flat-batch sibling)
    il_p = 1
    if (use_v3 and il == 1
            and not any(d[0] == "grid_mod" for d in all_factors)):
        # grid_mod tables select rows by the per-LINE grid index — il_p
        # blocks would mix digit rows
        if _STRIDED_ILP_OVERRIDE and p % _STRIDED_ILP_OVERRIDE == 0:
            il_p = _STRIDED_ILP_OVERRIDE   # tests/experiments
        elif not interpret:
            for cand in (8, 4, 2):
                if (p % cand == 0
                        and n * tile_s * (2 * cand) * 4 < (8 << 20)):
                    il_p = cand
                    break
    pad_s = (-s) % (tile_s * il)
    s_pad = s + pad_s

    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    const = lambda shape: pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    if (in_keep or out_keep) and not use_v3:
        raise NotImplementedError(
            "strided zero-pad elision requires the v3 path")
    # Mosaic legality: the second-minor block dim (the read window) must be
    # 8-divisible or equal n — round up (extra rows are declared zeros)
    in_len = in_keep or n
    if in_len < n and in_len % 8:
        in_len = min(n, -(-in_len // 8) * 8)
    out_len = out_keep or n
    if use_v3:
        int8 = _V3_MXU_INT8 and dtype == jnp.float32
        q1 = _v3_prune_q(n, in_keep) if (in_keep and not int8) else None
        r1, mp1 = _v3_first_stage(n)
        prune = q1 is not None and q1 < r1
        in_rows_eff = in_keep if prune else 0
        qrows = q1 * mp1 if prune else n
        vpu_tabs, mxu_tabs = _v3_tables(n, inverse, scale=scale, int8=int8,
                                        in_rows=in_rows_eff)
        v3_np = []
        for tr_, ti_, *_ in vpu_tabs:
            v3_np += [tr_, ti_]
        for Dp, tr_, ti_, r, L0, Mp in mxu_tabs:
            v3_np += _mxu_const_arrays(Dp)
            if Mp > 1:
                v3_np += [tr_, ti_]
        pre_rows_kind = any(d[0] == "rows" for d in factors_pre)
        post_rows_kind = any(d[0] == "rows" for d in factors_post)
        assert not (pre_rows_kind and len(factors_pre) > 1)
        assert not (post_rows_kind and len(factors_post) > 1)
        kernel = functools.partial(_strided_kernel_v3, n, n1, n2, tile_s,
                                   il, il_p, dtype, prec, len(factors_pre),
                                   len(factors_post), pre_rows_kind,
                                   post_rows_kind,
                                   inverse, vpu_tabs, mxu_tabs, len(v3_np),
                                   in_rows_eff, qrows)
        spec_in = pl.BlockSpec((il_p, in_len, tile_s * il),
                               lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((il_p, out_len, tile_s * il),
                                lambda b, t: (b, 0, t),
                                memory_space=pltpu.VMEM)
        in_specs = [spec_in, spec_in] + [const(t.shape) for t in v3_np]
        base_tabs = v3_np
        out_struct = jax.ShapeDtypeStruct((p, out_len, s_pad), dtype)
        mxu_macs = sum(r for *_, r, _, _ in mxu_tabs)
        alias_ok = in_len == n and out_len == n
    else:
        kernel = functools.partial(_strided_kernel, n1, n2, tile_s, dtype,
                                   prec, len(factors_pre),
                                   len(factors_post))
        spec_in = pl.BlockSpec((1, n2, n1, tile_s), lambda b, t: (b, 0, 0, t),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((1, n1, n2, tile_s), lambda b, t: (b, 0, 0, t),
                                memory_space=pltpu.VMEM)
        in_specs = [spec_in, spec_in, const(r2.shape), const(r1.shape),
                    const(twr.shape), const(twi.shape)]
        base_tabs = [r2, r1, twr, twi]
        out_struct = jax.ShapeDtypeStruct((p, n1, n2, s_pad), dtype)
        mxu_macs = n1 + n2
        # aliasing requires identical in/out abstract shapes: only the
        # square digit split qualifies for the two-factor kernel
        alias_ok = n1 == n2
    f_shapes = []
    f_pads = []
    for side, descs in (("pre", factors_pre), ("post", factors_post)):
        for desc in descs:
            spec, shape, pad_trailing = _factor_spec(desc, n1, n2, side,
                                                     s_pad, tile_s)
            in_specs += [spec, spec]
            f_shapes.append(shape)
            f_pads.append(pad_trailing)
    passes = _mxu_passes(prec)
    kw = {
        # accurate cost hints improve Mosaic's pipeline scheduling
        # (measured +6..18% on the contiguous kernels, experiments E3/E5)
        "cost_estimate": pl.CostEstimate(
            flops=2 * p * s_pad * n * mxu_macs * 8 * passes,
            transcendentals=0,
            bytes_accessed=dtype.itemsize * 2 * p * (in_len + out_len)
            * s_pad),
    }
    if donate and not interpret and alias_ok:
        kw["input_output_aliases"] = {0: 0, 1: 1}
    call = pl.pallas_call(
        kernel,
        grid=(p // il_p, s_pad // (tile_s * il)),
        in_specs=in_specs,
        out_specs=[spec_out, spec_out],
        out_shape=[out_struct] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(2),
        **kw,
    )

    def run(xr, xi, *tables):
        """``tables``: one (re, im) array pair per factor, each of the full
        shape from its descriptor (trailing S dim unpadded)."""
        # v3 planes may arrive with the full n rows (BlockSpec reads only
        # the in_len prefix) or pre-shrunk to in_len rows
        in_shape = ((p, xr.shape[-2], s) if use_v3 else (p, n2, n1, s))
        xr = xr.reshape(in_shape)
        xi = xi.reshape(in_shape)
        if pad_s:
            pads = tuple((0, 0) for _ in in_shape[:-1]) + ((0, pad_s),)
            xr = jnp.pad(xr, pads)
            xi = jnp.pad(xi, pads)
        args = [xr, xi] + [jnp.asarray(t) for t in base_tabs]
        nf_ = len(factors_pre) + len(factors_post)
        assert len(tables) == 2 * nf_, (len(tables), nf_)
        for i in range(nf_):
            fr, fi = tables[2 * i], tables[2 * i + 1]
            fr = fr.reshape(f_shapes[i][:-1] + (-1,))
            fi = fi.reshape(f_shapes[i][:-1] + (-1,))
            if pad_s and f_pads[i]:
                tpad = [(0, 0)] * 3 + [(0, pad_s)]
                fr = jnp.pad(fr, tpad)
                fi = jnp.pad(fi, tpad)
            args += [fr, fi]
        orr, oi = call(*args)
        if pad_s:
            orr = orr[..., :s]
            oi = oi[..., :s]
        o_n = out_len if use_v3 else n
        return orr.reshape(p, o_n, s), oi.reshape(p, o_n, s)

    return run


def strided_fft_planar(xr, xi, n: int, inverse: bool, donate: bool = False,
                       scale: float = 1.0, in_keep: int = 0,
                       out_keep: int = 0):
    """Natural-order DFT over the middle axis of (P, n, S) planes, scaled
    by ``scale`` in-kernel.  ``in_keep``: planes may carry only the first
    in_keep rows (the declared-zero tail is neither stored nor read);
    ``out_keep``: the returned planes have out_keep rows."""
    p, rows, s = xr.shape
    run = _build_strided_call(n, inverse, p, s, _INTERPRET, str(xr.dtype),
                              donate=donate, scale=scale,
                              in_keep=in_keep, out_keep=out_keep)
    return run(xr, xi)


# ---------------------------------------------------------------------------
# Outer-axis kernel (round 5): DFT over an axis that sits AHEAD of the two
# minor dims, consuming the natural (P, n, R, nz) layout directly.
#
# Why: the strided kernel's (P, n, S) view of an outer axis merges the minor
# dims into S — for a 3-D cube after the fused (y, z) pair pass that reshape
# is a genuine XLA relayout of the whole array (fact 38: 0.21 ms per
# direction at 256^3, re-tiling (nx, ny, nz) -> (nx, ny*nz)).  Here the
# BlockSpec windows the natural rank-4 layout ((1, n, tr, nz) blocks, grid
# over the R dim) and the transform runs over the LEADING dim of the
# (n, tr, nz) state: butterfly slices and digit reshapes touch only OUTER
# dims, so every vreg stays intact — no entry/exit transposes, no Mosaic
# sublane-alignment constraints at ANY stage granularity (the (n, S) state's
# Mp >= 64 rule does not apply), and no XLA relayout either side.
#
# The stage set is all-VPU (generic radix 2/3/4/5/7 butterflies as
# elementwise tile ops over the leading digit dims) — on an (8, 128)-tiled
# state each butterfly input is a whole vreg tile, the orientation the VPU
# is built for.  The reference's strided kernels solve the same problem with
# arbitrary shared-memory indexing (``appendRadixStageStrided``,
# ``vkFFT_RadixStage.h:300``); lane-blocked VMEM tiles are the TPU shape of
# that idea.
# ---------------------------------------------------------------------------

_OUTER_MAX_N = 4096   # leading-dim state rows; VMEM budget gates tr anyway


@functools.lru_cache(maxsize=1024)
def _outer_plan(n: int) -> Optional[tuple[int, ...]]:
    """Radix list for the outer-axis VPU pipeline: 4s first (add-only
    butterflies), one trailing 2, then generic 3/5/7 butterflies (r^2
    tile-MACs each).  None when n has a prime factor > 7 or is out of
    range — callers fall back to the strided path."""
    if n < 2 or n > _OUTER_MAX_N:
        return None
    rad, m = [], n
    while m % 4 == 0:
        rad.append(4)
        m //= 4
    if m % 2 == 0:
        rad.append(2)
        m //= 2
    for p_ in (3, 5, 7):
        while m % p_ == 0:
            rad.append(p_)
            m //= p_
    return tuple(rad) if m == 1 else None


@functools.lru_cache(maxsize=512)
def _outer_tables(n: int, inverse: bool, scale: float = 1.0):
    """Per-stage (twr, twi, r, L0, Mp) Stockham twiddles for the outer-axis
    VPU pipeline (same recurrence as ``_v3_tables``' VPU stages, any radix).
    ``scale`` folds into stage 1 (stageNormalization analog)."""
    rads = _outer_plan(n)
    sign = 2.0j if inverse else -2.0j
    tabs, L, M = [], 1, n
    for r in rads:
        Mp = M // r
        tw = np.exp(sign * np.pi / M * np.outer(np.arange(r), np.arange(Mp)))
        if scale != 1.0 and L == 1:
            tw = tw * scale
        tabs.append((np.real(tw).astype(np.float32),
                     np.imag(tw).astype(np.float32), r, L, Mp))
        L, M = L * r, Mp
    return tabs


def _generic_butterfly(zr, zi, r, inverse, q=None):
    """Radix-r butterfly over dim 1 of (L0, r, Mp, ...) state, digits stacked
    to the FRONT of the result: (r, L0, Mp, ...).  r=4/2 use the add-only
    networks; other r run the r^2 constant-coefficient MAC network (exact
    roots from numpy fp64).  ``q``: only the first q input digits are live
    (declared-zero tail) — the sums simply have fewer terms."""
    qr = q or r
    if r == 4 and qr == 4:
        t0r, t0i = zr[:, 0] + zr[:, 2], zi[:, 0] + zi[:, 2]
        t1r, t1i = zr[:, 0] - zr[:, 2], zi[:, 0] - zi[:, 2]
        t2r, t2i = zr[:, 1] + zr[:, 3], zi[:, 1] + zi[:, 3]
        t3r, t3i = zr[:, 1] - zr[:, 3], zi[:, 1] - zi[:, 3]
        if inverse:
            y1r, y1i = t1r - t3i, t1i + t3r
            y3r, y3i = t1r + t3i, t1i - t3r
        else:
            y1r, y1i = t1r + t3i, t1i - t3r
            y3r, y3i = t1r - t3i, t1i + t3r
        return (jnp.stack([t0r + t2r, y1r, t0r - t2r, y3r], axis=0),
                jnp.stack([t0i + t2i, y1i, t0i - t2i, y3i], axis=0))
    if r == 2 and qr == 2:
        return (jnp.stack([zr[:, 0] + zr[:, 1], zr[:, 0] - zr[:, 1]], axis=0),
                jnp.stack([zi[:, 0] + zi[:, 1], zi[:, 0] - zi[:, 1]], axis=0))
    # generic / pruned: y_j = sum_i w_r^(i*j) z_i as constant-coefficient
    # planar MACs (r*q tile ops; coefficients exact fp64 -> f32)
    sign = 2.0j if inverse else -2.0j
    w = np.exp(sign * np.pi / r * np.outer(np.arange(r), np.arange(qr)))
    outr, outi = [], []
    for j in range(r):
        ar = ai = None
        for i in range(qr):
            cr, ci = np.float32(w[j, i].real), np.float32(w[j, i].imag)
            tr_ = zr[:, i] * cr - zi[:, i] * ci
            ti_ = zr[:, i] * ci + zi[:, i] * cr
            ar = tr_ if ar is None else ar + tr_
            ai = ti_ if ai is None else ai + ti_
        outr.append(ar)
        outi.append(ai)
    return jnp.stack(outr, axis=0), jnp.stack(outi, axis=0)


def _outer_apply_stages(xr, xi, tail, table_refs, tabs, inverse,
                        in_rows: int = 0):
    """Run the outer-axis Stockham pipeline on (rows, *tail) state: every
    reshape/slice touches only leading dims (minor-2 vreg tiles ride along
    untouched; rank-5 leading-dim ops are Mosaic-legal — e43b).  The twiddle
    tables arrive HOST-shaped (r, 1, Mp, 1, 1): an in-kernel rank-2 -> rank-5
    reshape crosses the minor-dim boundary and fails Mosaic layout inference
    ("unsupported shape cast", e43).  ``in_rows``: declared-zero tail
    [in_rows, n) — stage 1's butterfly drops the dead digit terms
    (``vkFFT_Zeropad.h`` compute guards)."""
    first = True
    for ti, (_, _, r, L0, Mp) in enumerate(tabs):
        q = r
        if first and in_rows:
            q = min(r, -(-in_rows // Mp))
        first = False
        zr = xr.reshape(L0, q, Mp, *tail)
        zi = xi.reshape(L0, q, Mp, *tail)
        ar, ai = _generic_butterfly(zr, zi, r, inverse,
                                    q=q if q < r else None)
        twr = table_refs[2 * ti][:]          # (r, 1, Mp, 1, 1) host-shaped
        twi = table_refs[2 * ti + 1][:]
        xr = (ar * twr - ai * twi).reshape(-1, *tail)
        xi = (ar * twi + ai * twr).reshape(-1, *tail)
    return xr, xi


def _outer_kernel(n, tr, nz, out_dtype, tabs, inverse, in_rows, qrows,
                  *refs):
    xr_ref, xi_ref = refs[:2]
    or_ref, oi_ref = refs[-2:]
    table_refs = refs[2:-2]
    xr = xr_ref[0].astype(jnp.float32)        # (n | in_len, tr, nz)
    xi = xi_ref[0].astype(jnp.float32)
    if in_rows and xr.shape[0] > qrows:
        xr, xi = xr[:qrows], xi[:qrows]
    elif xr.shape[0] < qrows:
        pads = ((0, qrows - xr.shape[0]),) + ((0, 0),) * 2
        xr = jnp.pad(xr, pads)
        xi = jnp.pad(xi, pads)
    xr, xi = _outer_apply_stages(xr, xi, (tr, nz), table_refs, tabs,
                                 inverse, in_rows=in_rows)
    keep = or_ref.shape[1]   # < n: discarded-row writes elided
    or_ref[0] = xr.reshape(n, tr, nz)[:keep].astype(out_dtype)
    oi_ref[0] = xi.reshape(n, tr, nz)[:keep].astype(out_dtype)


def _outer_tr(n: int, r_dim: int, nz: int) -> int:
    """Rows of the R dim per block: largest divisor of R with
    n*tr*nz f32 state <= ~2MB per plane component, preferring sublane-tile
    multiples (DMA-friendly (8, nz) tiles)."""
    budget = max(1, (2 << 20) // (4 * n * nz))
    cap = min(r_dim, budget)
    # prefer the largest 8-multiple divisor; else the largest divisor
    cands = [t for t in range(8, cap + 1, 8) if r_dim % t == 0]
    if cands:
        return cands[-1]
    cands = [t for t in range(1, cap + 1) if r_dim % t == 0]
    return cands[-1] if cands else 1


def outer_available(n: int, r_dim: int, nz: int,
                    dtype_name: str = "float32") -> bool:
    """Can the outer-axis kernel transform dim 1 of (P, n, R, nz)?  Block
    legality: the R-window (second-minor block dim) must be an 8-multiple or
    the whole R; sublane efficiency wants tr >= 8 (a (tr < 8, nz) tile wastes
    the sublane dim of every vreg)."""
    if _outer_plan(n) is None or nz % 128 or dtype_name != "float32":
        return False
    tr = _outer_tr(n, r_dim, nz)
    return tr % 8 == 0 or tr == r_dim


@functools.lru_cache(maxsize=256)
def _build_outer_call(n: int, inverse: bool, p: int, r_dim: int, nz: int,
                      interpret: bool, dtype_name: str = "float32",
                      donate: bool = False, scale: float = 1.0,
                      in_keep: int = 0, out_keep: int = 0):
    """Transform dim 1 of (P, n, R, nz) planes in the natural layout.
    ``in_keep``/``out_keep``: row-prefix zero-pad elision on the transform
    dim (the declared-zero tail is never DMA'd / the discarded tail never
    written; stage 1 prunes its dead digit terms)."""
    dtype = jnp.dtype(dtype_name)
    rads = _outer_plan(n)
    r1 = rads[0]
    mp1 = n // r1
    q1 = min(r1, -(-in_keep // mp1)) if in_keep else r1
    prune = in_keep and q1 < r1
    in_rows_eff = in_keep if prune else 0
    qrows = q1 * mp1 if prune else n
    tabs = _outer_tables(n, inverse, scale=scale)
    tr = _outer_tr(n, r_dim, nz)
    in_len = in_keep or n
    # outer-dim windows need no lane-tile rounding, but keep sublane-tile
    # multiples for clean DMA
    if in_len < n and in_len % 8:
        in_len = min(n, -(-in_len // 8) * 8)
    out_len = out_keep or n
    kernel = functools.partial(_outer_kernel, n, tr, nz, dtype, tabs,
                               inverse, in_rows_eff, qrows)
    spec_in = pl.BlockSpec((1, in_len, tr, nz), lambda b, t: (b, 0, t, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, out_len, tr, nz), lambda b, t: (b, 0, t, 0),
                            memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b, t: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs = [spec_in, spec_in]
    np_tables = []
    for twr, twi, r, L0, Mp in tabs:
        # host-shaped rank-5 (r, 1, Mp, 1, 1): in-kernel minor-crossing
        # reshapes are Mosaic-illegal (e43); leading-dim rank-5 broadcasts
        # are fine (e43b)
        t5r = twr.reshape(r, 1, Mp, 1, 1)
        t5i = twi.reshape(r, 1, Mp, 1, 1)
        in_specs += [const(t5r), const(t5i)]
        np_tables += [t5r, t5i]
    # VPU flop estimate: radix-4/2 ~12 ops/pt/stage, generic r ~6r
    vpu_ops = sum(12 if r in (2, 4) else 6 * r for r in rads)
    kw = {
        "cost_estimate": pl.CostEstimate(
            flops=2 * p * r_dim * nz * n * vpu_ops,
            transcendentals=0,
            bytes_accessed=dtype.itemsize * 2 * p * r_dim * nz
            * (in_len + out_len)),
    }
    if donate and not interpret and in_len == n and out_len == n:
        kw["input_output_aliases"] = {0: 0, 1: 1}
    call = pl.pallas_call(
        kernel, grid=(p, r_dim // tr),
        in_specs=in_specs, out_specs=[spec_out, spec_out],
        out_shape=[jax.ShapeDtypeStruct((p, out_len, r_dim, nz), dtype)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(2),
        **kw)

    def run(xr, xi):
        a, b = call(xr, xi, *(jnp.asarray(t) for t in np_tables))
        return a, b

    return run


def outer_fft_planar(xr, xi, n: int, inverse: bool, donate: bool = False,
                     scale: float = 1.0, in_keep: int = 0,
                     out_keep: int = 0):
    """Natural-layout DFT over dim 1 of (P, n, R, nz) planes — the outer-axis
    kernel (no XLA relayout either side, unlike the (P, n, S) strided view).
    ``in_keep``/``out_keep``: row-prefix elision; with ``out_keep`` the
    returned dim-1 extent is out_keep."""
    p, rows, r_dim, nz = xr.shape
    run = _build_outer_call(n, inverse, p, r_dim, nz, _INTERPRET,
                            str(xr.dtype), donate=donate, scale=scale,
                            in_keep=in_keep, out_keep=out_keep)
    return run(xr, xi)


@functools.lru_cache(maxsize=256)
def _sep_twiddle(rows: int, stride: int, s: int, n: int, inverse: bool):
    """One separable factor of the four-step inter-pass twiddle:
    exp(+-2*pi*i * (row * stride * s_idx mod n) / n), shape (rows, s).
    The full twiddle w_n^(kc * is) factorizes exactly over the digits of kc
    because the exponent is linear in each digit — O((d1+d2)*S) storage
    instead of the reference's full O(N) LUT (``vkFFT_ManageLUT.h``)."""
    sign = 2.0j if inverse else -2.0j
    r = np.arange(rows, dtype=np.int64)[:, None] * stride
    ss = np.arange(s, dtype=np.int64)[None, :]
    tw = np.exp(sign * np.pi / n * ((r * ss) % n))
    return np.real(tw).astype(np.float32), np.imag(tw).astype(np.float32)


# ---------------------------------------------------------------------------
# Long-sequence multi-upload four-step (reference numPasses>1 regime,
# ``vkFFT_Scheduler.h:2590-2650``): N = Nc * Ns with both factors handled by
# the single-kernel paths.  The axis is viewed as (Nc, Ns); a strided pass
# transforms Nc in place (trailing batch = Ns fills the lanes), an
# elementwise inter-pass twiddle w_N^(kc*ns) follows (reference LUT_4step),
# then a contiguous pass transforms Ns.  Natural output order needs the
# final (kc, ks) -> (ks, kc) reorder; order='swapped' keeps kc-major and
# skips it (disableReorderFourStep semantics) — fwd+inv pairs cancel.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _divisors(n: int) -> tuple:
    """Sorted divisors of n from its prime factorization (n can be 2^32+;
    trial-division enumeration would be quadratically slow here)."""
    from collections import Counter
    divs = [1]
    for p, e in Counter(prime_factors(n)).items():
        divs = [d * p**k for d in divs for k in range(e + 1)]
    return tuple(sorted(divs))


@functools.lru_cache(maxsize=512)
def split_long(n: int) -> Optional[tuple[int, int]]:
    """(Nc, Ns): strided-factor x contiguous-factor.

    Round 3: prefer Nc in {128, 256, 512, 1024} with a v3-plannable Ns —
    then the contiguous stage's transposed-intermediate (tl) write IS the
    four-step natural-order reorder (gb == Nc makes the (steps, Ns, gb)
    output exactly the (B, Ns, Nc) layout), eliminating the separate XLA
    transpose pass, and the stage itself runs the v3 pipeline.  Otherwise:
    the v2 rule (Ns as large as possible)."""
    for nc in (128, 256, 512, 1024):
        if n % nc == 0:
            ns = n // nc
            if 1 < ns <= _V3_MAX_N and _use_v3(ns) and _use_v3(nc):
                return (nc, ns)
    for ns in reversed(_divisors(n)):
        if ns > MAX_SINGLE_KERNEL_N or ns >= n:
            continue
        nc = n // ns
        if nc <= MAX_SINGLE_KERNEL_N and _use_v2(ns) and _use_v2(nc):
            return (nc, ns)
    return None


@functools.lru_cache(maxsize=512)
def split_long3(n: int) -> Optional[tuple[int, int, int]]:
    """(Na, Nb, Ns) three-upload split for axes beyond the 2-level range —
    the reference's third upload (``axisSplit``, ``vkFFT_Scheduler.h:
    2590-2893``; axis ceiling 2^32, README.md:8).  Each factor must be a
    v2-supported single-kernel length."""
    divs = _divisors(n)
    for ns in reversed(divs):
        if ns > MAX_SINGLE_KERNEL_N or ns >= n or not _use_v2(ns):
            continue
        m = n // ns
        if m > MAX_SINGLE_KERNEL_N * MAX_SINGLE_KERNEL_N:
            continue
        # near-square (Na, Nb) split of the remaining factor
        best = None
        for na in _divisors(m):
            if na <= 1 or na > MAX_SINGLE_KERNEL_N:
                continue
            nb = m // na
            if nb <= MAX_SINGLE_KERNEL_N and _use_v2(na) and _use_v2(nb):
                if best is None or abs(na - nb) < abs(best[0] - best[1]):
                    best = (na, nb)
        if best is not None:
            return (best[0], best[1], ns)
    return None


def fft_long_planar(xr, xi, n: int, inverse: bool, order: str = "natural",
                    scale: float = 1.0):
    """DFT of (B, n) planar lines for n beyond the single-kernel range.
    The inter-pass twiddle is fused into the strided kernel (post-multiply on
    the forward write, pre-multiply on the inverse read) as separable digit
    factors — no separate elementwise HBM pass and no O(n) twiddle table.
    ``scale`` folds into the last kernel of the pipeline."""
    if split_long(n) is None:
        return _fft_long3_planar(xr, xi, n, inverse, order, scale)
    nc, ns = split_long(n)
    B = xr.shape[0]
    c1, c2 = split_lane_major(nc)

    if not inverse:
        # post twiddle on the strided OUTPUT block (1, c1, c2, ts):
        # kc = a*c2 + b -> A[a, is] = w_n^(a*c2*is), B[b, is] = w_n^(b*is)
        fa = _sep_twiddle(c1, c2, ns, n, False)
        fb = _sep_twiddle(c2, 1, ns, n, False)
        run = _build_strided_call(nc, False, B, ns, _INTERPRET, str(xr.dtype),
                                  fused="post",
                                  factors=(("dim1", c1), ("dim2", c2)))
        tr, ti = run(xr.reshape(B, nc, ns), xi.reshape(B, nc, ns),
                     jnp.asarray(fa[0]), jnp.asarray(fa[1]),
                     jnp.asarray(fb[0]), jnp.asarray(fb[1]))   # (B, kc, ns)
        tl_ok = (order == "natural" and nc % _V3_SB == 0
                 and nc // _V3_SB in (1, 2, 4, 8) and _use_v3(ns))
        if tl_ok:
            # free four-step reorder (round 3): the tl write with gb == nc
            # makes the contiguous stage's output exactly the natural
            # (B, Ns, Nc) layout — no XLA transpose pass
            run = _build_fft_call_v3(ns, False, B * nc, _INTERPRET,
                                     str(tr.dtype), out_tl=True,
                                     scale=scale, force_il=nc // _V3_SB)
            orr, oi = run(tr.reshape(B * nc, ns), ti.reshape(B * nc, ns))
            return orr.reshape(B, n), oi.reshape(B, n)
        if _use_v3(ns):
            # natural-order-native contiguous stage (round 3; v2's natural
            # path pays a digit-reorder pass)
            orr, oi = core_fft_planar_v3(tr.reshape(B * nc, ns),
                                         ti.reshape(B * nc, ns), ns, False,
                                         scale=scale)
        elif _use_v2(ns):
            orr, oi = core_fft_planar_v2(tr.reshape(B * nc, ns),
                                         ti.reshape(B * nc, ns), ns, False,
                                         order="natural", donate=True,
                                         scale=scale)
        else:
            orr, oi = core_fft_planar(tr.reshape(B * nc, ns),
                                      ti.reshape(B * nc, ns), ns, False,
                                      scale=scale)
        orr = orr.reshape(B, nc, ns)
        oi = oi.reshape(B, nc, ns)
        if order == "natural":
            orr = orr.swapaxes(1, 2).reshape(B, n)             # (B, ks, kc)
            oi = oi.swapaxes(1, 2).reshape(B, n)
        else:
            orr = orr.reshape(B, n)
            oi = oi.reshape(B, n)
        return orr, oi

    # inverse: mirror pipeline
    tl_ok = (order == "natural" and nc % _V3_SB == 0
             and nc // _V3_SB in (1, 2, 4, 8) and _use_v3(ns))
    if tl_ok:
        # the natural (B, Ns, Nc) view IS the tl input layout — no
        # transpose, no swapaxes (mirror of the forward's free reorder)
        run = _build_fft_call_v3(ns, True, B * nc, _INTERPRET,
                                 str(xr.dtype), in_tl=True,
                                 force_il=nc // _V3_SB)
        br, bi = run(xr.reshape(B, ns, nc), xi.reshape(B, ns, nc))
        br = br.reshape(B, nc, ns)
        bi = bi.reshape(B, nc, ns)
    else:
        if order == "natural":
            xr = xr.reshape(B, ns, nc).swapaxes(1, 2)
            xi = xi.reshape(B, ns, nc).swapaxes(1, 2)
        else:
            xr = xr.reshape(B, nc, ns)
            xi = xi.reshape(B, nc, ns)
        if _use_v3(ns):
            br, bi = core_fft_planar_v3(xr.reshape(B * nc, ns),
                                        xi.reshape(B * nc, ns), ns, True)
        else:
            br, bi = core_fft_planar(xr.reshape(B * nc, ns),
                                     xi.reshape(B * nc, ns), ns, True)
        br = br.reshape(B, nc, ns)
        bi = bi.reshape(B, nc, ns)
    # pre twiddle on the strided INPUT block (1, c2, c1, ts):
    # kc = a*c1 + b with a in [c2] -> A[a, is] = w*(a*c1*is), B[b, is]
    fa = _sep_twiddle(c2, c1, ns, n, True)
    fb = _sep_twiddle(c1, 1, ns, n, True)
    run = _build_strided_call(nc, True, B, ns, _INTERPRET, str(xr.dtype),
                              fused="pre",
                              factors=(("dim1", c2), ("dim2", c1)),
                              scale=scale)
    orr, oi = run(br, bi, jnp.asarray(fa[0]), jnp.asarray(fa[1]),
                  jnp.asarray(fb[0]), jnp.asarray(fb[1]))
    return orr.reshape(B, n), oi.reshape(B, n)


def _fft_long3_planar(xr, xi, n: int, inverse: bool, order: str = "natural",
                      scale: float = 1.0):
    """Three-upload four-step for axes beyond the 2-level range (~2^28),
    matching the reference's numPasses==3 regime (``vkFFT_Scheduler.h:
    2590-2893``; axis ceiling 2^32, README.md:8).

    Forward dataflow, n = Na*Nb*Ns with x viewed (B, ja, jb, js):
      1. strided DFT over ja, fused post-twiddle w_{NaNb}^(ka*jb)
      2. strided DFT over jb, fused post-twiddle w_n^((kb*Na+ka)*js)
      3. contiguous DFT over js
    Output digits (ka, kb, ks); natural order is one (B,ka,kb,ks) ->
    (B,ks,kb,ka) transpose.  All twiddles ride the kernels as separable
    digit factors — there is no O(n) table at any point.
    """
    sp = split_long3(n)
    if sp is None:
        raise ValueError(f"no long-path split for n={n}")
    na, nb, ns = sp
    nc = na * nb
    B = xr.shape[0]
    a1, a2 = split_lane_major(na)
    b1, b2 = split_lane_major(nb)
    dt = str(xr.dtype)

    if not inverse:
        # pass 1 over ja, trailing S1 = nb*ns; inner twiddle depends on
        # jb = S1_idx // ns only (column factors)
        ca = _sep_twiddle(a1, a2, nb, nc, False)   # rows ka-slow digit
        cb = _sep_twiddle(a2, 1, nb, nc, False)
        run1 = _build_strided_call(
            na, False, B, nb * ns, _INTERPRET, dt, fused="post",
            factors=(("dim1_col", a1, nb), ("dim2_col", a2, nb)))
        tr, ti = run1(xr.reshape(B, na, nb * ns), xi.reshape(B, na, nb * ns),
                      jnp.asarray(ca[0]), jnp.asarray(ca[1]),
                      jnp.asarray(cb[0]), jnp.asarray(cb[1]))  # (B, ka, nb*ns)

        # pass 2 over jb, P = B*na (ka fast); outer twiddle w_n^(kc*is),
        # kc = kb*na + ka with kb = u*b2 + v
        fu = _sep_twiddle(b1, b2 * na, ns, n, False)
        fv = _sep_twiddle(b2, na, ns, n, False)
        fk = _sep_twiddle(na, 1, ns, n, False)
        run2 = _build_strided_call(
            nb, False, B * na, ns, _INTERPRET, dt, fused="post",
            factors=(("dim1", b1), ("dim2", b2), ("grid_mod", na)))
        tr, ti = run2(tr.reshape(B * na, nb, ns), ti.reshape(B * na, nb, ns),
                      jnp.asarray(fu[0]), jnp.asarray(fu[1]),
                      jnp.asarray(fv[0]), jnp.asarray(fv[1]),
                      jnp.asarray(fk[0]), jnp.asarray(fk[1]))  # (B*na, kb, ns)

        orr, oi = core_fft_planar_v2(tr.reshape(B * nc, ns),
                                     ti.reshape(B * nc, ns), ns, False,
                                     order="natural", donate=True,
                                     scale=scale)
        orr = orr.reshape(B, na, nb, ns)
        oi = oi.reshape(B, na, nb, ns)
        if order == "natural":
            orr = orr.transpose(0, 3, 2, 1).reshape(B, n)
            oi = oi.transpose(0, 3, 2, 1).reshape(B, n)
        else:
            orr = orr.reshape(B, n)
            oi = oi.reshape(B, n)
        return orr, oi

    # inverse: exact mirror
    if order == "natural":
        xr = xr.reshape(B, ns, nb, na).transpose(0, 3, 2, 1)
        xi = xi.reshape(B, ns, nb, na).transpose(0, 3, 2, 1)
    xr = xr.reshape(B * nc, ns)
    xi = xi.reshape(B * nc, ns)
    br, bi = core_fft_planar_v2(xr, xi, ns, True, order="natural")

    fu = _sep_twiddle(b2, b1 * na, ns, n, True)   # pre layout: dim1 = b2 rows
    fv = _sep_twiddle(b1, na, ns, n, True)
    fk = _sep_twiddle(na, 1, ns, n, True)
    run2 = _build_strided_call(
        nb, True, B * na, ns, _INTERPRET, dt, fused="pre",
        factors=(("dim1", b2), ("dim2", b1), ("grid_mod", na)))
    br, bi = run2(br.reshape(B * na, nb, ns), bi.reshape(B * na, nb, ns),
                  jnp.asarray(fu[0]), jnp.asarray(fu[1]),
                  jnp.asarray(fv[0]), jnp.asarray(fv[1]),
                  jnp.asarray(fk[0]), jnp.asarray(fk[1]))

    ca = _sep_twiddle(a2, a1, nb, nc, True)       # pre layout: dim1 = a2 rows
    cb = _sep_twiddle(a1, 1, nb, nc, True)
    run1 = _build_strided_call(
        na, True, B, nb * ns, _INTERPRET, dt, fused="pre",
        factors=(("dim1_col", a2, nb), ("dim2_col", a1, nb)), scale=scale)
    orr, oi = run1(br.reshape(B, na, nb * ns), bi.reshape(B, na, nb * ns),
                   jnp.asarray(ca[0]), jnp.asarray(ca[1]),
                   jnp.asarray(cb[0]), jnp.asarray(cb[1]))
    return orr.reshape(B, n), oi.reshape(B, n)


# ---------------------------------------------------------------------------
# Fused convolution kernel: pointwise spectrum multiply folded into the
# inverse transform (the reference's signature fusion — convolution executed
# inside the last-axis kernel with an inline inverse FFT,
# ``vkFFT_FFT.h:241-351`` / ``appendKernelConvolution``).  Consumes
# swapped-order spectra, multiplies by a swapped-order table, emits natural
# order: a full circular convolution is two kernels / two HBM round trips.
# ---------------------------------------------------------------------------


def _conv_inv_kernel(n1, n2, tb, out_dtype, prec, has_dc, *refs):
    if has_dc:
        (xr_ref, xi_ref, cr_ref, ci_ref, dcr_ref, dci_ref,
         rsub_ref, mlane_ref, twr_ref, twi_ref, or_ref, oi_ref) = refs
    else:
        (xr_ref, xi_ref, cr_ref, ci_ref,
         rsub_ref, mlane_ref, twr_ref, twi_ref, or_ref, oi_ref) = refs
    cr = cr_ref[:]
    ci = ci_ref[:]
    xr0 = xr_ref[:].astype(jnp.float32)
    xi0 = xi_ref[:].astype(jnp.float32)
    xr = xr0 * cr[None] - xi0 * ci[None]
    xi = xr0 * ci[None] + xi0 * cr[None]
    # inverse v2 flow (lane matmul -> conj twiddle -> sublane matmul)
    twr = twr_ref[:]
    twi = twi_ref[:]
    if n1 > 1:
        z2 = jnp.concatenate([xr, xi], axis=2)
        y2 = jax.lax.dot_general(z2, mlane_ref[:], (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        ar, ai = y2[..., :n1], y2[..., n1:]
    else:
        ar, ai = xr, xi
    tr = ar * twr[None] - ai * twi[None]
    ti = ar * twi[None] + ai * twr[None]
    if n2 > 1:
        z = jnp.concatenate([tr, ti], axis=1)
        y = jax.lax.dot_general(rsub_ref[:], z, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        outr = jnp.swapaxes(y[:n2], 0, 1)
        outi = jnp.swapaxes(y[n2:], 0, 1)
    else:
        outr, outi = tr, ti
    if has_dc:
        # per-line additive constant fused into the store (the Rader x0
        # term, round 5 — kills the separate XLA add pass)
        outr = outr + dcr_ref[:].astype(jnp.float32)[:, :, None]
        outi = outi + dci_ref[:].astype(jnp.float32)[:, :, None]
    or_ref[:] = outr.astype(out_dtype)
    oi_ref[:] = outi.astype(out_dtype)


@functools.lru_cache(maxsize=256)
def _build_conv_inv_call(n: int, batch: int, interpret: bool,
                         dtype_name: str = "float32", with_dc: bool = False):
    dtype = jnp.dtype(dtype_name)
    n1, n2 = split_lane_major(n)
    rsub, mlane, twr, twi = _v2_tables(n, True)
    tb = _v2_lines_per_block(n)
    pad = (-batch) % tb
    padded = batch + pad
    lane = 128 if (n1 < 128 and not interpret) else n1
    if lane != n1:
        m_pad = np.zeros((2 * lane, 2 * lane), dtype=np.float32)
        m_pad[:n1, :n1] = mlane[:n1, :n1]
        m_pad[:n1, lane:lane + n1] = mlane[:n1, n1:]
        m_pad[lane:lane + n1, :n1] = mlane[n1:, :n1]
        m_pad[lane:lane + n1, lane:lane + n1] = mlane[n1:, n1:]
        mlane = m_pad
        twr = np.pad(twr, ((0, 0), (0, lane - n1)))
        twi = np.pad(twi, ((0, 0), (0, lane - n1)))

    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    kernel = functools.partial(_conv_inv_kernel, lane, n2, tb, dtype, prec,
                               with_dc)
    spec = pl.BlockSpec((tb, n2, lane), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    dc_spec = pl.BlockSpec((tb, 1), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
    kw = {} if interpret else {"input_output_aliases": {0: 0, 1: 1}}
    in_specs = [spec, spec, const((n2, lane)), const((n2, lane))]
    if with_dc:
        in_specs += [dc_spec, dc_spec]
    in_specs += [const(rsub.shape), const(mlane.shape),
                 const(twr.shape), const(twi.shape)]
    call = pl.pallas_call(
        kernel,
        grid=(padded // tb,),
        in_specs=in_specs,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((padded, n2, lane), dtype)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        **kw,
    )

    def run(xr, xi, cr, ci, dcr=None, dci=None):
        # x arrives in swapped (B, n2, lane) layout from the forward kernel
        if pad:
            xr = jnp.pad(xr, ((0, pad), (0, 0), (0, 0)))
            xi = jnp.pad(xi, ((0, pad), (0, 0), (0, 0)))
        args = [xr, xi, cr, ci]
        if with_dc:
            if pad:
                dcr = jnp.pad(dcr, ((0, pad), (0, 0)))
                dci = jnp.pad(dci, ((0, pad), (0, 0)))
            args += [dcr, dci]
        orr, oi = call(*args, jnp.asarray(rsub), jnp.asarray(mlane),
                       jnp.asarray(twr), jnp.asarray(twi))
        if lane != n1:
            orr = orr[..., :n1]
            oi = oi[..., :n1]
        return (orr[:batch].reshape(batch, n), oi[:batch].reshape(batch, n))

    return run, lane, n1, n2, tb


def conv_fused_planar(x: Planar, n: int, table: np.ndarray,
                      normalize: bool = True) -> Planar:
    """Circular convolution of (B, n) planar lines with a fixed kernel whose
    *natural-order* spectrum is ``table`` — two fused kernels total (forward
    swapped, multiply+inverse), no intermediate spectrum round trip."""
    n1, n2 = split_lane_major(n)
    B = x.shape[0]
    run, lane, _, _, _ = _build_conv_inv_call(n, B, _INTERPRET, str(x.dtype))
    # forward in swapped order, raw (B, n2, lane-padded?) — rebuild the v2
    # forward's padded layout
    fr, fi = core_fft_planar_v2(x.re, x.im, n, False, order="swapped")
    fr = fr.reshape(B, n2, n1)
    fi = fi.reshape(B, n2, n1)
    if lane != n1:
        fr = jnp.pad(fr, ((0, 0), (0, 0), (0, lane - n1)))
        fi = jnp.pad(fi, ((0, 0), (0, 0), (0, lane - n1)))
    tab_sw = np.ascontiguousarray(table.reshape(n1, n2).T)        # (n2, n1)
    if lane != n1:
        tab_sw = np.pad(tab_sw, ((0, 0), (0, lane - n1)))
    scale = (1.0 / n) if normalize else 1.0
    cr = jnp.asarray((np.real(tab_sw) * scale).astype(np.float32))
    ci = jnp.asarray((np.imag(tab_sw) * scale).astype(np.float32))
    orr, oi = run(fr, fi, cr, ci)
    return Planar(orr, oi)


# ---------------------------------------------------------------------------
# Single-kernel fused convolution on the v3 layout: forward stages ->
# spectrum multiply -> inverse stages, all inside one Pallas kernel — one
# HBM read + one write for the whole circular convolution, matching the
# reference's in-kernel form (``vkFFT_FFT.h:241-351``: read -> staged FFT ->
# ``appendKernelConvolution`` -> inline inverse stage loop -> write).
#
# Three table modes:
#   scalar 1-D   — table (n,) baked as a (n, 1) VMEM constant
#   N-D rows     — the last-axis pass of an N-D convolution: each line block
#                  multiplies by its own rows of the full N-D spectrum; the
#                  (n, ZY)-transposed table is block-sliced by the grid index
#                  (``appendKernelConvolution`` reads the kernel buffer at
#                  the same strided index as the data)
#   matrix m x m — coordinate planes ride a leading block dim; the per-
#                  frequency m x m complex matrix multiply mixes the m
#                  forward spectra before the inline inverse (reference
#                  scalar/2x2/3x3 kernels, vkFFT_Convolution.h:125)
# ---------------------------------------------------------------------------


def _conv_v3_kernel(n, sb, m, il, rows, out_dtype, prec, conj_data, xpow,
                    post_scale, fwd_tabs, inv_tabs, n_fwd, n_inv, blu,
                    blu_live, qrows, *refs):
    xr_ref, xi_ref = refs[0], refs[1]
    fwd_refs = refs[2:2 + n_fwd]
    inv_refs = refs[2 + n_fwd:2 + n_fwd + n_inv]
    cr_ref, ci_ref = refs[2 + n_fwd + n_inv:4 + n_fwd + n_inv]
    if blu:
        ar_ref, ai_ref = refs[4 + n_fwd + n_inv:6 + n_fwd + n_inv]
    or_ref, oi_ref = refs[-2:]
    fwd_vpu, fwd_mxu = fwd_tabs
    inv_vpu, inv_mxu = inv_tabs

    # ``il`` independent sb-line pipelines per grid step (round 5 — the
    # same Mosaic MXU/VPU-overlap economics as the v3 FFT kernel, E9/E10;
    # the conv kernel ran single-chain through round 4)
    for slab in range(il):
        ssl = slice(slab * sb, (slab + 1) * sb)
        spectra = []
        for i in range(m):
            # scalar modes: (1, il*sb, n) blocks; matrix mode: (sb, m, n)
            # blocks sliced per coordinate plane (no XLA-level transpose of
            # the caller's (..., m, n) layout is needed)
            if m == 1:
                xr0, xi0 = xr_ref[0, ssl], xi_ref[0, ssl]
            else:
                xr0, xi0 = xr_ref[:, i, :], xi_ref[:, i, :]
            xr = jnp.swapaxes(xr0.astype(jnp.float32), 0, 1)  # (n|blu, sb)
            xi = jnp.swapaxes(xi0.astype(jnp.float32), 0, 1)
            if blu:
                # fused Bluestein (reference appendBluesteinMultiplication,
                # vkFFT_Bluestein.h:32): chirp pre-multiply on the read
                # path; the chirp-pad region [blu, n) never leaves HBM and
                # only the q live stage-1 chunks materialize (pruned first
                # stage).  A declared-zero input tail [blu_live, blu)
                # (round 5, zeropad_input through a Bluestein plan) narrows
                # the read window and deepens the prune.
                ar = ar_ref[...].astype(jnp.float32)          # (blu, 1)
                ai = ai_ref[...].astype(jnp.float32)
                rin = xr.shape[0]
                xr, xi = xr * ar[:rin] - xi * ai[:rin], \
                    xr * ai[:rin] + xi * ar[:rin]
                if rin > qrows:
                    xr, xi = xr[:qrows], xi[:qrows]
                elif rin < qrows:
                    pads = ((0, qrows - rin), (0, 0))
                    xr = jnp.pad(xr, pads)
                    xi = jnp.pad(xi, pads)
            fr, fi = _v3_apply_stages(xr, xi, sb, fwd_refs, fwd_vpu,
                                      fwd_mxu, prec, False,
                                      in_rows=blu_live)
            fr = fr.reshape(n, sb)
            fi = fi.reshape(n, sb)
            if conj_data:
                fi = -fi
            spectra.append((fr, fi))

        for o in range(m):
            yr = yi = None
            for i in range(m):
                if m > 1:
                    kr = cr_ref[:, o * m + i:o * m + i + 1]
                    ki = ci_ref[:, o * m + i:o * m + i + 1]
                elif rows > 1:
                    # per-slab table columns: the block carries either a
                    # window of the (n, rows) table (rows % (sb*il) == 0)
                    # or the whole table ((sb*il) % rows == 0; the slab
                    # offset is then static)
                    if cr_ref.shape[1] > sb:
                        c0 = (slab * sb) % cr_ref.shape[1]
                        kr = cr_ref[:, c0:c0 + sb]
                        ki = ci_ref[:, c0:c0 + sb]
                    else:
                        kr = cr_ref[...]
                        ki = ci_ref[...]
                else:
                    kr = cr_ref[...]                          # (n, 1)
                    ki = ci_ref[...]
                kr = kr.astype(jnp.float32)
                ki = ki.astype(jnp.float32)
                fr, fi = spectra[i]
                tr = fr * kr - fi * ki
                ti = fr * ki + fi * kr
                yr = tr if yr is None else yr + tr
                yi = ti if yi is None else yi + ti
            if xpow:
                mag = jax.lax.rsqrt(yr * yr + yi * yi + 1e-30)
                yr = yr * mag
                yi = yi * mag
            br, bi = _v3_apply_stages(yr, yi, sb, inv_refs, inv_vpu,
                                      inv_mxu, prec, True)
            br = br.reshape(n, sb)
            bi = bi.reshape(n, sb)
            if blu:
                # fused Bluestein write path: crop to the live prefix (the
                # padded tail is never written) + chirp post-multiply
                br, bi = br[:blu], bi[:blu]
                br, bi = br * ar - bi * ai, br * ai + bi * ar
            if post_scale != 1.0:
                s = jnp.float32(post_scale)
                br = br * s
                bi = bi * s
            if m == 1:
                or_ref[0, ssl] = jnp.swapaxes(br, 0, 1).astype(out_dtype)
                oi_ref[0, ssl] = jnp.swapaxes(bi, 0, 1).astype(out_dtype)
            else:
                or_ref[:, o, :] = jnp.swapaxes(br, 0, 1).astype(out_dtype)
                oi_ref[:, o, :] = jnp.swapaxes(bi, 0, 1).astype(out_dtype)


@functools.lru_cache(maxsize=256)
def _build_conv_v3_call(n: int, batch: int, interpret: bool,
                        dtype_name: str = "float32", m: int = 1,
                        rows: int = 1, conj_data: bool = False,
                        xpow: bool = False, post_scale: float = 1.0,
                        blu: int = 0, blu_in: int = 0, plan=None):
    """One-kernel circular convolution of ``batch`` lines of length n.

    ``m`` > 1: matrix convolution — operands are (batch, m, n) planes and
    the table is an (n, m*m) host array (column o*m+i = K[o, i] spectrum).
    ``rows`` > 1: N-D last-axis mode — the table is (n, rows) and line j
    multiplies by column j %% rows (requires sb | rows).
    ``post_scale`` != 1: in-kernel multiply after the inverse stages (used
    with ``xpow`` where a table scale would cancel in Y/|Y|; otherwise
    callers bake normalization into the table).

    ``blu`` > 0: fused Bluestein mode — the operands are (1, batch, blu)
    planes of the ORIGINAL (unpadded) length; the kernel multiplies by the
    chirp on its read path, runs the padded n-point convolution with a
    pruned first stage (the [blu, n) pad never exists anywhere), crops to
    blu on the write path and chirp-post-multiplies.  HBM traffic is 2*blu
    per line instead of ~2*n + 4 extra XLA passes — the reference's
    in-kernel structure (``vkFFT_Bluestein.h:32,201``)."""
    dtype = jnp.dtype(dtype_name)
    _i8 = _V3_MXU_INT8 and dtype == jnp.float32
    if blu:
        assert m == 1 and rows == 1, (m, rows)
        live = blu_in or blu   # declared-zero tail narrows the live prefix
        q1 = _v3_prune_q(n, live, plan)
        r1, mp1 = _v3_first_stage(n, plan)
        qrows = q1 * mp1 if q1 < r1 else n
        in_rows = live if q1 < r1 else 0
    else:
        qrows, in_rows = n, 0
    fwd_tabs = _v3_tables(n, False, plan=plan, int8=_i8, in_rows=in_rows)
    inv_tabs = _v3_tables(n, True, plan=plan, int8=_i8)
    sb = _V3_SB
    # il interleaved sb-line pipelines per step (round 5 — the v3 kernel's
    # MXU/VPU-overlap rule; 8MB in-kernel f32 state budget).  rows > 1
    # constrains il so each slab's table columns stay block-static.
    il = 1
    io_len_ = blu or n
    if m == 1 and _V3_IL_OVERRIDE:
        il = _V3_IL_OVERRIDE   # tests / experiments (works under interpret)
    elif m == 1 and not interpret:
        # cap 4 (not the FFT kernels' 8): each conv slab unrolls TWO stage
        # sets, and an il=8 conv kernel (16 staged pipelines) blows up the
        # Mosaic compile (round 5: a 10006-constituent compile ran >30 min)
        while (il < 4 and io_len_ * (2 * il) * sb * 4 < (8 << 20)
               and batch >= 2 * il * sb
               and (rows == 1 or rows % (sb * il * 2) == 0
                    or (sb * il * 2) % rows == 0)):
            il *= 2
    gb = sb * il
    pad = (-batch) % gb
    padded = batch + pad
    if rows > 1:
        assert m == 1 and rows % sb == 0, (rows, sb, batch)
        assert rows % gb == 0 or gb % rows == 0, (rows, gb)
    prec = _PRECISION if dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    def np_tables(tabs):
        out = []
        for twr, twi, *_ in tabs[0]:
            out += [twr, twi]
        for Dp, twr, twi, r, L0, Mp in tabs[1]:
            out += _mxu_const_arrays(Dp)
            if Mp > 1:
                out += [twr, twi]
        return out

    fwd_np = np_tables(fwd_tabs)
    inv_np = np_tables(inv_tabs)
    kernel = functools.partial(_conv_v3_kernel, n, sb, m, il, rows, dtype,
                               prec, conj_data, xpow, post_scale,
                               fwd_tabs, inv_tabs, len(fwd_np), len(inv_np),
                               blu if in_rows or blu else 0, in_rows, qrows)

    io_len = blu or n
    # read window: the declared-zero tail [blu_in, blu) is never DMA'd
    # (lane-tile legality: round up; the extra columns are declared zeros)
    in_l = io_len
    if blu and blu_in and blu_in < blu:
        in_l = min(blu, -(-blu_in // 128) * 128)
    if m == 1:
        spec_in_m1 = pl.BlockSpec((1, gb, in_l), lambda b: (0, b, 0),
                                  memory_space=pltpu.VMEM)
        spec = pl.BlockSpec((1, gb, io_len), lambda b: (0, b, 0),
                            memory_space=pltpu.VMEM)
        out_struct = jax.ShapeDtypeStruct((1, padded, io_len), dtype)
    else:
        spec = pl.BlockSpec((sb, m, n), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        out_struct = jax.ShapeDtypeStruct((padded, m, n), dtype)
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    if rows > 1:
        if rows % gb == 0:
            tab_spec = pl.BlockSpec((n, gb), lambda b: (0, b % (rows // gb)),
                                    memory_space=pltpu.VMEM)
        else:   # gb % rows == 0: whole table resident, slab offsets static
            tab_spec = pl.BlockSpec((n, rows), lambda b: (0, 0),
                                    memory_space=pltpu.VMEM)
    elif m > 1:
        tab_spec = pl.BlockSpec((n, m * m), lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        tab_spec = pl.BlockSpec((n, 1), lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
    sp_in = spec_in_m1 if (m == 1 and in_l != io_len) else spec
    in_specs = ([sp_in, sp_in] + [const(t) for t in fwd_np]
                + [const(t) for t in inv_np] + [tab_spec, tab_spec])
    if blu:
        chirp_spec = pl.BlockSpec((blu, 1), lambda b: (0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs += [chirp_spec, chirp_spec]
    passes = _mxu_passes(prec)
    mxu_macs = (sum(r for *_, r, _, _ in fwd_tabs[1])
                + sum(r for *_, r, _, _ in inv_tabs[1]))
    kw = {
        "cost_estimate": pl.CostEstimate(
            flops=2 * m * padded * n * (mxu_macs * 8 * passes + 80),
            transcendentals=0,
            bytes_accessed=dtype.itemsize * 2 * m * padded * io_len * 2),
    }
    if not interpret and in_l == io_len:
        kw["input_output_aliases"] = {0: 0, 1: 1}
    call = pl.pallas_call(
        kernel, grid=(padded // gb,),
        in_specs=in_specs, out_specs=[spec, spec],
        out_shape=[out_struct] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(),
        **kw)

    def run(xr, xi, cr, ci, ar=None, ai=None):
        """m == 1: (1, batch, n) planes; m > 1: (batch, m, n) planes.
        ``cr/ci``: (n, cols) table planes; ``ar/ai``: (blu, 1) chirp planes
        (Bluestein mode only)."""
        if pad:
            pads = (((0, 0), (0, pad), (0, 0)) if m == 1
                    else ((0, pad), (0, 0), (0, 0)))
            xr = jnp.pad(xr, pads)
            xi = jnp.pad(xi, pads)
        tabs = [jnp.asarray(t) for t in fwd_np] + \
               [jnp.asarray(t) for t in inv_np]
        extra = (cr, ci, ar, ai) if blu else (cr, ci)
        a, b = call(xr, xi, *tabs, *extra)
        if pad:
            return ((a[:, :batch], b[:, :batch]) if m == 1
                    else (a[:batch], b[:batch]))
        return a, b

    return run


def use_conv_v3(n: int) -> bool:
    return _use_v3(n)


def bluestein_fused_v3(x: Planar, n: int, m: int, inverse: bool,
                       scale: float = 1.0, in_keep: int = 0) -> Planar:
    """ONE-kernel Bluestein transform of (B, n) planar lines: chirp
    pre-multiply on the kernel's read path, padded m-point forward stages
    (pruned first stage — the [n, m) chirp pad never exists in HBM or
    VMEM), spectrum multiply, inline inverse stages, crop + chirp
    post-multiply on the write path.  HBM traffic = 2n per line per
    direction, vs ~2m + 4 extra XLA passes for the unfused form — the
    reference's in-kernel Bluestein structure
    (``appendBluesteinMultiplication`` ``vkFFT_Bluestein.h:32``,
    ``appendBluesteinConvolution`` ``:201``)."""
    a_t, b_t = luts.bluestein_chirp(n, m, inverse)
    B = x.shape[0]
    run = _build_conv_v3_call(m, B, _INTERPRET, str(x.dtype), 1, 1,
                              False, False, 1.0, blu=n,
                              blu_in=in_keep if 0 < in_keep < n else 0)
    tab = b_t * (scale / m)     # 1/m + caller normalization ride the table
    cr = jnp.asarray(np.real(tab).astype(np.float32).reshape(m, 1))
    ci = jnp.asarray(np.imag(tab).astype(np.float32).reshape(m, 1))
    ar = jnp.asarray(np.real(a_t).astype(np.float32).reshape(n, 1))
    ai = jnp.asarray(np.imag(a_t).astype(np.float32).reshape(n, 1))
    orr, oi = run(x.re[None], x.im[None], cr, ci, ar, ai)
    return Planar(orr[0], oi[0])


def conv_fused_v3(x: Planar, n: int, table, scale: float = 1.0,
                  conj_data: bool = False, xpow: bool = False,
                  plan=None) -> Planar:
    """Single-kernel circular convolution of (B, n) planar lines with a
    fixed kernel whose natural-order spectrum is ``table`` (n,) complex.
    ``scale``: normalization constant (e.g. 1/n) — baked into the table,
    or applied post-inverse under ``xpow`` (where table scales cancel)."""
    B = x.shape[0]
    run = _build_conv_v3_call(n, B, _INTERPRET, str(x.dtype), 1, 1,
                              conj_data, xpow,
                              post_scale=scale if xpow else 1.0, plan=plan)
    tab = np.asarray(table) * (1.0 if xpow else scale)
    cr = jnp.asarray(np.real(tab).astype(np.float32).reshape(n, 1))
    ci = jnp.asarray(np.imag(tab).astype(np.float32).reshape(n, 1))
    orr, oi = run(x.re[None], x.im[None], cr, ci)
    return Planar(orr[0], oi[0])


def conv_fused_v3_rows(x: Planar, n: int, rows: int, table_t,
                       scale: float = 1.0, conj_data: bool = False,
                       xpow: bool = False) -> Planar:
    """N-D last-axis fused pass: (B, n) lines where line j multiplies by
    spectrum column j %% rows of ``table_t`` — an (n, rows) complex array
    (the transposed last-axis-major N-D kernel spectrum)."""
    B = x.shape[0]
    run = _build_conv_v3_call(n, B, _INTERPRET, str(x.dtype), 1, rows,
                              conj_data, xpow,
                              post_scale=scale if xpow else 1.0)
    tab = np.asarray(table_t) * (1.0 if xpow else scale)
    cr = jnp.asarray(np.real(tab).astype(np.float32))
    ci = jnp.asarray(np.imag(tab).astype(np.float32))
    orr, oi = run(x.re[None], x.im[None], cr, ci)
    return Planar(orr[0], oi[0])


def conv_fused_v3_matrix(x: Planar, n: int, m: int, table,
                         scale: float = 1.0, conj_data: bool = False,
                         xpow: bool = False) -> Planar:
    """Matrix convolution: ``x`` is (B, m, n) planes, ``table`` an
    (m, m, n) complex host array; output (B, m, n) planes of
    out[:, o] = ifft(sum_i table[o, i] * fft(x[:, i]))."""
    B = x.shape[0]
    run = _build_conv_v3_call(n, B, _INTERPRET, str(x.dtype), m, 1,
                              conj_data, xpow,
                              post_scale=scale if xpow else 1.0)
    tab = np.asarray(table).reshape(m * m, n).T * (1.0 if xpow else scale)
    cr = jnp.asarray(np.ascontiguousarray(np.real(tab)).astype(np.float32))
    ci = jnp.asarray(np.ascontiguousarray(np.imag(tab)).astype(np.float32))
    orr, oi = run(x.re, x.im, cr, ci)
    return Planar(orr, oi)
