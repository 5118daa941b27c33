"""Double-double FFT engine — the TPU "fp64" transform tier.

Runs the same Stockham recurrence as the fp32 engines but with every complex
MAC expanded into double-double error-free transformations on the VPU (the
MXU has no use here: dd products cannot ride a bf16 systolic array).  This
mirrors how the reference implements its quad tier: the same generated kernel
structure with ``PfQuadSum/PfQuadProd`` emitted for every arithmetic op
(``vkFFT_MathUtils.h``), at a large constant-factor cost over native
precision — the price of 2^-48-class accuracy on fp32-only hardware.

Twiddles/DFT coefficients are split exactly from host fp64 (hi = f32(x),
lo = f32(x - hi)), the analog of the reference's FP64-precomputed LUTs that
make its FP32 Bluestein/Rader more accurate than cuFFT (README.md:72-79).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu import luts
from vkfft_tpu.planner.factorize import Algorithm, decompose, _group_radices, prime_factors
from vkfft_tpu.planner.plan import Stage, build_stages
from vkfft_tpu.precision.doubledouble import (
    DD,
    DDComplex,
    dd_from_f64,
    ddc_from_complex128,
    ddc_to_complex128,
)

# dd stages unroll r^2 scalar MACs in the trace; keep radices small so the
# HLO stays compilable (radix 8 -> 64 MACs/stage).
_DD_MAX_RADIX = 8


def _dd_scalar(v: complex) -> DDComplex:
    re_hi = np.float32(v.real)
    re_lo = np.float32(v.real - np.float64(re_hi))
    im_hi = np.float32(v.imag)
    im_lo = np.float32(v.imag - np.float64(im_hi))
    return DDComplex(DD(re_hi, re_lo), DD(im_hi, im_lo))


def _dd_table(tab: np.ndarray) -> DDComplex:
    return DDComplex(dd_from_f64(np.real(tab)), dd_from_f64(np.imag(tab)))


@functools.lru_cache(maxsize=256)
def _dd_radices(n: int) -> tuple[int, ...]:
    primes = prime_factors(n)
    big = tuple(sorted((p for p in primes if p > _DD_MAX_RADIX), reverse=True))
    small = [p for p in primes if p <= _DD_MAX_RADIX]
    return big + tuple(_group_radices(small, _DD_MAX_RADIX))


def _apply_stages_dd(x: DDComplex, stages, inverse: bool) -> DDComplex:
    B = x.shape[0]
    for st in stages:
        r, L, Mp = st.r, st.L, st.Mp
        D = luts.dft_matrix(r, inverse)
        TW = luts.stage_twiddle(r, Mp, inverse)
        xs = x.reshape(B, L, r, Mp)
        cols = [xs[:, :, j, :] for j in range(r)]
        outs = []
        for i in range(r):
            acc = cols[0] * _dd_scalar(complex(D[i, 0]))
            for j in range(1, r):
                acc = acc + cols[j] * _dd_scalar(complex(D[i, j]))
            tw_i = _dd_table(TW[i])  # (Mp,)
            tw_b = DDComplex(
                DD(tw_i.re.hi[None, None, :], tw_i.re.lo[None, None, :]),
                DD(tw_i.im.hi[None, None, :], tw_i.im.lo[None, None, :]))
            outs.append(acc * tw_b)
        # stack i as a new axis before l -> (B, r, L, Mp), merge (i, l)
        planes = []
        for get in (lambda c: c.re.hi, lambda c: c.re.lo,
                    lambda c: c.im.hi, lambda c: c.im.lo):
            planes.append(jnp.stack([get(o) for o in outs], axis=1).reshape(B, r * L, Mp))
        x = DDComplex(DD(planes[0], planes[1]), DD(planes[2], planes[3]))
    return x.reshape(B, -1)


def _use_dd_pallas(n: int) -> bool:
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.precision.dd_kernel import use_dd_kernel
    if not use_dd_kernel(n):
        return False
    if pe._INTERPRET:
        return True
    return jax.devices()[0].platform != "cpu"


@functools.lru_cache(maxsize=256)
def _dd_split(n: int):
    """n = n1*n2 with both factors runnable by the dd kernel.

    Prefers a lane-tile-aligned contiguous factor (n2 %% 128 == 0) so the
    strided pass's trailing dim fills whole lane tiles — the balanced split
    at n=4096 gave n2=64 (half-tile lanes) and measured 2x slower than
    n=16384's aligned split (e37, round 4); falls back to the most balanced
    split otherwise."""
    import math
    from vkfft_tpu.precision.dd_kernel import use_dd_kernel
    for n1 in range(math.isqrt(n), 1, -1):
        n2 = n // n1
        if (n % n1 == 0 and n2 % 128 == 0 and use_dd_kernel(n1)
                and use_dd_kernel(n2)):
            return n1, n2
    for n1 in range(math.isqrt(n), 1, -1):
        if n % n1 == 0 and use_dd_kernel(n1) and use_dd_kernel(n // n1):
            return n1, n // n1
    return None


def _use_dd_fourstep(n: int) -> bool:
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.precision.dd_kernel import _DD_MAX_N
    if n <= _DD_MAX_N or _dd_split(n) is None:
        return False
    if pe._INTERPRET:
        return True
    return jax.devices()[0].platform != "cpu"


def _dd_four_step(x: DDComplex, n: int, inverse: bool) -> DDComplex:
    """Four-step dd transform for n beyond the single-kernel VMEM ceiling:
    strided dd kernel over n1 (trailing n2 in lanes), inter-factor twiddle,
    contiguous dd kernel over n2, transpose to natural order — the dd analog
    of the fp32 long path / the reference quad tier's multi-upload regime
    (``vkFFT_Scheduler.h`` numPasses>1 at quad precision)."""
    from vkfft_tpu.precision.dd_kernel import dd_fft_pallas, dd_fft_strided_pallas
    n1, n2 = _dd_split(n)
    B = x.shape[0]
    xs = _ddc_map(x, lambda p: p.reshape(B, n1, n2))
    a = dd_fft_strided_pallas(xs, n1, inverse)
    # w_n^{k1*j2} as (n1, n2), split exactly from host fp64
    tw = _dd_table(np.ascontiguousarray(luts.ct_twiddle(n1, n2, inverse).T))
    twb = DDComplex(DD(tw.re.hi[None], tw.re.lo[None]),
                    DD(tw.im.hi[None], tw.im.lo[None]))
    a = a * twb
    b = dd_fft_pallas(_ddc_map(a, lambda p: p.reshape(B * n1, n2)), n2, inverse)
    # X[k1 + n1*k2] = B[k1, k2]: natural order is the (k2, k1) transpose
    return _ddc_map(b, lambda p: jnp.swapaxes(
        p.reshape(B, n1, n2), 1, 2).reshape(B, n))


def _core_fft_dd(x: DDComplex, n: int, inverse: bool) -> DDComplex:
    if _use_dd_pallas(n):
        from vkfft_tpu.precision.dd_kernel import dd_fft_pallas
        return dd_fft_pallas(x, n, inverse)
    if _use_dd_fourstep(n):
        return _dd_four_step(x, n, inverse)
    stages = build_stages(n, _dd_radices(n))
    return _apply_stages_dd(x, stages, inverse)


def _pad_tail_dd(x: DDComplex, pad: int) -> DDComplex:
    if pad == 0:
        return x
    z = jnp.zeros(x.shape[:-1] + (pad,), x.re.hi.dtype)

    def cat(p):
        return jnp.concatenate([p, z], axis=-1)

    return DDComplex(DD(cat(x.re.hi), cat(x.re.lo)), DD(cat(x.im.hi), cat(x.im.lo)))


# Largest prime the dd engine runs as a direct stage: each radix-r stage
# unrolls r^2 dd-complex MACs (~30 traced ops each) in the jaxpr, so the
# fp32 planner's 127-prime ceiling would produce ~400k-op traces that OOM
# compilers.  Primes beyond this use Bluestein over a 13-smooth size.
_DD_MAX_PRIME = 13


def _ddc_map(x: DDComplex, f) -> DDComplex:
    return DDComplex(DD(f(x.re.hi), f(x.re.lo)), DD(f(x.im.hi), f(x.im.lo)))


def _dd_tree_sum(x: DDComplex) -> DDComplex:
    """Sum over the last axis with a compensated pairwise tree (log-depth
    dd_add reduction; a plain jnp.sum would round at fp32)."""
    n = x.shape[-1]
    m = 1 << (n - 1).bit_length()
    if m != n:
        x = _pad_tail_dd(x, m - n)
    while m > 1:
        m //= 2
        lo = x[..., :m]
        hi = x[..., m:]
        x = lo + hi
    return x


def _fft_rader_dd(x: DDComplex, p: int, inverse: bool) -> DDComplex:
    """Rader prime FFT in double-double: length-(p-1) cyclic convolution
    with dd arithmetic throughout (the reference's quad tier computes its
    Rader kernels per precision incl. double-double:
    ``VkFFTGenerateRaderFFTKernel``, ``vkFFT_RecursiveFFTGenerators.h:996``).
    The dd engine previously sent every prime > 13 on a Bluestein detour
    (two padded transforms + chirp mults); Rader runs the exact-size
    convolution instead.  Inverse by conjugation."""
    if inverse:
        conj = lambda v: DDComplex(v.re, DD(-v.im.hi, -v.im.lo))
        return conj(_fft_rader_dd(conj(x), p, False))
    perm, inv_perm, b_fft = luts.rader_tables(p)
    x0 = x[:, :1]
    X0 = _dd_tree_sum(x)
    a = _ddc_map(x, lambda pl: jnp.take(pl, jnp.asarray(perm), axis=1))
    A = fft_lines_dd(a, p - 1, False)
    C = A * _bcast_tab(_dd_table(b_fft))
    c = fft_lines_dd(C, p - 1, True)
    inv_m = _dd_scalar(complex(1.0 / (p - 1)))
    c = (c * inv_m) + _ddc_map(x0, lambda pl: jnp.broadcast_to(
        pl, pl.shape[:-1] + (p - 1,)))
    # gather + concat, never scatter (XLA scatters serialize on TPU):
    # out[:, inv_perm[k]] = c[:, k]  <=>  out[:, 1:] = c[:, argsort(inv_perm)]
    order = jnp.asarray(np.argsort(inv_perm))

    def place(head, tail):
        return jnp.concatenate([head, jnp.take(tail, order, axis=1)], axis=1)
    return DDComplex(
        DD(place(X0.re.hi, c.re.hi), place(X0.re.lo, c.re.lo)),
        DD(place(X0.im.hi, c.im.hi), place(X0.im.lo, c.im.lo)))


def _bcast_tab(t: DDComplex) -> DDComplex:
    return DDComplex(DD(t.re.hi[None, :], t.re.lo[None, :]),
                     DD(t.im.hi[None, :], t.im.lo[None, :]))


def fft_lines_dd(x: DDComplex, n: int, inverse: bool = False) -> DDComplex:
    """Unnormalized double-double DFT over (B, n) quad planes."""
    if n == 1:
        return x
    if max(prime_factors(n)) <= _DD_MAX_PRIME:
        return _core_fft_dd(x, n, inverse)
    if len(prime_factors(n)) == 1 and max(prime_factors(n - 1)) <= _DD_MAX_PRIME:
        # prime n with a smooth p-1: exact-size Rader beats the Bluestein
        # detour (two padded transforms)
        return _fft_rader_dd(x, n, inverse)
    from vkfft_tpu.planner.factorize import _bluestein_padded_size
    m = _bluestein_padded_size(n)
    a_t, b_t = luts.bluestein_chirp(n, m, inverse)
    a = _dd_table(a_t)
    b = _dd_table(b_t)

    def bcast(t: DDComplex) -> DDComplex:
        return DDComplex(DD(t.re.hi[None, :], t.re.lo[None, :]),
                         DD(t.im.hi[None, :], t.im.lo[None, :]))

    y = _pad_tail_dd(x * bcast(a), m - n)
    Y = _core_fft_dd(y, m, False)
    y = _core_fft_dd(Y * bcast(b), m, True)
    inv_m = _dd_scalar(complex(1.0 / m))
    y = y * inv_m
    return y[:, :n] * bcast(a)


@functools.lru_cache(maxsize=256)
def _dd_compiled(n: int, inverse: bool, batch: int):
    """Compile the dd transform with the guilty optimization disabled.

    The XLA:CPU fusion emitter evaluates fused elementwise chains with excess
    precision / contraction even across optimization_barrier, which silently
    destroys the error-free transforms (verified by pass bisection: only
    ``fusion`` off restores 1e-15 accuracy).  dd executables therefore disable
    HLO fusion on CPU; the arithmetic is elementwise VPU work, so the cost is
    acceptable for the precision tier."""
    fn = jax.jit(functools.partial(fft_lines_dd, n=n, inverse=inverse))
    z = jnp.zeros((batch, n), jnp.float32)
    example = DDComplex(DD(z, z), DD(z, z))
    platform = jax.devices()[0].platform
    if platform == "cpu":
        return fn.lower(example).compile(
            compiler_options={"xla_disable_hlo_passes": "fusion"})
    return fn


def fft_dd(x: np.ndarray, inverse: bool = False, normalize: bool = False) -> np.ndarray:
    """Host convenience: complex128 (B, n) -> complex128 via the dd engine."""
    x = np.asarray(x, dtype=np.complex128)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    n = x.shape[-1]
    lead = x.shape[:-1]
    flat = x.reshape(-1, n)
    xd = ddc_from_complex128(flat)
    fn = _dd_compiled(n, inverse, flat.shape[0])
    y = fn(xd)
    out = ddc_to_complex128(y).reshape(*lead, n)
    if inverse and normalize:
        out = out / n
    return out[0] if squeeze else out


def fft_axis_dd(x: DDComplex, axis: int, n: int, inverse: bool = False) -> DDComplex:
    """Unnormalized double-double DFT along ``axis`` of N-D quad planes.

    Non-minor smooth axes run the strided dd kernel in place (trailing dims
    flattened into lanes — transpose-free, like the fp32 strided path); other
    shapes fall back to moveaxis + the contiguous engine."""
    ndim = x.ndim
    axis = axis % ndim
    shape = x.shape
    if axis != ndim - 1 and _use_dd_pallas(n):
        from vkfft_tpu.precision.dd_kernel import dd_fft_strided_pallas
        p = int(np.prod(shape[:axis], dtype=np.int64))
        s = int(np.prod(shape[axis + 1:], dtype=np.int64))
        xs = _ddc_map(x, lambda pl: pl.reshape(p, n, s))
        y = dd_fft_strided_pallas(xs, n, inverse)
        return _ddc_map(y, lambda pl: pl.reshape(*shape))
    moved = axis != ndim - 1

    def mv(p, src, dst):
        return jnp.moveaxis(p, src, dst)

    if moved:
        x = DDComplex(DD(mv(x.re.hi, axis, -1), mv(x.re.lo, axis, -1)),
                      DD(mv(x.im.hi, axis, -1), mv(x.im.lo, axis, -1)))
    y = fft_lines_dd(x.reshape(-1, n), n, inverse).reshape(
        *(x.shape if moved else shape))
    if moved:
        y = DDComplex(DD(mv(y.re.hi, -1, axis), mv(y.re.lo, -1, axis)),
                      DD(mv(y.im.hi, -1, axis), mv(y.im.lo, -1, axis)))
    return y


def dd_scale(x: DDComplex, value: float) -> DDComplex:
    """Multiply by an fp64 host scalar split exactly into a dd pair."""
    hi = np.float32(value)
    lo = np.float32(np.float64(value) - np.float64(hi))
    s = DD(hi, lo)
    return DDComplex(x.re * s, x.im * s)
