"""Pallas double-double FFT kernel — the in-VMEM "fp64" transform.

The XLA dd engine (``dd_fft._apply_stages_dd``) materializes four fp32
planes per stage through HBM; this kernel runs the whole Stockham pipeline
VMEM-resident in one pallas call, the dd analog of the fp32 v3 kernel.  It
mirrors the reference's quad kernels, which emit the same radix-stage
structure with every MAC expanded to ``PfQuadSum/PfQuadProd``
(``vkFFT_CodeGen/vkFFT_MathUtils/vkFFT_MathUtils.h``; quad kernel layout
``storeSharedComplexComponentsSeparately``, ``vkFFT_SharedMemory.h``).

Layout: the v3 dual — S = 128 lines in lanes, the sequence in sublane/outer
dims, natural order in and out.  All arithmetic is VPU (a dd product is not
bilinear, so the MXU's fp32-accumulate systolic array cannot help: each
product needs its own error term before any accumulation rounds).

DFT coefficients are embedded as exact hi/lo scalar pairs with fast paths
for +-1 / +-i entries (radix 2/4 stages are multiplication-free, like the
reference's hand-unrolled butterflies, ``vkFFT_RadixKernels.h:30``).
Twiddle tables arrive as four fp32 VMEM operands per stage, split exactly
from host fp64 (the reference's FP64/FP128 LUT discipline).

Error-free-transform hazards: XLA:CPU's fusion emitter breaks EFTs (see
``doubledouble.py``), so interpreter-mode runs only validate structure at
fp32-level error; Mosaic performs no algebraic reassociation or FMA
contraction across the ``optimization_barrier`` markers, and real-TPU runs
hold ~1e-14 (validated in ``tests/tpu_smoke.py``).
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkfft_tpu import luts
from vkfft_tpu.planner.plan import build_stages
from vkfft_tpu.precision import doubledouble as ddm
from vkfft_tpu.precision.doubledouble import DD, DDComplex

_nullctx = contextlib.nullcontext

_DD_SB = 128          # lines per block (one lane tile)
_DD_MAX_N = 2048      # VMEM ceiling: 4 planes * n * 128 * 4B + stage temps


def _split_scalar(v: float) -> tuple[np.float32, np.float32]:
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return hi, lo


def _coeff_kind(c: complex, tol: float = 1e-15) -> str:
    if abs(c - 1.0) < tol:
        return "one"
    if abs(c + 1.0) < tol:
        return "neg"
    if abs(c - 1j) < tol:
        return "i"
    if abs(c + 1j) < tol:
        return "negi"
    return "full"


def _dd_cadd(ar, ai, br, bi):
    return ddm.dd_add(ar, br), ddm.dd_add(ai, bi)


def _dd_scalar_cmul(xr: DD, xi: DD, c: complex):
    """(xr + i xi) * c with c an exact host dd scalar; trivial coefficients
    skip the dd products entirely."""
    kind = _coeff_kind(c)
    if kind == "one":
        return xr, xi
    if kind == "neg":
        return ddm.dd_neg(xr), ddm.dd_neg(xi)
    if kind == "i":
        return ddm.dd_neg(xi), xr
    if kind == "negi":
        return xi, ddm.dd_neg(xr)
    cr = DD(*_split_scalar(c.real))
    ci = DD(*_split_scalar(c.imag))
    rr = ddm.dd_mul(xr, cr)
    ii = ddm.dd_mul(xi, ci)
    ri = ddm.dd_mul(xr, ci)
    ir = ddm.dd_mul(xi, cr)
    return ddm.dd_sub(rr, ii), ddm.dd_add(ri, ir)


def _dd_cmul(xr: DD, xi: DD, yr: DD, yi: DD):
    rr = ddm.dd_mul(xr, yr)
    ii = ddm.dd_mul(xi, yi)
    ri = ddm.dd_mul(xr, yi)
    ir = ddm.dd_mul(xi, yr)
    return ddm.dd_sub(rr, ii), ddm.dd_add(ri, ir)


@functools.lru_cache(maxsize=256)
def _dd_stage_tables(n: int, inverse: bool):
    """Per-stage (r, L, Mp, D-matrix, twiddle hi/lo plane 4-tuple)."""
    from vkfft_tpu.precision.dd_fft import _dd_radices
    stages = []
    for st in build_stages(n, _dd_radices(n)):
        if st.r > 8:
            return None
        D = luts.dft_matrix(st.r, inverse)
        TW = luts.stage_twiddle(st.r, st.Mp, inverse)        # (r, Mp) c128
        tw_planes = None
        if st.Mp > 1:
            re_hi = TW.real.astype(np.float32)
            re_lo = (TW.real - re_hi.astype(np.float64)).astype(np.float32)
            im_hi = TW.imag.astype(np.float32)
            im_lo = (TW.imag - im_hi.astype(np.float64)).astype(np.float32)
            tw_planes = (re_hi, re_lo, im_hi, im_lo)
        stages.append((st.r, st.L, st.Mp, D, tw_planes))
    return tuple(stages)


def use_dd_kernel(n: int) -> bool:
    from vkfft_tpu.planner.factorize import prime_factors
    if n < 2 or n > _DD_MAX_N:
        return False
    if max(prime_factors(n)) > 8:
        return False
    return _dd_stage_tables(n, False) is not None


def _dd_apply_stages(xr: DD, xi: DD, S: int, stages, table_refs):
    """Stockham pipeline on (n, S) dd planes; same digit walk as the fp32
    v3 kernel (new digit in front — self-sorting natural order)."""
    ti = 0
    for (r, L, Mp, D, tw_planes) in stages:
        def sl(p, j):
            return p.reshape(L, r, Mp, S)[:, j]
        cols = [(DD(sl(xr.hi, j), sl(xr.lo, j)),
                 DD(sl(xi.hi, j), sl(xi.lo, j))) for j in range(r)]
        if tw_planes is not None:
            twr = DD(table_refs[ti][:][:, None, :, None],
                     table_refs[ti + 1][:][:, None, :, None])   # (r,1,Mp,1)
            twi = DD(table_refs[ti + 2][:][:, None, :, None],
                     table_refs[ti + 3][:][:, None, :, None])
            ti += 4
        outs = []
        for i in range(r):
            ar, ai = _dd_scalar_cmul(cols[0][0], cols[0][1], complex(D[i, 0]))
            for j in range(1, r):
                tr_, ti_ = _dd_scalar_cmul(cols[j][0], cols[j][1],
                                           complex(D[i, j]))
                ar, ai = _dd_cadd(ar, ai, tr_, ti_)
            if tw_planes is not None:
                ar, ai = _dd_cmul(ar, ai,
                                  DD(twr.hi[i], twr.lo[i]),
                                  DD(twi.hi[i], twi.lo[i]))
            outs.append((ar, ai))
        # stack the new digit in front: (r, L, Mp, S) -> flat
        def stk(get):
            return jnp.stack([get(o) for o in outs], axis=0).reshape(-1, S)
        xr = DD(stk(lambda o: o[0].hi), stk(lambda o: o[0].lo))
        xi = DD(stk(lambda o: o[1].hi), stk(lambda o: o[1].lo))
    return xr, xi


def _dd_fft_kernel(n, sb, stages, barriers, *refs):
    (rh_ref, rl_ref, ih_ref, il_ref) = refs[:4]
    table_refs = refs[4:-4]
    (orh, orl, oih, oil) = refs[-4:]
    # Mosaic cannot lower optimization_barrier (and does not need it — no
    # simplifier / FMA contraction between jaxpr and Mosaic IR); interpreter
    # mode keeps barriers because the ops then run through XLA.
    # COMPILER-PROPERTY ASSUMPTION (jax 0.9.0 / current Mosaic): the
    # jaxpr->Mosaic lowering performs no float-identity simplification and
    # no FMA contraction.  If a future Mosaic adds either, the EFT error
    # terms here corrupt silently (~3e-8 instead of ~1e-14) with no
    # CPU-visible failure — the guard is tests/tpu_smoke.py's dd section,
    # whose tolerance is pinned to the 1e-12 class for exactly this reason.
    with (ddm.no_barriers() if not barriers else _nullctx()):
        swp = lambda ref: jnp.swapaxes(ref[0], 0, 1)         # (n, sb)
        xr = DD(swp(rh_ref), swp(rl_ref))
        xi = DD(swp(ih_ref), swp(il_ref))
        xr, xi = _dd_apply_stages(xr, xi, sb, stages, table_refs)
        orh[0] = jnp.swapaxes(xr.hi.reshape(n, sb), 0, 1)
        orl[0] = jnp.swapaxes(xr.lo.reshape(n, sb), 0, 1)
        oih[0] = jnp.swapaxes(xi.hi.reshape(n, sb), 0, 1)
        oil[0] = jnp.swapaxes(xi.lo.reshape(n, sb), 0, 1)


@functools.lru_cache(maxsize=256)
def _build_dd_call(n: int, inverse: bool, batch: int, interpret: bool):
    stages = _dd_stage_tables(n, inverse)
    sb = _DD_SB
    pad = (-batch) % sb
    padded = batch + pad
    np_tables = []
    for (_, _, Mp, _, tw_planes) in stages:
        if tw_planes is not None:
            np_tables += list(tw_planes)
    kernel = functools.partial(_dd_fft_kernel, n, sb, stages, interpret)
    spec = pl.BlockSpec((1, sb, n), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs = [spec] * 4 + [const(t) for t in np_tables]
    # ~40 VPU flops per dd MAC; the cost hint keeps Mosaic's pipelining sane
    macs = sum(r for (r, *_ ) in stages)
    kw = {
        "cost_estimate": pl.CostEstimate(
            flops=4 * padded * n * macs * 40,
            transcendentals=0,
            bytes_accessed=4 * 4 * padded * n * 2),
    }
    if not interpret:
        # 4 quad planes + stage temps exceed the 16MB default scoped-VMEM
        # budget at n >= 1024 (hardware-observed); same unlock as the fp32
        # v3 family.
        from vkfft_tpu.ops.pallas_engine import _vmem_params
        kw["compiler_params"] = _vmem_params()
    call = pl.pallas_call(
        kernel, grid=(padded // sb,),
        in_specs=in_specs, out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((padded // sb, sb, n),
                                        jnp.float32)] * 4,
        interpret=interpret,
        **kw)

    def run(x: DDComplex) -> DDComplex:
        planes = [x.re.hi, x.re.lo, x.im.hi, x.im.lo]
        if pad:
            planes = [jnp.pad(p, ((0, pad), (0, 0))) for p in planes]
        planes = [p.reshape(padded // sb, sb, n) for p in planes]
        outs = call(*planes, *(jnp.asarray(t) for t in np_tables))
        outs = [o.reshape(padded, n)[:batch] for o in outs]
        return DDComplex(DD(outs[0], outs[1]), DD(outs[2], outs[3]))

    return run


def dd_fft_pallas(x: DDComplex, n: int, inverse: bool) -> DDComplex:
    """Single-kernel dd transform of (B, n) quad planes, natural order."""
    from vkfft_tpu.ops import pallas_engine as pe
    run = _build_dd_call(n, inverse, x.shape[0], pe._INTERPRET)
    return run(x)


# ---------------------------------------------------------------------------
# Strided dd kernel: transform the middle axis of (P, n, S) quad planes with
# the trailing batch S in lanes.  The contiguous kernel above already runs
# its stages in (n, S) layout (it swaps the (sb, n) block on entry); a
# strided axis arrives in that layout natively, so this variant is the same
# stage pipeline with no transpose at either end — the dd analog of the fp32
# strided kernel (the reference's quad tier likewise reuses one kernel
# structure for strided axes, ``vkFFT_Plan_FFT.h`` axis_upload dispatch).

_DD_TILE_S = 128      # lanes per block


def _dd_strided_kernel(n, tile_s, stages, barriers, *refs):
    (rh_ref, rl_ref, ih_ref, il_ref) = refs[:4]
    table_refs = refs[4:-4]
    (orh, orl, oih, oil) = refs[-4:]
    with (ddm.no_barriers() if not barriers else _nullctx()):
        xr = DD(rh_ref[0], rl_ref[0])        # (n, tile_s)
        xi = DD(ih_ref[0], il_ref[0])
        xr, xi = _dd_apply_stages(xr, xi, tile_s, stages, table_refs)
        orh[0] = xr.hi.reshape(n, tile_s)
        orl[0] = xr.lo.reshape(n, tile_s)
        oih[0] = xi.hi.reshape(n, tile_s)
        oil[0] = xi.lo.reshape(n, tile_s)


@functools.lru_cache(maxsize=256)
def _build_dd_strided_call(n: int, inverse: bool, p: int, s: int,
                           interpret: bool):
    stages = _dd_stage_tables(n, inverse)
    tile_s = _DD_TILE_S
    pad_s = (-s) % tile_s
    s_pad = s + pad_s
    np_tables = []
    for (_, _, Mp, _, tw_planes) in stages:
        if tw_planes is not None:
            np_tables += list(tw_planes)
    kernel = functools.partial(_dd_strided_kernel, n, tile_s, stages,
                               interpret)
    spec = pl.BlockSpec((1, n, tile_s), lambda b, t: (b, 0, t),
                        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b, t: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    macs = sum(r for (r, *_) in stages)
    kw = {}
    if not interpret:
        from vkfft_tpu.ops.pallas_engine import _vmem_params
        kw["compiler_params"] = _vmem_params(2)
    call = pl.pallas_call(
        kernel, grid=(p, s_pad // tile_s),
        in_specs=[spec] * 4 + [const(t) for t in np_tables],
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((p, n, s_pad), jnp.float32)] * 4,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * p * s_pad * n * macs * 40,
            transcendentals=0,
            bytes_accessed=4 * 4 * p * n * s_pad * 2),
        **kw)

    def run(x: DDComplex) -> DDComplex:
        planes = [x.re.hi, x.re.lo, x.im.hi, x.im.lo]
        if pad_s:
            planes = [jnp.pad(pn, ((0, 0), (0, 0), (0, pad_s)))
                      for pn in planes]
        outs = call(*planes, *(jnp.asarray(t) for t in np_tables))
        if pad_s:
            outs = [o[..., :s] for o in outs]
        return DDComplex(DD(outs[0], outs[1]), DD(outs[2], outs[3]))

    return run


def dd_fft_strided_pallas(x: DDComplex, n: int, inverse: bool) -> DDComplex:
    """Natural-order dd DFT over the middle axis of (P, n, S) quad planes."""
    from vkfft_tpu.ops import pallas_engine as pe
    p, _, s = x.shape
    run = _build_dd_strided_call(n, inverse, p, s, pe._INTERPRET)
    return run(x)
