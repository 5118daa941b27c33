"""E2: kernel architecture experiments on real TPU.

Variants (all natural-order public-path semantics, fwd+inv roundtrip):
  base       current v2 kernel + XLA digit reorder (the round-1 path)
  swapped    current v2 kernel, swapped-order roundtrip (reorder-free bound)
  x3         v2 kernel with manual bf16x3 matmuls (2x fewer MXU passes, ~4e-6)
  ktrans     v2 kernel writing natural order via in-kernel transpose
  ktrans_x3  both
  stock      batch-in-lanes Stockham: in-kernel transpose at both ends,
             multi-stage small-radix contractions over sublane dims
  stock_x3   stock with bf16x3

Usage: python experiments/e2_kernel_variants.py [n ...]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST
import os
INTERPRET = os.environ.get("E2_INTERPRET", "0") == "1"


def dft(n, inverse=False):
    s = 2j if inverse else -2j
    k = np.arange(n)
    return np.exp(s * np.pi / n * np.outer(k, k))


def pack_rows(C):  # acts on [re; im] rows (left mult)
    Cr, Ci = np.real(C), np.imag(C)
    return np.block([[Cr, -Ci], [Ci, Cr]]).astype(np.float32)


def pack_cols(C):  # right mult of [re | im] cols
    Cr, Ci = np.real(C), np.imag(C)
    return np.block([[Cr, Ci], [-Ci, Cr]]).astype(np.float32)


def split3(M):
    """bf16 hi/lo split of a constant matrix, concatenated for the 3-term
    x3 contraction: [Mh; Mh; Ml] along the contraction (first) axis."""
    Mh = M.astype(jnp.bfloat16)
    Ml = (M - np.asarray(Mh, np.float32)).astype(jnp.bfloat16)
    return np.concatenate([Mh, Mh, Ml], axis=0)


def x3_operand(z, axis):
    """In-kernel: [z_hi, z_lo, z_hi] along ``axis`` in bf16."""
    zh = z.astype(jnp.bfloat16)
    zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([zh, zl, zh], axis=axis)


def split_lane_major(n):
    for n1 in range(min(n, 128), 0, -1):
        if n % n1 == 0 and n // n1 <= 128:
            return n1, n // n1
    return None


# ---------------------------------------------------------------------------
# v2-style kernels (lane-major), with x3 / in-kernel-transpose options
# ---------------------------------------------------------------------------

def _v2_tables(n, inverse):
    n1, n2 = split_lane_major(n)
    sign = 2.0j if inverse else -2.0j
    D1, D2 = dft(n1, inverse), dft(n2, inverse)
    tw = np.exp(sign * np.pi / n * np.outer(np.arange(n2), np.arange(n1)))
    return (pack_rows(D2), pack_cols(D1),
            np.real(tw).astype(np.float32), np.imag(tw).astype(np.float32))


def make_v2(n, inverse, batch, x3=False, ktrans=False, semantics=None):
    n1, n2 = split_lane_major(n)
    assert n1 == 128, "experiment assumes full lane digit"
    rsub, mlane, twr, twi = _v2_tables(n, inverse)
    rsub = np.ascontiguousarray(rsub.T)  # contraction on axis 0 everywhere
    tb = int(min(128, max(1, (512 * 1024) // (2 * n * 4))))
    assert batch % tb == 0
    if x3:
        rsub_c = split3(rsub)     # (6n2, 2n2)
        mlane_c = split3(mlane)   # (6n1, 2n1)
    else:
        rsub_c, mlane_c = rsub, mlane

    def kernel(xr_ref, xi_ref, rs_ref, ml_ref, twr_ref, twi_ref, or_ref, oi_ref):
        twr_ = twr_ref[:]
        twi_ = twi_ref[:]
        if not inverse:
            xr = xr_ref[:].astype(jnp.float32)
            xi = xi_ref[:].astype(jnp.float32)
            if ktrans:
                # natural input (TB, n) -> (TB, n2, n1)
                xr = xr.reshape(tb, n2, n1)
                xi = xi.reshape(tb, n2, n1)
            z = jnp.concatenate([xr, xi], axis=1)
            if x3:
                z = x3_operand(z, 1)
            y = jax.lax.dot_general(
                rs_ref[:], z, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=None if x3 else HI)          # (2n2, TB, n1)
            ar, ai = y[:n2], y[n2:]
            tr = ar * twr_[:, None, :] - ai * twi_[:, None, :]
            ti = ar * twi_[:, None, :] + ai * twr_[:, None, :]
            z2 = jnp.concatenate([tr, ti], axis=2)     # (n2, TB, 2n1)
            if x3:
                z2 = x3_operand(z2, 2)
            y2 = jax.lax.dot_general(
                z2, ml_ref[:], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=None if x3 else HI)          # (n2, TB, 2n1)
            outr = jnp.swapaxes(y2[..., :n1], 0, 1)    # (TB, n2, n1) swapped
            outi = jnp.swapaxes(y2[..., n1:], 0, 1)
            if ktrans:
                # swapped (TB, k2, k1) -> natural flat (TB, k1*n2+k2)
                outr = jnp.swapaxes(outr, 1, 2).reshape(tb, n)
                outi = jnp.swapaxes(outi, 1, 2).reshape(tb, n)
            or_ref[:] = outr
            oi_ref[:] = outi
        else:
            xr = xr_ref[:].astype(jnp.float32)
            xi = xi_ref[:].astype(jnp.float32)
            if ktrans:
                # natural (TB, n) -> swapped (TB, k2, k1)
                xr = jnp.swapaxes(xr.reshape(tb, n1, n2), 1, 2)
                xi = jnp.swapaxes(xi.reshape(tb, n1, n2), 1, 2)
            z2 = jnp.concatenate([xr, xi], axis=2)
            if x3:
                z2 = x3_operand(z2, 2)
            y2 = jax.lax.dot_general(
                z2, ml_ref[:], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=None if x3 else HI)
            ar, ai = y2[..., :n1], y2[..., n1:]
            tr = ar * twr_[None] - ai * twi_[None]
            ti = ar * twi_[None] + ai * twr_[None]
            z = jnp.concatenate([tr, ti], axis=1)
            if x3:
                z = x3_operand(z, 1)
            y = jax.lax.dot_general(
                rs_ref[:], z, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=None if x3 else HI)          # (2n2, TB, n1)
            outr = jnp.swapaxes(y[:n2], 0, 1)
            outi = jnp.swapaxes(y[n2:], 0, 1)
            if ktrans:
                outr = outr.reshape(tb, n)
                outi = outi.reshape(tb, n)
            or_ref[:] = outr
            oi_ref[:] = outi

    blk = (tb, n) if ktrans else (tb, n2, n1)
    spec = pl.BlockSpec(blk, (lambda b: (b, 0)) if ktrans else (lambda b: (b, 0, 0)),
                        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    shape = (batch, n) if ktrans else (batch, n2, n1)
    kw = {"interpret": INTERPRET}
    if semantics:
        kw["compiler_params"] = pltpu.CompilerParams(dimension_semantics=(semantics,))
    call = pl.pallas_call(
        kernel,
        grid=(batch // tb,),
        in_specs=[spec, spec, const(np.asarray(rsub_c)), const(np.asarray(mlane_c)),
                  const(twr), const(twi)],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 2,
        **kw,
    )
    rs_j = jnp.asarray(rsub_c)
    ml_j = jnp.asarray(mlane_c)
    twr_j = jnp.asarray(twr)
    twi_j = jnp.asarray(twi)

    def run(xr, xi):
        # natural (B, n) in/out for ktrans; reorder at XLA level otherwise
        if ktrans:
            orr, oi = call(xr, xi, rs_j, ml_j, twr_j, twi_j)
            return orr, oi
        if not inverse:
            xr = xr.reshape(batch, n2, n1)
            xi = xi.reshape(batch, n2, n1)
            orr, oi = call(xr, xi, rs_j, ml_j, twr_j, twi_j)
            orr = orr.reshape(batch, n2, n1).swapaxes(1, 2).reshape(batch, n)
            oi = oi.reshape(batch, n2, n1).swapaxes(1, 2).reshape(batch, n)
            return orr, oi
        xr = xr.reshape(batch, n1, n2).swapaxes(1, 2)
        xi = xi.reshape(batch, n1, n2).swapaxes(1, 2)
        orr, oi = call(xr, xi, rs_j, ml_j, twr_j, twi_j)
        return orr.reshape(batch, n), oi.reshape(batch, n)

    return run


# ---------------------------------------------------------------------------
# Stockham batch-in-lanes kernel
# ---------------------------------------------------------------------------

def stages_for(n, rmax=64):
    out = []
    m = n
    while m > 1:
        for r in range(min(rmax, m), 1, -1):
            if m % r == 0:
                out.append(r)
                m //= r
                break
    return out


def make_stock(n, inverse, batch, x3=False, sb=128, semantics=None):
    radices = stages_for(n)
    # per-stage tables
    tabs = []
    L, M = 1, n
    sign = 2.0j if inverse else -2.0j
    for r in radices:
        Mp = M // r
        D = np.ascontiguousarray(pack_rows(dft(r, inverse)).T)  # contract axis 0
        tw = np.exp(sign * np.pi / M * np.outer(np.arange(r), np.arange(Mp)))
        tabs.append((split3(D) if x3 else D,
                     np.real(tw).astype(np.float32),
                     np.imag(tw).astype(np.float32), r, L, M, Mp))
        L, M = L * r, Mp
    assert batch % sb == 0

    def kernel(xr_ref, xi_ref, *refs):
        table_refs = refs[:-2]
        or_ref, oi_ref = refs[-2:]
        xr = jnp.swapaxes(xr_ref[0], 0, 1)   # (n, S)
        xi = jnp.swapaxes(xi_ref[0], 0, 1)
        S = sb
        L, M = 1, n
        for si, (_, _, _, r, L0, M0, Mp) in enumerate(tabs):
            D_ref, twr_ref, twi_ref = (table_refs[3 * si], table_refs[3 * si + 1],
                                       table_refs[3 * si + 2])
            z = jnp.concatenate([xr.reshape(L0, r, Mp, S),
                                 xi.reshape(L0, r, Mp, S)], axis=1)
            if x3:
                z = x3_operand(z, 1)
            y = jax.lax.dot_general(
                D_ref[:], z, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=None if x3 else HI)     # (2r, L0, Mp, S)
            ar, ai = y[:r], y[r:]
            twr_ = twr_ref[:][:, None, :, None]
            twi_ = twi_ref[:][:, None, :, None]
            tr = ar * twr_ - ai * twi_
            ti = ar * twi_ + ai * twr_
            xr = tr.reshape(-1, S)
            xi = ti.reshape(-1, S)
        or_ref[0] = jnp.swapaxes(xr.reshape(n, S), 0, 1)
        oi_ref[0] = jnp.swapaxes(xi.reshape(n, S), 0, 1)

    spec = pl.BlockSpec((1, sb, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs = [spec, spec]
    tables = []
    for D, twr, twi, *_ in tabs:
        in_specs += [const(np.asarray(D)), const(twr), const(twi)]
        tables += [jnp.asarray(D), jnp.asarray(twr), jnp.asarray(twi)]
    kw = {"interpret": INTERPRET}
    if semantics:
        kw["compiler_params"] = pltpu.CompilerParams(dimension_semantics=(semantics,))
    call = pl.pallas_call(
        kernel,
        grid=(batch // sb,),
        in_specs=in_specs,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((batch // sb, sb, n), jnp.float32)] * 2,
        **kw,
    )

    def run(xr, xi):
        xr = xr.reshape(batch // sb, sb, n)
        xi = xi.reshape(batch // sb, sb, n)
        orr, oi = call(xr, xi, *tables)
        return orr.reshape(batch, n), oi.reshape(batch, n)

    return run


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def timeit(fwd, inv, batch, n, lo=10, hi=60):
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    inv_n = np.float32(1.0 / n)

    def fwd_inv(pair):
        a, b = pair
        fr, fi = fwd(a, b)
        br, bi = inv(fr, fi)
        return (br * inv_n, bi * inv_n)

    def make(iters):
        @jax.jit
        def runner(pair):
            return jax.lax.fori_loop(0, iters, lambda i, v: fwd_inv(v), pair)
        return runner

    f_lo, f_hi = make(lo), make(hi)
    float(np.asarray(f_lo((xr, xi))[0][0, 0]))
    float(np.asarray(f_hi((xr, xi))[0][0, 0]))

    def t(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f((xr, xi))[0][0, 0]))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(f_hi) - t(f_lo)) / (hi - lo)
    moved = 4 * 2 * batch * n * 4
    return moved / dt / 1e9, dt


def accuracy(fwd, n, batch=256):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    fr, fi = fwd(jnp.asarray(x.real.astype(np.float32)),
                 jnp.asarray(x.imag.astype(np.float32)))
    got = np.asarray(fr) + 1j * np.asarray(fi)
    ref = np.fft.fft(x)
    return np.abs(got - ref).max() / np.abs(ref).max()


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024]
    for n in sizes:
        batch = max(128, (128 * 1024 * 1024) // (8 * n))
        batch = (batch // 128) * 128
        print(f"== n={n} batch={batch} ==")
        variants = []
        variants.append(("base", dict(x3=False, ktrans=False)))
        variants.append(("x3", dict(x3=True, ktrans=False)))
        variants.append(("ktrans", dict(x3=False, ktrans=True)))
        variants.append(("ktrans_x3", dict(x3=True, ktrans=True)))
        for name, kwargs in variants:
            try:
                fwd = make_v2(n, False, batch, **kwargs)
                inv = make_v2(n, True, batch, **kwargs)
                err = accuracy(lambda a, b: make_v2(n, False, 256, **kwargs)(a, b), n)
                gbs, dt = timeit(fwd, inv, batch, n)
                print(f"  {name:12s}: {gbs:7.1f} GB/s  ({dt*1e3:.3f} ms)  fwd err {err:.2e}")
            except Exception as e:
                print(f"  {name:12s}: FAILED {type(e).__name__}: {str(e)[:160]}")
        for name, x3 in (("stock", False), ("stock_x3", True)):
            try:
                fwd = make_stock(n, False, batch, x3=x3)
                inv = make_stock(n, True, batch, x3=x3)
                err = accuracy(lambda a, b: make_stock(n, False, 256, x3=x3)(a, b), n)
                gbs, dt = timeit(fwd, inv, batch, n)
                print(f"  {name:12s}: {gbs:7.1f} GB/s  ({dt*1e3:.3f} ms)  fwd err {err:.2e}")
            except Exception as e:
                print(f"  {name:12s}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
