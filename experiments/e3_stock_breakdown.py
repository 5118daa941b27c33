"""E3: where does the stock (batch-in-lanes Stockham) kernel's time go?

Pieces, all on (B, n) fp32 planar pairs, fwd+inv roundtrip timing like E2:
  copy        pallas copy kernel, same blocks (DMA + dispatch floor)
  copyT       copy + the two in-kernel (sb, n)<->(n, sb) transposes
  stock_nt    stock stages WITHOUT twiddle multiplies (MXU + transposes)
  stock       full kernel (reference variant from E2)
  stock_par   full kernel + dimension_semantics=("parallel",)
  stock_arb   full kernel + dimension_semantics=("arbitrary",)
  stock_ce    full kernel + CostEstimate
  stock_d     full kernel at DEFAULT matmul precision (1-pass bf16)
  sb=256      full kernel with 256-line blocks
  rmax=32     radix schedule capped at 32 (more stages, fewer MACs)

Usage: python experiments/e3_stock_breakdown.py [n ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST
INTERPRET = os.environ.get("E3_INTERPRET", "0") == "1"


def dft(n, inverse=False):
    s = 2j if inverse else -2j
    k = np.arange(n)
    return np.exp(s * np.pi / n * np.outer(k, k))


def pack_rows(C):
    Cr, Ci = np.real(C), np.imag(C)
    return np.block([[Cr, -Ci], [Ci, Cr]]).astype(np.float32)


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


def make_kernel(n, inverse, batch, mode="stock", sb=128, semantics=None,
                prec=HI, rmax=64, cost=False):
    radices = stages_for(n, rmax)
    tabs = []
    L, M = 1, n
    sign = 2.0j if inverse else -2.0j
    for r in radices:
        Mp = M // r
        D = np.ascontiguousarray(pack_rows(dft(r, inverse)).T)
        tw = np.exp(sign * np.pi / M * np.outer(np.arange(r), np.arange(Mp)))
        tabs.append((D, np.real(tw).astype(np.float32),
                     np.imag(tw).astype(np.float32), r, L, M, Mp))
        L, M = L * r, Mp
    assert batch % sb == 0

    def kernel(xr_ref, xi_ref, *refs):
        table_refs = refs[:-2]
        or_ref, oi_ref = refs[-2:]
        if mode == "copy":
            or_ref[0] = xr_ref[0]
            oi_ref[0] = xi_ref[0]
            return
        xr = jnp.swapaxes(xr_ref[0], 0, 1)   # (n, S)
        xi = jnp.swapaxes(xi_ref[0], 0, 1)
        if mode == "copyT":
            or_ref[0] = jnp.swapaxes(xr, 0, 1)
            oi_ref[0] = jnp.swapaxes(xi, 0, 1)
            return
        S = sb
        for si, (_, _, _, r, L0, M0, Mp) in enumerate(tabs):
            D_ref, twr_ref, twi_ref = (table_refs[3 * si],
                                       table_refs[3 * si + 1],
                                       table_refs[3 * si + 2])
            z = jnp.concatenate([xr.reshape(L0, r, Mp, S),
                                 xi.reshape(L0, r, Mp, S)], axis=1)
            y = jax.lax.dot_general(
                D_ref[:], z, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                         # (2r, L0, Mp, S)
            ar, ai = y[:r], y[r:]
            if mode == "stock_nt" or Mp == 1:
                xr = ar.reshape(-1, S)
                xi = ai.reshape(-1, S)
            else:
                twr_ = twr_ref[:][:, None, :, None]
                twi_ = twi_ref[:][:, None, :, None]
                xr = (ar * twr_ - ai * twi_).reshape(-1, S)
                xi = (ar * twi_ + ai * twr_).reshape(-1, S)
        or_ref[0] = jnp.swapaxes(xr.reshape(n, S), 0, 1)
        oi_ref[0] = jnp.swapaxes(xi.reshape(n, S), 0, 1)

    spec = pl.BlockSpec((1, sb, n), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs = [spec, spec]
    tables = []
    for D, twr, twi, *_ in tabs:
        in_specs += [const(np.asarray(D)), const(twr), const(twi)]
        tables += [jnp.asarray(D), jnp.asarray(twr), jnp.asarray(twi)]
    kw = {"interpret": INTERPRET}
    if semantics:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))
    if cost:
        flops = 2 * batch * n * sum(radices) * 8
        kw["cost_estimate"] = pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=4 * 2 * batch * n * 2)
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


def accuracy(make_fwd, n, batch=256):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    fwd = make_fwd(batch)
    fr, fi = fwd(jnp.asarray(x.real.astype(np.float32)),
                 jnp.asarray(x.imag.astype(np.float32)))
    got = np.asarray(fr) + 1j * np.asarray(fi)
    ref = np.fft.fft(x)
    return np.abs(got - ref).max() / np.abs(ref).max()


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024]
    for n in sizes:
        batch = max(128, (128 * 1024 * 1024) // (8 * n))
        batch = (batch // 256) * 256
        print(f"== n={n} batch={batch} ==", flush=True)
        variants = [
            ("copy", dict(mode="copy")),
            ("copyT", dict(mode="copyT")),
            ("stock_nt", dict(mode="stock_nt")),
            ("stock", dict()),
            ("stock_par", dict(semantics="parallel")),
            ("stock_arb", dict(semantics="arbitrary")),
            ("stock_ce", dict(cost=True)),
            ("stock_d", dict(prec=jax.lax.Precision.DEFAULT)),
            ("sb256", dict(sb=256)),
            ("rmax32", dict(rmax=32)),
            ("rmax16", dict(rmax=16)),
        ]
        for name, kwargs in variants:
            try:
                fwd = make_kernel(n, False, batch, **kwargs)
                inv = make_kernel(n, True, batch, **kwargs)
                if name.startswith("stock") and name not in ("stock_nt",):
                    err = accuracy(
                        lambda b: make_kernel(n, False, b, **kwargs), n)
                else:
                    err = float("nan")
                gbs, dt = timeit(fwd, inv, batch, n)
                print(f"  {name:10s}: {gbs:7.1f} GB/s  ({dt*1e3:.3f} ms)"
                      f"  err {err:.2e}", flush=True)
            except Exception as e:
                print(f"  {name:10s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
