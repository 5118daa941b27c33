"""E4: push the DMA/dispatch ceiling and the best stock combos.

Variants (fwd+inv roundtrip two-point timing as E2/E3):
  jnp_scale    pure XLA z*1.0000001 roundtrip (framework floor, no pallas)
  copy         pallas copy, (1, sb, n) blocks  [E3 reference]
  copy_don     copy with input_output_aliases
  copy_big     copy with (1, 256, n) blocks
  copy_flat    copy with flat 2-D (rows, 512) blocks over the whole array
  copy_ce      copy + CostEstimate
  stock_ce     best E3 fp32 variant
  stock_ce_don stock + CostEstimate + donation
  stock_ce_arb stock + CostEstimate + arbitrary semantics
  v2_ce        current production v2 kernel + CostEstimate (n=4096 case)

Usage: python experiments/e4_ceiling.py [n ...]
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST
INTERPRET = os.environ.get("E4_INTERPRET", "0") == "1"


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


def make_copy(n, batch, sb=128, donate=False, ce=False, flat=False):
    if flat:
        rows = batch * n // 512
        spec = pl.BlockSpec((512, 512), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

        def kernel(xr_ref, xi_ref, or_ref, oi_ref):
            or_ref[:] = xr_ref[:]
            oi_ref[:] = xi_ref[:]

        kw = {"interpret": INTERPRET}
        if donate:
            kw["input_output_aliases"] = {0: 0, 1: 1}
        call = pl.pallas_call(
            kernel, grid=(rows // 512,),
            in_specs=[spec, spec], out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((rows, 512), jnp.float32)] * 2,
            **kw)

        def run(xr, xi):
            a, b = call(xr.reshape(rows, 512), xi.reshape(rows, 512))
            return a.reshape(batch, n), b.reshape(batch, n)
        return run

    def kernel(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[0] = xr_ref[0]
        oi_ref[0] = xi_ref[0]

    spec = pl.BlockSpec((1, sb, n), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    kw = {"interpret": INTERPRET}
    if donate:
        kw["input_output_aliases"] = {0: 0, 1: 1}
    if ce:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=0, transcendentals=0, bytes_accessed=4 * 2 * batch * n * 2)
    call = pl.pallas_call(
        kernel, grid=(batch // sb,),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((batch // sb, sb, n), jnp.float32)] * 2,
        **kw)

    def run(xr, xi):
        a, b = call(xr.reshape(batch // sb, sb, n),
                    xi.reshape(batch // sb, sb, n))
        return a.reshape(batch, n), b.reshape(batch, n)
    return run


def make_stock(n, inverse, batch, sb=128, semantics=None, ce=True,
               donate=False, prec=HI):
    radices = stages_for(n)
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

    def kernel(xr_ref, xi_ref, *refs):
        table_refs = refs[:-2]
        or_ref, oi_ref = refs[-2:]
        xr = jnp.swapaxes(xr_ref[0], 0, 1)
        xi = jnp.swapaxes(xi_ref[0], 0, 1)
        S = sb
        for si, (_, _, _, r, L0, M0, Mp) in enumerate(tabs):
            D_ref, twr_ref, twi_ref = (table_refs[3 * si],
                                       table_refs[3 * si + 1],
                                       table_refs[3 * si + 2])
            z = jnp.concatenate([xr.reshape(L0, r, Mp, S),
                                 xi.reshape(L0, r, Mp, S)], axis=1)
            y = jax.lax.dot_general(
                D_ref[:], z, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            ar, ai = y[:r], y[r:]
            if Mp == 1:
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
    if ce:
        flops = 2 * batch * n * sum(radices) * 8 * (6 if prec is HI else 1)
        kw["cost_estimate"] = pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=4 * 2 * batch * n * 2)
    if donate:
        kw["input_output_aliases"] = {0: 0, 1: 1}
    call = pl.pallas_call(
        kernel, grid=(batch // sb,),
        in_specs=in_specs, out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((batch // sb, sb, n), jnp.float32)] * 2,
        **kw)

    def run(xr, xi):
        xr = xr.reshape(batch // sb, sb, n)
        xi = xi.reshape(batch // sb, sb, n)
        orr, oi = call(xr, xi, *tables)
        return orr.reshape(batch, n), oi.reshape(batch, n)
    return run


def make_v2_ce(n, inverse, batch):
    import vkfft_tpu  # noqa: F401 — path setup
    from vkfft_tpu.ops import pallas_engine as pe

    def run(xr, xi):
        return pe.core_fft_planar_v2(xr, xi, n, inverse, order="natural")
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


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024]
    for n in sizes:
        batch = max(128, (128 * 1024 * 1024) // (8 * n))
        batch = (batch // 256) * 256
        print(f"== n={n} batch={batch} ==", flush=True)
        variants = [
            ("jnp_scale", lambda inv: lambda a, b: (a * np.float32(1.0000001),
                                                    b * np.float32(1.0000001))),
            ("copy", lambda inv: make_copy(n, batch)),
            ("copy_don", lambda inv: make_copy(n, batch, donate=True)),
            ("copy_big", lambda inv: make_copy(n, batch, sb=256)),
            ("copy_flat", lambda inv: make_copy(n, batch, flat=True)),
            ("copy_ce", lambda inv: make_copy(n, batch, ce=True)),
            ("stock_ce", lambda inv: make_stock(n, inv, batch)),
            ("stock_ce_don", lambda inv: make_stock(n, inv, batch, donate=True)),
            ("stock_ce_arb", lambda inv: make_stock(n, inv, batch,
                                                    semantics="arbitrary")),
            ("v2_ce", lambda inv: make_v2_ce(n, inv, batch)),
        ]
        for name, mk in variants:
            try:
                fwd = mk(False)
                inv = mk(True)
                gbs, dt = timeit(fwd, inv, batch, n)
                print(f"  {name:12s}: {gbs:7.1f} GB/s  ({dt*1e3:.3f} ms)",
                      flush=True)
            except Exception as e:
                print(f"  {name:12s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
