"""E14 (e13 variant): il/block ceiling probes — on >1MB blocks was the default VMEM limit —
CompilerParams(vmem_limit_bytes=100MB) unlocks them (E12: n=4096 compiles
at 309 GB/s).  Sweep the opened space: deeper interleaves at 1024/2048,
single-kernel 4096 il=2, and n=8192.

Usage: python experiments/e13_vmem_unlock.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkfft_tpu.ops import pallas_engine as pe

SB = 128


def make(n, batch, plan, il):
    vpu_f, mxu_f = pe._v3_tables(n, False, plan)
    vpu_i, mxu_i = pe._v3_tables(n, True, plan)
    prec = jax.lax.Precision.HIGHEST
    gb = SB * il

    def tables(vt, mt):
        out = []
        for twr, twi, *_ in vt:
            out += [twr, twi]
        for D, twr, twi, r, L0, Mp in mt:
            out.append(D)
            if Mp > 1:
                out += [twr, twi]
        return out

    def build(inverse):
        vt = vpu_i if inverse else vpu_f
        mt = mxu_i if inverse else mxu_f
        np_tables = tables(vt, mt)

        def kernel(xr_ref, xi_ref, *refs):
            or_ref, oi_ref = refs[-2:]
            trefs = refs[:-2]
            for i in range(il):
                xr = jnp.swapaxes(
                    xr_ref[0, i * SB:(i + 1) * SB].astype(jnp.float32), 0, 1)
                xi = jnp.swapaxes(
                    xi_ref[0, i * SB:(i + 1) * SB].astype(jnp.float32), 0, 1)
                xr, xi = pe._v3_apply_stages(xr, xi, SB, trefs, vt, mt,
                                             prec, inverse)
                or_ref[0, i * SB:(i + 1) * SB] = jnp.swapaxes(
                    xr.reshape(n, SB), 0, 1)
                oi_ref[0, i * SB:(i + 1) * SB] = jnp.swapaxes(
                    xi.reshape(n, SB), 0, 1)

        const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                       memory_space=pltpu.VMEM)
        spec = pl.BlockSpec((1, gb, n), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        in_specs = [spec, spec] + [const(t) for t in np_tables]
        macs = sum(r for *_, r, _, _ in mxu_f)
        ce = pl.CostEstimate(flops=2 * batch * n * (macs * 8 * 6 + 60),
                             transcendentals=0,
                             bytes_accessed=4 * 2 * batch * n * 2)
        call = pl.pallas_call(
            kernel, grid=(batch // gb,), in_specs=in_specs,
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((batch // gb, gb, n),
                                            jnp.float32)] * 2,
            cost_estimate=ce,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))

        def run(xr, xi):
            a, b = call(xr.reshape(batch // gb, gb, n),
                        xi.reshape(batch // gb, gb, n),
                        *[jnp.asarray(t) for t in np_tables])
            return a.reshape(batch, n), b.reshape(batch, n)
        return run

    return build(False), build(True)


def timeit(fwd, inv, batch, n, lo=10, hi=40):
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    inv_n = np.float32(1.0 / n)

    def fwd_inv(pair):
        a, b = pair
        fr, fi = fwd(a, b)
        br, bi = inv(fr, fi)
        return (br * inv_n, bi * inv_n)

    def mk(it):
        @jax.jit
        def r(p):
            return jax.lax.fori_loop(0, it, lambda i, v: fwd_inv(v), p)
        return r
    f_lo, f_hi = mk(lo), mk(hi)
    float(np.asarray(f_lo((xr, xi))[0].ravel()[0]))
    float(np.asarray(f_hi((xr, xi))[0].ravel()[0]))

    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f((xr, xi))[0].ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best
    dt = (t(f_hi) - t(f_lo)) / (hi - lo)
    return 4 * 2 * batch * n * 4 / dt / 1e9


def check_err(fwd, batch, n):
    rng = np.random.default_rng(1)
    xr = rng.standard_normal((batch, n)).astype(np.float32)
    xi = rng.standard_normal((batch, n)).astype(np.float32)
    yr, yi = fwd(jnp.asarray(xr), jnp.asarray(xi))
    got = np.asarray(yr[:4]) + 1j * np.asarray(yi[:4])
    ref = np.fft.fft(xr[:4] + 1j * xi[:4])
    return np.abs(got - ref).max() / np.abs(ref).max()


CASES = [
    (4096, ((4, 4, 4), (64,)), 4),
    (8192, ((4, 4, 4, 2), (64,)), 2),
    (2048, ((4, 4, 2), (64,)), 8),
    (256, ((4,), (64,)), 16),
    (1024, ((4, 4), (64,)), 8),
]


def main():
    target = 128 * 1024 * 1024
    for n, plan, il in CASES:
        batch = max(SB * il, target // (8 * n) // (SB * il) * (SB * il))
        tag = f"n={n} il={il} {plan}"
        try:
            fwd, inv = make(n, batch, plan, il)
            err = check_err(fwd, batch, n)
            gbs = timeit(fwd, inv, batch, n)
            print(f"  {tag:40s}: {gbs:7.1f} GB/s  err {err:.2e}", flush=True)
        except Exception as e:
            print(f"  {tag:40s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
