"""E12: make n=4096 compile on the v3 pipeline (current laggard: v2 at
~205 GB/s vs 350-400 for v3 sizes).

Known failures: (1, 128, 4096) blocks (2MB/plane) crash the remote Mosaic
compiler; tl layout needs >=128 lanes so sb<128 is shape-invalid there.

Candidates:
  a) nat sb=64 — (1, 64, 4096) 1MB blocks, swap to (4096, 64) partial-lane
     state (wastes half the lanes but compiles?)
  b) nat sb=32 — 0.5MB blocks
  c) nat sb=128 + explicit CompilerParams vmem limit raise
  d) split-operand: two (1, 128, 2048) windows per plane, lane-concat
     in-kernel (each DMA window 1MB)
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkfft_tpu.ops import pallas_engine as pe

N = 4096
PLAN = ((4, 4, 4), (64,))


def tables(vt, mt):
    out = []
    for twr, twi, *_ in vt:
        out += [twr, twi]
    for D, twr, twi, r, L0, Mp in mt:
        out.append(D)
        if Mp > 1:
            out += [twr, twi]
    return out


def make(batch, mode, sb=128):
    n = N
    vpu_f, mxu_f = pe._v3_tables(n, False, PLAN)
    vpu_i, mxu_i = pe._v3_tables(n, True, PLAN)
    prec = jax.lax.Precision.HIGHEST

    def build(inverse):
        vt = vpu_i if inverse else vpu_f
        mt = mxu_i if inverse else mxu_f
        np_tables = tables(vt, mt)
        const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                       memory_space=pltpu.VMEM)
        kw = {}
        if mode == "vmem":
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)

        if mode == "split":
            h = n // 2
            def kernel(xr0, xr1, xi0, xi1, *refs):
                or0, or1, oi0, oi1 = refs[-4:]
                trefs = refs[:-4]
                xr = jnp.swapaxes(jnp.concatenate(
                    [xr0[0], xr1[0]], axis=1).astype(jnp.float32), 0, 1)
                xi = jnp.swapaxes(jnp.concatenate(
                    [xi0[0], xi1[0]], axis=1).astype(jnp.float32), 0, 1)
                xr, xi = pe._v3_apply_stages(xr, xi, sb, trefs, vt, mt,
                                             prec, inverse)
                yr = jnp.swapaxes(xr.reshape(n, sb), 0, 1)
                yi = jnp.swapaxes(xi.reshape(n, sb), 0, 1)
                or0[0] = yr[:, :h]
                or1[0] = yr[:, h:]
                oi0[0] = yi[:, :h]
                oi1[0] = yi[:, h:]
            spec0 = pl.BlockSpec((1, sb, h), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
            spec1 = pl.BlockSpec((1, sb, h), lambda b: (b, 0, 1),
                                 memory_space=pltpu.VMEM)
            in_specs = [spec0, spec1, spec0, spec1] + [const(t)
                                                       for t in np_tables]
            out_specs = [spec0, spec1, spec0, spec1]
            out_shape = [jax.ShapeDtypeStruct((batch // sb, sb, n),
                                              jnp.float32)] * 4
            ce = pl.CostEstimate(flops=2 * batch * n * (64 * 8 * 6 + 60),
                                 transcendentals=0,
                                 bytes_accessed=4 * 2 * batch * n * 2)
            call = pl.pallas_call(kernel, grid=(batch // sb,),
                                  in_specs=in_specs, out_specs=out_specs,
                                  out_shape=out_shape, cost_estimate=ce,
                                  **kw)

            def run(xr, xi):
                a = xr.reshape(batch // sb, sb, n)
                b = xi.reshape(batch // sb, sb, n)
                tabs = [jnp.asarray(t) for t in np_tables]
                r0, r1, i0, i1 = call(a, a, b, b, *tabs)
                # NOTE: passing the same array twice; each spec window picks
                # its half, so (a, a) is correct for (left, right) windows
                out_r = r0  # windows wrote into the same logical array? no:
                return (jnp.concatenate([r0[..., :h], r1[..., h:]], -1)
                        .reshape(batch, n),
                        jnp.concatenate([i0[..., :h], i1[..., h:]], -1)
                        .reshape(batch, n))
            return run

        def kernel(xr_ref, xi_ref, *refs):
            or_ref, oi_ref = refs[-2:]
            trefs = refs[:-2]
            xr = jnp.swapaxes(xr_ref[0].astype(jnp.float32), 0, 1)
            xi = jnp.swapaxes(xi_ref[0].astype(jnp.float32), 0, 1)
            xr, xi = pe._v3_apply_stages(xr, xi, sb, trefs, vt, mt,
                                         prec, inverse)
            or_ref[0] = jnp.swapaxes(xr.reshape(n, sb), 0, 1)
            oi_ref[0] = jnp.swapaxes(xi.reshape(n, sb), 0, 1)

        spec = pl.BlockSpec((1, sb, n), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        in_specs = [spec, spec] + [const(t) for t in np_tables]
        ce = pl.CostEstimate(flops=2 * batch * n * (64 * 8 * 6 + 60),
                             transcendentals=0,
                             bytes_accessed=4 * 2 * batch * n * 2)
        call = pl.pallas_call(kernel, grid=(batch // sb,),
                              in_specs=in_specs, out_specs=[spec, spec],
                              out_shape=[jax.ShapeDtypeStruct(
                                  (batch // sb, sb, n), jnp.float32)] * 2,
                              cost_estimate=ce, **kw)

        def run(xr, xi):
            a, b = call(xr.reshape(batch // sb, sb, n),
                        xi.reshape(batch // sb, sb, n),
                        *[jnp.asarray(t) for t in np_tables])
            return a.reshape(batch, n), b.reshape(batch, n)
        return run

    return build(False), build(True)


def timeit(fwd, inv, batch, n=N, lo=10, hi=40):
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


def check_err(fwd, batch):
    rng = np.random.default_rng(1)
    xr = rng.standard_normal((batch, N)).astype(np.float32)
    xi = rng.standard_normal((batch, N)).astype(np.float32)
    yr, yi = fwd(jnp.asarray(xr), jnp.asarray(xi))
    got = np.asarray(yr[:4]) + 1j * np.asarray(yi[:4])
    ref = np.fft.fft(xr[:4] + 1j * xi[:4])
    return np.abs(got - ref).max() / np.abs(ref).max()


def main():
    batch = 4096
    for mode, sb in [("plain", 64), ("plain", 32), ("vmem", 128),
                     ("split", 128)]:
        tag = f"{mode} sb={sb}"
        try:
            fwd, inv = make(batch, mode, sb)
            err = check_err(fwd, batch)
            gbs = timeit(fwd, inv, batch)
            print(f"  {tag:16s}: {gbs:7.1f} GB/s  err {err:.2e}", flush=True)
        except Exception as e:
            print(f"  {tag:16s}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
