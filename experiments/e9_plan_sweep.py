"""E9: stage-plan sweep for the v3 pipeline in both layouts.

Questions (real v5e):
  1. MXU efficiency vs contraction depth: is one K=128 packed stage (r=64)
     faster than two r<=32 stages (K<=64, partial tile)?  Decides whether
     the strided kernel's (n1, n2) two-matmul split should become
     v3-style VPU stages + one 64-point MXU stage.
  2. Best (vpu, mxu) plan per n for tl (batch-in-lanes, no swap — the
     strided-kernel layout) and nat (swapaxes in/out) layouts.
  3. interleave: two independent half-block pipelines per grid step — does
     Mosaic overlap VPU stages of one with MXU stage of the other?
  4. n=4096 compile hunt (sb 32/64, plan variants).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/e9_plan_sweep.py [n ...]
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


def make(n, batch, plan, layout="tl", sb=128, interleave=1):
    vpu_tabs, mxu_tabs = pe._v3_tables(n, False, plan)
    vpu_tabs_i, mxu_tabs_i = pe._v3_tables(n, True, plan)
    prec = jax.lax.Precision.HIGHEST

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
        vt = vpu_tabs_i if inverse else vpu_tabs
        mt = mxu_tabs_i if inverse else mxu_tabs
        np_tables = tables(vt, mt)

        def kernel(xr_ref, xi_ref, *refs):
            or_ref, oi_ref = refs[-2:]
            table_refs = refs[:-2]
            if layout == "tl":
                S = sb * interleave
                xr = xr_ref[...].astype(jnp.float32)
                xi = xi_ref[...].astype(jnp.float32)
                xr, xi = pe._v3_apply_stages(xr, xi, S, table_refs, vt, mt,
                                             prec, inverse)
                or_ref[...] = xr.reshape(n, S)
                oi_ref[...] = xi.reshape(n, S)
            else:
                parts = []
                for i in range(interleave):
                    xr = jnp.swapaxes(
                        xr_ref[0, i * sb:(i + 1) * sb].astype(jnp.float32),
                        0, 1)
                    xi = jnp.swapaxes(
                        xi_ref[0, i * sb:(i + 1) * sb].astype(jnp.float32),
                        0, 1)
                    yr, yi = pe._v3_apply_stages(xr, xi, sb, table_refs, vt,
                                                 mt, prec, inverse)
                    parts.append((yr.reshape(n, sb), yi.reshape(n, sb)))
                or_ref[0] = jnp.concatenate(
                    [jnp.swapaxes(p[0], 0, 1) for p in parts], axis=0)
                oi_ref[0] = jnp.concatenate(
                    [jnp.swapaxes(p[1], 0, 1) for p in parts], axis=0)

        const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                       memory_space=pltpu.VMEM)
        gb = sb * interleave
        if layout == "tl":
            spec = pl.BlockSpec((n, gb), lambda b: (0, b),
                                memory_space=pltpu.VMEM)
            out_shape = [jax.ShapeDtypeStruct((n, batch), jnp.float32)] * 2
        else:
            spec = pl.BlockSpec((1, gb, n), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
            out_shape = [jax.ShapeDtypeStruct((batch // gb, gb, n),
                                              jnp.float32)] * 2
        in_specs = [spec, spec] + [const(t) for t in np_tables]
        mxu_macs = sum(r for *_, r, _, _ in (mxu_tabs))
        ce = pl.CostEstimate(flops=2 * batch * n * (mxu_macs * 8 * 6 + 40),
                             transcendentals=0,
                             bytes_accessed=4 * 2 * batch * n * 2)
        call = pl.pallas_call(kernel, grid=(batch // gb,), in_specs=in_specs,
                              out_specs=[spec, spec], out_shape=out_shape,
                              cost_estimate=ce)

        def run(xr, xi):
            if layout == "tl":
                return call(xr, xi, *[jnp.asarray(t) for t in np_tables])
            a, b = call(xr.reshape(batch // gb, gb, n),
                        xi.reshape(batch // gb, gb, n),
                        *[jnp.asarray(t) for t in np_tables])
            return a.reshape(batch, n), b.reshape(batch, n)
        return run

    return build(False), build(True)


def timeit(fwd, inv, batch, n, tl, lo=10, hi=60):
    rng = np.random.default_rng(0)
    shape = (n, batch) if tl else (batch, n)
    xr = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    inv_n = np.float32(1.0 / n)

    def fwd_inv(pair):
        a, b = pair
        fr, fi = fwd(a, b)
        br, bi = inv(fr, fi)
        return (br * inv_n, bi * inv_n)

    def mk(iters):
        @jax.jit
        def runner(pair):
            return jax.lax.fori_loop(0, iters, lambda i, v: fwd_inv(v), pair)
        return runner

    f_lo, f_hi = mk(lo), mk(hi)
    float(np.asarray(f_lo((xr, xi))[0].ravel()[0]))
    float(np.asarray(f_hi((xr, xi))[0].ravel()[0]))

    def t(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f((xr, xi))[0].ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(f_hi) - t(f_lo)) / (hi - lo)
    moved = 4 * 2 * batch * n * 4
    return moved / dt / 1e9, dt


def check_err(fwd, batch, n, tl):
    rng = np.random.default_rng(1)
    xr = rng.standard_normal((batch, n)).astype(np.float32)
    xi = rng.standard_normal((batch, n)).astype(np.float32)
    if tl:
        yr, yi = fwd(jnp.asarray(xr.T.copy()), jnp.asarray(xi.T.copy()))
        got = np.asarray(yr).T[:8] + 1j * np.asarray(yi).T[:8]
    else:
        yr, yi = fwd(jnp.asarray(xr), jnp.asarray(xi))
        got = np.asarray(yr[:8]) + 1j * np.asarray(yi[:8])
    ref = np.fft.fft(xr[:8] + 1j * xi[:8])
    return np.abs(got - ref).max() / np.abs(ref).max()


PLANS = {
    256: [((4,), (64,)), ((4, 4), (16,)), ((2,), (32,)), ((), (64, 4))],
    512: [((4, 2), (64,)), ((4, 4), (32,)), ((4, 4, 2), (16,))],
    1024: [((4, 4), (64,)), ((4, 4, 4), (16,)), ((4, 4, 2), (32,))],
    2048: [((4, 4, 2), (64,)), ((4, 4, 4), (32,)), ((4, 4, 4, 2), (16,))],
    4096: [((4, 4, 4), (64,)), ((4, 4, 4, 4), (16,)), ((4, 4), (16, 16))],
}


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024]
    for n in sizes:
        batch = max(512, (64 * 1024 * 1024 // (8 * n)) // 512 * 512)
        print(f"== n={n} batch={batch} ==", flush=True)
        sbs = [128] if n < 4096 else [64, 32]
        for plan in PLANS[n]:
            for layout in (["tl", "nat"] if n < 4096 else ["tl"]):
                for sb in sbs:
                    for il in [1, 2, 4]:
                        tag = f"{layout} sb={sb} il={il} {plan}"
                        try:
                            fwd, inv = make(n, batch, plan, layout, sb, il)
                            gbs, dt = timeit(fwd, inv, batch, n,
                                             layout == "tl")
                            err = check_err(fwd, batch, n, layout == "tl")
                            print(f"  {tag:44s}: {gbs:7.1f} GB/s "
                                  f"({dt*1e3:.3f} ms)  err {err:.2e}",
                                  flush=True)
                        except Exception as e:
                            print(f"  {tag:44s}: FAILED {type(e).__name__}: "
                                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
