"""E8: where does v3's time go at n=1024?  copy floor ~643, v3 ~350 GB/s.

Ablation variants (some produce WRONG results — timing only):
  copy      plain block copy through VMEM (floor)
  swap      swapaxes in + roll + swapaxes out (transpose cost probe; the
            roll blocks Mosaic from cancelling the pair)
  vpuonly   entry/exit swaps + VPU stages only (no MXU dot)
  mxuonly   entry/exit swaps + MXU stage only (no VPU stages)
  full      the real v3 pipeline (correct results)
  tlfull    full pipeline on a transposed (n, batch) HBM layout — block is
            (n, sb) so NO in-kernel swapaxes at all (correct results for
            transposed in/out; chains stay in that layout throughout)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/e8_v3_ablation.py [n ...]
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

SB = 128


def make(n, batch, mode, inverse=False):
    vpu_tabs, mxu_tabs = pe._v3_tables(n, inverse)
    prec = jax.lax.Precision.HIGHEST
    tl = mode == "tlfull"

    np_tables = []
    for twr, twi, *_ in vpu_tabs:
        np_tables += [twr, twi]
    for D, twr, twi, r, L0, Mp in mxu_tabs:
        np_tables.append(D)
        if Mp > 1:
            np_tables += [twr, twi]

    def kernel(xr_ref, xi_ref, *refs):
        or_ref, oi_ref = refs[-2:]
        table_refs = refs[:-2]
        if tl:
            xr = xr_ref[...].astype(jnp.float32)
            xi = xi_ref[...].astype(jnp.float32)
        else:
            xr = jnp.swapaxes(xr_ref[0].astype(jnp.float32), 0, 1)
            xi = jnp.swapaxes(xi_ref[0].astype(jnp.float32), 0, 1)
        S = SB
        if mode == "copy":
            or_ref[...] = xr_ref[...]
            oi_ref[...] = xi_ref[...]
            return
        if mode == "swap":
            xr = pltpu.roll(xr, shift=1, axis=0)
            xi = pltpu.roll(xi, shift=1, axis=0)
        elif mode in ("full", "tlfull"):
            xr, xi = pe._v3_apply_stages(xr, xi, S, table_refs, vpu_tabs,
                                         mxu_tabs, prec, inverse)
        elif mode == "vpuonly":
            xr, xi = pe._v3_apply_stages(xr, xi, S, table_refs[: 2 * len(vpu_tabs)],
                                         vpu_tabs, [], prec, inverse)
        elif mode == "mxuonly":
            xr, xi = pe._v3_apply_stages(xr, xi, S, table_refs[2 * len(vpu_tabs):],
                                         [], mxu_tabs, prec, inverse)
        xr = xr.reshape(n, S)
        xi = xi.reshape(n, S)
        if tl:
            or_ref[...] = xr
            oi_ref[...] = xi
        else:
            or_ref[0] = jnp.swapaxes(xr, 0, 1)
            oi_ref[0] = jnp.swapaxes(xi, 0, 1)

    const = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    if tl:
        spec = pl.BlockSpec((n, SB), lambda b: (0, b),
                            memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((n, batch), jnp.float32)] * 2
    else:
        spec = pl.BlockSpec((1, SB, n), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((batch // SB, SB, n),
                                          jnp.float32)] * 2
    in_specs = [spec, spec] + [const(t) for t in np_tables]
    mxu_macs = sum(r for *_, r, _, _ in mxu_tabs)
    ce = pl.CostEstimate(flops=2 * batch * n * (mxu_macs * 8 * 6 + 40),
                         transcendentals=0,
                         bytes_accessed=4 * 2 * batch * n * 2)
    call = pl.pallas_call(kernel, grid=(batch // SB,), in_specs=in_specs,
                          out_specs=[spec, spec], out_shape=out_shape,
                          cost_estimate=ce)

    def run(xr, xi):
        if tl:
            a, b = call(xr, xi, *[jnp.asarray(t) for t in np_tables])
            return a, b
        a, b = call(xr.reshape(batch // SB, SB, n),
                    xi.reshape(batch // SB, SB, n),
                    *[jnp.asarray(t) for t in np_tables])
        return a.reshape(batch, n), b.reshape(batch, n)
    return run


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


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024]
    for n in sizes:
        batch = max(SB, (64 * 1024 * 1024 // (8 * n)) // SB * SB)
        print(f"== n={n} batch={batch}  plan={pe._v3_plan(n)} ==")
        for mode in ["copy", "swap", "vpuonly", "mxuonly", "full", "tlfull"]:
            tl = mode == "tlfull"
            try:
                fwd = make(n, batch, mode, False)
                inv = make(n, batch, mode, True)
                gbs, dt = timeit(fwd, inv, batch, n, tl)
                err = (check_err(fwd, batch, n, tl)
                       if mode in ("full", "tlfull") else float("nan"))
                print(f"  {mode:8s}: {gbs:7.1f} GB/s  ({dt*1e3:.3f} ms)"
                      f"  err {err:.2e}")
            except Exception as e:
                print(f"  {mode:8s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}")


if __name__ == "__main__":
    main()
