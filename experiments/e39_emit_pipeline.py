"""E39 (round 4): manual double-buffering via pltpu.emit_pipeline on the v3
kernel (verdict lever 1b — last unmeasured headline lever).

The production kernel relies on Mosaic's automatic grid pipelining
(BlockSpec grid + "parallel" semantics).  This experiment hands Mosaic an
EXPLICIT inner pipeline instead: the outer pallas_call has no grid and
HBM-resident data operands; pltpu.emit_pipeline drives the block loop with
double-buffered DMA.  If automatic pipelining is the limiter, this form
should beat the production 1.02-1.05 ms round trips at n=1024.

Usage: PYTHONPATH=... python -u experiments/e39_emit_pipeline.py
"""
import functools
import time
import numpy as np

GB = 1e9
TARGET = 128 * 1024 * 1024


def timed_chain(fn, p0, fetch, n_lo=10, n_hi=60, reps=3):
    import jax

    def make(iters):
        @jax.jit
        def run(p):
            return jax.lax.fori_loop(0, iters, lambda i, v: fn(v), p)
        return run

    f_lo, f_hi = make(n_lo), make(n_hi)
    fetch(f_lo(p0)); fetch(f_hi(p0))

    def t(f):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(f(p0))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(f_hi) - t(f_lo)) / (n_hi - n_lo)


@functools.lru_cache(maxsize=32)
def build_emit(n, batch, inverse, scale=1.0):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vkfft_tpu.ops import pallas_engine as pe

    sb = pe._V3_SB
    il = 1
    while (il < 8 and n * (2 * il) * sb * 4 < (8 << 20)
           and batch >= 4 * il * sb):
        il *= 2
    gb = sb * il
    assert batch % gb == 0
    vpu_tabs, mxu_tabs = pe._v3_tables(n, inverse, scale=scale, int8=False)
    np_tables = []
    for twr, twi, *_ in vpu_tabs:
        np_tables += [twr, twi]
    for Dp, twr, twi, r, L0, Mp in mxu_tabs:
        np_tables.append(Dp)
        if Mp > 1:
            np_tables += [twr, twi]
    prec = jax.lax.Precision.HIGHEST

    def inner(*refs):
        xr_blk, xi_blk = refs[0], refs[1]
        tab_refs = refs[2:-2]
        or_blk, oi_blk = refs[-2:]
        for i in range(il):
            xr = jnp.swapaxes(xr_blk[i * sb:(i + 1) * sb], 0, 1)
            xi = jnp.swapaxes(xi_blk[i * sb:(i + 1) * sb], 0, 1)
            xr, xi = pe._v3_apply_stages(xr, xi, sb, tab_refs, vpu_tabs,
                                         mxu_tabs, prec, inverse)
            or_blk[i * sb:(i + 1) * sb] = jnp.swapaxes(xr.reshape(n, sb), 0, 1)
            oi_blk[i * sb:(i + 1) * sb] = jnp.swapaxes(xi.reshape(n, sb), 0, 1)

    blk = lambda: pl.BlockSpec((gb, n), lambda i: (i, 0))
    tab_blk = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    def outer(*refs):
        xr_hbm, xi_hbm = refs[0], refs[1]
        tab_refs = refs[2:-2]
        or_hbm, oi_hbm = refs[-2:]
        pltpu.emit_pipeline(
            functools.partial(_inner_with_tables, tab_refs),
            grid=(batch // gb,),
            in_specs=[blk(), blk()],
            out_specs=[blk(), blk()],
        )(xr_hbm, xi_hbm, or_hbm, oi_hbm)

    def _inner_with_tables(tab_refs, xr_blk, xi_blk, or_blk, oi_blk):
        inner(xr_blk, xi_blk, *tab_refs, or_blk, oi_blk)

    import jax
    call = pl.pallas_call(
        outer,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(np_tables),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((batch, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pe._VMEM_LIMIT),
    )

    def run(xr, xi):
        return call(xr, xi, *(jnp.asarray(t) for t in np_tables))

    return run


def main():
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r[0][0, 0]))

    for n in (1024, 4096):
        b = TARGET // (8 * n)
        xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        data = 2 * b * n * 4

        # correctness
        try:
            fwd = build_emit(n, b, False)
            fr, fi = fwd(xr, xi)
            ref = np.fft.fft(np.asarray(xr[:4], np.float64)
                             + 1j * np.asarray(xi[:4], np.float64))
            got = np.asarray(fr[:4], np.float64) + 1j * np.asarray(fi[:4],
                                                                   np.float64)
            err = np.abs(got - ref).max() / np.abs(ref).max()
        except Exception as e:
            print(f"  emit n={n}: FAIL {repr(e)[:120]}", flush=True)
            continue

        inv = build_emit(n, b, True, scale=1.0 / n)

        def rt_emit(p, fwd=fwd, inv=inv):
            fr, fi = fwd(p[0], p[1])
            return inv(fr, fi)

        def rt_prod(p, n=n):
            fr, fi = pe.core_fft_planar_v3(p[0], p[1], n, False)
            return pe.core_fft_planar_v3(fr, fi, n, True, scale=1.0 / n)

        dt_e = timed_chain(rt_emit, (xr, xi), fetch)
        dt_p = timed_chain(rt_prod, (xr, xi), fetch)
        print(f"  n={n:5d} b={b}: emit_pipeline {dt_e*1e3:7.3f} ms "
              f"({4*data/dt_e/GB:6.1f} GB/s, err {err:.1e})  "
              f"production {dt_p*1e3:7.3f} ms ({4*data/dt_p/GB:6.1f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
