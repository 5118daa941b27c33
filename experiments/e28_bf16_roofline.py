"""E28: the bf16-storage tier vs the HBM roofline.

The fp32/HIGHEST headline is compute-bound (6 bf16 MXU passes per
contraction — BENCH.md ceiling analysis).  The bf16 STORAGE tier
(halfPrecisionMemoryOnly analog) halves the bytes AND runs DEFAULT
precision (one MXU pass): this is the DMA-bound regime where the >=90%
roofline north star is meaningful.  Accuracy: ~3e-3 (storage rounding).
"""
from __future__ import annotations

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


def main():
    import jax.numpy as jnp
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r.re[0, 0]))

    for n in (256, 1024, 4096):
        # same element count as the fp32 headline; bf16 planes = half bytes
        b = TARGET // (8 * n)
        p0 = Planar(
            jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)).astype(jnp.bfloat16),
            jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)).astype(jnp.bfloat16))

        def rt(p, n=n):
            rr, ii = pe.core_fft_planar_v3(p.re, p.im, n, False)
            rr, ii = pe.core_fft_planar_v3(rr, ii, n, True, scale=1.0 / n)
            return Planar(rr, ii)

        dt = timed_chain(rt, p0, fetch)
        data = 2 * b * n * 2              # bf16 planes
        print(f"bf16 storage n={n:5d}: {dt*1e3:7.3f} ms  "
              f"{4*data/dt/GB:6.1f} GB/s  ({4*data/dt/GB/819*100:4.1f}% roofline)",
              flush=True)


def rfft2_alternative():
    """rfft2 via the generic route (1-D merged-slab r2c + strided y pass)
    vs the merged-plane pair kernel — justifies the use_r2c_pair gate."""
    import jax.numpy as jnp
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.transforms import r2c as tr2c
    rng = np.random.default_rng(0)
    ny = nz = 256
    b = TARGET // (4 * ny * nz)
    x = jnp.asarray(rng.standard_normal((b, ny, nz)).astype(np.float32))
    fetch = lambda r: float(np.asarray(r[0, 0, 0]))

    def rt_pair(v):
        F = pe.rfft2_pair_planar(v)
        return pe.irfft2_pair_planar(F.re, F.im, ny, nz)

    saved = pe.use_r2c_pair
    pe.use_r2c_pair = lambda *a: False
    try:
        def rt_generic(v):
            F = tr2c.rfftn(v, axes=(-2, -1))
            return tr2c.irfftn(F, s=(ny, nz), axes=(-2, -1))

        dt = timed_chain(rt_generic, x, fetch)
        print(f"rfft2 generic route rt : {dt*1e3:7.3f} ms", flush=True)
    finally:
        pe.use_r2c_pair = saved
    dt = timed_chain(rt_pair, x, fetch)
    print(f"rfft2 pair kernel rt   : {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    import sys
    secs = set(sys.argv[1:]) or {"bf16", "rfft2"}
    if "bf16" in secs:
        main()
    if "rfft2" in secs:
        rfft2_alternative()
