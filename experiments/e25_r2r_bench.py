"""E25: hardware bandwidth of the rebuilt real-transform kernels (round 3).

All r2c/DCT kernels were rebuilt on the no-shuffle principles (merged-slab
line pairing, per-line complex pipelines, zero reversal/permutation ops —
e24 series).  Measures each family fwd (+inv where defined) on 128MB-class
real working sets; GB/s of actual HBM traffic.
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
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r[0, 0]))

    def row(tag, dt, traffic):
        print(f"{tag:34s} {dt*1e3:8.3f} ms  {traffic/dt/GB:7.1f} GB/s",
              flush=True)

    # r2c round trips
    n = 1024
    b = TARGET // (4 * n)
    x0 = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    m = n // 2

    def rt_planar(v):
        ar, ai = pe.rfft_lines_planar(v)
        return pe.irfft_lines_planar(ar, ai, n, scale=1.0 / m)

    def rt_packed(v):
        ar, ai = pe.rfft_lines_packed(v)
        return pe.irfft_lines_packed(ar, ai, n, scale=1.0 / m)

    real_b = b * n * 4
    dt = timed_chain(rt_planar, x0, fetch)
    row("r2c rt n=1024 planar(m+1)", dt, 4 * real_b)
    dt = timed_chain(rt_packed, x0, fetch)
    row("r2c rt n=1024 packed", dt, 4 * real_b)

    # DCT families, forward chains (bounded: scale keeps magnitudes sane)
    for tag, fn, nn in [
        ("dct2 n=1024", lambda v: pe.dct2_lines(v, scale=1.0 / 2048), 1024),
        ("dct3 n=1024", lambda v: pe.dct3_lines(v, scale=1.0 / 2048), 1024),
        ("dst2 n=1024", lambda v: pe.dst2_lines(v, scale=1.0 / 2048), 1024),
        ("dct1 n=1025", lambda v: pe.dct1_lines(v, scale=1.0 / 2048), 1025),
        ("dst1 n=1023", lambda v: pe.dst1_lines(v, scale=1.0 / 2048), 1023),
        ("dct4 n=1024", lambda v: pe.dct4_lines(v, scale=1.0 / 2048), 1024),
    ]:
        bb = TARGET // (4 * nn)
        xx = jnp.asarray(rng.standard_normal((bb, nn)).astype(np.float32))
        dt = timed_chain(fn, xx, fetch)
        row(tag, dt, 2 * bb * nn * 4)


if __name__ == "__main__":
    main()
