"""E16: donation (input_output_aliases) on the round-2 production paths.

The round-1 finding "donation regresses on the public natural-order path"
was measured against the v2+reorder pipeline.  The production kernels are
now v3 (no reorder pass at all) and strided=v3-in-tl-layout, and E5 showed
v3+donation gains 5-10% in bare chains.  Re-measure the *production* bench
chains (fwd+inv fori loops, 128MB systems) donated vs undonated.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu import cache
from vkfft_tpu.pcomplex import Planar
from vkfft_tpu.planner import plan_axis
from vkfft_tpu.ops import pallas_engine as pe


def bench_system(n: int, batch: int, donate: bool, n_lo=10, n_hi=60):
    plan = plan_axis(n)
    rng = np.random.default_rng(0)

    @jax.jit
    def fwd_inv(p):
        y = pe.fft_lines_p(p, plan, False, donate=donate)
        return pe.fft_lines_p(y, plan, True, donate=donate, scale=1.0 / n)

    p0 = Planar(jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32)),
                jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32)))

    def make(iters):
        @jax.jit
        def run(p):
            return jax.lax.fori_loop(0, iters, lambda i, v: fwd_inv(v), p)
        return run

    f_lo, f_hi = make(n_lo), make(n_hi)
    float(np.asarray(f_lo(p0).re[0, 0]))
    float(np.asarray(f_hi(p0).re[0, 0]))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(p0).re[0, 0]))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(f_hi) - timed(f_lo)) / (n_hi - n_lo)
    return 4 * 2 * batch * n * 4 / dt / 1e9


def bench_3d(donate: bool, shape=(256, 256, 256), n_lo=2, n_hi=8):
    plans = [plan_axis(s) for s in shape]
    total = int(np.prod(shape))

    @jax.jit
    def fwd_inv(p):
        for ax in range(3):
            p = pe.fft_axis_p(p, ax, plans[ax], False, donate=donate)
        for ax in (2, 1):
            p = pe.fft_axis_p(p, ax, plans[ax], True, donate=donate)
        return pe.fft_axis_p(p, 0, plans[0], True, donate=donate,
                             scale=1.0 / total)

    rng = np.random.default_rng(0)
    p0 = Planar(jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
                jnp.asarray(rng.standard_normal(shape).astype(np.float32)))

    def make(iters):
        @jax.jit
        def run(p):
            return jax.lax.fori_loop(0, iters, lambda i, v: fwd_inv(v), p)
        return run

    f_lo, f_hi = make(n_lo), make(n_hi)
    float(np.asarray(f_lo(p0).re[0, 0, 0]))
    float(np.asarray(f_hi(p0).re[0, 0, 0]))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(p0).re[0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(f_hi) - timed(f_lo)) / (n_hi - n_lo)
    return 2 * 2 * 3 * 2 * total * 4 / dt / 1e9


def main():
    try:
        cache.enable_persistent_cache()
    except Exception as e:
        print("no persistent cache:", e, flush=True)
    target_bytes = 128 * 1024 * 1024
    for n in (256, 1024, 4096):
        batch = max(1, target_bytes // (8 * n))
        g0 = bench_system(n, batch, donate=False)
        g1 = bench_system(n, batch, donate=True)
        print(f"n={n:5d}: undonated {g0:6.1f}  donated {g1:6.1f} GB/s", flush=True)
    g0 = bench_3d(False)
    g1 = bench_3d(True)
    print(f"3-D 256^3: undonated {g0:6.1f}  donated {g1:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
