"""E17: 3-pass bf16 MXU emulation vs HIGHEST (6-pass) in the v3 kernel.

Mosaic does not lower ``Precision.HIGH``, but a manual hi/lo bf16 operand
split with the lo*lo term dropped gives the same 3-pass shape.  Expected:
MXU stage time halves (the kernel is compute-bound; MXU ~0.34ms of the
~0.78ms compute at n=1024), error rises from ~2e-7 to ~1.5e-5 (above the
fp32 suite's 2e-6 bar — so this can only be an opt-in fast tier, but it
bounds how much the MXU passes cost).
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


def bench_system(n: int, batch: int, n_lo=10, n_hi=60):
    plan = plan_axis(n)
    rng = np.random.default_rng(0)

    @jax.jit
    def fwd_inv(p):
        y = pe.fft_lines_p(p, plan, False)
        return pe.fft_lines_p(y, plan, True, scale=1.0 / n)

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


def err_check(n: int):
    plan = plan_axis(n)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((256, n)) + 1j * rng.standard_normal((256, n))
    p = Planar(jnp.asarray(x.real.astype(np.float32)),
               jnp.asarray(x.imag.astype(np.float32)))
    y = pe.fft_lines_p(p, plan, False)
    got = (np.asarray(y.re, dtype=np.float64)
           + 1j * np.asarray(y.im, dtype=np.float64))
    ref = np.fft.fft(x)
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))


def main():
    try:
        cache.enable_persistent_cache()
    except Exception as e:
        print("no persistent cache:", e, flush=True)
    target_bytes = 128 * 1024 * 1024
    for mode in (False, True):
        pe._V3_MXU_SPLIT3 = mode
        pe._build_fft_call_v3.cache_clear()
        tag = "3-pass" if mode else "HIGHEST"
        for n in (256, 1024, 4096):
            batch = max(1, target_bytes // (8 * n))
            g = bench_system(n, batch)
            e = err_check(n)
            print(f"{tag:8s} n={n:5d}: {g:6.1f} GB/s  err {e:.2e}", flush=True)


if __name__ == "__main__":
    main()
