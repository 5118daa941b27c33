"""E19: R2C vs C2C bandwidth at n=1024 (VERDICT item 7's done-criterion:
in-kernel R2C should beat 1.5x the C2C bandwidth — it moves half the bytes
through one kernel, ``vkFFT_R2C.h:450`` analog; README.md:13 claims 2x).
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


def _timed(f, x, n_lo=10, n_hi=60):
    def make(iters):
        @jax.jit
        def run(p):
            return jax.lax.fori_loop(0, iters, lambda i, v: f(v), p)
        return run

    f_lo, f_hi = make(n_lo), make(n_hi)

    def force(y):
        leaf = jax.tree_util.tree_leaves(y)[0]
        return float(np.asarray(leaf).ravel()[0])

    force(f_lo(x)); force(f_hi(x))

    def t(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(f_hi) - t(f_lo)) / (n_hi - n_lo)


def main():
    try:
        cache.enable_persistent_cache()
    except Exception as e:
        print("no persistent cache:", e, flush=True)
    n = 1024
    target = 128 * 1024 * 1024
    # C2C: batch fills 128MB of planar complex data
    bc = target // (8 * n)
    plan = plan_axis(n)
    rng = np.random.default_rng(0)
    pc = Planar(jnp.asarray(rng.standard_normal((bc, n)).astype(np.float32)),
                jnp.asarray(rng.standard_normal((bc, n)).astype(np.float32)))

    def c2c(p):
        y = pe.fft_lines_p(p, plan, False)
        return pe.fft_lines_p(y, plan, True, scale=1.0 / n)

    dt_c = _timed(c2c, pc)
    gb_c = 4 * 2 * bc * n * 4 / dt_c / 1e9

    # R2C: real data, same 128MB real footprint (br lines of n reals)
    br = target // (4 * n)
    xr = jnp.asarray(rng.standard_normal((br, n)).astype(np.float32))
    m = n // 2

    def r2c_pair(x):
        ar, ai = pe.rfft_lines_planar(x)
        return pe.irfft_lines_planar(ar, ai, n, scale=1.0 / m)

    dt_r = _timed(r2c_pair, xr)
    # bytes: fwd reads n reals + writes 2(m+1) ~ n reals; inv mirrors
    gb_r = (2 * (br * n * 4 + br * 2 * (m + 1) * 4)) / dt_r / 1e9
    # per-transform time ratio at equal logical content (br real lines vs
    # bc complex lines both = 128MB): reference claims R2C ~2x faster
    print(f"C2C n={n}: {gb_c:6.1f} GB/s  ({dt_c*1e3:.3f} ms/iter, batch {bc})")
    print(f"R2C n={n}: {gb_r:6.1f} GB/s  ({dt_r*1e3:.3f} ms/iter, batch {br})")
    # time per point: c2c does bc*n complex pts; r2c br*n real pts
    tpp_c = dt_c / (bc * n)
    tpp_r = dt_r / (br * n)
    print(f"time/pt: c2c {tpp_c*1e12:.2f} ps, r2c {tpp_r*1e12:.2f} ps, "
          f"speedup {tpp_c/tpp_r:.2f}x (target >= 1.5x at equal real content "
          f"= 2 real pts per complex pt => ratio vs 0.5x baseline)")


if __name__ == "__main__":
    main()
