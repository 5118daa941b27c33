"""E15: strided-kernel tile width + chain splitting under the raised VMEM
limit.  The 3-D bench runs strided passes at n=256 with (1, 256, 256)
256KB blocks; the 4MB budget allows tile_s up to 4096.  Also probe
splitting a wide tile into independent chains (the il trick).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vkfft_tpu.ops import pallas_engine as pe


def bench_3d(shape=(256, 256, 256), n_lo=2, n_hi=8):
    from vkfft_tpu.pcomplex import Planar
    from vkfft_tpu.planner import plan_axis

    plans = [plan_axis(s) for s in shape]
    total = int(np.prod(shape))
    inv_n = np.float32(1.0 / total)

    @jax.jit
    def fwd_inv(p):
        for ax in range(3):
            p = pe.fft_axis_p(p, ax, plans[ax], False)
        for ax in (2, 1, 0):
            p = pe.fft_axis_p(p, ax, plans[ax], True)
        return Planar(p.re * inv_n, p.im * inv_n)

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
    moved = 2 * 2 * 3 * 2 * total * 4
    return moved / dt / 1e9


def strided_1d(n, p, s, lo=10, hi=40):
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((p, n, s)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((p, n, s)).astype(np.float32))
    inv_n = np.float32(1.0 / n)

    def fwd_inv(pair):
        a, b = pair
        fr, fi = pe.strided_fft_planar(a, b, n, False)
        br, bi = pe.strided_fft_planar(fr, fi, n, True)
        return (br * inv_n, bi * inv_n)

    def mk(it):
        @jax.jit
        def r(v):
            return jax.lax.fori_loop(0, it, lambda i, q: fwd_inv(q), v)
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
    return 4 * 2 * p * n * s * 4 / dt / 1e9


def main():
    import vkfft_tpu.ops.pallas_engine as _pe

    orig = _pe._strided_tile_s

    def set_target(kb):
        def tile(n, s, kb=kb):
            if s < 128:
                return 128
            target = max(256, min(8192, (kb * 1024) // (4 * n)))
            if s <= target:
                return s
            return max(256, (target // 256) * 256)
        _pe._strided_tile_s = tile
        _pe._build_strided_call.cache_clear()

    for kb in (256, 1024, 2048, 4096):
        set_target(kb)
        g1 = strided_1d(256, 1, 65536)
        print(f"tile target {kb:5d}KB: strided n=256 s=64K: {g1:6.1f} GB/s",
              flush=True)
    for kb in (256, 1024, 4096):
        set_target(kb)
        g3 = bench_3d()
        print(f"tile target {kb:5d}KB: 3-D 256^3: {g3:6.1f} GB/s", flush=True)
    _pe._strided_tile_s = orig


if __name__ == "__main__":
    main()
