"""E23: round-3 fixes under the microscope (real TPU).

  1. r2c n=1024: PACKED aligned layout vs numpy (m+1)-wide layout — is the
     2052-byte row stride the 3x R2C slowdown (e22)?  il sweep on top.
  2. pair 256x256 with il interleaving vs the two-pass route.
  3. 3-D 256^3 app walk with the improved pair kernel.

Methodology: chained two-point (10/60), on-device scalar fetch.
"""
from __future__ import annotations

import sys
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


def row(tag, dt, traffic, note=""):
    print(f"{tag:40s} {dt*1e3:8.3f} ms  {traffic/dt/GB:7.1f} GB/s  {note}",
          flush=True)
    return traffic / dt / GB


def main():
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar
    from vkfft_tpu.planner import plan_axis
    from vkfft_tpu import api
    from vkfft_tpu.config import FFTConfig

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    sections = set(sys.argv[1:]) or {"r2c", "pair", "3d"}
    rng = np.random.default_rng(0)
    fetch_a = lambda r: float(np.asarray(r[(0,) * r.ndim]))
    fetch_p = lambda r: float(np.asarray(r.re[(0,) * r.re.ndim]))

    if "r2c" in sections:
        n = 1024
        b = TARGET // (4 * n)
        x0 = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        real_b = b * n * 4
        half_b = b * (n // 2) * 8

        def rt_packed(v):
            ar, ai = pe.rfft_lines_packed(v)
            return pe.irfft_lines_packed(ar, ai, n, scale=1.0 / (n // 2))

        def rt_numpy(v):
            ar, ai = pe.rfft_lines_planar(v)
            return pe.irfft_lines_planar(ar, ai, n, scale=1.0 / (n // 2))

        print("== r2c n=1024 layouts (fwd+inv), il sweep ==", flush=True)
        for il in (None, 1, 2, 4):
            pe._V3_IL_OVERRIDE = il
            pe._build_r2c_call.cache_clear()
            tag = f"il={il or 'auto'}"
            dt = timed_chain(rt_packed, x0, fetch_a)
            row(f"r2c packed {tag}", dt, 2 * (real_b + half_b))
        pe._V3_IL_OVERRIDE = None
        pe._build_r2c_call.cache_clear()
        dt = timed_chain(rt_numpy, x0, fetch_a)
        row("r2c numpy(m+1) layout il=auto", dt, 2 * (real_b + half_b))
        # c2c bar at equal real content
        b2 = b // 2
        plan = plan_axis(n)
        eng = api._engine("pallas")

        def rt_c(p):
            y = eng.fft_lines_p(p, plan, False)
            return eng.fft_lines_p(y, plan, True, scale=1.0 / n)

        p0 = Planar(jnp.asarray(rng.standard_normal((b2, n)).astype(np.float32)),
                    jnp.asarray(rng.standard_normal((b2, n)).astype(np.float32)))
        dt = timed_chain(rt_c, p0, fetch_p)
        row("c2c equal-real-content", dt, 4 * 2 * b2 * n * 4)

    if "pair" in sections:
        print("== pair 256x256 with il (fwd+inv) ==", flush=True)
        ny = nz = 256
        b = TARGET // (8 * ny * nz)
        plan_y, plan_z = plan_axis(ny), plan_axis(nz)
        p0 = Planar(jnp.asarray(rng.standard_normal((b, ny, nz)).astype(np.float32)),
                    jnp.asarray(rng.standard_normal((b, ny, nz)).astype(np.float32)))
        data = 2 * b * ny * nz * 4

        def pair_rt(p):
            q = pe.fft_pair_p(p, ny, nz, False)
            return pe.fft_pair_p(q, ny, nz, True, scale=1.0 / (ny * nz))

        def twopass_rt(p):
            q = pe.fft_axis_p(p, 2, plan_z, False)
            q = pe.fft_axis_p(q, 1, plan_y, False)
            q = pe.fft_axis_p(q, 1, plan_y, True)
            return pe.fft_axis_p(q, 2, plan_z, True, scale=1.0 / (ny * nz))

        for il in (None, 1, 2, 4):
            pe._V3_IL_OVERRIDE = il
            pe._build_pair_call.cache_clear()
            dt = timed_chain(pair_rt, p0, fetch_p)
            row(f"pair il={il or 'auto'}", dt, 4 * data, "(2 kernels/rt)")
        pe._V3_IL_OVERRIDE = None
        pe._build_pair_call.cache_clear()
        dt = timed_chain(twopass_rt, p0, fetch_p)
        row("two-pass", dt, 8 * data, "(4 kernels/rt)")

    if "3d" in sections:
        print("== 3-D 256^3 app walk (fwd+inv) ==", flush=True)
        shape = (256, 256, 256)
        total = int(np.prod(shape))
        p0 = Planar(jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
                    jnp.asarray(rng.standard_normal(shape).astype(np.float32)))
        data = 2 * total * 4
        app = api.FFTApplication(FFTConfig(shape=shape, normalize=True),
                                 engine="pallas")

        def rt(p):
            return app.inverse(app.forward(p))

        dt = timed_chain(rt, p0, fetch_p, n_lo=4, n_hi=16)
        row("3-D 256^3 pair-fused (il pair)", dt, 2 * 2 * 2 * data,
            "(2 uploads/dir)")


if __name__ == "__main__":
    main()
