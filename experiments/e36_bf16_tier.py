"""E36 (round 4): bf16-storage tier after the storage-width transpose fix
(entry relayout at 16 bits, exit narrow-then-swap) and dtype-aware il
budgets.  Round-3 baseline (e28): 268/296/253 GB/s of bf16 bytes at
n=256/1024/4096 (~35% of roofline); verdict done-bar: >= 50%.

Also sanity-checks the fp32 headline rt (the transpose-order change is a
no-op for f32) and sweeps il for bf16.

Usage: PYTHONPATH=... python -u experiments/e36_bf16_tier.py
"""
import time
import numpy as np

GB = 1e9
TARGET = 128 * 1024 * 1024   # of STORAGE bytes (bf16: half the elements)


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
    fetch = lambda r: float(np.asarray(r[0][0, 0]))

    print("== bf16 storage tier (bytes = bf16 bytes) ==", flush=True)
    for n in (256, 1024, 4096):
        b = TARGET // (4 * n)   # 2 bf16 planes = 4 bytes/point
        xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)
                         .astype(jnp.bfloat16))
        xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)
                         .astype(jnp.bfloat16))
        data = 2 * b * n * 2

        def rt(p, n=n):
            fr, fi = pe.core_fft_planar_v3(p[0], p[1], n, False)
            return pe.core_fft_planar_v3(fr, fi, n, True, scale=1.0 / n)

        dt = timed_chain(rt, (xr, xi), fetch)
        print(f"  bf16 n={n:5d} b={b}: {dt*1e3:7.3f} ms  "
              f"{4*data/dt/GB:6.1f} GB/s of bf16 bytes "
              f"({4*data/dt/GB/819*100:4.1f}% roofline)", flush=True)
        # il sweep
        for force in (8, 16):
            pe._V3_IL_OVERRIDE = force
            pe._build_fft_call_v3.cache_clear()
            try:
                dt = timed_chain(rt, (xr, xi), fetch)
                print(f"    il={force:2d}: {dt*1e3:7.3f} ms  "
                      f"{4*data/dt/GB:6.1f} GB/s", flush=True)
            except Exception as e:
                print(f"    il={force}: fail {repr(e)[:80]}", flush=True)
            pe._V3_IL_OVERRIDE = None
            pe._build_fft_call_v3.cache_clear()

    print("== fp32 sanity (transpose-order change must be a no-op) ==",
          flush=True)
    for n in (1024,):
        b = TARGET // (8 * n)
        xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        data = 2 * b * n * 4

        def rt(p, n=n):
            fr, fi = pe.core_fft_planar_v3(p[0], p[1], n, False)
            return pe.core_fft_planar_v3(fr, fi, n, True, scale=1.0 / n)

        dt = timed_chain(rt, (xr, xi), fetch)
        print(f"  fp32 n={n}: {dt*1e3:7.3f} ms  {4*data/dt/GB:6.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
