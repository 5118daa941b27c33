"""E31: can the v3 single-kernel ceiling rise to n=16384?  (8MB per plane
block at il=1 under the 100MB VMEM budget; if it compiles and beats the
2-pass long path, _V3_MAX_N rises.)"""
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

    for n in (16384, 32768):
        pe._V3_MAX_N = max(pe._V3_MAX_N, n)
        pe._v3_plan.cache_clear()
        b = TARGET // (8 * n)
        x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
        xr = jnp.asarray(x.real.astype(np.float32))
        xi = jnp.asarray(x.imag.astype(np.float32))
        data = 2 * b * n * 4
        # correctness first
        try:
            fr, fi = pe.core_fft_planar_v3(xr, xi, n, False)
            ref = np.fft.fft(x)
            got = np.asarray(fr) + 1j * np.asarray(fi)
            err = np.abs(got - ref).max() / np.abs(ref).max()
            print(f"v3 n={n}: compiles, rel_err {err:.2e}", flush=True)
        except Exception as e:
            print(f"v3 n={n}: FAILED {repr(e)[:110]}", flush=True)
            continue

        def rt(p, n=n):
            rr, ii = pe.core_fft_planar_v3(p.re, p.im, n, False)
            rr, ii = pe.core_fft_planar_v3(rr, ii, n, True, scale=1.0 / n)
            return Planar(rr, ii)

        dt = timed_chain(rt, Planar(xr, xi), fetch)
        print(f"v3 n={n} single-kernel rt: {dt*1e3:7.3f} ms  "
              f"{4*data/dt/GB:6.1f} GB/s", flush=True)

        # the long-path alternative (production route today)
        pe._V3_MAX_N = 8192
        pe._v3_plan.cache_clear()
        pe.split_long.cache_clear()

        def rt_long(p, n=n):
            rr, ii = pe.fft_long_planar(p.re, p.im, n, False)
            rr, ii = pe.fft_long_planar(rr, ii, n, True, scale=1.0 / n)
            return Planar(rr, ii)

        dt = timed_chain(rt_long, Planar(xr, xi), fetch)
        print(f"long n={n} 2-pass rt   : {dt*1e3:7.3f} ms  "
              f"{4*data/dt/GB:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
