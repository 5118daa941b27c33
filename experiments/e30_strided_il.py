"""E30: strided-kernel il sweep (the 3-D outer pass shape)."""
import time
import numpy as np

GB = 1e9


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
    from vkfft_tpu.planner import plan_axis

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r.re[0, 0, 0]))
    n = 256
    plan = plan_axis(n)
    p0 = Planar(jnp.asarray(rng.standard_normal((n, 256, 256)).astype(np.float32)),
                jnp.asarray(rng.standard_normal((n, 256, 256)).astype(np.float32)))
    data = 2 * n * 256 * 256 * 4

    def rt(p):
        q = pe.fft_axis_p(p, 0, plan, False)
        return pe.fft_axis_p(q, 0, plan, True, scale=1.0 / n)

    for il in (1, 2, 4, 8, None):
        pe._V3_IL_OVERRIDE = il
        pe._build_strided_call.cache_clear()
        try:
            dt = timed_chain(rt, p0, fetch)
            print(f"strided n=256 s=64Ki il={il or 'auto'}: {dt*1e3:7.3f} ms  "
                  f"{4*data/dt/GB:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"il={il}: FAILED {repr(e)[:90]}", flush=True)
    pe._V3_IL_OVERRIDE = None
    pe._build_strided_call.cache_clear()


if __name__ == "__main__":
    main()
