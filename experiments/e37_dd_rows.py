"""E37 (round 4): hardware bandwidth rows for the dd (quad-class) STRIDED
and FOUR-STEP paths (verdict weak-6 — round 3 had only the contiguous
n=1024 number, 49.5 GB/s of quad-plane bytes).

Usage: PYTHONPATH=... python -u experiments/e37_dd_rows.py
"""
import time
import numpy as np

GB = 1e9


def timed_chain(fn, p0, fetch, n_lo=4, n_hi=24, reps=3):
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
    from vkfft_tpu.precision.dd_fft import (fft_lines_dd, dd_scale,
                                            fft_axis_dd, _use_dd_fourstep)
    from vkfft_tpu.precision.doubledouble import DD, DDComplex

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r.re.hi[(0,) * r.re.hi.ndim]))

    def mk(shape):
        z = jnp.zeros(shape, jnp.float32)
        return DDComplex(
            DD(jnp.asarray(rng.standard_normal(shape).astype(np.float32)), z),
            DD(jnp.asarray(rng.standard_normal(shape).astype(np.float32)), z))

    # contiguous refresh + four-step rows (quad planes = 16 bytes/point)
    for n, b in ((1024, 4096), (4096, 1024), (16384, 256), (65536, 64)):
        x = mk((b, n))
        four = _use_dd_fourstep(n)

        def rt(v, n=n):
            y = fft_lines_dd(v, n, False)
            return dd_scale(fft_lines_dd(y, n, True), 1.0 / n)

        try:
            dt = timed_chain(rt, x, fetch)
        except Exception as e:
            print(f"  dd n={n}: FAIL {repr(e)[:100]}", flush=True)
            continue
        moved = 4 * 16 * b * n   # fwd+inv, r+w, 4 fp32 planes
        print(f"  dd {'four-step' if four else 'contig   '} n={n:6d} b={b}: "
              f"{dt*1e3:8.3f} ms  {moved/dt/GB:6.1f} GB/s of quad bytes",
              flush=True)

    # strided row: middle axis of (B, n, s)
    for n, s, b in ((256, 512, 2),):
        x = mk((b, n, s))

        def rt3(v, n=n):
            y = fft_axis_dd(v, 1, n, False)
            return dd_scale(fft_axis_dd(y, 1, n, True), 1.0 / n)

        try:
            dt = timed_chain(rt3, x, fetch)
        except Exception as e:
            print(f"  dd strided n={n}: FAIL {repr(e)[:100]}", flush=True)
            continue
        moved = 4 * 16 * b * n * s
        print(f"  dd strided   n={n:6d} s={s} b={b}: {dt*1e3:8.3f} ms  "
              f"{moved/dt/GB:6.1f} GB/s of quad bytes", flush=True)


if __name__ == "__main__":
    main()
