"""E47: the ONE-kernel Bluestein (conv-pair form) on hardware vs the
3-kernel long tier.  e44f state: 10007 11.53 ms (6.07x smooth/pt),
7919-via-bluestein 9.32.  Target: 10007 <= 5x (9.6 ms).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u experiments/e47_bluestein_pair.py
"""
import time
import numpy as np

TARGET = 64 * 1024 * 1024


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
    from vkfft_tpu.pcomplex import Planar

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r.re[0, 0]))
    smooth_pt = 1.938e-3 / (819 * 10240)   # e44d smooth 10240 reference

    for (n, m) in ((10007, 32768), (7919, 16384)):
        b = max(1, TARGET // (8 * n))
        x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        f = pe._bluestein_pair_p(p, n, m, False)
        ref = np.fft.fft(x[:2], axis=1)
        got = np.asarray(f.re[:2]) + 1j * np.asarray(f.im[:2])
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))

        def rt(v, n=n, m=m):
            g = pe._bluestein_pair_p(v, n, m, False)
            return pe._bluestein_pair_p(g, n, m, True, scale=1.0 / n)

        dt = timed_chain(rt, p, fetch)
        per = dt / (b * n) * 1e9
        print(f"bluestein_pair n={n} m={m}: rt {dt*1e3:8.3f} ms  "
              f"{per:6.3f} ns/pt  ({per/ (smooth_pt*1e9):.2f}x smooth)  "
              f"fwd_err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
