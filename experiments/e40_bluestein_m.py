"""E40 (round 4): Bluestein padded-size shootout on hardware.

The structured choice m = Nc*Ns minimizes SIZE, but 20480 = 2^12*5 forces
a K=4 MXU tail stage in the conv kernel (terrible systolic fill), while
m = 32768 is 1.6x bigger yet runs K=128-class stages throughout.  Measure
the actual round trips:

  n=10007: m=20480 (current planner) vs m=32768 (pow-2 structured)
  n=7919:  m=15876 (v2 two-kernel conv, current) vs m=16384 (structured
           long-conv, nc=128 ns=128)

Usage: PYTHONPATH=... python -u experiments/e40_bluestein_m.py
"""
import time
import numpy as np

GB = 1e9


def timed_chain(fn, p0, fetch, n_lo=6, n_hi=30, reps=3):
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
    from vkfft_tpu import cache, luts
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar, planar_table

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r.re[0, 0]))

    def bluestein_rt(n, m, b):
        """fwd+inv at padded size m through the production pieces."""
        a_t, b_fwd = luts.bluestein_chirp(n, m, False)
        _, b_inv = luts.bluestein_chirp(n, m, True)
        a = planar_table(a_t, np.float32)

        def one(x, tab):
            y = pe._pad_tail_p(x * a[None, :], m - n)
            y = pe._conv_roundtrip_p(y, m, tab * (1.0 / m))
            return y[:, :n] * a[None, :]

        def rt(x):
            y = one(x, b_fwd)
            z = one(y, b_inv)
            return z * np.float32(1.0 / n)

        return rt

    for n, ms in ((10007, (20480, 32768)), (7919, (15876, 16384))):
        b = 64 * 1024 * 1024 // (8 * n)
        x = Planar(jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)),
                   jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)))
        for m in ms:
            route = ("fused-v3" if pe._use_v3(m) else
                     "v2-pair" if pe._use_v2(m) else
                     "long-conv" if (pe.split_long(m) or (1,))[0] % 128 == 0
                     else "fallback")
            try:
                # correctness probe
                rt = bluestein_rt(n, m, b)
                z = rt(x[:4])
                err = (np.abs(np.asarray(z.re) - np.asarray(x.re[:4])).max()
                       / np.abs(np.asarray(x.re[:4])).max())
                dt = timed_chain(rt, x, fetch)
                nominal = 4 * 2 * b * n * 4
                print(f"  n={n} m={m:6d} [{route:9s}]: {dt*1e3:8.3f} ms  "
                      f"nominal {nominal/dt/GB:6.1f} GB/s  rt err {err:.1e}",
                      flush=True)
            except Exception as e:
                print(f"  n={n} m={m}: FAIL {repr(e)[:110]}", flush=True)

    # smooth neighbor anchor
    n = 10240
    b = 64 * 1024 * 1024 // (8 * n)
    x = Planar(jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)),
               jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)))

    def rt_smooth(v, n=n):
        fr, fi = pe.core_fft_planar(v.re, v.im, n, False)
        orr, oi = pe.core_fft_planar(fr, fi, n, True, scale=1.0 / n)
        return Planar(orr, oi)

    dt = timed_chain(rt_smooth, x, fetch)
    nominal = 4 * 2 * b * n * 4
    print(f"  smooth n={n}: {dt*1e3:8.3f} ms  nominal {nominal/dt/GB:6.1f} "
          f"GB/s", flush=True)


if __name__ == "__main__":
    main()
