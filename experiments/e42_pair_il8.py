"""E42 (round 4): pair-kernel il=8 (e23 tuned il=4 vs 2 and stopped; the
pair is now the 3-D bottleneck at 1.10 ms/direction for 256^2 planes).
Also re-times the 3-D application round trip after the donation change.

Usage: PYTHONPATH=... python -u experiments/e42_pair_il8.py
"""
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
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache, api
    from vkfft_tpu.config import FFTConfig
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)

    ny = nz = 256
    b = TARGET // (8 * ny * nz)
    xr = jnp.asarray(rng.standard_normal((b, ny, nz)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, ny, nz)).astype(np.float32))
    data = 2 * b * ny * nz * 4
    fetch = lambda r: float(np.asarray(r[0][0, 0, 0]))

    def rt(p):
        fr, fi = pe.fft_pair_planar(p[0], p[1], ny, nz, False)
        return pe.fft_pair_planar(fr, fi, ny, nz, True,
                                  scale=1.0 / (ny * nz))

    for il in (None, 8, 16):
        pe._V3_IL_OVERRIDE = il
        pe._build_pair_call.cache_clear()
        try:
            dt = timed_chain(rt, (xr, xi), fetch)
            print(f"  pair 256x256 il={il or 'auto(4)'}: {dt*1e3:7.3f} ms  "
                  f"{4*data/dt/GB:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"  pair il={il}: FAIL {repr(e)[:90]}", flush=True)
        pe._V3_IL_OVERRIDE = None
        pe._build_pair_call.cache_clear()

    # 3-D application wall after donation
    shape = (256, 256, 256)
    app = api.FFTApplication(FFTConfig(shape=shape, normalize=True),
                             engine="pallas")
    p0 = Planar(jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
                jnp.asarray(rng.standard_normal(shape).astype(np.float32)))

    def rt3(p):
        return app.inverse(app.forward(p))

    dt = timed_chain(rt3, p0, lambda r: float(np.asarray(r.re[0, 0, 0])),
                     n_lo=2, n_hi=8)
    total = int(np.prod(shape))
    print(f"  3-D 256^3 app rt: {dt*1e3:7.3f} ms  actual "
          f"{2*2*2*total*8/dt/GB:6.1f} GB/s (2 uploads/dir)", flush=True)


if __name__ == "__main__":
    main()
