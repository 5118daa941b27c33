"""E43c: full 3-D application round trip with the outer-axis kernel wired in.

Round-4 closing numbers: 256^3 rt 3.82-4.18 ms (257-281 GB/s actual).
Target (VERDICT round 5 item 1): >= ~325 GB/s (rt <= 3.3 ms).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u experiments/e43c_3d_app.py
"""
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
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import api, cache
    from vkfft_tpu.config import FFTConfig
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)

    # tr sweep for the standalone x-pass at 256^3
    n = 256
    shape4 = (1, 256, 256, 256)
    xr = jnp.asarray(rng.standard_normal(shape4).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal(shape4).astype(np.float32))
    data = 2 * 256**3 * 4
    fetch4 = lambda r: float(np.asarray(r[0][0, 0, 0, 0]))
    orig = pe._outer_tr
    for tr_budget in (2, 4, 8):   # 2MB..8MB targets -> tr = 8/16/32 here
        pe._build_outer_call.cache_clear()

        def patched(n_, r_dim, nz, _b=tr_budget):
            budget = max(1, (_b << 20) // (4 * n_ * nz))
            cap = min(r_dim, budget)
            cands = [t for t in range(8, cap + 1, 8) if r_dim % t == 0]
            if cands:
                return cands[-1]
            cands = [t for t in range(1, cap + 1) if r_dim % t == 0]
            return cands[-1] if cands else 1

        pe._outer_tr = patched

        def rt(p):
            a, b = pe.outer_fft_planar(p[0], p[1], n, False)
            return pe.outer_fft_planar(a, b, n, True, scale=1.0 / n)

        tr_val = patched(256, 256, 256)
        dt = timed_chain(rt, (xr, xi), fetch4)
        print(f"x-pass tr={tr_val:3d}: rt {dt*1e3:7.3f} ms  "
              f"{4*data/dt/GB:6.1f} GB/s eff", flush=True)
    pe._outer_tr = orig
    pe._build_outer_call.cache_clear()

    # full application 256^3 round trip
    for cube in (128, 256):
        shape = (cube, cube, cube)
        app = api.FFTApplication(FFTConfig(shape=shape, normalize=True),
                                 engine="pallas")
        p0 = Planar(
            jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
            jnp.asarray(rng.standard_normal(shape).astype(np.float32)))
        d = 2 * cube**3 * 4
        fetch = lambda r: float(np.asarray(r.re[0, 0, 0]))

        def rt_app(p):
            return app._inv(app._fwd(p))

        # correctness spot check
        f = app._fwd(p0)
        ref = np.fft.fftn(np.asarray(p0.re)[:2, :2, :]
                          + 1j * np.asarray(p0.im)[:2, :2, :], axes=(-1,))
        dt = timed_chain(rt_app, p0, fetch)
        # bench.py convention: actual = uploads/dir (2: pair + outer) x
        # (read+write) x 2 directions = 8 passes of the planar array
        print(f"3-D {cube}^3 app rt: {dt*1e3:7.3f} ms  "
              f"actual {8*d/dt/GB:6.1f} GB/s  "
              f"(3-pass-equiv {12*d/dt/GB:6.1f})", flush=True)

        b = app._inv(f)
        err = float(jnp.max(jnp.abs(b.re - p0.re)))
        print(f"  rt max abs err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
