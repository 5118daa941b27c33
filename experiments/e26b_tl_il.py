"""E26b: combine the two e26 winners — il=8 interleaving AND the
transposed-intermediate (tl) layout — per headline system."""
from __future__ import annotations

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
    fetch_p = lambda r: float(np.asarray(r.re[0, 0]))

    def row(tag, dt, traffic):
        print(f"{tag:36s} {dt*1e3:8.3f} ms  {traffic/dt/GB:7.1f} GB/s",
              flush=True)

    for n, ils in ((256, (8,)), (1024, (4, 8)), (4096, (1, 2, 4))):
        b = TARGET // (8 * n)
        p0 = Planar(jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)),
                    jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)))
        data = 2 * b * n * 4
        print(f"== n={n} ==", flush=True)
        for il in ils:
            pe._V3_IL_OVERRIDE = il
            pe._build_fft_call_v3.cache_clear()
            try:
                fwd = pe._build_fft_call_v3(n, False, b, False, "float32",
                                            out_tl=True)
                inv = pe._build_fft_call_v3(n, True, b, False, "float32",
                                            in_tl=True, scale=1.0 / n)

                def rt_tl(p, fwd=fwd, inv=inv):
                    tr, ti = fwd(p.re, p.im)
                    rr, ii = inv(tr, ti)
                    return Planar(rr, ii)

                dt = timed_chain(rt_tl, p0, fetch_p)
                row(f"tl il={il}", dt, 4 * data)
            except Exception as e:
                print(f"tl il={il}: FAILED {repr(e)[:90]}", flush=True)
        pe._V3_IL_OVERRIDE = None
        pe._build_fft_call_v3.cache_clear()
        # natural path with the new 8MB auto budget (production default)

        def rt(p):
            rr, ii = pe.core_fft_planar_v3(p.re, p.im, n, False)
            rr, ii = pe.core_fft_planar_v3(rr, ii, n, True, scale=1.0 / n)
            return Planar(rr, ii)

        dt = timed_chain(rt, p0, fetch_p)
        row("natural auto(8MB budget)", dt, 4 * data)


if __name__ == "__main__":
    main()
