"""E27: hardware timing for the last round-3 rewrites — long path with the
v3 contiguous stage, per-line DCT-IV, merged-plane rfft2 pair."""
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

    def row(tag, dt, traffic):
        print(f"{tag:36s} {dt*1e3:8.3f} ms  {traffic/dt/GB:7.1f} GB/s",
              flush=True)

    # long path fwd+inv (natural order) at 2^17 and 2^20
    for k in (17, 20):
        n = 1 << k
        b = max(1, TARGET // (8 * n))
        p0 = Planar(jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)),
                    jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)))
        data = 2 * b * n * 4

        def rt(p, n=n):
            rr, ii = pe.fft_long_planar(p.re, p.im, n, False)
            rr, ii = pe.fft_long_planar(rr, ii, n, True, scale=1.0 / n)
            return Planar(rr, ii)

        fetch = lambda r: float(np.asarray(r.re[0, 0]))
        dt = timed_chain(rt, p0, fetch, n_lo=4, n_hi=16)
        # long path: strided + contiguous (+ reorder) per direction
        row(f"long n=2^{k} (v3 stage)", dt, 4 * data)

    # per-line DCT-IV (rewritten)
    n = 1024
    b = TARGET // (4 * n)
    x0 = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    fetch_a = lambda r: float(np.asarray(r[0, 0]))
    dt = timed_chain(lambda v: pe.dct4_lines(v, scale=1.0 / 2048), x0, fetch_a)
    row("dct4 n=1024 (per-line form)", dt, 2 * b * n * 4)

    # merged-plane rfft2 pair round trip
    ny = nz = 256
    b2 = TARGET // (4 * ny * nz)
    x2 = jnp.asarray(rng.standard_normal((b2, ny, nz)).astype(np.float32))

    def rt2(v):
        F = pe.rfft2_pair_planar(v)
        return pe.irfft2_pair_planar(F.re, F.im, ny, nz)

    fetch_3 = lambda r: float(np.asarray(r[0, 0, 0]))
    dt = timed_chain(rt2, x2, fetch_3)
    row(f"rfft2 pair {ny}x{nz} rt", dt, 4 * b2 * ny * nz * 4)


if __name__ == "__main__":
    main()
