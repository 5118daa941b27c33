"""E33 (round 4): first hardware batch for the verdict's perf levers.

  A. dimension_semantics=("parallel",) vs ("arbitrary",) in ISOLATION
     (verdict weak-1a / TODO_NEXT #1 — landed in round 3 untested).
  B. Pruned-stage zero-pad forward: full vs elided+pruned at h = n/4, n/2,
     3n/4 (verdict next-2; round-3 elision measured only 1.05-1.08x).
  C. DCT-IV hardware number for the round-3 per-line rewrite (verdict
     weak-8 / TODO_NEXT #5; e25 measured the OLD kernel at 5.67 ms).
  D. rfft2 merged-plane pair round-trip timing refresh (TODO_NEXT #6).

Usage: PYTHONPATH=... python -u experiments/e33_round4_levers.py [ABCD]
"""
import sys
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


def clear_builds(pe):
    pe._build_fft_call_v3.cache_clear()
    pe._build_strided_call.cache_clear()
    pe._build_pair_call.cache_clear()


def section_a(pe, jnp, rng, fetch_rr):
    from jax.experimental.pallas import tpu as pltpu
    print("== A: dimension_semantics parallel vs arbitrary ==", flush=True)
    orig = pe._vmem_params

    def arb_params(ndims: int = 1):
        return pltpu.CompilerParams(
            vmem_limit_bytes=pe._VMEM_LIMIT,
            dimension_semantics=("arbitrary",) * ndims)

    for n in (256, 1024, 4096):
        b = TARGET // (8 * n)
        xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        data = 2 * b * n * 4

        def fwd_inv(p, n=n):
            fr, fi = pe.core_fft_planar_v3(p[0], p[1], n, False)
            return pe.core_fft_planar_v3(fr, fi, n, True, scale=1.0 / n)

        for name, params in (("parallel", orig), ("arbitrary", arb_params)):
            pe._vmem_params = params
            clear_builds(pe)
            dt = timed_chain(fwd_inv, (xr, xi), fetch_rr)
            print(f"  v3 n={n:5d} b={b}: {name:9s} {dt*1e3:7.3f} ms  "
                  f"{4*data/dt/GB:6.1f} GB/s", flush=True)
        pe._vmem_params = orig
    for (p_, n, s) in ((1, 256, 65536),):
        xr = jnp.asarray(rng.standard_normal((p_, n, s)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((p_, n, s)).astype(np.float32))
        data = 2 * p_ * n * s * 4

        def fwd_inv(t, n=n):
            fr, fi = pe.strided_fft_planar(t[0], t[1], n, False)
            return pe.strided_fft_planar(fr, fi, n, True, scale=1.0 / n)

        fetch3 = lambda r: float(np.asarray(r[0][0, 0, 0]))
        for name, params in (("parallel", orig), ("arbitrary", arb_params)):
            pe._vmem_params = params
            clear_builds(pe)
            dt = timed_chain(fwd_inv, (xr, xi), fetch3)
            print(f"  strided n={n} s={s}: {name:9s} {dt*1e3:7.3f} ms  "
                  f"{4*data/dt/GB:6.1f} GB/s", flush=True)
        pe._vmem_params = orig
    clear_builds(pe)


def section_b(pe, jnp, rng, fetch_rr):
    print("== B: pruned-stage zero-pad forward (fwd-only chains) ==",
          flush=True)
    for n in (1024, 4096):
        b = TARGET // (8 * n)
        xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

        def full(p, n=n):
            return pe.core_fft_planar_v3(p[0], p[1], n, False)

        dt_full = timed_chain(full, (xr, xi), fetch_rr)
        print(f"  n={n:5d} b={b}: full      {dt_full*1e3:7.3f} ms", flush=True)
        for h in (n // 4, n // 2, 3 * n // 4):
            def pruned(p, n=n, h=h):
                return pe.core_fft_planar_v3(p[0], p[1], n, False,
                                             in_nonzero=h)
            dt = timed_chain(pruned, (xr, xi), fetch_rr)
            print(f"  n={n:5d} h={h:5d}: pruned   {dt*1e3:7.3f} ms  "
                  f"({dt_full/dt:.2f}x)", flush=True)


def section_c(pe, jnp, rng):
    print("== C: DCT-IV per-line kernel (round-3 rewrite) ==", flush=True)
    for n in (1024,):
        b = TARGET // (4 * n)
        x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

        def rt(v, n=n):
            y = pe.dct4_lines(v)
            return pe.dct4_lines(y, scale=1.0 / (4 * n))

        fetch1 = lambda r: float(np.asarray(r[0, 0]))
        dt = timed_chain(rt, x, fetch1)
        moved = 2 * 2 * b * n * 4
        print(f"  dct4 n={n} b={b}: {dt*1e3:7.3f} ms/roundtrip  "
              f"{moved/dt/GB:6.1f} GB/s", flush=True)


def section_d(pe, jnp, rng):
    print("== D: rfft2 pair 256x256 ==", flush=True)
    ny = nz = 256
    b = TARGET // (4 * ny * nz)
    x = jnp.asarray(rng.standard_normal((b, ny, nz)).astype(np.float32))

    def rt2(v):
        s = pe.rfft2_pair_planar(v)
        return pe.irfft2_pair_planar(s.re, s.im, ny, nz)

    fetch2 = lambda r: float(np.asarray(r[0, 0, 0]))
    dt = timed_chain(rt2, x, fetch2)
    moved = 2 * b * ny * nz * 4 + 2 * b * ny * (nz + 2) * 4
    print(f"  rfft2 {ny}x{nz} b={b}: {dt*1e3:7.3f} ms/roundtrip  "
          f"{moved/dt/GB:6.1f} GB/s (real+spectrum traffic)", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe

    sections = set((sys.argv[1] if len(sys.argv) > 1 else "ABCD").upper())
    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch_rr = lambda r: float(np.asarray(r[0][0, 0]))
    if "A" in sections:
        section_a(pe, jnp, rng, fetch_rr)
    if "B" in sections:
        section_b(pe, jnp, rng, fetch_rr)
    if "C" in sections:
        section_c(pe, jnp, rng)
    if "D" in sections:
        section_d(pe, jnp, rng)


if __name__ == "__main__":
    main()
