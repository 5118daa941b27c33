"""E44 (round 5): fused long-tier Bluestein on hardware.

Round-4 rows (fact 40, 64MB sets, fwd+inv): 10007 17.58 ms (9.2x smooth
10240 per point; with pow-2 m + fixes ~8x), 7919 Rader 5.52 ms (2.9x),
smooth 10240 1.91 ms.  Verdict targets: 10007 <= 5x, 7919 <= 2x per point.

Measures: 10007 via the chirp-fused 3-kernel tier; 7919 via (a) its
production Rader path, (b) forced fused-long Bluestein m=16384 — if (b)
wins, large Rader primes reroute (the TPU-native answer to in-kernel
Rader: the chirp mults fuse where the generator permutations cannot).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u experiments/e44_bluestein_fused_long.py
"""
import time
import numpy as np

GB = 1e9
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
    from vkfft_tpu.planner.plan import plan_axis

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r.re[0, 0]))

    rows = []

    def bench(tag, n, rt_fn, check_fn=None):
        b = max(1, TARGET // (8 * n))
        x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        if check_fn is not None:
            f = check_fn(p, n)
            ref = np.fft.fft(x[:2], axis=1)
            got = np.asarray(f.re[:2]) + 1j * np.asarray(f.im[:2])
            err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        else:
            err = float("nan")
        dt = timed_chain(lambda v: rt_fn(v, n), p, fetch)
        per_pt = dt / (b * n) * 1e9
        rows.append((tag, n, dt, per_pt))
        print(f"{tag:34s} n={n:6d} b={b:5d}: rt {dt*1e3:8.3f} ms  "
              f"{per_pt:7.3f} ns/pt  fwd_err {err:.2e}", flush=True)
        return per_pt

    def prod_rt(p, n):
        plan = plan_axis(n)
        f = pe.fft_lines_p(p, plan, False)
        return pe.fft_lines_p(f, plan, True, scale=1.0 / n)

    def prod_fwd(p, n):
        return pe.fft_lines_p(p, plan_axis(n), False)

    def blue_rt(m):
        def rt(p, n):
            f = pe._bluestein_long_fused_p(p, n, m, False)
            return pe._bluestein_long_fused_p(f, n, m, True, scale=1.0 / n)
        return rt

    def blue_fwd(m):
        return lambda p, n: pe._bluestein_long_fused_p(p, n, m, False)

    import os
    smooth = bench("smooth 10240 (long path)", 10240, prod_rt, prod_fwd)
    p7 = bench("7919 production (Rader)", 7919, prod_rt, prod_fwd)
    p7b = bench("7919 fused-long Bluestein m=16384", 7919,
                blue_rt(16384), blue_fwd(16384))
    p10 = bench("10007 fused-long Bluestein (prod)", 10007, prod_rt, prod_fwd)
    if os.environ.get("E44_RUN_10006") == "1":
        # long compile chain (SPLIT: 2 x 5003-bluestein constituents);
        # sample 7 is the artifact home for this row
        p6 = bench("10006 production (SPLIT)", 10006, prod_rt, prod_fwd)

    print(f"\nper-point ratios vs smooth 10240:", flush=True)
    for tag, n, dt, per in rows[1:]:
        print(f"  {tag:34s}: {per / smooth:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
