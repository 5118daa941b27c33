"""E34 (round 4): isolate the pruned-stage zero-pad saving with STATIONARY
forward chains.

e33 section B used unnormalized fwd-only chains — values explode to inf
within a few iterations and the measured 0.92 ms/fwd at n=1024 is ~2x the
0.51 ms the round-trip numbers imply, so inf/nan operand handling appears to
poison the timing (and likely poisoned round 3's 1.05-1.08x sample-4 numbers
too).  Here every chain folds scale=1/sqrt(n) into the kernel tables, which
keeps iterated magnitudes stationary at zero extra runtime cost.

Variants per (n, h): full | elide-dense (read elision, dense zero-fill, the
round-3 form) | elide-pruned (round-4 stage-1 pruning).

Usage: PYTHONPATH=... python -u experiments/e34_pruned_isolation.py
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
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r[0][0, 0]))

    for n in (1024, 4096):
        b = TARGET // (8 * n)
        s = 1.0 / np.sqrt(n)  # stationary iterated magnitude
        xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        data = 2 * b * n * 4

        def full(p, n=n, s=s):
            return pe.core_fft_planar_v3(p[0], p[1], n, False, scale=s)

        dt_full = timed_chain(full, (xr, xi), fetch)
        print(f"  n={n:5d} b={b}: full (stationary)  {dt_full*1e3:7.3f} ms  "
              f"rt-equiv {2*2*data/ (2*dt_full)/GB:6.1f} GB/s", flush=True)

        orig_prune = pe._v3_prune_q
        for h in (n // 4, n // 2):
            def run_h(p, n=n, h=h, s=s):
                return pe.core_fft_planar_v3(p[0], p[1], n, False,
                                             in_nonzero=h, scale=s)
            # dense zero-fill (round-3 behavior): disable pruning
            pe._v3_prune_q = lambda n_, ir, plan=None: pe._v3_first_stage(n_, plan)[0]
            pe._build_fft_call_v3.cache_clear()
            pe._v3_tables_impl.cache_clear()
            dt_dense = timed_chain(run_h, (xr, xi), fetch)
            # pruned (round 4)
            pe._v3_prune_q = orig_prune
            pe._build_fft_call_v3.cache_clear()
            pe._v3_tables_impl.cache_clear()
            dt_pruned = timed_chain(run_h, (xr, xi), fetch)
            print(f"  n={n:5d} h={h:5d}: elide-dense {dt_dense*1e3:7.3f} ms "
                  f"({dt_full/dt_dense:.2f}x)   elide-pruned "
                  f"{dt_pruned*1e3:7.3f} ms ({dt_full/dt_pruned:.2f}x)",
                  flush=True)
        pe._v3_prune_q = orig_prune

        # round-trip sanity (compare bench.py's numbers)
        def rt(p, n=n):
            fr, fi = pe.core_fft_planar_v3(p[0], p[1], n, False)
            return pe.core_fft_planar_v3(fr, fi, n, True, scale=1.0 / n)

        dt_rt = timed_chain(rt, (xr, xi), fetch)
        print(f"  n={n:5d} roundtrip sanity: {dt_rt*1e3:7.3f} ms  "
              f"{4*data/dt_rt/GB:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
