"""E38 (round 4): can the bf16-storage tier reach 50% of roofline with
ALL-MXU stage plans at DEFAULT precision?

The tier's accuracy floor is the bf16 quantization (~3e-3), and its MXU
already runs 1-pass DEFAULT — but the VPU radix stages and their f32 state
work are precision-independent (BENCH fact 27) and dominate.  An all-MXU
plan replaces the VPU butterflies with 1-pass bf16 contractions.  At
HIGHEST (6-pass) all-MXU measured 241-287 vs VPU-staged 327-348 (E4/E5);
at DEFAULT the MXU passes are 6x cheaper, so the trade can flip.

Also sweeps il=16 at small n (e36: bf16 n=256 il=16 = 337 vs 304 GB/s).

Usage: PYTHONPATH=... python -u experiments/e38_bf16_allmxu.py
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


PLANS = {
    256:  [None, ((), (16, 16)), ((), (64, 4)), ((4,), (64,))],
    1024: [None, ((), (32, 32)), ((), (64, 16)), ((4,), (16, 16))],
    4096: [None, ((), (64, 64)), ((4,), (32, 32))],
}


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
    orig_plan = pe._v3_plan

    for n in (256, 1024, 4096):
        b = TARGET // (4 * n)
        xr32 = rng.standard_normal((b, n)).astype(np.float32)
        xi32 = rng.standard_normal((b, n)).astype(np.float32)
        xr = jnp.asarray(xr32).astype(jnp.bfloat16)
        xi = jnp.asarray(xi32).astype(jnp.bfloat16)
        data = 2 * b * n * 2

        def rt(p, n=n):
            fr, fi = pe.core_fft_planar_v3(p[0], p[1], n, False)
            return pe.core_fft_planar_v3(fr, fi, n, True, scale=1.0 / n)

        for plan in PLANS[n]:
            if plan is None:
                pe._v3_plan = orig_plan
                tag = "default  "
            else:
                pe._v3_plan = lambda m, _p=plan, _n=n: (
                    _p if m == _n else orig_plan(m))
                tag = str(plan)
            pe._v3_tables_impl.cache_clear()
            pe._build_fft_call_v3.cache_clear()
            try:
                # correctness probe on a small slice first
                fr, fi = pe.core_fft_planar_v3(xr[:256], xi[:256], n, False)
                ref = np.fft.fft(np.asarray(xr[:256], np.float64)
                                 + 1j * np.asarray(xi[:256], np.float64))
                err = np.abs((np.asarray(fr, np.float64)
                              + 1j * np.asarray(fi, np.float64)) - ref).max()
                err /= np.abs(ref).max()
                dt = timed_chain(rt, (xr, xi), fetch)
                print(f"  bf16 n={n:5d} plan {tag:18s}: {dt*1e3:7.3f} ms  "
                      f"{4*data/dt/GB:6.1f} GB/s ({4*data/dt/GB/819*100:4.1f}%)"
                      f"  err {err:.1e}", flush=True)
            except Exception as e:
                print(f"  bf16 n={n:5d} plan {tag}: FAIL {repr(e)[:90]}",
                      flush=True)
        pe._v3_plan = orig_plan
        pe._v3_tables_impl.cache_clear()
        pe._build_fft_call_v3.cache_clear()


if __name__ == "__main__":
    main()
