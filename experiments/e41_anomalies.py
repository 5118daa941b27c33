"""E41 (round 4): pin down two measurement anomalies.

A. e39 measured the PRODUCTION v3 round trip at 0.705 ms (762 GB/s!) where
   bench.py and e34 measure 1.03-1.07 ms.  The only structural difference:
   e39 timed it AFTER building/timing emit_pipeline variants in the same
   process.  Repeat both orderings.
B. The 3-D wall (4.15 ms) exceeds pair (2.165) + strided (1.04) by ~1 ms.
   Profile the bench_3d round trip per-op.

Usage: PYTHONPATH=... python -u experiments/e41_anomalies.py
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
    import glob, gzip, json, os, shutil
    from collections import defaultdict
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache, debug
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar
    from vkfft_tpu.config import FFTConfig
    from vkfft_tpu import api

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r[0][0, 0]))

    n = 1024
    b = TARGET // (8 * n)
    xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    data = 2 * b * n * 4

    def rt(p):
        fr, fi = pe.core_fft_planar_v3(p[0], p[1], n, False)
        return pe.core_fft_planar_v3(fr, fi, n, True, scale=1.0 / n)

    for tag in ("first", "second", "third"):
        dt = timed_chain(rt, (xr, xi), fetch)
        print(f"  A: v3 rt n=1024 ({tag}): {dt*1e3:7.3f} ms  "
              f"{4*data/dt/GB:6.1f} GB/s", flush=True)

    # B: profile the 3-D round trip
    shape = (256, 256, 256)
    app = api.FFTApplication(FFTConfig(shape=shape, normalize=True),
                             engine="pallas")
    p0 = Planar(jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
                jnp.asarray(rng.standard_normal(shape).astype(np.float32)))

    @jax.jit
    def rt3(p):
        return app.inverse(app.forward(p))

    def chain3(p):
        return jax.lax.fori_loop(0, 5, lambda i, v: rt3(v), p)

    outdir = "/tmp/vkfft_e41_3d"
    shutil.rmtree(outdir, ignore_errors=True)
    debug.profile_trace(jax.jit(chain3), p0, outdir=outdir, iters=3)
    paths = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.trace.json.gz")))
    events = defaultdict(list)
    if paths:
        with gzip.open(paths[-1], "rt") as f:
            td = json.load(f)
        for ev in td.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                events[ev.get("name", "?")].append(ev["dur"])
    rows = sorted(((sum(d), k, len(d), np.median(d)) for k, d in
                   events.items() if len(d) >= 3), reverse=True)
    print("  B: 3-D rt per-op (top 10):", flush=True)
    for tot, name, cnt, med in rows[:10]:
        print(f"     {name[:70]:70s} n={cnt:4d} med={med/1e3:8.3f} ms "
              f"tot={tot/1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
