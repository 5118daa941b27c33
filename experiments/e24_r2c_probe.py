"""E24: where do the r2c kernel's 3 ms go? (real TPU)

The packed-layout fix (e23) changed nothing, so the cost is inside the
kernel.  This peels it apart with probe kernels (numerically wrong where
noted, perf-representative):

  full            packed fwd + packed inv               (baseline, ~2.98 ms)
  fwd=nodeint     contiguous halves replace the stride-2 even/odd
                  deinterleave (isolates the fwd relayout cost)
  fwd=single      single-width stages, no dual, no untangle
  fwd=copy        fwd = DMA + transposes only (isolates inv total)
  inv=nointer     full fwd; inverse skips the stride-2 interleave
  inv=single      full fwd; inverse single-width, no repack
  inv=copy        full fwd; inv = DMA + transposes only (isolates fwd total)
  copy/copy       pure DMA floor of the round trip
"""
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
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r[0, 0]))
    n = 1024
    m = n // 2
    b = TARGET // (4 * n)
    x0 = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    def make_rt(fwd_probe, inv_probe):
        fw = pe._build_r2c_call(n, b, False, False, "float32",
                                packed=True, probe=fwd_probe)
        iv = pe._build_r2c_call(n, b, False, True, "float32",
                                scale=1.0 / m, packed=True, probe=inv_probe)

        def rt(v):
            ar, ai = fw(v)
            return iv(ar, ai)
        return rt

    cases = [
        ("merged-slab full (default)", None, None),
        ("noflip/noflip (flip cost)", "noflip", "noflip"),
        ("fwd=copy (inv total)", "copy", None),
        ("inv=copy (fwd total)", None, "copy"),
        ("copy/copy (DMA floor)", "copy", "copy"),
    ]
    for tag, fp, ip in cases:
        dt = timed_chain(make_rt(fp, ip), x0, fetch)
        print(f"{tag:28s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
