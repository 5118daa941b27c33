"""E11: A/B the interleave depth on the PRODUCTION v3 path at the bench's
128MB system sizes (the 64MB experiment numbers swing +-30% — only
production-scale chained timing is trustworthy on this runtime)."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from vkfft_tpu.ops import pallas_engine as pe

def timeit(n, batch, reps=3):
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    inv_n = np.float32(1.0/n)
    def fwd_inv(pair):
        a, b = pair
        fr, fi = pe.core_fft_planar_v3(a, b, n, False)
        br, bi = pe.core_fft_planar_v3(fr, fi, n, True)
        return (br*inv_n, bi*inv_n)
    def mk(it):
        @jax.jit
        def r(p): return jax.lax.fori_loop(0, it, lambda i, v: fwd_inv(v), p)
        return r
    lo, hi = 10, 60
    f_lo, f_hi = mk(lo), mk(hi)
    float(np.asarray(f_lo((xr,xi))[0].ravel()[0]))
    float(np.asarray(f_hi((xr,xi))[0].ravel()[0]))
    out = []
    for _ in range(reps):
        def t(f):
            best = 1e9
            for _ in range(2):
                t0=time.perf_counter(); float(np.asarray(f((xr,xi))[0].ravel()[0]))
                best=min(best, time.perf_counter()-t0)
            return best
        dt=(t(f_hi)-t(f_lo))/(hi-lo)
        out.append(4*2*batch*n*4/dt/1e9)
    return out

target = 128*1024*1024
for n in (256, 512):
    batch = target // (8*n)
    for il in (4, 8):
        if n*il*128*4 > (1<<20):
            continue
        pe._V3_IL_OVERRIDE = il
        pe._build_fft_call_v3.cache_clear()
        vals = timeit(n, batch)
        print(f"n={n:5d} il={il}: " + " ".join(f"{v:.0f}" for v in vals)
              + " GB/s", flush=True)
pe._V3_IL_OVERRIDE = None
