"""E43 (round 5): outer-axis kernel vs relayout+strided for the 3-D x-pass.

The 3-D profiled glue (fact 38): the x-axis pass views (nx, ny, nz) as
(1, nx, ny*nz) — a genuine XLA relayout (copy.4 ~0.21 ms/direction at
256^3).  The outer-axis kernel consumes the natural rank-4 layout directly
(blocks (1, n, tr, nz), all-VPU leading-dim stages).  Measure both forms
standalone at 256^3 and 512-row shapes.

Usage: PYTHONPATH=/root/repo python -u experiments/e43_outer_kernel.py
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
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    fetch = lambda r: float(np.asarray(r[0][0, 0, 0, 0]))

    for (nx, ny, nz) in [(256, 256, 256), (512, 64, 512)]:
        shape = (1, nx, ny, nz)
        data = 2 * nx * ny * nz * 4   # planar f32 bytes
        xr = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

        # correctness spot-check on hardware (fwd vs numpy on a slice)
        fr, fi = pe.outer_fft_planar(xr, xi, nx, False)
        ref = np.fft.fft(np.asarray(xr)[0, :, :2, :2]
                         + 1j * np.asarray(xi)[0, :, :2, :2], axis=0)
        got = np.asarray(fr)[0, :, :2, :2] + 1j * np.asarray(fi)[0, :, :2, :2]
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"[{nx}x{ny}x{nz}] outer fwd err {err:.2e}", flush=True)

        def rt_outer(p):
            a, b = pe.outer_fft_planar(p[0], p[1], nx, False)
            return pe.outer_fft_planar(a, b, nx, True, scale=1.0 / nx)

        dt = timed_chain(rt_outer, (xr, xi), fetch)
        print(f"[{nx}x{ny}x{nz}] outer rt: {dt*1e3:7.3f} ms  "
              f"{4*data/dt/GB:6.1f} GB/s eff", flush=True)

        # current production form: reshape (relayout) + strided
        def rt_strided(p):
            ar = p[0].reshape(1, nx, ny * nz)
            ai = p[1].reshape(1, nx, ny * nz)
            a, b = pe.strided_fft_planar(ar, ai, nx, False)
            a, b = pe.strided_fft_planar(a, b, nx, True, scale=1.0 / nx)
            return (a.reshape(1, nx, ny, nz), b.reshape(1, nx, ny, nz))

        dt = timed_chain(rt_strided, (xr, xi), fetch)
        print(f"[{nx}x{ny}x{nz}] reshape+strided rt: {dt*1e3:7.3f} ms  "
              f"{4*data/dt/GB:6.1f} GB/s eff", flush=True)

        # strided alone on pre-relayouted data (kernel-only baseline)
        xr2 = jnp.asarray(np.asarray(xr).reshape(1, nx, ny * nz))
        xi2 = jnp.asarray(np.asarray(xi).reshape(1, nx, ny * nz))
        fetch2 = lambda r: float(np.asarray(r[0][0, 0, 0]))

        def rt_strided_only(p):
            a, b = pe.strided_fft_planar(p[0], p[1], nx, False)
            return pe.strided_fft_planar(a, b, nx, True, scale=1.0 / nx)

        dt = timed_chain(rt_strided_only, (xr2, xi2), fetch2)
        print(f"[{nx}x{ny}x{nz}] strided kernel-only rt: {dt*1e3:7.3f} ms  "
              f"{4*data/dt/GB:6.1f} GB/s eff", flush=True)


if __name__ == "__main__":
    main()
