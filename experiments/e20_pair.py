"""E20: fused two-axis (pair) kernel vs separate passes, real TPU.

Measures, with the chained two-point method on 128MB-class working sets:
  1. 2-D C2C (batch, 256, 256): pair kernel vs contiguous+strided passes
  2. 3-D 256^3 via the application walk (pair fuses the minor axes)
  3. 2-D scalar convolution 256x256: conv_fused_pair (one kernel) vs the
     v3_rows form (strided + fused last axis + strided)
"""
from __future__ import annotations

import time

import numpy as np


def timed_chain(fn, p0, n_lo=4, n_hi=16, reps=3, fetch=None):
    import jax

    def make(iters):
        @jax.jit
        def run(p):
            return jax.lax.fori_loop(0, iters, lambda i, v: fn(v), p)
        return run

    f_lo, f_hi = make(n_lo), make(n_hi)
    fetch = fetch or (lambda r: float(np.asarray(r[0]).ravel()[0]))
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
    from vkfft_tpu.planner import plan_axis

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)

    # --- 1. 2-D C2C: pair vs two passes -----------------------------------
    ny = nz = 256
    b = 128 * 1024 * 1024 // (8 * ny * nz)          # ~128MB planar
    xr = jnp.asarray(rng.standard_normal((b, ny, nz)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, ny, nz)).astype(np.float32))
    plan_y, plan_z = plan_axis(ny), plan_axis(nz)

    def pair_fwd_inv(p):
        xr_, xi_ = pe.fft_pair_planar(p.re, p.im, ny, nz, False)
        xr_, xi_ = pe.fft_pair_planar(xr_, xi_, ny, nz, True,
                                      scale=1.0 / (ny * nz))
        return Planar(xr_, xi_)

    def twopass_fwd_inv(p):
        p = pe.fft_axis_p(p, 2, plan_z, False)
        p = pe.fft_axis_p(p, 1, plan_y, False)
        p = pe.fft_axis_p(p, 1, plan_y, True)
        p = pe.fft_axis_p(p, 2, plan_z, True, scale=1.0 / (ny * nz))
        return p

    p0 = Planar(xr, xi)
    data = 2 * b * ny * nz * 4
    fetch = lambda r: float(np.asarray(r.re).ravel()[0])
    dt = timed_chain(pair_fwd_inv, p0, fetch=fetch)
    print(f"2-D {ny}x{nz} b={b} pair    : {dt*1e3:7.3f} ms "
          f"eff(1 upload) {4*data/dt/1e9:6.1f} GB/s")
    dt2 = timed_chain(twopass_fwd_inv, p0, fetch=fetch)
    print(f"2-D {ny}x{nz} b={b} twopass : {dt2*1e3:7.3f} ms "
          f"eff(2 uploads) {8*data/dt2/1e9:6.1f} GB/s  pair speedup "
          f"{dt2/dt:4.2f}x")

    # --- 2. 3-D via the application (bench.py measures this too) ----------
    import bench
    g3, d3, p3 = bench.bench_3d((256, 256, 256))
    print(f"3-D 256^3 app walk: {g3:6.1f} GB/s  {d3*1e3:7.3f} ms "
          f"({p3} uploads/dir)")

    # --- 3. 2-D convolution: one kernel vs v3_rows form -------------------
    h = rng.standard_normal((ny, nz)) + 1j * rng.standard_normal((ny, nz))
    H = np.fft.fft2(h)
    Ht = np.ascontiguousarray(H.T)
    Hrows = np.ascontiguousarray(H.reshape(ny, nz).T)  # (n, rows) transposed

    def conv_pair(p):
        return pe.conv_fused_pair(p, ny, nz, Ht, scale=1.0 / (ny * nz))

    def conv_rows(p):
        q = pe.fft_axis_p(p, 1, plan_y, False)
        out = pe.conv_fused_v3_rows(q.reshape(-1, nz), nz, ny, Hrows,
                                    scale=1.0 / (ny * nz))
        out = out.reshape(b, ny, nz)
        return pe.fft_axis_p(out, 1, plan_y, True)

    dt = timed_chain(conv_pair, p0, fetch=fetch)
    print(f"conv {ny}x{nz} pair (1 kernel): {dt*1e3:7.3f} ms "
          f"{2*data/dt/1e9:6.1f} GB/s(1 r+w)")
    dt2 = timed_chain(conv_rows, p0, fetch=fetch)
    print(f"conv {ny}x{nz} rows (3 passes): {dt2*1e3:7.3f} ms  speedup "
          f"{dt2/dt:4.2f}x")

    # correctness spot check on hardware
    got = conv_pair(Planar(xr[:1], xi[:1]))
    gotc = np.asarray(got.re[0]) + 1j * np.asarray(got.im[0])
    x0 = np.asarray(xr[0]) + 1j * np.asarray(xi[0])
    ref = np.fft.ifft2(np.fft.fft2(x0) * H)
    rel = np.abs(gotc - ref).max() / np.abs(ref).max()
    print(f"conv pair correctness vs oracle: {rel:.2e}")

    # --- 4. single-kernel rfft2/irfft2 (r2c pair) --------------------------
    xreal = jnp.asarray(rng.standard_normal((b, ny, nz)).astype(np.float32))

    def r2c_roundtrip(v):
        X = pe.rfft2_pair_planar(v)
        return pe.irfft2_pair_planar(X.re, X.im, ny, nz)

    fetch_r = lambda r: float(np.asarray(r).ravel()[0])
    dt = timed_chain(r2c_roundtrip, xreal, fetch=fetch_r)
    real_bytes = b * ny * nz * 4
    # r2c pair moves ~2 real-plane equivalents per direction pair
    print(f"rfft2+irfft2 pair {ny}x{nz}: {dt*1e3:7.3f} ms  "
          f"eff {4*real_bytes/dt/1e9:6.1f} GB/s (real-plane r+w)")
    X = pe.rfft2_pair_planar(xreal[:1])
    gotr = np.asarray(X.re[0]) + 1j * np.asarray(X.im[0])
    refr = np.fft.rfft2(np.asarray(xreal[0], dtype=np.float64))
    print(f"rfft2 pair correctness: "
          f"{np.abs(gotr-refr).max()/np.abs(refr).max():.2e}")

    # --- 5. in-kernel DCT-II vs XLA composition ---------------------------
    nd = 1024
    bd = 128 * 1024 * 1024 // (4 * nd)
    xd = jnp.asarray(rng.standard_normal((bd, nd)).astype(np.float32))

    def dct_rt(v):
        return pe.dct3_lines(pe.dct2_lines(v), scale=1.0 / (2 * nd))

    dt = timed_chain(dct_rt, xd, fetch=fetch_r)
    dbytes = bd * nd * 4
    print(f"dct2+dct3 kernels n={nd}: {dt*1e3:7.3f} ms  "
          f"eff {4*dbytes/dt/1e9:6.1f} GB/s")
    import scipy.fft as sfft
    gd = np.asarray(pe.dct2_lines(xd[:2]))
    rd = sfft.dct(np.asarray(xd[:2], dtype=np.float64), type=2, axis=-1)
    print(f"dct2 kernel correctness: {np.abs(gd-rd).max()/np.abs(rd).max():.2e}")

    # --- 6. zero-pad pair elision: half-padded 2-D vs unpadded ------------
    def pair_fwd_elide(p):
        xr_, xi_ = pe.fft_pair_planar(p.re, p.im, ny, nz, False,
                                      in_keep=(ny // 2, nz // 2))
        xr_, xi_ = pe.fft_pair_planar(xr_, xi_, ny, nz, True,
                                      scale=1.0 / (ny * nz),
                                      out_keep=(ny // 2, nz // 2))
        pads = ((0, 0), (0, ny - ny // 2), (0, nz - nz // 2))
        return Planar(jnp.pad(xr_, pads), jnp.pad(xi_, pads))

    dt_e = timed_chain(pair_fwd_elide, p0, fetch=fetch)
    dt_f = timed_chain(pair_fwd_inv, p0, fetch=fetch)
    print(f"pair zeropad (quarter window): {dt_e*1e3:7.3f} ms vs full "
          f"{dt_f*1e3:7.3f} ms -> {dt_f/dt_e:4.2f}x")


if __name__ == "__main__":
    main()
