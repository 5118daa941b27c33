"""E22: per-kernel-family hardware decision table (round 3).

VERDICT r2 item 3: every default fusion route must be backed by a measured
number (the reference analog is the upload-count decision,
``vkFFT_Scheduler.h:2590-2650``).  Measures, with the chained two-point
method on 128MB-class working sets (the only stable methodology on the
tunneled runtime — BENCH.md facts 1/14):

  c2c       v3 contiguous n=256/1024/4096 (production baseline) + donation
  strided   axis-0 pass shape of the 3-D walk
  pair      fused two-axis 256x256 vs the two-pass route it replaces
  3d        app-walk 256^3 with pair fusion vs forced per-axis passes
  r2c       in-kernel R2C n=1024 round trip vs the C2C it must beat
  dct       in-kernel DCT-II n=1024 vs the XLA composition
  conv      fused 1-D conv n=1024; 2-D conv: conv_pair vs rows route
  dd        double-double n=1024 bandwidth (the reference quad bench analog,
            ``sample_9_benchmark_VkFFT_quadDoubleDouble.cpp``)

Usage: python experiments/e22_family_bench.py [section ...]
Prints one aligned row per measurement: ms/iter and effective GB/s of
*actual HBM traffic* (bytes truly moved, not normalized per upload) so
numbers are directly comparable across fused and unfused routes.
"""
from __future__ import annotations

import sys
import time

import numpy as np

GB = 1e9
TARGET = 128 * 1024 * 1024  # planar working set per system


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


def row(tag, dt, traffic_bytes, note=""):
    print(f"{tag:34s} {dt*1e3:8.3f} ms  {traffic_bytes/dt/GB:7.1f} GB/s  {note}",
          flush=True)
    return traffic_bytes / dt / GB


def main():
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache, api
    from vkfft_tpu.config import FFTConfig
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar
    from vkfft_tpu.planner import plan_axis

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    sections = set(sys.argv[1:]) or {"c2c", "strided", "pair", "3d", "r2c",
                                     "dct", "conv", "dd"}
    rng = np.random.default_rng(0)
    # index on-device FIRST: np.asarray on the full array would
    # transfer the whole working set through the tunnel inside the
    # timed region (the e20 round-2 harness bug)
    fetch_p = lambda r: float(np.asarray(r.re[(0,) * r.re.ndim]))
    fetch_a = lambda r: float(np.asarray(r[(0,) * r.ndim]))
    results = {}

    def planar(shape):
        return Planar(jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
                      jnp.asarray(rng.standard_normal(shape).astype(np.float32)))

    # ---- c2c: contiguous v3 fwd+inv (the headline path) -------------------
    if "c2c" in sections:
        print("== c2c contiguous (fwd+inv round trip) ==", flush=True)
        for n in (256, 1024, 4096):
            b = TARGET // (8 * n)
            plan = plan_axis(n)
            eng = api._engine("pallas")

            def rt(p, n=n, plan=plan):
                y = eng.fft_lines_p(p, plan, False)
                return eng.fft_lines_p(y, plan, True, scale=1.0 / n)

            data = 2 * b * n * 4
            dt = timed_chain(rt, planar((b, n)), fetch_p)
            results[f"c2c_{n}"] = row(f"c2c v3 n={n} b={b}", dt, 4 * data)
        # donation variant (e16: queued round 2, never ran)
        n, b = 1024, TARGET // (8 * 1024)
        def rt_d(p):
            rr, ii = pe.core_fft_planar_v3(p.re, p.im, n, False, donate=True)
            rr, ii = pe.core_fft_planar_v3(rr, ii, n, True, donate=True,
                                           scale=1.0 / n)
            return Planar(rr, ii)
        data = 2 * b * n * 4
        dt = timed_chain(rt_d, planar((b, n)), fetch_p)
        results["c2c_1024_donate"] = row("c2c v3 n=1024 +donate", dt, 4 * data)

    # ---- strided: the 3-D outer-axis pass shape ----------------------------
    if "strided" in sections:
        print("== strided axis pass (fwd+inv) ==", flush=True)
        n, s = 256, 256 * 256
        b = 1
        plan = plan_axis(n)

        def rt(p):
            q = pe.fft_axis_p(p, 0, plan, False)
            return pe.fft_axis_p(q, 0, plan, True, scale=1.0 / n)

        data = 2 * n * s * 4
        dt = timed_chain(rt, planar((n, 256, 256)), fetch_p)
        results["strided_256"] = row(f"strided n={n} s={s}", dt, 4 * data)

    # ---- pair: fused two-axis vs the two-pass route ------------------------
    if "pair" in sections:
        print("== pair (2-D 256x256 fwd+inv) ==", flush=True)
        ny = nz = 256
        b = TARGET // (8 * ny * nz)
        plan_y, plan_z = plan_axis(ny), plan_axis(nz)
        p0 = planar((b, ny, nz))
        data = 2 * b * ny * nz * 4

        def pair_rt(p):
            q = pe.fft_pair_p(p, ny, nz, False)
            return pe.fft_pair_p(q, ny, nz, True, scale=1.0 / (ny * nz))

        def twopass_rt(p):
            q = pe.fft_axis_p(p, 2, plan_z, False)
            q = pe.fft_axis_p(q, 1, plan_y, False)
            q = pe.fft_axis_p(q, 1, plan_y, True)
            return pe.fft_axis_p(q, 2, plan_z, True, scale=1.0 / (ny * nz))

        dt = timed_chain(pair_rt, p0, fetch_p)
        results["pair"] = row("pair 256x256", dt, 4 * data, "(2 kernels/rt)")
        dt = timed_chain(twopass_rt, p0, fetch_p)
        results["twopass"] = row("two-pass 256x256", dt, 8 * data,
                                 "(4 kernels/rt)")
        print(f"  -> pair {'WINS' if results['pair'] and 4*data/results['pair'] < 8*data/results['twopass'] else 'decision: compare ms'}",
              flush=True)

    # ---- 3d: application walk with and without pair fusion -----------------
    if "3d" in sections:
        print("== 3-D 256^3 app walk (fwd+inv) ==", flush=True)
        shape = (256, 256, 256)
        total = int(np.prod(shape))
        p0 = planar(shape)
        data = 2 * total * 4
        for label, avail in (("pair-fused", True), ("per-axis", False)):
            saved = pe.pair_available
            if not avail:
                pe.pair_available = lambda *a, **k: False
            try:
                app = api.FFTApplication(FFTConfig(shape=shape, normalize=True),
                                         engine="pallas")
                passes = 2 if avail else 3

                def rt(p, app=app):
                    return app.inverse(app.forward(p))

                dt = timed_chain(rt, p0, fetch_p, n_lo=4, n_hi=16)
                results[f"3d_{label}"] = row(
                    f"3-D 256^3 {label}", dt, 2 * 2 * passes * data,
                    f"({passes} uploads/dir, actual traffic)")
            finally:
                pe.pair_available = saved

    # ---- r2c ----------------------------------------------------------------
    if "r2c" in sections:
        print("== r2c n=1024 (fwd+inv, planar engine path) ==", flush=True)
        n = 1024
        b = TARGET // (4 * n)   # real data: b*n*4 = 128MB
        x0 = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

        def rt(v):
            ar, ai = pe.rfft_lines_planar(v)
            return pe.irfft_lines_planar(ar, ai, n, scale=1.0 / (n // 2))

        real_b = b * n * 4
        half_b = b * (n // 2 + 1) * 8
        dt = timed_chain(rt, x0, fetch_a)
        results["r2c_1024"] = row("r2c n=1024 in-kernel", dt,
                                  2 * (real_b + half_b))
        # the C2C bar it must beat (same REAL content = half the batch of
        # complex lines): c2c at b/2 complex lines of length n
        b2 = b // 2
        plan = plan_axis(n)
        eng = api._engine("pallas")

        def rt_c(p):
            y = eng.fft_lines_p(p, plan, False)
            return eng.fft_lines_p(y, plan, True, scale=1.0 / n)

        data = 2 * b2 * n * 4
        dt = timed_chain(rt_c, planar((b2, n)), fetch_p)
        results["c2c_equal_content"] = row("c2c equal-real-content", dt,
                                           4 * data)

    # ---- dct ---------------------------------------------------------------
    if "dct" in sections:
        print("== dct-II n=1024 (fwd only, real lines) ==", flush=True)
        n = 1024
        b = TARGET // (4 * n)
        x0 = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

        def rt(v):
            return pe.dct2_lines(v, scale=1.0 / n)  # chained: stays bounded

        dt = timed_chain(rt, x0, fetch_a)
        results["dct2_1024"] = row("dct2 in-kernel", dt, 2 * b * n * 4)

    # ---- conv --------------------------------------------------------------
    if "conv" in sections:
        print("== fused convolution ==", flush=True)
        n = 1024
        b = TARGET // (8 * n)
        h = np.exp(-np.arange(n) / 7.0)
        H = np.fft.fft(h)
        p0 = planar((b, n))
        data = 2 * b * n * 4

        def rt(p):
            return pe.conv_fused_v3(p, n, H, scale=1.0 / n)

        dt = timed_chain(rt, p0, fetch_p)
        results["conv_v3_1024"] = row("conv fused v3 n=1024", dt, 2 * data,
                                      "(1 kernel: r+w once)")
        ny = nz = 256
        b2 = TARGET // (8 * ny * nz)
        H2 = np.fft.fft2(rng.standard_normal((ny, nz))).T  # (nz, ny) spectrum
        p2 = planar((b2, ny, nz))
        data2 = 2 * b2 * ny * nz * 4

        def rt2(p):
            return pe.conv_fused_pair(p, ny, nz, H2, scale=1.0 / (ny * nz))

        dt = timed_chain(rt2, p2, fetch_p)
        results["conv_pair_256"] = row("conv pair 256x256", dt, 2 * data2,
                                       "(1 kernel)")

    # ---- dd ----------------------------------------------------------------
    if "dd" in sections:
        print("== double-double n=1024 (fwd+inv) ==", flush=True)
        from vkfft_tpu.precision import dd_kernel as dk
        from vkfft_tpu.precision import dd_fft
        n = 1024
        b = TARGET // (16 * n)   # dd planar: 4 planes x 4 bytes
        xc = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n)))
        from vkfft_tpu.precision.doubledouble import ddc_from_complex128
        x0 = ddc_from_complex128(xc)

        def rt(x):
            y = dk.dd_fft_pallas(x, n, False)
            y = dk.dd_fft_pallas(y, n, True)
            return dd_fft.dd_scale(y, 1.0 / n)

        fetch_dd = lambda r: float(np.asarray(r.re.hi[(0,) * r.re.hi.ndim]))
        data = 4 * b * n * 4
        dt = timed_chain(rt, x0, fetch_dd)
        results["dd_1024"] = row("dd n=1024 in-kernel", dt, 4 * data)

    print("\n== decision summary (GB/s of actual traffic) ==")
    for k, v in results.items():
        print(f"  {k:24s} {v:7.1f}")


if __name__ == "__main__":
    main()
