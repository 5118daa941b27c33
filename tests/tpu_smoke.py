"""Hardware smoke test: compile + run the real Pallas kernels on the TPU.

The pytest suite runs Pallas in interpreter mode on CPU, which skips the
Mosaic hardware compiler entirely — layout hazards (e.g. 4-D transposes with
small second-minor dims, lane padding) only surface here.  Run manually on
the TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python tests/tpu_smoke.py

Covers: v2 lane-padded path, v3 DIRECT sizes incl. every MXU-stage shape
class (Mp==1 pow-2, Mp>1 odd factors), the in-kernel R2C/C2R path, strided
axes, and a Bluestein/Rader size.  Exits nonzero on any failure.
"""
import sys

import numpy as np


def rel_err(got, ref):
    return np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import vkfft_tpu as vk
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu import cache as _cache

    try:  # amortize the tunneled runtime's slow cold compiles across runs
        _cache.enable_persistent_cache()
    except Exception:
        pass

    plat = jax.devices()[0].platform
    print(f"platform: {plat} ({jax.devices()[0]})")
    if plat == "cpu":
        print("WARNING: running on CPU — enabling interpreter mode "
              "(this does NOT exercise the Mosaic hardware compiler)")
        pe.set_interpret(True)
    failures = []

    def check(tag, got, ref, tol=5e-5):
        e = rel_err(np.asarray(got), ref)
        ok = e < tol
        print(f"  {'ok ' if ok else 'FAIL'} {tag:34s} rel_err={e:.2e}")
        if not ok:
            failures.append(tag)

    rng = np.random.default_rng(0)

    # --- v3 DIRECT kernel: pow-2 (Mp==1 MXU stages), odd-factor sizes
    # (Mp>1 MXU stages — the layout class that broke on hardware), lane
    # padding (batch not a multiple of 128), and a VPU+MXU mix.
    print("v3 kernel (batch-in-lanes Stockham):")
    for n, b in [(64, 128), (256, 128), (1024, 128), (1024, 37),
                 (500, 128), (1000, 64), (320, 128), (729, 128),
                 (60, 128), (2048, 128), (4096, 256), (8192, 256),
                 (6144, 128)]:
        if not pe._use_v3(n):
            print(f"  skip n={n} (no v3 plan)")
            continue
        x = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n)))
        xr = jnp.asarray(x.real.astype(np.float32))
        xi = jnp.asarray(x.imag.astype(np.float32))
        fr, fi = pe.core_fft_planar_v3(xr, xi, n, False)
        check(f"v3 fwd n={n} b={b}", np.asarray(fr) + 1j * np.asarray(fi),
              np.fft.fft(x, axis=-1))
        br, bi = pe.core_fft_planar_v3(fr, fi, n, True)
        check(f"v3 inv n={n} b={b}",
              (np.asarray(br) + 1j * np.asarray(bi)) / n, x)

    # --- v2 lane-padded path (lane != n1; skipped in interpreter tests)
    print("v2 kernel (lane-major), incl. lane-padded digits:")
    for n in [4096, 4608]:   # 4608 = 64*72: n1=72 pads to 128 lanes
        sp = pe.split_lane_major(n)
        if sp is None:
            print(f"  skip n={n} (no v2 split)")
            continue
        x = (rng.standard_normal((16, n)) + 1j * rng.standard_normal((16, n)))
        xr = jnp.asarray(x.real.astype(np.float32))
        xi = jnp.asarray(x.imag.astype(np.float32))
        fr, fi = pe.core_fft_planar_v2(xr, xi, n, False)
        check(f"v2 fwd n={n} (n1={sp[0]})",
              np.asarray(fr) + 1j * np.asarray(fi), np.fft.fft(x, axis=-1))

    # --- in-kernel R2C / C2R
    print("in-kernel R2C/C2R:")
    for n in [8, 64, 256, 1000, 1024, 2048, 4096, 8192]:
        if not pe.use_r2c_kernel(n):
            print(f"  skip n={n} (gate)")
            continue
        xr_np = rng.standard_normal((37, n)).astype(np.float32)
        ar, ai = pe.rfft_lines_planar(jnp.asarray(xr_np))
        ref = np.fft.rfft(xr_np.astype(np.float64), axis=-1)
        check(f"rfft kernel n={n}", np.asarray(ar) + 1j * np.asarray(ai), ref)
        y = pe.irfft_lines_planar(
            jnp.asarray(ref.real.astype(np.float32)),
            jnp.asarray(ref.imag.astype(np.float32)), n)
        check(f"irfft kernel n={n}", np.asarray(y) / (n // 2), xr_np)

    # --- merged-sequences R2C (odd length, two real lines per complex FFT)
    print("merged-sequences R2C (odd n):")
    from vkfft_tpu.transforms import r2c as _r2c
    for n in [101, 347]:
        xo = rng.standard_normal((8, n)).astype(np.float32)
        Xo = _r2c.rfft(jnp.asarray(xo))
        ref = np.fft.rfft(xo.astype(np.float64))
        check(f"rfft merged n={n}", np.asarray(Xo.re) + 1j * np.asarray(Xo.im)
              if hasattr(Xo, "re") else np.asarray(Xo), ref)
        back = _r2c.irfft(Xo, n=n)
        check(f"irfft merged n={n}", np.asarray(back), xo)

    # --- public API: strided axis + a prime (Rader) + Bluestein size
    print("public API (strided / Rader / Bluestein):")
    x2 = (rng.standard_normal((64, 256)) + 1j * rng.standard_normal((64, 256)))
    got = vk.fftn(x2.astype(np.complex64), axes=(0,))
    from vkfft_tpu.pcomplex import to_numpy, Planar
    got = to_numpy(got) if isinstance(got, Planar) else np.asarray(got)
    check("fft axis0 (strided) 64x256", got, np.fft.fft(x2, axis=0))
    # unaligned trailing batch (s=129, a half-spectrum width): the strided
    # tile must round up to whole lane tiles (e28-found Mosaic layout bug)
    x2u = (rng.standard_normal((2, 256, 129))
           + 1j * rng.standard_normal((2, 256, 129)))
    got = vk.fftn(x2u.astype(np.complex64), axes=(1,))
    got = to_numpy(got) if isinstance(got, Planar) else np.asarray(got)
    check("fft strided s=129 (unaligned)", got, np.fft.fft(x2u, axis=1))
    for n in [101, 1009, 1001]:
        x1 = (rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n)))
        got = vk.fft(x1.astype(np.complex64))
        got = to_numpy(got) if isinstance(got, Planar) else np.asarray(got)
        check(f"fft n={n} (prime/Bluestein)", got, np.fft.fft(x1, axis=-1),
              tol=2e-4)

    # --- single-kernel fused convolution (v3): scalar / N-D rows / matrix
    print("fused convolution (single-kernel v3):")
    n = 1024
    xc = (rng.standard_normal((256, n)) + 1j * rng.standard_normal((256, n)))
    h = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    H = np.fft.fft(h)
    xp = Planar(jnp.asarray(xc.real.astype(np.float32)),
                jnp.asarray(xc.imag.astype(np.float32)))
    out = pe.conv_fused_v3(xp, n, H, scale=1.0 / n)
    check("conv v3 scalar n=1024",
          np.asarray(out.re) + 1j * np.asarray(out.im),
          np.fft.ifft(np.fft.fft(xc) * H))
    rows, nl = 128, 256
    x2d = (rng.standard_normal((rows, nl)) + 1j * rng.standard_normal((rows, nl)))
    h2d = (rng.standard_normal((rows, nl)) + 1j * rng.standard_normal((rows, nl)))
    Ht = np.fft.fft(h2d, axis=-1)
    xp2 = Planar(jnp.asarray(x2d.real.astype(np.float32)),
                 jnp.asarray(x2d.imag.astype(np.float32)))
    out = pe.conv_fused_v3_rows(xp2, nl, rows, np.ascontiguousarray(Ht.T),
                                scale=1.0 / nl)
    check("conv v3 rows 128x256",
          np.asarray(out.re) + 1j * np.asarray(out.im),
          np.fft.ifft(np.fft.fft(x2d, axis=-1) * Ht, axis=-1))
    m = 3
    xm = (rng.standard_normal((8, m, nl)) + 1j * rng.standard_normal((8, m, nl)))
    Km = rng.standard_normal((m, m, nl)) + 1j * rng.standard_normal((m, m, nl))
    xpm = Planar(jnp.asarray(xm.real.astype(np.float32)),
                 jnp.asarray(xm.imag.astype(np.float32)))
    out = pe.conv_fused_v3_matrix(xpm, nl, m, Km, scale=1.0 / nl)
    check("conv v3 matrix 3x3 n=256",
          np.asarray(out.re) + 1j * np.asarray(out.im),
          np.fft.ifft(np.einsum("oin,bin->bon", Km, np.fft.fft(xm))))

    # --- fused two-axis kernel (both minor axes in one VMEM pass) + the
    # single-kernel two-axis convolution built on it
    print("fused two-axis (pair) kernels:")
    ny, nz = 256, 256
    xy = (rng.standard_normal((2, ny, nz)) + 1j * rng.standard_normal((2, ny, nz)))
    pr, pi = pe.fft_pair_planar(jnp.asarray(xy.real.astype(np.float32)),
                                jnp.asarray(xy.imag.astype(np.float32)),
                                ny, nz, False)
    check("pair fwd 256x256", np.asarray(pr) + 1j * np.asarray(pi),
          np.fft.fft2(xy, axes=(1, 2)), tol=2e-4)
    hk = rng.standard_normal((ny, nz)) + 1j * rng.standard_normal((ny, nz))
    Hk = np.fft.fft2(hk)
    cv = pe.conv_fused_pair(
        Planar(jnp.asarray(xy.real.astype(np.float32)),
               jnp.asarray(xy.imag.astype(np.float32))),
        ny, nz, np.ascontiguousarray(Hk.T), scale=1.0 / (ny * nz))
    check("conv pair 256x256", np.asarray(cv.re) + 1j * np.asarray(cv.im),
          np.fft.ifft2(np.fft.fft2(xy, axes=(1, 2)) * Hk, axes=(1, 2)),
          tol=2e-4)

    # --- window legality classes (round-4 hardware audit: Mosaic block
    # dims must be (8, 128)-divisible or equal the array dims; these
    # exercise the rounding / corner-slice / pruning machinery on real
    # Mosaic, which interpret mode cannot)
    print("elision windows (hardware block legality):")
    xw = np.zeros((2, ny, nz), dtype=np.complex64)
    xw[:, :100, :200] = (rng.standard_normal((2, 100, 200))
                         + 1j * rng.standard_normal((2, 100, 200)))
    wr, wi = pe.fft_pair_planar(
        jnp.asarray(xw.real.astype(np.float32)),
        jnp.asarray(xw.imag.astype(np.float32)), ny, nz, False,
        in_keep=(100, 200))
    check("pair window (100,200) of 256^2", np.asarray(wr) + 1j * np.asarray(wi),
          np.fft.fft2(xw, axes=(1, 2)), tol=2e-4)
    x1 = np.zeros((256, 1024), dtype=np.complex64)
    x1[:, :600] = (rng.standard_normal((256, 600))
                   + 1j * rng.standard_normal((256, 600)))
    vr, vi = pe.core_fft_planar_v3(
        jnp.asarray(x1.real.astype(np.float32)),
        jnp.asarray(x1.imag.astype(np.float32)), 1024, False, in_nonzero=600)
    check("v3 unaligned window n=1024 h=600",
          np.asarray(vr) + 1j * np.asarray(vi), np.fft.fft(x1), tol=2e-4)
    x2 = np.zeros((256, 512), dtype=np.complex64)
    x2[:, :128] = (rng.standard_normal((256, 128))
                   + 1j * rng.standard_normal((256, 128)))
    x2[:, 384:] = (rng.standard_normal((256, 128))
                   + 1j * rng.standard_normal((256, 128)))
    ir2, ii2 = pe.core_fft_planar_v3(
        jnp.asarray(x2.real.astype(np.float32)),
        jnp.asarray(x2.imag.astype(np.float32)), 512, False,
        in_window=(128, 384))
    check("v3 interior window n=512 [128,384)",
          np.asarray(ir2) + 1j * np.asarray(ii2), np.fft.fft(x2), tol=2e-4)
    from vkfft_tpu.planner import plan_axis as _plan_axis
    from vkfft_tpu.planner import Algorithm as _Alg
    xb = (rng.standard_normal((2, 263)) + 1j * rng.standard_normal((2, 263)))
    pb = _plan_axis(263)
    assert pb.algorithm is _Alg.BLUESTEIN
    yb = pe.fft_lines_p(Planar(jnp.asarray(xb.real.astype(np.float32)),
                               jnp.asarray(xb.imag.astype(np.float32))),
                        pb, False)
    check("bluestein fused n=263 (odd io width)",
          np.asarray(yb.re) + 1j * np.asarray(yb.im), np.fft.fft(xb),
          tol=2e-4)

    # --- single-kernel 2-D real transform (r2c pair)
    print("r2c pair (single-kernel rfft2/irfft2):")
    xrr = rng.standard_normal((2, 256, 256)).astype(np.float32)
    Xp = pe.rfft2_pair_planar(jnp.asarray(xrr))
    check("rfft2 pair 256x256", np.asarray(Xp.re) + 1j * np.asarray(Xp.im),
          np.fft.rfft2(xrr.astype(np.float64), axes=(1, 2)), tol=2e-4)
    yrr = pe.irfft2_pair_planar(Xp.re, Xp.im, 256, 256)
    check("irfft2 pair roundtrip", np.asarray(yrr), xrr, tol=2e-4)

    # --- in-kernel DCT/DST I-IV (round-3 no-shuffle forms)
    print("in-kernel DCT/DST I-IV:")
    import scipy.fft as sfft
    xdc = rng.standard_normal((4, 1024)).astype(np.float32)
    check("dct2 kernel n=1024", np.asarray(pe.dct2_lines(jnp.asarray(xdc))),
          sfft.dct(xdc.astype(np.float64), type=2, axis=-1), tol=2e-4)
    check("dct3 kernel n=1024", np.asarray(pe.dct3_lines(jnp.asarray(xdc))),
          sfft.dct(xdc.astype(np.float64), type=3, axis=-1), tol=2e-4)
    check("dst2 kernel n=1024", np.asarray(pe.dst2_lines(jnp.asarray(xdc))),
          sfft.dst(xdc.astype(np.float64), type=2, axis=-1), tol=2e-4)
    check("dst3 kernel n=1024", np.asarray(pe.dst3_lines(jnp.asarray(xdc))),
          sfft.dst(xdc.astype(np.float64), type=3, axis=-1), tol=2e-4)
    xd1 = rng.standard_normal((4, 1025)).astype(np.float32)
    check("dct1 kernel n=1025", np.asarray(pe.dct1_lines(jnp.asarray(xd1))),
          sfft.dct(xd1.astype(np.float64), type=1, axis=-1), tol=2e-4)
    xs1 = rng.standard_normal((4, 1023)).astype(np.float32)
    check("dst1 kernel n=1023", np.asarray(pe.dst1_lines(jnp.asarray(xs1))),
          sfft.dst(xs1.astype(np.float64), type=1, axis=-1), tol=2e-4)
    check("dct4 kernel n=1024", np.asarray(pe.dct4_lines(jnp.asarray(xdc))),
          sfft.dct(xdc.astype(np.float64), type=4, axis=-1), tol=2e-4)
    check("dst4 kernel n=1024", np.asarray(pe.dst4_lines(jnp.asarray(xdc))),
          sfft.dst(xdc.astype(np.float64), type=4, axis=-1), tol=2e-4)

    # --- packed half-spectrum layout + tl round trip + interior zeropad
    print("round-3 layout paths:")
    xrp = rng.standard_normal((260, 1024)).astype(np.float32)
    pr, pi = pe.rfft_lines_packed(jnp.asarray(xrp))
    back = pe.irfft_lines_packed(pr, pi, 1024, scale=1.0 / 512)
    check("r2c packed roundtrip n=1024", np.asarray(back), xrp, tol=2e-5)
    xtl = (rng.standard_normal((300, 1024))
           + 1j * rng.standard_normal((300, 1024)))
    tlr = jnp.asarray(xtl.real.astype(np.float32))
    tli = jnp.asarray(xtl.imag.astype(np.float32))
    ar, ai = pe.core_fft_planar_v3_tl(tlr, tli, 1024, False)
    br, bi = pe.core_fft_planar_v3_tl(ar, ai, 1024, True, scale=1.0 / 1024)
    check("tl-intermediate roundtrip n=1024",
          np.asarray(br)[:300] + 1j * np.asarray(bi)[:300], xtl, tol=2e-5)
    xw = rng.standard_normal((130, 1024)).astype(np.float32)
    xw[:, 256:768] = 0
    wr, wi = pe.core_fft_planar_v3(jnp.asarray(xw),
                                   jnp.zeros((130, 1024), jnp.float32),
                                   1024, False, in_window=(256, 768))
    check("interior zeropad window n=1024",
          np.asarray(wr) + 1j * np.asarray(wi), np.fft.fft(xw), tol=2e-4)

    # --- int8 compute mode (6-pass digit emulation on the int8 MXU)
    print("int8 compute mode (set_compute_mode('fp32_int8')):")
    vk.set_compute_mode("fp32_int8")
    try:
        for n in [256, 1024, 1000, 4096]:
            xq = (rng.standard_normal((64, n)) + 1j * rng.standard_normal((64, n)))
            xr8 = jnp.asarray(xq.real.astype(np.float32))
            xi8 = jnp.asarray(xq.imag.astype(np.float32))
            fr, fi = pe.core_fft_planar_v3(xr8, xi8, n, False)
            check(f"int8 v3 fwd n={n}", np.asarray(fr) + 1j * np.asarray(fi),
                  np.fft.fft(xq, axis=-1))
        xq = (rng.standard_normal((8, 16384))
              + 1j * rng.standard_normal((8, 16384)))
        fr, fi = pe.core_fft_planar_v2(
            jnp.asarray(xq.real.astype(np.float32)),
            jnp.asarray(xq.imag.astype(np.float32)), 16384, False)
        check("int8 v2 fwd n=16384", np.asarray(fr) + 1j * np.asarray(fi),
              np.fft.fft(xq, axis=-1))
    finally:
        vk.set_compute_mode("fp32")

    # --- long path (fused inter-pass twiddles ride the strided kernel)
    print("long path (multi-upload four-step):")
    nL = 1 << 17
    xl = (rng.standard_normal((2, nL)) + 1j * rng.standard_normal((2, nL)))
    xr = jnp.asarray(xl.real.astype(np.float32))
    xi = jnp.asarray(xl.imag.astype(np.float32))
    fr, fi = pe.fft_long_planar(xr, xi, nL, False)
    check("long fwd n=2^17", np.asarray(fr)[:, :4096] + 1j * np.asarray(fi)[:, :4096],
          np.fft.fft(xl, axis=-1)[:, :4096], tol=2e-4)
    br, bi = pe.fft_long_planar(fr, fi, nL, True)
    check("long roundtrip n=2^17",
          (np.asarray(br) + 1j * np.asarray(bi)) / nL, xl, tol=2e-4)

    # --- dd kernels on hardware (EFT barriers hold; CPU fusion hazard
    # does not apply here): contiguous + the strided (transpose-free) form
    print("double-double kernels:")
    from vkfft_tpu.precision.dd_kernel import dd_fft_pallas, dd_fft_strided_pallas
    from vkfft_tpu.precision.doubledouble import (ddc_from_complex128,
                                                  ddc_to_complex128)
    xd = rng.standard_normal((4, 1024)) + 1j * rng.standard_normal((4, 1024))
    got = ddc_to_complex128(dd_fft_pallas(ddc_from_complex128(xd), 1024, False))
    check("dd contiguous n=1024", got, np.fft.fft(xd), tol=1e-12)
    xs = rng.standard_normal((2, 256, 192)) + 1j * rng.standard_normal((2, 256, 192))
    got = ddc_to_complex128(
        dd_fft_strided_pallas(ddc_from_complex128(xs), 256, False))
    check("dd strided n=256 (S=192, lane-padded)", got,
          np.fft.fft(xs, axis=1), tol=1e-12)

    # --- 3-D (strided v3 passes on two axes)
    print("3-D:")
    sh = (64, 64, 64)
    x3 = (rng.standard_normal(sh) + 1j * rng.standard_normal(sh))
    got = vk.fftn(x3.astype(np.complex64))
    got = to_numpy(got) if isinstance(got, Planar) else np.asarray(got)
    check("fftn 64^3", got, np.fft.fftn(x3), tol=2e-4)

    # --- round 5: outer-axis kernel, one-kernel Bluestein, elision routes
    print("round-5 kernels:")
    from vkfft_tpu.pcomplex import Planar as _P
    xo = rng.standard_normal((1, 256, 16, 128)) + 1j * rng.standard_normal(
        (1, 256, 16, 128))
    orr, oi = pe.outer_fft_planar(
        jnp.asarray(xo.real.astype(np.float32)),
        jnp.asarray(xo.imag.astype(np.float32)), 256, False)
    check("outer-axis kernel n=256", np.asarray(orr) + 1j * np.asarray(oi),
          np.fft.fft(xo, axis=1))
    xo60 = rng.standard_normal((1, 60, 8, 128)) + 1j * rng.standard_normal(
        (1, 60, 8, 128))
    orr, oi = pe.outer_fft_planar(
        jnp.asarray(xo60.real.astype(np.float32)),
        jnp.asarray(xo60.imag.astype(np.float32)), 60, False)
    check("outer-axis generic radices n=60",
          np.asarray(orr) + 1j * np.asarray(oi), np.fft.fft(xo60, axis=1))
    xb = rng.standard_normal((8, 10007)) + 1j * rng.standard_normal((8, 10007))
    pb = _P(jnp.asarray(xb.real.astype(np.float32)),
            jnp.asarray(xb.imag.astype(np.float32)))
    yb = pe._bluestein_pair_p(pb, 10007, 32768, False)
    check("bluestein-pair n=10007",
          np.asarray(yb.re) + 1j * np.asarray(yb.im), np.fft.fft(xb, axis=1))
    # elision routes through the application
    from vkfft_tpu import api as _api
    from vkfft_tpu.config import FFTConfig as _C
    sh = (64, 128, 128)
    app = _api.FFTApplication(_C(shape=sh, normalize=True,
                                 zeropad_output=(None, (64, 128), (64, 128))),
                              engine="pallas")
    x5 = rng.standard_normal(sh) + 1j * rng.standard_normal(sh)
    p5 = _P(jnp.asarray(x5.real.astype(np.float32)),
            jnp.asarray(x5.imag.astype(np.float32)))
    r5 = np.fft.fftn(x5)
    r5[:, 64:] = 0
    r5[:, :, 64:] = 0
    check("pair_out route (frequencyZeroPadding)", to_numpy(app.forward(p5)),
          r5, tol=2e-4)
    sh6 = (256, 512)
    app6 = _api.FFTApplication(_C(shape=sh6, normalize=True,
                                  zeropad_input=((128, 256), (256, 512))),
                               engine="pallas")
    x6 = rng.standard_normal(sh6) + 1j * rng.standard_normal(sh6)
    x6[128:] = 0
    x6[:, 256:] = 0
    p6 = _P(jnp.asarray(x6.real.astype(np.float32)),
            jnp.asarray(x6.imag.astype(np.float32)))
    check(f"2-D elision route ({app6.zeropad_mode})",
          to_numpy(app6.forward(p6)), np.fft.fftn(x6), tol=2e-4)

    print(f"\n{'PASS' if not failures else 'FAIL'}: "
          f"{len(failures)} failure(s) {failures or ''}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
