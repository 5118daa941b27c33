"""CLI benchmark / precision / functional suite.

TPU analog of the reference's test-suite driver (``VkFFT_TestSuite.cpp:548``
flag dispatch, ``:124`` launchVkFFT) with the same sample taxonomy:

  0-10    benchmarks          (``sample_0..10_benchmark_*.cpp``)
  11-19   precision vs oracle (``sample_11..19_precision_*.cpp``)
  50-52   convolution checks  (``sample_50..52_convolution_*.cpp``)
  100-101 DCT benchmarks      (``sample_100/101_benchmark_*_dct.cpp``)
  1000+   size sweeps         (``sample_1000..1004_*_2_4096.cpp``)
  200     user benchmark      (``user_benchmark_VkFFT.cpp``, flags
                               -X/-Y/-Z/-P/-B/-N/-R2C/-DCT)

Metrics match the reference: per-system avg ms over ``num_iter`` runs,
"benchmark score" = sum(bufferSize_KB / avg_ms) / num_systems
(``sample_0...cpp:242,268``), and estimated bandwidth from bytes moved
(``:234-241``).  Precision metrics: avg/max absolute difference and relative
eps vs the fp64 numpy oracle (``sample_11...cpp:289-323``).

Usage:  python -m vkfft_tpu.cli -vkfft 0 [-o results.txt] [--engine jnp]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


_SAMPLES = {}


def sample(num, desc):
    def deco(fn):
        _SAMPLES[num] = (fn, desc)
        return fn
    return deco


class Ctx:
    def __init__(self, args):
        self.args = args
        self.engine = args.engine
        self.out = open(args.output, "a") if args.output else None

    def log(self, msg=""):
        print(msg)
        if self.out:
            self.out.write(msg + "\n")
            self.out.flush()


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _rand_complex(shape, seed=0, dtype=np.complex64):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(dtype)


def _time_fwd_inv(app, x, iters=80, warmup=2):
    """Reference ``performVulkanFFTiFFT`` analog (utils_VkFFT.cpp:868):
    an in-graph lax.fori_loop chain of forward+inverse with a value fetch,
    two-point fitted — host-side loops cannot measure tunneled TPU runtimes
    (async dispatch + result caching + tens-of-ms sync costs)."""
    import jax
    import numpy as _np
    from vkfft_tpu import api
    from vkfft_tpu.pcomplex import from_complex, Planar

    planar = not api.complex_supported()
    xd = from_complex(x) if planar else jax.numpy.asarray(x)

    def make(n_it):
        @jax.jit
        def run(p):
            return jax.lax.fori_loop(
                0, n_it, lambda i, v: app._inv(app._fwd(v)), p)
        return run

    def force(v):
        # index ON DEVICE first: np.asarray on the full array would pull
        # the whole working set through the tunnel inside the timed region
        # (the e20/e22 harness bug — BENCH.md postmortem)
        leaf = v.re if isinstance(v, Planar) else v
        return float(_np.asarray(leaf[(0,) * leaf.ndim]).real)

    lo_n = max(1, iters // 6)
    hi_n = max(iters, lo_n + 1)
    f_lo, f_hi = make(lo_n), make(hi_n)
    force(f_lo(xd))
    force(f_hi(xd))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(f(xd))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(f_hi) - timed(f_lo)) / (hi_n - lo_n), 1e-9)


def _time_chain_fn(fn, x0, n_lo=10, n_hi=60):
    """Chained two-point timing of a shape-preserving jitted callable
    (see _time_fwd_inv; naive block_until_ready loops are fiction on the
    tunneled runtime)."""
    import jax
    import numpy as _np

    def make(n_it):
        @jax.jit
        def run(v):
            return jax.lax.fori_loop(0, n_it, lambda i, z: fn(z), v)
        return run

    def force(v):
        leaf = jax.tree_util.tree_leaves(v)[0]
        return float(_np.asarray(leaf[(0,) * leaf.ndim]).real)

    f_lo, f_hi = make(n_lo), make(n_hi)
    force(f_lo(x0))
    force(f_hi(x0))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(f(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(f_hi) - timed(f_lo)) / (n_hi - n_lo), 1e-9)


def _bench_systems(ctx, systems, dtype=np.complex64, target_mb=128,
                   label="", iters=80):
    """Reference sample-0 pattern: sweep systems, batch each to target size,
    print ms + bandwidth + aggregate score.  128MB default sets: the only
    stable size class on the tunneled runtime (64MB swings +-30%, BENCH.md
    fact 14)."""
    import vkfft_tpu as vt

    score = 0.0
    itemsize = np.dtype(dtype).itemsize
    for shape in systems:
        n_elems = int(np.prod(shape))
        batch = max(1, target_mb * 1024 * 1024 // (itemsize * n_elems))
        x = _rand_complex((batch,) + shape, seed=n_elems, dtype=dtype)
        cfg = vt.FFTConfig(shape=shape, normalize=False)
        app = vt.get_application(cfg, ctx.engine)
        dt = _time_fwd_inv(app, x, iters=iters)
        buf_kb = x.nbytes / 1024
        uploads = 2 * len(shape)  # fwd+inv, one read+write per axis pass
        if dt < 50e-6:
            # below the tunneled runtime's sync jitter: unmeasurable here
            ctx.log(f"  {label}{'x'.join(map(str, shape)):>16} batch {batch:6d}: "
                    f"  (below timing noise floor; see bench.py)")
            continue
        gbs = x.nbytes * 2 * uploads / dt / 1e9
        score += buf_kb / (dt * 1e3)
        ctx.log(f"  {label}{'x'.join(map(str, shape)):>16} batch {batch:6d}: "
                f"{dt * 1e3:8.3f} ms  est {gbs:7.1f} GB/s")
    ctx.log(f"  benchmark score: {score / len(systems):.1f}")


def _precision_report(ctx, name, got, ref):
    diff = np.abs(got - ref)
    data_norm = np.abs(ref)
    eps = diff / np.maximum(data_norm.max(), 1e-300)
    ctx.log(f"  {name}: avg_diff {diff.mean():.3e}  max_diff {diff.max():.3e}  "
            f"avg_eps {eps.mean():.3e}  max_eps {eps.max():.3e}")
    return eps.max()


def _to_host(y):
    from vkfft_tpu.pcomplex import Planar, to_numpy
    return to_numpy(y) if isinstance(y, Planar) else np.asarray(y)


def _run_fft_host(x, engine, axes=None, inverse=False):
    import vkfft_tpu as vt
    from vkfft_tpu import api
    from vkfft_tpu.pcomplex import to_numpy, Planar

    y = vt.fftn(x, axes=axes, engine=engine, inverse=inverse)
    if isinstance(y, Planar):
        return to_numpy(y)
    return np.asarray(y)


def _as_np(y):
    """Planar -> complex numpy; anything else -> np.asarray (complex-free
    backends return Planar from rfft and friends)."""
    from vkfft_tpu.pcomplex import to_numpy, Planar

    return to_numpy(y) if isinstance(y, Planar) else np.asarray(y)


# ---------------------------------------------------------------------------
# benchmark samples
# ---------------------------------------------------------------------------

@sample(0, "benchmark 1D batched C2C FP32 (pow-2)")
def sample_0(ctx):
    _bench_systems(ctx, [(1 << k,) for k in range(6, 13)])


@sample(1, "benchmark 1D batched C2C FP64 (CPU) / double-double (TPU)")
def sample_1(ctx):
    from vkfft_tpu import api
    if api.complex_supported():
        _bench_systems(ctx, [(1 << k,) for k in range(6, 12)], dtype=np.complex128)
    else:
        ctx.log("  (fp64 path on TPU = double-double; see sample 9)")


@sample(3, "benchmark 3D C2C FP32 (cube sweep, sample_3/1003 analog)")
def sample_3(ctx):
    """Reference sample_3 + the 3-D benchmark sweep of
    ``sample_1003_benchmark_VkFFT_single_3d_2_512.cpp``: pow-2 cubes to
    512^3 plus a non-pow-2 row (96 = 2^5*3, per-axis route)."""
    _bench_systems(ctx, [(32, 32, 32), (64, 64, 64), (96, 96, 96),
                         (128, 128, 128), (256, 256, 256),
                         (512, 512, 512)], target_mb=128)


@sample(6, "benchmark R2C/C2R FP32")
def sample_6(ctx):
    import vkfft_tpu as vt
    import jax
    import jax.numpy as jnp
    for n in (256, 1024, 4096):
        batch = max(1, 128 * 1024 * 1024 // (4 * n))
        rng = np.random.default_rng(n)
        x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        f = lambda v: vt.irfft(vt.rfft(v, engine=ctx.engine), n=n,
                               engine=ctx.engine)
        dt = _time_chain_fn(f, x)
        if dt < 50e-6:
            ctx.log(f"  R2C+C2R n={n:6d}: below timing noise floor")
            continue
        moved = 2 * 2 * batch * n * 4   # real r+w per direction class
        ctx.log(f"  R2C+C2R n={n:6d} batch {batch:6d}: {dt * 1e3:8.3f} ms  "
                f"est {moved / dt / 1e9:7.1f} GB/s")


@sample(7, "benchmark Bluestein (primes) FP32")
def sample_7(ctx):
    """Primes vs the smooth neighbor: 10007 (Bluestein, m=32768 ONE-kernel
    conv-pair tier — round 5), 7919 (Rader, p-1 = 2*37*107 fused v2 conv),
    10006 (SPLIT with a 5003 Bluestein factor), and 10240 = 2^11*5 (the
    smooth long-path neighbor the prime rows are judged against — same
    nominal-bytes formula, so the GB/s ratio IS the time-per-point
    ratio)."""
    _bench_systems(ctx, [(10007,), (7919,), (2 * 5003,), (10240,)],
                   target_mb=64)


# ---------------------------------------------------------------------------
# precision samples
# ---------------------------------------------------------------------------

_PRECISION_SYSTEMS_1D = [(1 << k,) for k in range(3, 15)] + [
    (6,), (12,), (60,), (120,), (360,), (1000,), (2310,),
]
# long-path (multi-upload four-step) systems to the reference's full 2^26
# envelope (sample_11_precision_VkFFT_single.cpp:78-90) — round 4
_PRECISION_SYSTEMS_LONG = [(1 << 17,), (1 << 20,), (1 << 22,), (1 << 24,),
                           (1 << 26,)]
# 4-D transforms (reference default VKFFT_MAX_FFT_DIMENSIONS=4,
# vkFFT/vkFFT.h:70-102)
_PRECISION_SYSTEMS_ND = [(8, 16), (32, 32), (16, 17, 4), (8, 8, 8),
                         (8, 8, 8, 8), (4, 8, 16, 8)]


@sample(11, "precision C2C FP32 vs fp64 oracle")
def sample_11(ctx):
    worst = 0.0
    for shape in (_PRECISION_SYSTEMS_1D + _PRECISION_SYSTEMS_LONG
                  + _PRECISION_SYSTEMS_ND):
        x = _rand_complex(shape, seed=1, dtype=np.complex64)
        got = _run_fft_host(x, ctx.engine)
        ref = np.fft.fftn(x.astype(np.complex128))
        worst = max(worst, _precision_report(ctx, f"{'x'.join(map(str, shape))}", got, ref))
    ctx.log(f"  WORST max_eps: {worst:.3e} ({'PASS' if worst < 1e-4 else 'FAIL'})")


@sample(12, "precision C2C FP64 vs fp64 oracle")
def sample_12(ctx):
    """FP64 tier everywhere: native complex128 on complex-capable backends;
    on TPU the DOUBLE-precision config converts complex128 through the
    double-double quad planes automatically (reference ``doublePrecision``
    one-flag ergonomics, ``vkFFT_Structs.h:187``)."""
    import vkfft_tpu as vt
    from vkfft_tpu import api
    from vkfft_tpu.config import Precision
    worst = 0.0
    native = api.complex_supported()
    systems = _PRECISION_SYSTEMS_1D if native else _PRECISION_SYSTEMS_1D[:10]
    for shape in systems:
        x = _rand_complex(shape, seed=2, dtype=np.complex128)
        if native:
            got = _run_fft_host(x, ctx.engine)
        else:
            cfg = vt.FFTConfig(shape=shape, normalize=False,
                               precision=Precision.DOUBLE)
            app = vt.get_application(cfg, ctx.engine)
            got = app.forward(x.reshape(1, *shape))[0]
        ref = np.fft.fftn(x)
        worst = max(worst, _precision_report(ctx, f"{shape[0]}", got, ref))
    ctx.log(f"  WORST max_eps: {worst:.3e} ({'PASS' if worst < 1e-12 else 'FAIL'})")


@sample(14, "precision non-pow2 + primes (Rader/Bluestein paths)")
def sample_14(ctx):
    worst = 0.0
    # primes toward the reference's ~1e5 envelope (Rader ceiling README.md:10,
    # Bluestein beyond): 32771/65537/99991 exercise the large-prime paths
    for n in [17, 31, 61, 67, 97, 101, 257, 641, 1009, 10007, 10006, 919,
              32771, 65537, 99991]:
        x = _rand_complex((3, n), seed=n, dtype=np.complex64)
        got = _run_fft_host(x, ctx.engine, axes=(-1,))
        ref = np.fft.fft(x.astype(np.complex128), axis=-1)
        worst = max(worst, _precision_report(ctx, f"n={n}", got, ref))
    ctx.log(f"  WORST max_eps: {worst:.3e} ({'PASS' if worst < 1e-3 else 'FAIL'})")


@sample(15, "precision R2C/C2R")
def sample_15(ctx):
    import vkfft_tpu as vt
    worst = 0.0
    for n in [8, 64, 256, 1024, 60, 1000, 17, 101]:
        rng = np.random.default_rng(n)
        x = rng.standard_normal((3, n)).astype(np.float32)
        got = _as_np(vt.rfft(x, engine=ctx.engine))
        ref = np.fft.rfft(x.astype(np.float64))
        worst = max(worst, _precision_report(ctx, f"n={n}", got, ref))
        back = _as_np(vt.irfft(got, n=n, engine=ctx.engine))
        worst = max(worst, _precision_report(ctx, f"n={n} inv", back, x.astype(np.float64)))
    ctx.log(f"  WORST max_eps: {worst:.3e} ({'PASS' if worst < 1e-4 else 'FAIL'})")


@sample(16, "precision DCT I-IV FP32")
def sample_16(ctx):
    import vkfft_tpu as vt
    worst = 0.0
    for t in (1, 2, 3, 4):
        # 1024/1000/255 exercise the in-kernel forms (incl. odd lengths)
        for n in (16, 64, 100, 256, 255, 1000, 1024):
            rng = np.random.default_rng(n * t)
            x = rng.standard_normal((3, n)).astype(np.float32)
            got = np.asarray(vt.dct(x, type=t, engine=ctx.engine))
            j = np.arange(n)
            k = np.arange(n)[:, None]
            if t == 1:
                jj = np.arange(1, n - 1)
                M = 2 * np.cos(np.pi * jj * k / (n - 1))
                ref = x[..., :1] + ((-1.0) ** k[:, 0]) * x[..., -1:] + x[..., 1:-1] @ M.T
            elif t == 2:
                ref = x @ (2 * np.cos(np.pi * (2 * j + 1) * k / (2 * n))).T
            elif t == 3:
                jj = np.arange(1, n)
                ref = x[..., :1] + x[..., 1:] @ (2 * np.cos(np.pi * jj * (2 * k + 1) / (2 * n))).T
            else:
                ref = x @ (2 * np.cos(np.pi * (2 * j + 1) * (2 * k + 1) / (4 * n))).T
            worst = max(worst, _precision_report(ctx, f"DCT-{t} n={n}", got, ref))
    ctx.log(f"  WORST max_eps: {worst:.3e} ({'PASS' if worst < 1e-3 else 'FAIL'})")


@sample(17, "precision DST I-IV FP32")
def sample_17(ctx):
    import vkfft_tpu as vt
    worst = 0.0
    for t in (1, 2, 3, 4):
        for n in (16, 64, 100, 255, 1024):
            rng = np.random.default_rng(n * t + 7)
            x = rng.standard_normal((2, n)).astype(np.float32)
            got = np.asarray(vt.dst(x, type=t, engine=ctx.engine))
            back = np.asarray(vt.idst(got, type=t, engine=ctx.engine))
            worst = max(worst, _precision_report(ctx, f"DST-{t} n={n} roundtrip",
                                                 back, x.astype(np.float64)))
    ctx.log(f"  WORST max_eps: {worst:.3e} ({'PASS' if worst < 1e-3 else 'FAIL'})")


# ---------------------------------------------------------------------------
# convolution samples
# ---------------------------------------------------------------------------

@sample(50, "convolution: 1D 3x3 identity matrix kernel")
def sample_50(ctx):
    import vkfft_tpu as vt
    n = 32
    x = _rand_complex((3, n), seed=5)
    kern = np.zeros((3, 3, n))
    for c in range(3):
        kern[c, c, 0] = 1.0
    cfg = vt.FFTConfig(shape=(n,), convolution=True, matrix_convolution=3,
                       coordinate_features=3)
    app = vt.ConvolutionApplication(cfg, kern, engine=ctx.engine)
    y = _to_host(app(x))
    err = np.abs(y - x).max()
    ctx.log(f"  identity 3x3 matrix conv max err: {err:.3e} "
            f"({'PASS' if err < 1e-4 else 'FAIL'})")


@sample(52, "convolution: 2D batched scalar kernel vs oracle")
def sample_52(ctx):
    import vkfft_tpu as vt
    shape = (16, 32)
    x = _rand_complex((4,) + shape, seed=6)
    h = _rand_complex(shape, seed=7)
    cfg = vt.FFTConfig(shape=shape, convolution=True)
    app = vt.ConvolutionApplication(cfg, h, engine=ctx.engine)
    y = _to_host(app(x))
    ref = np.fft.ifft2(np.fft.fft2(x) * np.fft.fft2(h))
    err = np.abs(y - ref).max() / np.abs(ref).max()
    ctx.log(f"  2D conv rel err: {err:.3e} ({'PASS' if err < 1e-4 else 'FAIL'})")


@sample(100, "benchmark multidim DCT FP32 (types 2 and 4, odd sizes incl.)")
def sample_100(ctx):
    import vkfft_tpu as vt
    import jax.numpy as jnp
    # n=255 exercises the odd-length in-kernel forms (round-3 gates admit
    # any n whose doubled length is v3-plannable); type 4 covers the
    # rewritten per-line DCT-IV kernel (round-4 hardware number)
    for t in (2, 4):
        for n in (256, 1024, 255):
            batch = max(1, 128 * 1024 * 1024 // (4 * n))
            rng = np.random.default_rng(n)
            x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
            # chained callables are self-normalizing (idct inverts dct
            # exactly here — measured growth factor 1.0)
            f = lambda v, t=t: vt.idct(vt.dct(v, type=t, engine=ctx.engine),
                                       type=t, engine=ctx.engine)
            dt = _time_chain_fn(f, x)
            if dt < 50e-6:
                ctx.log(f"  DCT-{t} n={n}: below timing noise floor")
                continue
            moved = 2 * 2 * batch * n * 4
            ctx.log(f"  DCT-{t}+inv n={n} batch {batch}: {dt * 1e3:8.3f} ms  "
                    f"est {moved / dt / 1e9:7.1f} GB/s")


@sample(1000, "sweep: EVERY system 2..4096 FP32 precision")
def sample_1000(ctx):
    """Reference sample_1000 runs *every* n in 2..4096
    (``sample_1000_benchmark_VkFFT_single_2_4096.cpp:77``) — the headline
    sweep.  Full breadth runs on complex-capable backends (CPU); on the
    tunneled TPU a ~130-system structured subset keeps compile volume sane
    (every algorithm class: pow-2, smooth, Rader primes, Bluestein primes,
    v2/v3 boundary sizes) — the full set is CI-coverable via
    ``JAX_PLATFORMS=cpu``."""
    from vkfft_tpu import api
    worst = 0.0
    worst_n = 0
    count = 0
    if api.complex_supported():
        sizes = range(2, 4097)
    else:
        from vkfft_tpu.planner import decompose, Algorithm
        keyset = {2, 3, 4, 5, 8, 16, 32, 64, 128, 256, 512, 1024, 2048,
                  4096, 6, 12, 60, 120, 360, 1000, 2310, 97, 101, 1009,
                  263, 1019, 129, 255, 257, 4095}
        sizes = sorted(keyset | {n for n in range(2, 4097) if n % 37 == 0}
                       | {n for n in range(2, 4097) if n % 61 == 0})
    for n in sizes:
        x = _rand_complex((2, n), seed=n, dtype=np.complex64)
        got = _run_fft_host(x, ctx.engine, axes=(-1,))
        ref = np.fft.fft(x.astype(np.complex128), axis=-1)
        eps = np.abs(got - ref).max() / np.abs(ref).max()
        if eps > worst:
            worst, worst_n = eps, n
        count += 1
    ctx.log(f"  {count} systems, worst rel err {worst:.3e} at n={worst_n} "
            f"({'PASS' if worst < 1e-4 else 'FAIL'})")


@sample(200, "user benchmark (-X/-Y/-Z/-P/-B/-N/-R2C/-DCT)")
def sample_200(ctx):
    import vkfft_tpu as vt
    a = ctx.args
    shape = tuple(s for s in (a.Z, a.Y, a.X) if s > 1) or (a.X,)
    dtype = np.complex128 if a.P else np.complex64
    batch = a.B
    if a.DCT:
        rng = np.random.default_rng(0)
        x = rng.standard_normal((batch,) + shape).astype(np.float32)
        import jax
        f = jax.jit(lambda v: vt.dctn(v, type=a.DCT, engine=ctx.engine))
        jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        for _ in range(a.N):
            y = f(x)
        jax.block_until_ready(y)
        ctx.log(f"  DCT-{a.DCT} {shape} batch {batch}: {(time.perf_counter() - t0) / a.N * 1e3:.3f} ms")
        return
    if a.R2C:
        rng = np.random.default_rng(0)
        n = shape[-1]
        x = rng.standard_normal((batch,) + shape).astype(np.float32)
        import jax
        f = jax.jit(lambda v: vt.irfft(vt.rfft(v, engine=ctx.engine), n=n,
                                       engine=ctx.engine))
        jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        for _ in range(a.N):
            y = f(x)
        jax.block_until_ready(y)
        ctx.log(f"  R2C+C2R {shape} batch {batch}: "
                f"{(time.perf_counter() - t0) / a.N * 1e3:.3f} ms")
        return
    x = _rand_complex((batch,) + shape, dtype=dtype)
    cfg = vt.FFTConfig(shape=shape, normalize=False)
    if a.load:
        # reference -load FILE: loadApplicationFromString from a user file
        from vkfft_tpu import cache
        with open(a.load, "rb") as f:
            app = cache.load_application_from_string(f.read(), engine=ctx.engine)
        ctx.log(f"  loaded plan blob from {a.load}")
    else:
        app = vt.get_application(cfg, ctx.engine)
    if a.save:
        # reference -save FILE: saveApplicationToString to a user file
        from vkfft_tpu import cache
        with open(a.save, "wb") as f:
            f.write(cache.save_application_to_string(app))
        ctx.log(f"  saved plan blob to {a.save}")
    dt = _time_fwd_inv(app, x, iters=a.N)
    gbs = x.nbytes * 2 * 2 * len(shape) / dt / 1e9
    ctx.log(f"  {shape} batch {batch}: {dt * 1e3:.3f} ms  est {gbs:.1f} GB/s")




@sample(2, "benchmark bf16/fp16 storage C2C (halfPrecisionMemoryOnly analog)")
def sample_2(ctx):
    import jax.numpy as jnp
    from vkfft_tpu.config import Precision
    import vkfft_tpu as vt
    from vkfft_tpu.pcomplex import Planar
    for n in (256, 1024, 4096):
        batch = max(1, 128 * 1024 * 1024 // (4 * n))
        rng = np.random.default_rng(n)
        cfg = vt.FFTConfig(shape=(n,), precision=Precision.BFLOAT16,
                           normalize=True)
        app = vt.get_application(cfg, ctx.engine)
        # feed bf16 planes so the fori_loop carry type is stable (the app
        # narrows f32 input in-trace, which would flip the carry dtype)
        p = Planar(jnp.asarray(rng.standard_normal((batch, n))
                               .astype(np.float32)).astype(jnp.bfloat16),
                   jnp.asarray(rng.standard_normal((batch, n))
                               .astype(np.float32)).astype(jnp.bfloat16))
        dt = _time_fwd_inv(app, p)
        if dt < 50e-6:
            ctx.log(f"  bf16 n={n}: below timing noise floor")
            continue
        moved = 2 * 2 * 2 * batch * n * 2   # bf16 planes, r+w, fwd+inv
        ctx.log(f"  bf16 storage n={n} batch {batch}: {dt*1e3:8.3f} ms  "
                f"est {moved/dt/1e9:7.1f} GB/s of bf16 bytes")


@sample(9, "benchmark double-double (quad-class) C2C")
def sample_9(ctx):
    """Reference ``sample_9_benchmark_VkFFT_quadDoubleDouble.cpp`` analog:
    chained fwd+inv at a real batch, effective GB/s over the quad planes
    (4 fp32 planes per complex value = the dd storage footprint)."""
    import jax
    import jax.numpy as jnp
    from vkfft_tpu.precision.dd_fft import fft_lines_dd, dd_scale
    from vkfft_tpu.precision.doubledouble import DD, DDComplex

    for n in (256, 1024):
        batch = max(128, 64 * 1024 * 1024 // (16 * n))
        rng = np.random.default_rng(n)

        def mk(iters, n=n):
            def fwd_inv(v):
                y = fft_lines_dd(v, n, False)
                z = fft_lines_dd(y, n, True)
                return dd_scale(z, 1.0 / n)

            @jax.jit
            def run(v):
                return jax.lax.fori_loop(0, iters, lambda i, p: fwd_inv(p), v)
            return run

        planes = [jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
                  for _ in range(2)]
        z = jnp.zeros((batch, n), jnp.float32)
        x = DDComplex(DD(planes[0], z), DD(planes[1], z))
        lo, hi = 4, 24
        f_lo, f_hi = mk(lo), mk(hi)
        float(np.asarray(f_lo(x).re.hi[0, 0]))
        float(np.asarray(f_hi(x).re.hi[0, 0]))

        def timed(f):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(f(x).re.hi[0, 0]))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = max((timed(f_hi) - timed(f_lo)) / (hi - lo), 1e-9)
        moved = 4 * 4 * batch * n * 4  # quad planes, r+w, fwd+inv
        ctx.log(f"  dd n={n} batch {batch}: {dt*1e3:8.3f} ms/iter  "
                f"est {moved/dt/1e9:7.1f} GB/s")


@sample(19, "precision double-double vs fp64 oracle (quad-tier check)")
def sample_19(ctx):
    from vkfft_tpu.precision.dd_fft import fft_dd
    from vkfft_tpu import api
    worst = 0.0
    # the pallas dd kernel keeps traces small on any backend; Rader covers
    # primes > 13 (the round-1 OOM hazard was the unrolled XLA dd trace)
    sizes = (8, 64, 100, 256, 101, 1024, 17, 97)
    for n in sizes:
        rng = np.random.default_rng(n)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        try:
            got = fft_dd(x)
        except Exception as e:
            ctx.log(f"  n={n}: compile failed ({repr(e)[:80]})")
            continue
        ref = np.fft.fft(x)
        worst = max(worst, _precision_report(ctx, f"n={n}", got, ref))
    ctx.log(f"  WORST max_eps: {worst:.3e} ({'PASS' if worst < 5e-14 else 'FAIL'})")


@sample(10, "plan save/load (binary cache analog, sample-0 pattern)")
def sample_10(ctx):
    import vkfft_tpu as vt
    from vkfft_tpu import cache
    cfg = vt.FFTConfig(shape=(1024,), normalize=True)
    app = vt.get_application(cfg, ctx.engine)
    blob = cache.save_application_to_string(app)
    app2 = cache.load_application_from_string(blob, engine=ctx.engine)
    x = _rand_complex((8, 1024), seed=3)
    from vkfft_tpu import api
    from vkfft_tpu.pcomplex import from_complex, to_numpy, Planar
    planar = not api.complex_supported()
    xd = from_complex(x) if planar else x
    y1 = app.forward(xd)
    y2 = app2.forward(xd)
    a1 = to_numpy(y1) if isinstance(y1, Planar) else np.asarray(y1)
    a2 = to_numpy(y2) if isinstance(y2, Planar) else np.asarray(y2)
    ok = np.array_equal(a1, a2)
    ctx.log(f"  plan blob {len(blob)} bytes, reloaded app bitwise-equal: {ok} "
            f"({'PASS' if ok else 'FAIL'})")


@sample(4, "benchmark zero-padded C2C FP32 (3-D work elision; sample_4 analog)")
def sample_4(ctx):
    """Reference sample_4
    (``sample_4_benchmark_VkFFT_single_3d_zeropadding.cpp``) benchmarks
    THREE-dimensional transforms with half-size declared-zero windows on
    every axis — the regime where zero-pad elision compounds (zero minor
    lines are never transformed at all; README.md:14-15 'up to 2x').  The
    1-D rows time full round trips (fwd-only single-kernel chains pay XLA
    loop-carry copies that mask the kernel ratio — e35) plus a donated
    per-kernel forward chain for the kernel-level ratio."""
    import vkfft_tpu as vt
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import from_complex

    # The reference's FULL 39-system table (2-D rows + 3-D cubes,
    # ``sample_4...zeropadding.cpp:69-78``; its size[0] is the contiguous
    # dim -> reversed into our row-major shape).  The full sweep runs on
    # the CPU/jnp engine or with --full; hardware defaults to a
    # representative subset (one tunneled chip; compiles dominate).
    ref_2d = [(1024, 1024), (720, 480), (1280, 720), (1920, 1080),
              (2560, 1440), (3840, 2160), (7680, 4320)]
    ref_2d += [(1 << a, 1 << b) for a, b in
               ((6, 6), (7, 6), (7, 7), (8, 7), (8, 8), (9, 8), (9, 9),
                (10, 9), (10, 10), (11, 10), (11, 11), (12, 11), (12, 12),
                (13, 12), (13, 13), (14, 13))]
    ref_3d = [(1 << a, 1 << b, 1 << c) for a, b, c in
              ((4, 4, 4), (5, 4, 4), (5, 5, 4), (5, 5, 5), (6, 5, 5),
               (6, 6, 5), (6, 6, 6), (7, 6, 6), (7, 7, 6), (7, 7, 7),
               (8, 7, 7), (8, 8, 7), (8, 8, 8), (9, 8, 8), (9, 9, 8),
               (9, 9, 9))]
    full_sweep = ctx.engine == "jnp" or getattr(ctx.args, "full", False)
    if full_sweep:
        systems = ([tuple(reversed(d)) for d in ref_2d]
                   + [tuple(reversed(d)) for d in ref_3d])
        target = 8 * 1024 * 1024 if ctx.engine == "jnp" else 64 * 1024 * 1024
    else:
        # pow-2 2-D rows + the 3-D cubes: the HD-geometry rows (1080p
        # class) hit a slow-Mosaic-compile kernel class (small-K MXU
        # tails) and live in the CPU 39-system table instead
        systems = [(1024, 2048), (2048, 4096), (128, 128, 128),
                   (256, 256, 256), (512, 512, 512)]
        target = 128 * 1024 * 1024
    score_f = score_p = 0.0
    rated = 0
    for shape in systems:
        n_el = int(np.prod(shape))
        batch = max(1, target // (8 * n_el))
        x = from_complex(_rand_complex((batch,) + shape, seed=n_el))
        # reference pad window: [ceil(size/2), size) per axis
        zp = tuple((-(-d // 2), d) for d in shape)
        try:
            full = vt.get_application(vt.FFTConfig(shape=shape), ctx.engine)
            pad = vt.get_application(
                vt.FFTConfig(shape=shape, zeropad_input=zp), ctx.engine)
            dt_f = _time_chain_fn(full._fwd, x)
            dt_p = _time_chain_fn(pad._fwd, x)
        except Exception as e:
            ctx.log(f"  {'x'.join(map(str, shape))}: FAILED "
                    f"{repr(e)[:90]}")
            continue
        if min(dt_f, dt_p) < 50e-6:
            ctx.log(f"  {'x'.join(map(str, shape))}: below timing noise "
                    f"floor; see bench.py")
            continue
        kb = batch * n_el * 8 / 1024.0
        score_f += kb / (dt_f * 1e3)
        score_p += kb / (dt_p * 1e3)
        rated += 1
        ctx.log(f"  {'x'.join(map(str, shape)):>14s} batch {batch:4d} fwd: "
                f"full {dt_f*1e3:8.3f} ms  half-pad {dt_p*1e3:8.3f} ms "
                f"({dt_f/dt_p:.2f}x, mode: {pad.zeropad_mode})")
    if rated:
        ctx.log(f"  benchmark score (sum KB/ms / {rated}): "
                f"full {score_f/rated:.0f}  half-pad {score_p/rated:.0f}")

    # -- 1-D: round trips + donated per-kernel forward --
    from vkfft_tpu.ops import pallas_engine as _pe
    for n in (1024, 4096):
        batch = max(1, 128 * 1024 * 1024 // (8 * n))
        x = from_complex(_rand_complex((batch, n), seed=n))
        # normalize=True keeps round-trip chain values stationary
        full = vt.get_application(vt.FFTConfig(shape=(n,), normalize=True),
                                  ctx.engine)
        pad = vt.get_application(
            vt.FFTConfig(shape=(n,), normalize=True,
                         zeropad_input=((n // 2, n),)), ctx.engine)
        mid = vt.get_application(
            vt.FFTConfig(shape=(n,), zeropad_input=((n // 4, 3 * n // 4),)),
            ctx.engine)
        rt_full = _time_chain_fn(lambda v, a=full: a._inv(a._fwd(v)), x)
        rt_pad = _time_chain_fn(lambda v, a=pad: a._inv(a._fwd(v)), x)
        dt_mid = _time_chain_fn(mid._fwd, x)
        # per-kernel forward ratio via donated single-kernel chains (the
        # alias keeps XLA from inserting loop-carry copies)
        s = float(1.0 / np.sqrt(n))
        kf = _time_chain_fn(
            lambda p: _pe.Planar(*_pe.core_fft_planar_v3(
                p.re, p.im, n, False, donate=True, scale=s)), x)
        kp = _time_chain_fn(
            lambda p: _pe.Planar(*_pe.core_fft_planar_v3(
                p.re, p.im, n, False, donate=True, in_nonzero=n // 2,
                scale=s)), x)
        if min(rt_full, rt_pad, dt_mid, kf, kp) < 50e-6:
            ctx.log(f"  n={n}: below timing noise floor; see bench.py")
            continue
        ctx.log(f"  n={n} batch {batch}: rt full {rt_full*1e3:8.3f} ms  "
                f"rt half-pad {rt_pad*1e3:8.3f} ms ({rt_full/rt_pad:.2f}x)  "
                f"fwd-kernel {kf/kp:.2f}x  "
                f"interior fwd {dt_mid*1e3:8.3f} ms "
                f"(mode: {mid.zeropad_mode})")


@sample(5, "benchmark no-reorder 4-step (disableReorderFourStep analog)")
def sample_5(ctx):
    """Reference sample_5: skipping the 4-step reorder pass keeps output in
    swapped digit order for extra bandwidth (``disableReorderFourStep``).
    Here: keep_intermediate_order=True vs natural order."""
    import vkfft_tpu as vt
    for n in (4096, 65536):
        batch = max(1, 64 * 1024 * 1024 // (8 * n))
        x = _rand_complex((batch, n), seed=n)
        nat = vt.get_application(vt.FFTConfig(shape=(n,)), ctx.engine)
        swp = vt.get_application(
            vt.FFTConfig(shape=(n,), keep_intermediate_order=True), ctx.engine)
        dt_nat = _time_fwd_inv(nat, x)
        dt_swp = _time_fwd_inv(swp, x)
        if min(dt_nat, dt_swp) < 50e-6:
            ctx.log(f"  n={n}: below timing noise floor; see bench.py")
            continue
        ctx.log(f"  n={n} batch {batch}: natural {dt_nat*1e3:8.3f} ms  "
                f"swapped {dt_swp*1e3:8.3f} ms  speedup {dt_nat/dt_swp:.2f}x")
    # 2-D pair tl form (round 4): the opaque (nz, ny) intermediate skips
    # one in-tile transpose per direction
    ny = nz = 256
    batch = max(1, 64 * 1024 * 1024 // (8 * ny * nz))
    x2 = _rand_complex((batch, ny, nz), seed=ny)
    nat2 = vt.get_application(vt.FFTConfig(shape=(ny, nz)), ctx.engine)
    tl2 = vt.get_application(
        vt.FFTConfig(shape=(ny, nz), keep_intermediate_order=True),
        ctx.engine)
    dt_nat2 = _time_fwd_inv(nat2, x2)
    dt_tl2 = _time_fwd_inv(tl2, x2)
    if min(dt_nat2, dt_tl2) >= 50e-6:
        ctx.log(f"  2-D {ny}x{nz} batch {batch}: natural {dt_nat2*1e3:8.3f} "
                f"ms  pair-tl {dt_tl2*1e3:8.3f} ms  "
                f"speedup {dt_nat2/dt_tl2:.2f}x")


@sample(8, "benchmark Bluestein FP64 (CPU) / double-double Bluestein (TPU)")
def sample_8(ctx):
    from vkfft_tpu import api
    if api.complex_supported():
        _bench_systems(ctx, [(10007,), (7919,)], dtype=np.complex128,
                       target_mb=4, iters=10)
        return
    from vkfft_tpu.precision.dd_fft import fft_dd
    # Round 5 (verdict dd item): the compile cost is MEASURED per size —
    # first call (compile + run) vs second call (run) — and the sweep
    # climbs to the 10007 class the fp32 sample 7 benches.
    for n in (131, 101, 1009, 10007):
        rng = np.random.default_rng(n)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        try:
            t0 = time.perf_counter()
            y = fft_dd(x)
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            y = fft_dd(x)
            t_run = time.perf_counter() - t0
        except Exception as e:
            ctx.log(f"  dd Bluestein n={n}: FAILED {repr(e)[:100]}")
            continue
        ref = np.fft.fft(x)
        err = np.abs(y - ref).max() / np.abs(ref).max()
        ctx.log(f"  dd n={n}: compile+run {t_first:.1f} s, run "
                f"{t_run*1e3:.1f} ms, rel err {err:.2e}")


@sample(13, "precision bf16/fp16 storage C2C vs fp64 oracle (sample_13 analog)")
def sample_13(ctx):
    """Reference sample_13 tests true fp16 compute; on TPU half tiers are
    storage-only with fp32 compute (config.py Precision docs) — the bound
    tested here is the bf16/fp16 quantization floor, not fp32 accuracy."""
    import jax.numpy as jnp
    from vkfft_tpu.config import Precision
    from vkfft_tpu.pcomplex import Planar
    import vkfft_tpu as vt
    worst = 0.0
    for prec, tol in ((Precision.BFLOAT16, 8e-2), (Precision.HALF, 1e-2)):
        for n in (64, 256, 1024):
            rng = np.random.default_rng(n)
            xr = rng.standard_normal((4, n)).astype(np.float32)
            xi = rng.standard_normal((4, n)).astype(np.float32)
            cfg = vt.FFTConfig(shape=(n,), precision=prec)
            app = vt.get_application(cfg, ctx.engine)
            y = app.forward(Planar(jnp.asarray(xr), jnp.asarray(xi)))
            got = np.asarray(y.re, np.float64) + 1j * np.asarray(y.im, np.float64)
            ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
            eps = _precision_report(ctx, f"{prec.value} n={n}", got, ref)
            worst = max(worst, 0.0 if eps < tol else eps)
    ctx.log(f"  {'PASS' if worst == 0.0 else f'FAIL worst {worst:.3e}'}")


@sample(18, "precision non-pow2 FP64 (CPU) / double-double (TPU)")
def sample_18(ctx):
    from vkfft_tpu import api
    worst = 0.0
    if api.complex_supported():
        for n in [6, 12, 60, 120, 360, 1000, 2310, 17, 101, 919, 1009]:
            x = _rand_complex((3, n), seed=n, dtype=np.complex128)
            got = _run_fft_host(x, ctx.engine, axes=(-1,))
            ref = np.fft.fft(x, axis=-1)
            worst = max(worst, _precision_report(ctx, f"n={n}", got, ref))
        ctx.log(f"  WORST max_eps: {worst:.3e} "
                f"({'PASS' if worst < 1e-12 else 'FAIL'})")
        return
    from vkfft_tpu.precision.dd_fft import fft_dd
    for n in (60, 100, 120):
        rng = np.random.default_rng(n)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        got = fft_dd(x)
        ref = np.fft.fft(x)
        worst = max(worst, _precision_report(ctx, f"dd n={n}", got, ref))
    ctx.log(f"  WORST max_eps: {worst:.3e} ({'PASS' if worst < 5e-14 else 'FAIL'})")


@sample(51, "convolution: 3D zero-padded real-input 3x3 matrix kernel")
def sample_51(ctx):
    """Reference sample_51 (3-D zero-padded R2C matrix convolution): real
    input, 3x3 matrix kernel, zero-padding declared on the last axis."""
    import vkfft_tpu as vt
    shape = (8, 8, 32)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((3,) + shape)
    x[..., shape[-1] // 2:] = 0
    kern = rng.standard_normal((3, 3) + shape) + 1j * rng.standard_normal((3, 3) + shape)
    cfg = vt.FFTConfig(shape=shape, convolution=True, matrix_convolution=3,
                       coordinate_features=3,
                       zeropad_input=(None, None, (shape[-1] // 2, shape[-1])))
    app = vt.ConvolutionApplication(cfg, kern, engine=ctx.engine)
    y = _to_host(app(x))
    X = np.fft.fftn(x, axes=(-3, -2, -1))
    K = np.fft.fftn(kern, axes=(-3, -2, -1))
    ref = np.fft.ifftn(np.einsum("ij...,j...->i...", K, X), axes=(-3, -2, -1))
    err = np.abs(y - ref).max() / np.abs(ref).max()
    ctx.log(f"  3D zero-padded matrix conv rel err: {err:.3e} "
            f"({'PASS' if err < 1e-4 else 'FAIL'})")

    # -- benchmark: the zero-pad elision factor on the fused conv route
    # (round 5; reference sample 51 is the marquee conv+zeropad demo).
    # 2-D scalar kernels ride the single-kernel conv-pair with pruned
    # forward stage sets when the data sits in a declared corner.
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar, from_complex
    shape2 = (256, 256)
    batch = max(1, 128 * 1024 * 1024 // (8 * int(np.prod(shape2))))
    kern2 = rng.standard_normal(shape2) + 1j * rng.standard_normal(shape2)
    xfull = rng.standard_normal((batch,) + shape2) \
        + 1j * rng.standard_normal((batch,) + shape2)
    xpad = np.array(xfull)
    xpad[:, shape2[0] // 2:, :] = 0
    xpad[:, :, shape2[1] // 2:] = 0
    dense = vt.ConvolutionApplication(
        vt.FFTConfig(shape=shape2, convolution=True), kern2,
        engine=ctx.engine)
    padded = vt.ConvolutionApplication(
        vt.FFTConfig(shape=shape2, convolution=True,
                     zeropad_input=tuple((d // 2, d) for d in shape2)),
        kern2, engine=ctx.engine)
    from vkfft_tpu import api as _api

    def _chainable(app_):
        # fori_loop bodies must be type-preserving: normalize the conv
        # output back to the input's planar f32 planes
        def fn(v):
            y = app_._call(v)
            return Planar(y.re.astype(jnp.float32), y.im.astype(jnp.float32))
        return fn

    xd = from_complex(xfull.astype(np.complex64))
    xp = from_complex(xpad.astype(np.complex64))
    xd = Planar(jnp.asarray(xd.re), jnp.asarray(xd.im))
    xp = Planar(jnp.asarray(xp.re), jnp.asarray(xp.im))
    dt_d = _time_chain_fn(_chainable(dense), xd)
    dt_p = _time_chain_fn(_chainable(padded), xp)
    if min(dt_d, dt_p) >= 50e-6:
        ctx.log(f"  2D {shape2} scalar conv batch {batch}: dense "
                f"{dt_d*1e3:8.3f} ms  half-pad^2 {dt_p*1e3:8.3f} ms "
                f"({dt_d/dt_p:.2f}x; modes {dense.fusion_mode} / "
                f"{padded.fusion_mode})")
    else:
        ctx.log("  conv elision bench: below timing noise floor")


@sample(101, "benchmark multidim DCT FP64 (CPU) / FP32 (TPU)")
def sample_101(ctx):
    import jax
    import vkfft_tpu as vt
    from vkfft_tpu import api
    dt_np = np.float64 if api.complex_supported() else np.float32
    # 96x96 exercises non-pow2 (incl. the odd doubled-length mappings on
    # the minor axis when swept); the cubes cover the strided R2R passes
    for shape in ((64, 64), (96, 96), (32, 32, 32)):
        batch = max(1, 8 * 1024 * 1024 // (8 * int(np.prod(shape))))
        rng = np.random.default_rng(0)
        x = rng.standard_normal((batch,) + shape).astype(dt_np)
        for t in (2, 3):
            f = jax.jit(lambda v, t=t: vt.dctn(v, type=t, engine=ctx.engine))
            jax.block_until_ready(f(x))
            t0 = time.perf_counter()
            for _ in range(5):
                y = f(x)
            jax.block_until_ready(y)
            ctx.log(f"  DCT-{t} {'x'.join(map(str, shape))} batch {batch} "
                    f"[{np.dtype(dt_np).name}]: "
                    f"{(time.perf_counter() - t0) / 5 * 1e3:.3f} ms")


@sample(1001, "sweep: 1D FP64 2..4096 (CPU) / double-double subset (TPU)")
def sample_1001(ctx):
    from vkfft_tpu import api
    worst = 0.0
    count = 0
    if api.complex_supported():
        # full breadth, like the reference's sample_1001 (every n 2..4096)
        sizes = range(2, 4097)
        tol = 1e-12
        for n in sizes:
            x = _rand_complex((2, n), seed=n, dtype=np.complex128)
            got = _run_fft_host(x, ctx.engine, axes=(-1,))
            ref = np.fft.fft(x, axis=-1)
            worst = max(worst, np.abs(got - ref).max() / np.abs(ref).max())
            count += 1
    else:
        from vkfft_tpu.precision.dd_fft import fft_dd
        tol = 1e-10
        for n in (8, 16, 60, 64, 100, 128):
            rng = np.random.default_rng(n)
            x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
            got = fft_dd(x)
            ref = np.fft.fft(x)
            worst = max(worst, np.abs(got - ref).max() / np.abs(ref).max())
            count += 1
    ctx.log(f"  {count} systems, worst rel err {worst:.3e} "
            f"({'PASS' if worst < tol else 'FAIL'})")


@sample(1002, "sweep: 1D bf16-storage subset (fp16-sweep analog)")
def sample_1002(ctx):
    import jax.numpy as jnp
    from vkfft_tpu.config import Precision
    from vkfft_tpu.pcomplex import Planar
    import vkfft_tpu as vt
    worst = 0.0
    count = 0
    for n in (8, 16, 32, 64, 128, 256, 512, 1024, 60, 100, 360):
        rng = np.random.default_rng(n)
        xr = rng.standard_normal((2, n)).astype(np.float32)
        xi = rng.standard_normal((2, n)).astype(np.float32)
        app = vt.get_application(
            vt.FFTConfig(shape=(n,), precision=Precision.BFLOAT16), ctx.engine)
        y = app.forward(Planar(jnp.asarray(xr), jnp.asarray(xi)))
        got = np.asarray(y.re, np.float64) + 1j * np.asarray(y.im, np.float64)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        worst = max(worst, np.abs(got - ref).max() / np.abs(ref).max())
        count += 1
    ctx.log(f"  {count} systems, worst rel err {worst:.3e} "
            f"({'PASS' if worst < 8e-2 else 'FAIL'})")


@sample(1003, "sweep: double-double (quad-class) subset")
def sample_1003(ctx):
    from vkfft_tpu.precision.dd_fft import fft_dd
    from vkfft_tpu import api
    worst = 0.0
    sizes = (8, 16, 32, 64, 100) if not api.complex_supported() else (
        8, 16, 32, 64, 100, 128, 256, 360)
    for n in sizes:
        rng = np.random.default_rng(n)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        got = fft_dd(x)
        ref = np.fft.fft(x)
        worst = max(worst, np.abs(got - ref).max() / np.abs(ref).max())
    ctx.log(f"  {len(sizes)} systems, worst rel err {worst:.3e} "
            f"({'PASS' if worst < 1e-10 else 'FAIL'})")


@sample(1004, "sweep: 3D cubes FP32 precision")
def sample_1004(ctx):
    worst = 0.0
    sizes = (4, 8, 12, 16, 24, 32, 48, 64)
    for n in sizes:
        x = _rand_complex((n, n, n), seed=n, dtype=np.complex64)
        got = _run_fft_host(x, ctx.engine)
        ref = np.fft.fftn(x.astype(np.complex128))
        worst = max(worst, np.abs(got - ref).max() / np.abs(ref).max())
    ctx.log(f"  cubes {sizes}, worst rel err {worst:.3e} "
            f"({'PASS' if worst < 1e-4 else 'FAIL'})")


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def main(argv=None):
    ap = argparse.ArgumentParser(
        description="vkfft_tpu test/benchmark suite (VkFFT_TestSuite analog)")
    ap.add_argument("-vkfft", "-sample", dest="sample", type=int, default=None,
                    help="sample number to run (see -list)")
    ap.add_argument("-list", action="store_true", help="list samples")
    ap.add_argument("-devices", action="store_true", help="list devices")
    ap.add_argument("-o", dest="output", default=None, help="append results to file")
    ap.add_argument("--engine", default=None, choices=["jnp", "pallas"],
                    help="execution engine (default: auto)")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--full", action="store_true",
                    help="sample 4: run the reference's full 39-system "
                         "table (default on the jnp engine)")
    ap.add_argument("-X", type=int, default=1024)
    ap.add_argument("-Y", type=int, default=1)
    ap.add_argument("-Z", type=int, default=1)
    ap.add_argument("-P", type=int, default=0, help="0 fp32, 1 fp64")
    ap.add_argument("-B", type=int, default=1, help="batch")
    ap.add_argument("-N", type=int, default=10, help="iterations")
    ap.add_argument("-R2C", type=int, default=0)
    ap.add_argument("-DCT", type=int, default=0)
    ap.add_argument("-save", default=None, metavar="FILE",
                    help="sample 200: write the plan blob to FILE "
                         "(saveApplicationToString analog)")
    ap.add_argument("-load", default=None, metavar="FILE",
                    help="sample 200: build the application from a plan "
                         "blob file (loadApplicationFromString analog)")
    ap.add_argument("-compare", action="store_true",
                    help="second-implementation race: run the sample on "
                         "both engines (pallas vs jnp/XLA) — the cuFFT/"
                         "rocFFT comparison-suite analog")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    # fp64 samples need x64 (otherwise complex128 inputs silently narrow);
    # only the CPU path computes in fp64 (TPU uses the double-double tier)
    import jax as _jax
    if args.cpu or _jax.default_backend() == "cpu":
        _jax.config.update("jax_enable_x64", True)

    if args.list or args.sample is None and not args.devices:
        print("available samples:")
        for num in sorted(_SAMPLES):
            print(f"  {num:5d}  {_SAMPLES[num][1]}")
        return 0

    if args.devices:
        import jax
        for i, d in enumerate(jax.devices()):
            print(f"  device {i}: {d.device_kind} ({d.platform})")
        return 0

    fn, desc = _SAMPLES[args.sample]
    engines = ["pallas", "jnp"] if args.compare else [args.engine]
    for eng in engines:
        args.engine = eng
        if eng == "pallas" and _jax.default_backend() == "cpu":
            # CPU has no Mosaic: run the pallas engine in interpreter mode
            from vkfft_tpu.ops import pallas_engine as _pe
            _pe.set_interpret(True)
        ctx = Ctx(args)
        label = f" [engine={eng}]" if args.compare else ""
        ctx.log(f"sample {args.sample}: {desc}{label}")
        t0 = time.time()
        fn(ctx)
        ctx.log(f"  done in {time.time() - t0:.1f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
