"""E18: int8 6-pass MXU emulation — fp32-accurate matmuls at 2x bf16 rate.

Numpy-validated decomposition (this file's --selftest): operands split into
three int8 digits with scales 127, 127*254, 127*254^2 (23 bits total); the
six products with digit-order < 3 recombined in f32 give rel err ~1.8e-7 —
full fp32 accuracy.  v5e MXU does int8 at 2x the bf16 rate, so 6 int8
passes = 3 bf16-pass equivalents = half of HIGHEST's 6 — and the v3 kernel
is MXU-bound at n>=1024.

Probes, in order:
  1. Does Mosaic lower int8 x int8 -> int32 dot_general inside a Pallas
     kernel on v5e?  (compile + correctness of a tiny kernel)
  2. Timing: 6-pass int8 vs HIGHEST f32 dot in the same kernel shape as
     v3's MXU stage (K=128 packed, (L0, 2r, Mp*S) operand).
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

SC = (127.0, 127.0 * 254, 127.0 * 254 * 254)


def digits_np(X, scale):
    r = (X / scale).astype(np.float64)
    out = []
    for sc in SC:
        d = np.round(r * sc)
        out.append(d.astype(np.int8))
        r = r - d / sc
    return out


def selftest():
    rng = np.random.default_rng(0)
    K = 128
    D = rng.uniform(-1, 1, (K, K))
    Z = rng.standard_normal((K, 512)) * 10.0
    s = np.max(np.abs(Z))
    dD = digits_np(D, 1.0)
    dZ = digits_np(Z, s)
    acc = np.zeros((K, Z.shape[1]))
    for i in range(3):
        for j in range(3 - i):
            acc += (dD[i].astype(np.int32) @ dZ[j].astype(np.int32)
                    ).astype(np.float64) / (SC[i] * SC[j])
    Y = acc * s
    ref = D @ Z
    print("numpy rel err:", np.linalg.norm(Y - ref) / np.linalg.norm(ref))


def probe_pallas():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, M = 128, 512

    def kern(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        o_ref[:] = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    rng = np.random.default_rng(0)
    a = rng.integers(-127, 127, (K, K)).astype(np.int8)
    b = rng.integers(-127, 127, (K, M)).astype(np.int8)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, M), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    got = np.asarray(jax.jit(call)(jnp.asarray(a), jnp.asarray(b)))
    ref = a.astype(np.int32) @ b.astype(np.int32)
    ok = np.array_equal(got, ref)
    print("pallas int8 dot lowers:", ok)
    return ok


def bench_stage(int8: bool, L0=8, r=64, MpS=128 * 8, iters=40):
    # iters=400 fully unrolls 400 dot+transpose pairs in one Mosaic kernel
    # — hardware-observed to stall the remote compiler for >10 min; 40 is
    # enough to dominate the launch overhead.
    """Time the v3 MXU stage shape: contract (2r, 2r) x (L0, 2r, MpS)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 2 * r
    rng = np.random.default_rng(0)
    D = rng.uniform(-1, 1, (K, K)).astype(np.float32)
    Z = rng.standard_normal((L0, K, MpS)).astype(np.float32)
    dims = (((0,), (1,)), ((), ()))

    # iterate with lax.fori_loop — a Python unroll of hundreds of dots
    # stalls the remote Mosaic compiler for >10 min (hardware-observed)
    if not int8:
        def kern(d_ref, z_ref, o_ref):
            def body(_, acc):
                return jnp.moveaxis(
                    jax.lax.dot_general(
                        d_ref[:], acc, dims,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST), 0, 1)
            o_ref[:] = jax.lax.fori_loop(0, iters, body, z_ref[:])
        args = [jnp.asarray(D), jnp.asarray(Z)]
        out_shape = jax.ShapeDtypeStruct(Z.shape, jnp.float32)
    else:
        dD = [jnp.asarray(d) for d in digits_np(D, 1.0)]

        def kern(d0, d1, d2, z_ref, o_ref):
            ds = (d0[:], d1[:], d2[:])

            def body(_, acc):
                s = jnp.max(jnp.abs(acc))
                rn = acc / s
                zd = []
                for sc in SC:
                    q = jnp.round(rn * sc)
                    zd.append(q.astype(jnp.int8))
                    rn = rn - q / sc
                tot = None
                for i in range(3):
                    for j in range(3 - i):
                        p = jax.lax.dot_general(
                            ds[i], zd[j], dims,
                            preferred_element_type=jnp.int32)
                        t = p.astype(jnp.float32) / np.float32(SC[i] * SC[j])
                        tot = t if tot is None else tot + t
                return jnp.moveaxis(tot * s, 0, 1)
            o_ref[:] = jax.lax.fori_loop(0, iters, body, z_ref[:])
        args = [*dD, jnp.asarray(Z)]
        out_shape = jax.ShapeDtypeStruct(Z.shape, jnp.float32)

    call = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    f = jax.jit(call)
    y = f(*args)
    y.block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        f(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    macs = L0 * K * K * MpS * iters
    # correctness vs f64 (single application check instead: apply once)
    return best, macs / best / 1e12


def err_once(L0=8, r=64, MpS=128 * 8):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    K = 2 * r
    D = rng.uniform(-1, 1, (K, K))
    Z = rng.standard_normal((L0, K, MpS))
    dims = (((0,), (1,)), ((), ()))
    dD = digits_np(D, 1.0)
    s = np.max(np.abs(Z))
    dZ = digits_np(Z, s)
    tot = None
    for i in range(3):
        for j in range(3 - i):
            p = jax.lax.dot_general(
                jnp.asarray(dD[i]), jnp.asarray(dZ[j]), dims,
                preferred_element_type=jnp.int32)
            t = p.astype(jnp.float32) / np.float32(SC[i] * SC[j])
            tot = t if tot is None else tot + t
    y = np.asarray(tot, dtype=np.float64) * s
    ref = np.einsum("kK,lKm->klm", D, Z)
    print("device rel err:", np.linalg.norm(y - ref) / np.linalg.norm(ref))


def bench_production(n: int, batch: int, n_lo=10, n_hi=60):
    import jax
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    from vkfft_tpu.planner import plan_axis
    from vkfft_tpu.ops import pallas_engine as pe

    plan = plan_axis(n)
    rng = np.random.default_rng(0)

    @jax.jit
    def fwd_inv(p):
        y = pe.fft_lines_p(p, plan, False)
        return pe.fft_lines_p(y, plan, True, scale=1.0 / n)

    p0 = Planar(jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32)),
                jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32)))

    def make(iters):
        @jax.jit
        def run(p):
            return jax.lax.fori_loop(0, iters, lambda i, v: fwd_inv(v), p)
        return run

    f_lo, f_hi = make(n_lo), make(n_hi)
    float(np.asarray(f_lo(p0).re[0, 0]))
    float(np.asarray(f_hi(p0).re[0, 0]))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(p0).re[0, 0]))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(f_hi) - timed(f_lo)) / (n_hi - n_lo)
    # error vs fp64 oracle on a small slice
    x = rng.standard_normal((256, n)) + 1j * rng.standard_normal((256, n))
    ps = Planar(jnp.asarray(x.real.astype(np.float32)),
                jnp.asarray(x.imag.astype(np.float32)))
    y = pe.fft_lines_p(ps, plan, False)
    got = (np.asarray(y.re, np.float64) + 1j * np.asarray(y.im, np.float64))
    ref = np.fft.fft(x)
    err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    return 4 * 2 * batch * n * 4 / dt / 1e9, err


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
    selftest()
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe
    try:
        cache.enable_persistent_cache()
    except Exception as e:
        print("no persistent cache:", e, flush=True)
    if not probe_pallas():
        print("int8 dot does not lower; stopping")
        return
    err_once()
    t_f32, tf32 = bench_stage(False)
    print(f"HIGHEST f32 stage: {t_f32*1e3:8.2f} ms  ({tf32:6.2f} Tmac/s)",
          flush=True)
    t_i8, ti8 = bench_stage(True)
    print(f"int8 6-pass stage: {t_i8*1e3:8.2f} ms  ({ti8:6.2f} Tmac/s)  "
          f"speedup {t_f32/t_i8:.2f}x", flush=True)
    target_bytes = 128 * 1024 * 1024
    for mode in (False, True):
        pe.set_mxu_int8(mode)
        tag = "int8  " if mode else "HIGHEST"
        for n in (256, 1024, 4096):
            batch = max(1, target_bytes // (8 * n))
            g, e = bench_production(n, batch)
            print(f"{tag} n={n:5d}: {g:6.1f} GB/s  err {e:.2e}", flush=True)


if __name__ == "__main__":
    main()
