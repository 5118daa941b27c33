"""E43b: Mosaic legality probes for the outer-axis kernel.

Four candidate formulations of 'transform the leading dim of (n, R, nz)
without an XLA relayout':

  A. block (1, n, 1, nz), grid over R; kernel state (n, nz) = the existing
     v3 (n, S) machinery verbatim (second-minor block dim = 1).
  B. rank-5 state ops, twiddle tables delivered host-shaped (r, 1, Mp, 1, 1)
     so no in-kernel minor-crossing cast.
  C. rank-5 state ops, twiddle applied on the FLATTENED rank-3 state with a
     host-flattened (n, 1, 1) table.
  D. in-kernel reshape (n, tr, nz) -> (n, tr*nz) + v3 stages (explicit
     relayout inside the kernel, overlappable).

Each probe: compile on TPU, check vs numpy, time a fwd+inv chain at 256^3.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u experiments/e43b_outer_probes.py
"""
import functools
import time
import traceback
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    n = 256
    R = 256
    nz = 256
    shape = (n, R, nz)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ref = np.fft.fft(x, axis=0)
    xr = jnp.asarray(x.real.astype(np.float32))
    xi = jnp.asarray(x.imag.astype(np.float32))
    data = 2 * n * R * nz * 4
    fetch = lambda r: float(np.asarray(r[0][0, 0, 0]))

    def check(tag, fn):
        try:
            fr, fi = fn(xr, xi, False)
            got = np.asarray(fr[:, :2, :2]) + 1j * np.asarray(fi[:, :2, :2])
            err = np.max(np.abs(got - ref[:, :2, :2])) / np.max(np.abs(ref))
            print(f"  {tag}: compiles, fwd err {err:.2e}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"  {tag}: FAIL {type(e).__name__}: {msg}", flush=True)
            return False
        try:
            def rt(p):
                a, b = fn(p[0], p[1], False)
                return fn(a, b, True)
            dt = timed_chain(rt, (xr, xi), fetch)
            print(f"  {tag}: rt {dt*1e3:7.3f} ms  {4*data/dt/GB:6.1f} GB/s eff",
                  flush=True)
        except Exception as e:
            print(f"  {tag}: timing FAIL {e}", flush=True)
        return True

    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                dimension_semantics=("parallel",))
    vmem2 = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                                 dimension_semantics=("parallel", "parallel"))

    # ---- probe A: (n, 1, nz) second-minor-1 blocks + v3 stages -----------
    def build_A(inverse):
        vpu_tabs, mxu_tabs = pe._v3_tables(n, inverse)
        np_tables = []
        for twr, twi, *_ in vpu_tabs:
            np_tables += [twr, twi]
        for Dp, twr, twi, r, L0, Mp in mxu_tabs:
            np_tables += pe._mxu_const_arrays(Dp)
            if Mp > 1:
                np_tables += [twr, twi]

        def kernel(*refs):
            xr_ref, xi_ref = refs[:2]
            or_ref, oi_ref = refs[-2:]
            tabs = refs[2:-2]
            a = xr_ref[:, 0, :].astype(jnp.float32)
            b = xi_ref[:, 0, :].astype(jnp.float32)
            a, b = pe._v3_apply_stages(a, b, nz, tabs, vpu_tabs, mxu_tabs,
                                       pe._PRECISION, inverse)
            or_ref[:, 0, :] = a.reshape(n, nz)
            oi_ref[:, 0, :] = b.reshape(n, nz)

        spec = pl.BlockSpec((n, 1, nz), lambda t: (0, t, 0),
                            memory_space=pltpu.VMEM)
        const = lambda a_: pl.BlockSpec(a_.shape, lambda t: (0,) * a_.ndim,
                                        memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel, grid=(R,),
            in_specs=[spec, spec] + [const(t) for t in np_tables],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 2,
            compiler_params=vmem)
        return lambda a, b: call(a, b, *(jnp.asarray(t) for t in np_tables))

    def run_A(a, b, inverse):
        return build_A(inverse)(a, b)

    # ---- probe B: rank-5 state, host-shaped rank-5 tables ----------------
    def build_B(inverse):
        tabs = pe._outer_tables(n, inverse)
        np_tables = []
        for twr, twi, r, L0, Mp in tabs:
            np_tables += [twr.reshape(r, 1, Mp, 1, 1),
                          twi.reshape(r, 1, Mp, 1, 1)]
        tr = 8

        def kernel(*refs):
            xr_ref, xi_ref = refs[:2]
            or_ref, oi_ref = refs[-2:]
            trefs = refs[2:-2]
            a = xr_ref[0].astype(jnp.float32)
            b = xi_ref[0].astype(jnp.float32)
            for ti, (_, _, r, L0, Mp) in enumerate(tabs):
                zr = a.reshape(L0, r, Mp, tr, nz)
                zi = b.reshape(L0, r, Mp, tr, nz)
                ar, ai = pe._generic_butterfly(zr, zi, r, inverse)
                twr = trefs[2 * ti][:]
                twi = trefs[2 * ti + 1][:]
                a = (ar * twr - ai * twi).reshape(-1, tr, nz)
                b = (ar * twi + ai * twr).reshape(-1, tr, nz)
            or_ref[0] = a.reshape(n, tr, nz)
            oi_ref[0] = b.reshape(n, tr, nz)

        spec = pl.BlockSpec((1, n, tr, nz), lambda p_, t: (p_, 0, t, 0),
                            memory_space=pltpu.VMEM)
        const = lambda a_: pl.BlockSpec(a_.shape, lambda p_, t: (0,) * a_.ndim,
                                        memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel, grid=(1, R // tr),
            in_specs=[spec, spec] + [const(t) for t in np_tables],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((1,) + shape, jnp.float32)] * 2,
            compiler_params=vmem2)
        return lambda a, b: tuple(
            o.reshape(shape) for o in call(a.reshape((1,) + shape),
                                           b.reshape((1,) + shape),
                                           *(jnp.asarray(t) for t in np_tables)))

    def run_B(a, b, inverse):
        return build_B(inverse)(a, b)

    # ---- probe C: rank-5 butterflies, flattened-row twiddle (n,1,1) ------
    def build_C(inverse):
        tabs = pe._outer_tables(n, inverse)
        np_tables = []
        for twr, twi, r, L0, Mp in tabs:
            # flattened row twiddle: rows (k, l, m) -> tw[k, m]
            fr = np.repeat(twr[:, None, :], L0, axis=1).reshape(-1, 1, 1)
            fi = np.repeat(twi[:, None, :], L0, axis=1).reshape(-1, 1, 1)
            np_tables += [fr, fi]
        tr = 8

        def kernel(*refs):
            xr_ref, xi_ref = refs[:2]
            or_ref, oi_ref = refs[-2:]
            trefs = refs[2:-2]
            a = xr_ref[0].astype(jnp.float32)
            b = xi_ref[0].astype(jnp.float32)
            for ti, (_, _, r, L0, Mp) in enumerate(tabs):
                zr = a.reshape(L0, r, Mp, tr, nz)
                zi = b.reshape(L0, r, Mp, tr, nz)
                ar, ai = pe._generic_butterfly(zr, zi, r, inverse)
                ar = ar.reshape(-1, tr, nz)
                ai = ai.reshape(-1, tr, nz)
                twr = trefs[2 * ti][:]
                twi = trefs[2 * ti + 1][:]
                a = ar * twr - ai * twi
                b = ar * twi + ai * twr
            or_ref[0] = a.reshape(n, tr, nz)
            oi_ref[0] = b.reshape(n, tr, nz)

        spec = pl.BlockSpec((1, n, tr, nz), lambda p_, t: (p_, 0, t, 0),
                            memory_space=pltpu.VMEM)
        const = lambda a_: pl.BlockSpec(a_.shape, lambda p_, t: (0,) * a_.ndim,
                                        memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel, grid=(1, R // tr),
            in_specs=[spec, spec] + [const(t) for t in np_tables],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((1,) + shape, jnp.float32)] * 2,
            compiler_params=vmem2)
        return lambda a, b: tuple(
            o.reshape(shape) for o in call(a.reshape((1,) + shape),
                                           b.reshape((1,) + shape),
                                           *(jnp.asarray(t) for t in np_tables)))

    def run_C(a, b, inverse):
        return build_C(inverse)(a, b)

    # ---- probe D: in-kernel reshape to (n, tr*nz) + v3 stages ------------
    def build_D(inverse):
        vpu_tabs, mxu_tabs = pe._v3_tables(n, inverse)
        np_tables = []
        for twr, twi, *_ in vpu_tabs:
            np_tables += [twr, twi]
        for Dp, twr, twi, r, L0, Mp in mxu_tabs:
            np_tables += pe._mxu_const_arrays(Dp)
            if Mp > 1:
                np_tables += [twr, twi]
        tr = 8
        S = tr * nz

        def kernel(*refs):
            xr_ref, xi_ref = refs[:2]
            or_ref, oi_ref = refs[-2:]
            tabs = refs[2:-2]
            a = xr_ref[0].astype(jnp.float32).reshape(n, S)
            b = xi_ref[0].astype(jnp.float32).reshape(n, S)
            a, b = pe._v3_apply_stages(a, b, S, tabs, vpu_tabs, mxu_tabs,
                                       pe._PRECISION, inverse)
            or_ref[0] = a.reshape(n, tr, nz)
            oi_ref[0] = b.reshape(n, tr, nz)

        spec = pl.BlockSpec((1, n, tr, nz), lambda p_, t: (p_, 0, t, 0),
                            memory_space=pltpu.VMEM)
        const = lambda a_: pl.BlockSpec(a_.shape, lambda p_, t: (0,) * a_.ndim,
                                        memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel, grid=(1, R // tr),
            in_specs=[spec, spec] + [const(t) for t in np_tables],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((1,) + shape, jnp.float32)] * 2,
            compiler_params=vmem2)
        return lambda a, b: tuple(
            o.reshape(shape) for o in call(a.reshape((1,) + shape),
                                           b.reshape((1,) + shape),
                                           *(jnp.asarray(t) for t in np_tables)))

    def run_D(a, b, inverse):
        return build_D(inverse)(a, b)

    print("probes at (n, R, nz) = (256, 256, 256):", flush=True)
    check("A (second-minor-1 blocks + v3)", run_A)
    check("B (rank-5, host rank-5 tables)", run_B)
    check("C (rank-5 bfly, flat (n,1,1) twiddle)", run_C)
    check("D (in-kernel minor reshape + v3)", run_D)


if __name__ == "__main__":
    main()
