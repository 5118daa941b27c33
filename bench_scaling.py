"""Multi-chip scaling-efficiency benchmark (the BASELINE.json north-star
metric: >= 80% scaling efficiency for pencil-decomposed 3-D FFTs).

On a real pod slice this measures slab/pencil 3-D FFT throughput at 1, 2, 4,
... N chips and reports efficiency = T1 / (N * T_N).  In this environment only
one physical chip is reachable, so on CPU/virtual platforms it exercises the
wiring on the forced 8-device host mesh (numbers are then methodological, not
hardware results — the harness is what ships).

Usage: python bench_scaling.py [--shape 256 256 256] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_mesh(shape, devices, engine=None, n_lo=2, n_hi=8,
               overlap_chunks=1):
    import jax
    from vkfft_tpu.parallel import DistributedFFT, fft_mesh

    mesh = fft_mesh((len(devices),), ("fft",), devices=devices)
    app = DistributedFFT(shape, mesh, engine=engine,
                         overlap_chunks=overlap_chunks)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    xs = app.shard_input(x)

    def roundtrip(v):
        return app.inverse(app.forward(v))

    z = roundtrip(xs)
    float(np.asarray(jax.tree_util.tree_leaves(z)[0]).reshape(-1)[0].real)

    def run(iters):
        t0 = time.perf_counter()
        z = xs
        for _ in range(iters):
            z = roundtrip(z)
        float(np.asarray(jax.tree_util.tree_leaves(z)[0]).reshape(-1)[0].real)
        return time.perf_counter() - t0

    return (run(n_hi) - run(n_lo)) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()
    shape = tuple(args.shape) if args.shape else (
        (64, 64, 64) if devices[0].platform == "cpu" else (256, 256, 256))

    counts = []
    c = 1
    while c <= len(devices):
        counts.append(c)
        c *= 2

    results = {}
    t1 = None
    for c in counts:
        if shape[0] % c or shape[1] % c:
            continue
        dt = bench_mesh(shape, devices[:c])
        if t1 is None:
            t1 = dt
        eff = t1 / (c * dt)
        entry = {"ms": round(dt * 1e3, 3), "efficiency": round(eff, 3)}
        if c > 1:
            dt_ov = bench_mesh(shape, devices[:c], overlap_chunks=4)
            entry["ms_overlap4"] = round(dt_ov * 1e3, 3)
        results[c] = entry

    print(json.dumps({
        "metric": "slab 3D FFT fwd+inv scaling over chips",
        "shape": list(shape),
        "results": results,
        "note": ("efficiency = T1/(N*T_N); ms_overlap4 = chunked "
                 "a2a/compute overlap; hardware-meaningful only on a real "
                 "multi-chip slice"),
    }))


if __name__ == "__main__":
    main()
