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


# v5e ICI: 4 links/chip in the 2-D torus at ~45 GB/s each direction
# (jax-ml.github.io/scaling-book roofline numbers) — per-chip egress used by
# the all-to-all model below.  Other generations can be passed via --ici.
ICI_EGRESS_GBS_DEFAULT = 180.0


def model_slab(shape, n_chips, t1_s, ici_gbs):
    """Analytic ICI roofline for the slab 3-D fwd+inv round trip.

    Per direction the slab path does ONE all_to_all; each chip sends
    (N-1)/N of its local planar volume (8 bytes/point fp32 re+im).
    Predicted T_N = t1/N (compute, perfectly parallel) + 2 * t_a2a
    (fwd + inv), and the overlapped bound replaces + with max() on the
    a2a-adjacent stage.  Returns (a2a_bytes_per_chip, t_pred_s,
    eff_pred, eff_pred_overlap)."""
    pts = 1
    for d in shape:
        pts *= d
    local_bytes = 8 * pts / n_chips
    a2a_bytes = local_bytes * (n_chips - 1) / n_chips
    t_a2a = a2a_bytes / (ici_gbs * 1e9)
    t_comp = t1_s / n_chips
    t_pred = t_comp + 2 * t_a2a
    # perfect overlap: the a2a of each direction hides under the two local
    # FFT passes of that direction (chunked pipeline) — bound by max()
    t_pred_ov = max(t_comp, 2 * t_a2a) + min(t_comp, 2 * t_a2a) * 0.1
    eff = t1_s / (n_chips * t_pred)
    eff_ov = t1_s / (n_chips * t_pred_ov)
    return a2a_bytes, t_pred, eff, eff_ov


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ici", type=float, default=ICI_EGRESS_GBS_DEFAULT,
                    help="per-chip ICI egress GB/s for the model")
    ap.add_argument("--t1-real-ms", type=float, default=4.0,
                    help="single-chip 256^3 fwd+inv round trip on real "
                         "hardware (measured 4.0 ms on v5e, e22/bench_r3; "
                         "anchors the north-star prediction)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()
    on_cpu = devices[0].platform == "cpu"
    shape = tuple(args.shape) if args.shape else (
        (64, 64, 64) if on_cpu else (256, 256, 256))

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
            # analytic ICI-roofline prediction for a REAL v5e slice: the
            # virtual CPU mesh serializes collectives through host memcpy,
            # so measured virtual efficiencies are methodology checks only
            a2a_b, t_pred, e_pred, e_pred_ov = model_slab(
                shape, c, t1, args.ici)
            entry["a2a_MB_per_chip_per_dir"] = round(a2a_b / 1e6, 2)
            entry["pred_ms_real_ici"] = round(t_pred * 1e3, 3)
            entry["pred_efficiency"] = round(e_pred, 3)
            entry["pred_efficiency_overlapped"] = round(e_pred_ov, 3)
        results[c] = entry

    # feasibility statement for the >= 80% north star at the headline shape,
    # anchored on the real-chip 256^3 round trip (not virtual-mesh times)
    tgt_shape = (256, 256, 256)
    t1_real = (t1 if (shape == tgt_shape and not on_cpu)
               else args.t1_real_ms * 1e-3)
    feas = {}
    for c in (4, 8, 16):
        a2a_b, t_pred, e, e_ov = model_slab(tgt_shape, c, t1_real, args.ici)
        feas[c] = {"a2a_MB_per_chip_per_dir": round(a2a_b / 1e6, 2),
                   "pred_ms": round(t_pred * 1e3, 3),
                   "pred_efficiency": round(e, 3),
                   "pred_efficiency_overlapped": round(e_ov, 3)}

    print(json.dumps({
        "metric": "slab 3D FFT fwd+inv scaling over chips",
        "shape": list(shape),
        "ici_model_gbs": args.ici,
        "results": results,
        "north_star_prediction_256cubed": feas,
        "note": ("efficiency = T1/(N*T_N) measured on the available mesh; "
                 "pred_* = analytic ICI roofline for a real v5e slice "
                 "(4x45 GB/s links): compute scales 1/N, one all_to_all "
                 "per direction moving (N-1)/N of the local volume. "
                 "ms_overlap4 = chunked a2a/compute overlap; on the "
                 "virtual CPU mesh chunking multiplies host-serialized "
                 "collective dispatches (no async ICI), which is why it "
                 "REGRESSES there (diagnosed round 4) — it targets real "
                 "slices only."),
    }))


if __name__ == "__main__":
    main()
