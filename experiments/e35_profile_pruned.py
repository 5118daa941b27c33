"""E35 (round 4): profiler-based per-kernel durations for the pruned
zero-pad forward — disambiguates the e34 chain anomaly where a fwd-only
chain measures ~0.92 ms/iter while the same kernel inside a fwd+inv round
trip costs ~0.52 ms.

Parses the chrome-trace events for pallas kernel durations under three
drivers: full fwd chain, pruned fwd chain (h=n/2), fwd+inv round trip.

Usage: PYTHONPATH=... python -u experiments/e35_profile_pruned.py
"""
import glob
import gzip
import json
import os
import shutil
from collections import defaultdict

import numpy as np


def parse_trace(outdir):
    """{op_name: [dur_us, ...]} from the newest trace in outdir."""
    paths = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return {}
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = defaultdict(list)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            events[ev.get("name", "?")].append(ev["dur"])
    return events


def report(tag, events, top=8):
    rows = []
    for name, durs in events.items():
        if len(durs) < 3:
            continue
        rows.append((sum(durs), name, len(durs), np.median(durs)))
    rows.sort(reverse=True)
    print(f"-- {tag}: top ops by total device time --", flush=True)
    for tot, name, cnt, med in rows[:top]:
        print(f"   {name[:72]:72s} n={cnt:4d} med={med/1e3:8.3f} ms "
              f"tot={tot/1e3:9.2f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache, debug
    from vkfft_tpu.ops import pallas_engine as pe

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    n = 1024
    b = 128 * 1024 * 1024 // (8 * n)
    s = 1.0 / np.sqrt(n)
    xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    def chain(fn, iters=20):
        @jax.jit
        def run(p):
            return jax.lax.fori_loop(0, iters, lambda i, v: fn(v), p)
        return run

    drivers = {
        "full-fwd": chain(lambda p: pe.core_fft_planar_v3(
            p[0], p[1], n, False, scale=s)),
        "pruned-fwd-h512": chain(lambda p: pe.core_fft_planar_v3(
            p[0], p[1], n, False, in_nonzero=512, scale=s)),
        "roundtrip": chain(lambda p: pe.core_fft_planar_v3(
            *pe.core_fft_planar_v3(p[0], p[1], n, False), n, True,
            scale=1.0 / n)),
    }
    for tag, fn in drivers.items():
        outdir = f"/tmp/vkfft_e35_{tag}"
        shutil.rmtree(outdir, ignore_errors=True)
        debug.profile_trace(fn, (xr, xi), outdir=outdir, iters=3)
        report(tag, parse_trace(outdir))


if __name__ == "__main__":
    main()
