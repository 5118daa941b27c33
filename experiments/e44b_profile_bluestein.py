"""E44b: per-op profile of the fused long-tier Bluestein at n=10007.

e44: rt 12.24 ms (was 17.58 unfused) — bandwidth accounting predicts ~5,
MXU accounting ~7.  Where are the other 5 ms?

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u experiments/e44b_profile_bluestein.py
"""
import glob
import gzip
import json
import os
import shutil
import time
from collections import defaultdict

import numpy as np

TARGET = 64 * 1024 * 1024


def main():
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    n, m = 10007, 32768
    b = max(1, TARGET // (8 * n))
    x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    p0 = Planar(jnp.asarray(x.real.astype(np.float32)),
                jnp.asarray(x.imag.astype(np.float32)))

    @jax.jit
    def rt(p):
        f = pe._bluestein_long_fused_p(p, n, m, False)
        return pe._bluestein_long_fused_p(f, n, m, True, scale=1.0 / n)

    @jax.jit
    def chain(p):
        return jax.lax.fori_loop(0, 8, lambda i, v: rt(v), p)

    float(np.asarray(chain(p0).re[0, 0]))  # warm

    tmp = "/tmp/e44b_trace"
    shutil.rmtree(tmp, ignore_errors=True)
    with jax.profiler.trace(tmp):
        float(np.asarray(chain(p0).re[0, 0]))

    # parse the trace: per-op durations on the device track
    files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace file found", flush=True)
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU device PIDs via process_name metadata
    dev_pids = set()
    for e in events:
        if e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e["pid"])
    per_op = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        per_op[name] += e.get("dur", 0) / 1e3   # us -> ms
        cnt[name] += 1
    total = sum(per_op.values())
    print(f"device total {total:.3f} ms over 8 iterations "
          f"({total/8:.3f} ms/iter)", flush=True)
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms/8:8.3f} ms/iter  x{cnt[name]:3d}  {name[:90]}",
              flush=True)


if __name__ == "__main__":
    main()
