"""E46: per-op profile of the production Rader path at p=7919 (5.5 ms rt).

Structure: gather-in (XLA), p-1=7918=2*37*107 conv (v2 lane-major kernels +
XLA spectrum mult), gather-out + DC terms.  Which part carries the 2.87x
per-point premium vs smooth?

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u experiments/e46_profile_rader.py
"""
import glob
import gzip
import json
import shutil
from collections import defaultdict

import numpy as np

TARGET = 64 * 1024 * 1024


def main():
    import jax
    import jax.numpy as jnp
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar
    from vkfft_tpu.planner.plan import plan_axis

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass
    rng = np.random.default_rng(0)
    n = 7919
    plan = plan_axis(n)
    b = max(1, TARGET // (8 * n))
    x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    p0 = Planar(jnp.asarray(x.real.astype(np.float32)),
                jnp.asarray(x.imag.astype(np.float32)))

    @jax.jit
    def rt(p):
        f = pe.fft_lines_p(p, plan, False)
        return pe.fft_lines_p(f, plan, True, scale=1.0 / n)

    @jax.jit
    def chain(p):
        return jax.lax.fori_loop(0, 8, lambda i, v: rt(v), p)

    float(np.asarray(chain(p0).re[0, 0]))

    tmp = "/tmp/e46_trace"
    shutil.rmtree(tmp, ignore_errors=True)
    with jax.profiler.trace(tmp):
        float(np.asarray(chain(p0).re[0, 0]))

    files = glob.glob(tmp + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    dev_pids = {e["pid"] for e in events if e.get("name") == "process_name"
                and "TPU" in e.get("args", {}).get("name", "")}
    per_op = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        per_op[e.get("name", "?")] += e.get("dur", 0) / 1e3
        cnt[e.get("name", "?")] += 1
    total = sum(per_op.values())
    print(f"device total {total/8:.3f} ms/iter", flush=True)
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:22]:
        print(f"  {ms/8:8.3f} ms/iter  x{cnt[name]:3d}  {name[:90]}",
              flush=True)


if __name__ == "__main__":
    main()
