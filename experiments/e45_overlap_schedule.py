"""E45 (round 5, verdict item 7): make the a2a/compute overlap claim
falsifiable — dump the COMPILED module schedule of the overlapped slab path
and check whether chunked all_to_alls genuinely interleave with per-chunk
local FFT compute (collective i+1 issued before chunk i's compute retires),
instead of trusting the analytic prediction.

Two compilations:
  1. 8-virtual-device CPU mesh (always available): the optimized HLO shows
     the chunk STRUCTURE (k all-to-alls separated by per-chunk fusions vs
     one monolithic a2a) and the scheduler's op order.
  2. best-effort TPU AOT topology (v5e 2x4) via jax topology APIs: if the
     environment supports chipless AOT, the TPU schedule shows true async
     collective-permute/all-to-all start/done pairs.

Writes hwlogs/hlo_overlap_r5.txt (full text) and prints a summary.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       PYTHONPATH=/root/repo python -u experiments/e45_overlap_schedule.py
"""
import re

import numpy as np


def analyze(tag, hlo: str, chunks: int):
    """Schedule facts from the compiled module: how many independent a2a
    chains exist (the chunk structure), whether the backend emitted ASYNC
    start/done pairs, and whether compute ops sit between a2a issue points
    in the linear schedule."""
    lines = hlo.splitlines()
    seq = []   # (line_idx, kind)
    for i, ln in enumerate(lines):
        s = ln.strip()
        if re.search(r"= .*all-to-all-start", s):
            seq.append((i, "a2a-start"))
        elif re.search(r"= .*all-to-all-done", s):
            seq.append((i, "a2a-done"))
        elif re.search(r"= \(?c64.*all-to-all\(", s):
            seq.append((i, "a2a"))
        elif re.search(r"= .* dot\(", s):
            seq.append((i, "dot"))
    n_a2a = sum(1 for _, k in seq if k in ("a2a", "a2a-start"))
    async_pairs = sum(1 for _, k in seq if k == "a2a-done")
    a2a_pos = [j for j, (_, k) in enumerate(seq)
               if k in ("a2a", "a2a-start")]
    gaps_with_compute = sum(
        1 for a, b in zip(a2a_pos, a2a_pos[1:])
        if any(seq[j][1] == "dot" for j in range(a + 1, b)))
    dots_before_first_a2a = (sum(1 for _, k in seq[:a2a_pos[0]]
                                 if k == "dot") if a2a_pos else 0)
    dots_after_last_a2a = (sum(1 for _, k in seq[a2a_pos[-1]:]
                               if k == "dot") if a2a_pos else 0)
    print(f"[{tag}] a2a ops: {n_a2a} (chunk structure: expect "
          f"{chunks} per plane per stage), async start/done pairs: "
          f"{async_pairs}, a2a->a2a gaps containing compute: "
          f"{gaps_with_compute}, dots before first/after last a2a: "
          f"{dots_before_first_a2a}/{dots_after_last_a2a}", flush=True)
    return {"a2a_ops": n_a2a, "async_pairs": async_pairs,
            "interleaved_gaps": gaps_with_compute}


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from vkfft_tpu.parallel import pencil

    devs = jax.devices()
    print(f"{len(devs)} devices on {devs[0].platform}", flush=True)
    assert len(devs) >= 8, "run with xla_force_host_platform_device_count=8"
    mesh = Mesh(np.array(devs[:8]), ("gx",))
    shape = (256, 64, 64)
    chunks = 4
    dist = pencil.DistributedFFT(shape, mesh, engine="jnp",
                                 overlap_chunks=chunks)
    x = jnp.zeros(shape, jnp.complex64)
    x = dist.shard_input(x)
    lowered = dist._fwd.lower(x)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open("hwlogs/hlo_overlap_r5.txt", "w") as f:
        f.write(f"=== CPU 8-dev slab fwd, overlap_chunks={chunks}, "
                f"shape={shape} ===\n")
        f.write(hlo)
    r = analyze("cpu-8dev", hlo, chunks)

    # monolithic baseline for contrast
    dist1 = pencil.DistributedFFT(shape, mesh, engine="jnp",
                                  overlap_chunks=1)
    hlo1 = dist1._fwd.lower(x).compile().as_text()
    with open("hwlogs/hlo_overlap_r5.txt", "a") as f:
        f.write("\n\n=== CPU 8-dev slab fwd, overlap_chunks=1 ===\n")
        f.write(hlo1)
    analyze("cpu-8dev-monolithic", hlo1, 1)

    # best-effort TPU AOT topology — gated: initializing the TPU plugin can
    # conflict with a live tunneled-TPU process (one-TPU-process rule)
    import os
    if os.environ.get("E45_TRY_TPU_TOPOLOGY") == "1":
        try:
            from jax.experimental import topologies
            topo = topologies.get_topology_desc("v5e:2x4", "tpu")
            print("TPU topology AOT available:", topo, flush=True)
            mesh_t = Mesh(np.array(topo.devices[:8]), ("gx",))
            dist_t = pencil.DistributedFFT(shape, mesh_t, engine="jnp",
                                           overlap_chunks=chunks)
            hlo_t = dist_t._fwd.lower(
                jax.ShapeDtypeStruct(shape, jnp.complex64)).compile().as_text()
            with open("hwlogs/hlo_overlap_r5.txt", "a") as f:
                f.write("\n\n=== TPU v5e:2x4 AOT slab fwd, "
                        f"overlap_chunks={chunks} ===\n")
                f.write(hlo_t)
            analyze("tpu-aot-2x4", hlo_t, chunks)
        except Exception as e:
            print(f"TPU AOT topology unavailable here: {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
    else:
        print("TPU AOT topology attempt skipped (set E45_TRY_TPU_TOPOLOGY=1 "
              "when no tunneled-TPU process is live)", flush=True)


if __name__ == "__main__":
    main()
