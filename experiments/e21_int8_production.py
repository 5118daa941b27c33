"""E21: production-system interleave sweep under int8 vs HIGHEST MXU modes.

The v3 kernel's interleave depth (il) was tuned with HIGHEST (6-pass bf16)
MXU stages (E11/E14: il=8 for n=256, il=4 for 512/1024, il=2 for 4096).
int8 6-pass emulation halves the MXU share but adds ~1.5-2 VPU stages of
quantization work per MXU stage, so the optimal overlap depth likely
shifts.  Sweep il x {fp32, fp32_int8} on the production bench systems and
report effective GB/s with bench.py's chained two-point method.

Run (TPU only, never concurrently with another TPU process):
    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/e21_int8_production.py
"""
from __future__ import annotations

import sys


def main():
    import jax

    plat = jax.devices()[0].platform
    print(f"platform: {plat} ({jax.devices()[0]})")
    if plat == "cpu":
        print("needs TPU hardware; exiting")
        return 1

    import vkfft_tpu
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine as pe
    import bench

    try:
        cache.enable_persistent_cache()
    except Exception:
        pass

    systems = [(256, 65536), (1024, 16384), (4096, 4096)]
    results = {}
    for mode in ("fp32", "fp32_int8"):
        vkfft_tpu.set_compute_mode(mode)
        for n, batch in systems:
            for il in (None, 2, 4, 8, 16):
                if il is not None and n * (2 * il) * 128 * 4 > (8 << 20):
                    continue  # beyond any plausible block budget
                pe._V3_IL_OVERRIDE = il
                pe._build_fft_call_v3.cache_clear()  # il is read at build time
                try:
                    gbs, dt = bench.bench_system(n, batch)
                    tag = f"{mode} n={n:5d} il={il or 'auto'}"
                    results[tag] = gbs
                    print(f"{tag:32s} {gbs:7.1f} GB/s  ({dt*1e3:.3f} ms)")
                except Exception as e:
                    print(f"{mode} n={n} il={il}: FAILED {type(e).__name__}: {e}")
                finally:
                    pe._V3_IL_OVERRIDE = None
                    pe._build_fft_call_v3.cache_clear()
    vkfft_tpu.set_compute_mode("fp32")

    best = {}
    for tag, gbs in results.items():
        key = tag.split(" il=")[0]
        if gbs > best.get(key, (0, ""))[0]:
            best[key] = (gbs, tag)
    print("\nbest per (mode, n):")
    for key, (gbs, tag) in sorted(best.items()):
        print(f"  {tag:32s} {gbs:7.1f} GB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
