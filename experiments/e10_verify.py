"""E10: re-time the e9 winners with repeats to separate signal from noise.

Usage: PYTHONPATH=... python experiments/e10_verify.py
"""
from __future__ import annotations

import sys

from e9_plan_sweep import make, timeit, check_err

CASES = [
    # (n, plan, layout, sb, il)
    (1024, ((4, 4, 2), (32,)), "tl", 128, 1),
    (1024, ((4, 4), (64,)), "tl", 128, 1),
    (1024, ((4, 4, 2), (32,)), "nat", 128, 2),
    (1024, ((4, 4), (64,)), "nat", 128, 2),
    (1024, ((4, 4, 2), (32,)), "nat", 128, 1),
]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for n, plan, layout, sb, il in CASES:
        batch = max(512, (64 * 1024 * 1024 // (8 * n)) // 512 * 512)
        fwd, inv = make(n, batch, plan, layout, sb, il)
        err = check_err(fwd, batch, n, layout == "tl")
        vals = []
        for _ in range(reps):
            gbs, dt = timeit(fwd, inv, batch, n, layout == "tl")
            vals.append(gbs)
        print(f"{layout} il={il} {plan}: "
              + " ".join(f"{v:.0f}" for v in vals)
              + f" GB/s  err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
