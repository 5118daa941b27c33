"""E7: Mosaic support probes for the in-kernel R2C building blocks.

  flip          jnp.flip along the sublane axis of (m, S)
  roll          pltpu.roll along sublane axis
  deint         even/odd sublane deinterleave via reshape+slice
  untangle      full R2C post-process: Zr = conj(Z[(m-k)%m]) via
                flip+roll, then E/O recombination with twiddles
  r2c_full      packed R2C: real (sb, N) block in, half-spectrum out,
                timed against C2C of the same N

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/e7_r2c_ops.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("E7_INTERPRET", "0") == "1"


def probe(name, fn):
    try:
        out = fn()
        print(f"  {name:10s}: OK {out}", flush=True)
        return True
    except Exception as e:
        print(f"  {name:10s}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return False


def make_call(kernel, m, S, n_out=None):
    n_out = n_out or m
    spec_in = pl.BlockSpec((m, S), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((n_out, S), lambda: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, in_specs=[spec_in], out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((n_out, S), jnp.float32),
        interpret=INTERPRET)


def main():
    m, S = 512, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, S)).astype(np.float32))

    def flip_kernel(x_ref, o_ref):
        o_ref[:] = jnp.flip(x_ref[:], axis=0)

    def roll_kernel(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=1, axis=0)

    def deint_kernel(x_ref, o_ref):
        z = x_ref[:].reshape(m // 2, 2, S)
        o_ref[:] = jnp.concatenate([z[:, 0], z[:, 1]], axis=0)

    def revmod_kernel(x_ref, o_ref):
        # Z[(m-k) % m] = roll(flip(Z), 1)
        o_ref[:] = pltpu.roll(jnp.flip(x_ref[:], axis=0), shift=1, axis=0)

    r = {}
    r["flip"] = probe("flip", lambda: np.abs(
        np.asarray(make_call(flip_kernel, m, S)(x))
        - np.asarray(x)[::-1]).max())
    r["roll"] = probe("roll", lambda: np.abs(
        np.asarray(make_call(roll_kernel, m, S)(x))
        - np.roll(np.asarray(x), 1, axis=0)).max())
    r["deint"] = probe("deint", lambda: np.abs(
        np.asarray(make_call(deint_kernel, m, S)(x))
        - np.concatenate([np.asarray(x)[0::2], np.asarray(x)[1::2]])).max())
    r["revmod"] = probe("revmod", lambda: np.abs(
        np.asarray(make_call(revmod_kernel, m, S)(x))
        - np.asarray(x)[(m - np.arange(m)) % m]).max())


if __name__ == "__main__":
    main()
