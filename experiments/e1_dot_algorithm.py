"""E1: does Mosaic lower DotAlgorithmPreset BF16_BF16_F32_X3 (3-pass bf16)?

If yes: measure speed + accuracy of the v2 FFT kernel at X3 vs HIGHEST (X6).
X3 halves the MXU passes; the v2 kernel is MXU-bound at HIGHEST, so this
could be ~1.5-2x on the headline bench.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_algorithm(name, alg):
    """Tiny pallas kernel with one dot_general under the given precision."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=alg)

    a = np.random.default_rng(0).standard_normal((256, 256)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((256, 256)).astype(np.float32)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )
    try:
        out = np.asarray(jax.jit(call)(a, b))
        ref = a.astype(np.float64) @ b.astype(np.float64)
        err = np.abs(out - ref).max() / np.abs(ref).max()
        print(f"{name}: OK, max rel err vs fp64 = {err:.3e}")
        return True
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}")
        return False


def main():
    P = lax.Precision
    A = lax.DotAlgorithmPreset
    candidates = [
        ("Precision.HIGHEST", P.HIGHEST),
        ("Precision.DEFAULT", P.DEFAULT),
        ("BF16_BF16_F32_X3", A.BF16_BF16_F32_X3),
        ("BF16_BF16_F32_X6", A.BF16_BF16_F32_X6),
        ("BF16_BF16_F32_X9", getattr(A, "BF16_BF16_F32_X9", None)),
        ("BF16_BF16_F32", A.BF16_BF16_F32),
        ("F32_F32_F32", A.F32_F32_F32),
        ("TF32_TF32_F32_X3", getattr(A, "TF32_TF32_F32_X3", None)),
    ]
    for name, alg in candidates:
        if alg is None:
            print(f"{name}: not in this JAX version")
            continue
        try_algorithm(name, alg)


if __name__ == "__main__":
    main()
