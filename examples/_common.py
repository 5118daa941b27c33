"""Shared example plumbing: optional CPU forcing for machines without a TPU.

The reference's examples share ~150 lines of device/queue/buffer setup per
backend (``utils_VkFFT.h``); here the only knob is which JAX platform runs
the program."""
import os


def setup():
    """Force the CPU platform (+ Pallas interpreter) when
    VKFFT_TPU_EXAMPLES_CPU=1 — used by CI; on TPU machines this is a no-op."""
    if os.environ.get("VKFFT_TPU_EXAMPLES_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        from vkfft_tpu.ops import pallas_engine

        pallas_engine.set_interpret(True)


def rel_err(got, ref):
    import numpy as np

    ref = np.asarray(ref)
    denom = np.abs(ref).max() or 1.0
    return np.abs(np.asarray(got) - ref).max() / denom
