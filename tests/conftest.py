"""Test harness: force an 8-device virtual CPU platform so every test —
including the multi-chip sharding suite — runs without TPU hardware (the
reference has no equivalent; its tests require a physical GPU).

Note: the environment's axon boot hook programmatically sets
``jax_platforms=axon,cpu``; the env var JAX_PLATFORMS alone does NOT override
it, so we must use ``jax.config.update`` after import."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Build the native C++ planner core when a compiler is available so the
# parity tests in test_native.py actually execute (round-2 verdict: they
# skipped silently in checkouts without a prebuilt .so).
import shutil

if shutil.which("c++") or shutil.which("g++"):
    os.environ.setdefault("VKFFT_TPU_NATIVE_BUILD", "1")
