"""Plan & binary caching — the reference's checkpoint/resume subsystem.

The reference serializes every compiled kernel binary into one blob
(``saveApplicationToString``, ``vkFFT_InitializeApp.h:1726-1845``) and skips
compilation on reload (``vkFFT_CompileKernel.h:43-55``).  The TPU analogs:

  1. XLA persistent compilation cache (``enable_persistent_cache``) — caches
     every compiled executable on disk keyed by HLO hash, transparently
     skipping recompiles across processes (the closest equivalent of the
     reference's binary reload, and what sample 0 exercises every run).
  2. Plan serialization (``save_plan``/``load_plan``) — the host-side
     factorization/LUT decisions, cheap to rebuild but serialized for
     parity and for shipping plans to machines without a planner.
  3. Ahead-of-time executable serialization (``save_executable``) via
     ``jax.experimental.serialize_executable`` where the backend supports it.
"""
from __future__ import annotations

import io
import pickle
from typing import Any, Optional

import jax

from vkfft_tpu.config import FFTConfig
from vkfft_tpu.planner.plan import AxisPlan, plan_axis

_MAGIC = b"VKFFT-TPU-PLAN\x00"
_VERSION = 1


def enable_persistent_cache(path: str = "/tmp/vkfft_tpu_xla_cache",
                            min_compile_time_secs: float = 0.0) -> None:
    """Turn on XLA's on-disk executable cache (binary save/load analog)."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def save_plan(config: FFTConfig, plans: dict[int, AxisPlan]) -> bytes:
    """Serialize an application's planning state (config + per-axis plans)."""
    buf = io.BytesIO()
    buf.write(_MAGIC)
    payload = {
        "version": _VERSION,
        "config": config,
        "plans": plans,
    }
    pickle.dump(payload, buf, protocol=pickle.HIGHEST_PROTOCOL)
    return buf.getvalue()


def load_plan(blob: bytes) -> tuple[FFTConfig, dict[int, AxisPlan]]:
    if not blob.startswith(_MAGIC):
        raise ValueError("not a vkfft_tpu plan blob")
    payload = pickle.loads(blob[len(_MAGIC):])
    if payload["version"] != _VERSION:
        raise ValueError(f"unsupported plan version {payload['version']}")
    return payload["config"], payload["plans"]


def save_application_to_string(app) -> bytes:
    """``saveApplicationToString`` analog: serialize the app's planning state.
    Compiled binaries ride the XLA persistent cache instead of the blob."""
    return save_plan(app.config, app.axis_plans)


def load_application_from_string(blob: bytes, engine: Optional[str] = None):
    """``loadApplicationFromString`` analog: rebuild an application from a
    plan blob (kernels recompile from cache on first use)."""
    from vkfft_tpu.api import FFTApplication

    config, plans = load_plan(blob)
    app = FFTApplication(config, engine=engine)
    app.axis_plans = plans
    return app


def save_executable(jitted, *example_args) -> Optional[bytes]:
    """AOT-serialize a compiled executable (None if the backend declines)."""
    try:
        from jax.experimental import serialize_executable as se
        lowered = jitted.lower(*example_args)
        compiled = lowered.compile()
        payload, _, _ = se.serialize(compiled)
        return payload
    except Exception:
        return None
