"""Plan & binary caching — the reference's checkpoint/resume subsystem.

The reference serializes every compiled kernel binary into one blob
(``saveApplicationToString``, ``vkFFT_InitializeApp.h:1726-1845``) and skips
compilation on reload (``vkFFT_CompileKernel.h:43-55``).  The TPU analogs:

  1. XLA persistent compilation cache (``enable_persistent_cache``) — caches
     every compiled executable on disk keyed by HLO hash, transparently
     skipping recompiles across processes (the closest equivalent of the
     reference's binary reload, and what sample 0 exercises every run).
  2. Plan serialization (``save_plan``/``load_plan``) — the host-side
     factorization decisions as a *declarative JSON document* (like the
     reference's passive binary format, and unlike pickle it cannot execute
     code on load): config fields + per-axis (n, algorithm, radices), rebuilt
     through ``plan_axis`` and cross-checked against the stored keys.
  3. Ahead-of-time executable serialization (``save_executable``) via
     ``jax.experimental.serialize_executable`` where the backend supports it.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

import jax

from vkfft_tpu.config import FFTConfig, Precision, TransformKind
from vkfft_tpu.planner.plan import AxisPlan, plan_axis

_MAGIC = b"VKFFT-TPU-PLAN\x00"
_VERSION = 2


def enable_persistent_cache(path: str = "/tmp/vkfft_tpu_xla_cache",
                            min_compile_time_secs: float = 0.0) -> None:
    """Turn on XLA's on-disk executable cache (binary save/load analog)."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _config_to_dict(config: FFTConfig) -> dict:
    d = dataclasses.asdict(config)
    d["kind"] = config.kind.value
    d["precision"] = config.precision.value
    return d


def _maybe_tuple(v):
    if isinstance(v, list):
        return tuple(_maybe_tuple(x) for x in v)
    return v


def _config_from_dict(d: dict) -> FFTConfig:
    known = {f.name for f in dataclasses.fields(FFTConfig)}
    kw: dict[str, Any] = {}
    for key, val in d.items():
        if key not in known:
            continue  # forward compatibility: ignore unknown fields
        if key == "kind":
            val = TransformKind(val)
        elif key == "precision":
            val = Precision(val)
        else:
            val = _maybe_tuple(val)
        kw[key] = val
    return FFTConfig(**kw)


def save_plan(config: FFTConfig, plans: dict[int, AxisPlan]) -> bytes:
    """Serialize an application's planning state (config + per-axis plans)
    as a passive JSON document — safe to load from untrusted sources."""
    payload = {
        "version": _VERSION,
        "config": _config_to_dict(config),
        "plans": {
            str(ax): {
                "n": p.n,
                "algorithm": p.algorithm.value,
                "radices": [s.r for s in p.stages],
            }
            for ax, p in plans.items()
        },
    }
    return _MAGIC + json.dumps(payload).encode("utf-8")


def load_plan(blob: bytes) -> tuple[FFTConfig, dict[int, AxisPlan]]:
    if not blob.startswith(_MAGIC):
        raise ValueError("not a vkfft_tpu plan blob")
    payload = json.loads(blob[len(_MAGIC):].decode("utf-8"))
    if payload["version"] != _VERSION:
        raise ValueError(f"unsupported plan version {payload['version']}")
    config = _config_from_dict(payload["config"])
    plans: dict[int, AxisPlan] = {}
    for ax_str, rec in payload["plans"].items():
        plan = plan_axis(int(rec["n"]))
        if plan.algorithm.value != rec["algorithm"]:
            raise ValueError(
                f"plan blob algorithm {rec['algorithm']!r} for n={rec['n']} "
                f"does not match this planner ({plan.algorithm.value!r})")
        plans[int(ax_str)] = plan
    return config, plans


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
