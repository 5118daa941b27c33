"""Debug observability — ``keepShaderCode`` / ``printMemoryLayout`` analogs.

The reference can dump each generated kernel's source at execution
(``keepShaderCode``, ``vkFFT_RunApp.h:59``) and print which buffer each pass
reads/writes (``printMemoryLayout``, ``:60-77``).  Here the "generated
source" is the XLA program: ``dump_hlo`` returns the lowered HLO/StableHLO
text, ``describe`` prints the plan structure (the information the reference
encodes in its specialization constants), and ``memory_layout`` narrates the
pass/buffer schedule."""
from __future__ import annotations

from typing import Optional

import numpy as np

from vkfft_tpu.planner.factorize import Algorithm
from vkfft_tpu.planner.plan import AxisPlan


def describe_axis(plan: AxisPlan) -> str:
    d = plan.decomp
    lines = [f"axis n={plan.n}: algorithm={d.algorithm.value}"]
    if d.algorithm is Algorithm.SPLIT:
        from vkfft_tpu.planner.plan import plan_axis
        a, b = d.split
        lines.append(f"  cooley-tukey split {a} x {b}; factor plans:")
        for f in (a, b):
            sub = describe_axis(plan_axis(f))
            lines.extend("    " + ln for ln in sub.splitlines())
        return "\n".join(lines)
    if d.algorithm is Algorithm.BLUESTEIN:
        lines.append(f"  bluestein padded size m={d.bluestein_size}")
    if d.algorithm is Algorithm.RADER:
        lines.append(f"  rader prime p={d.rader_prime} (convolution length {plan.n - 1})")
    lines.append(f"  core length {plan.core_n}, stages: "
                 + " -> ".join(f"r{s.r}(L={s.L},M'={s.Mp})" for s in plan.stages))
    lines.append(f"  cost model: {sum(s.r for s in plan.stages)} MACs/point")
    try:
        from vkfft_tpu.ops.pallas_engine import split_lane_major, _use_v2
        s = split_lane_major(plan.core_n)
        if s and _use_v2(plan.core_n):
            lines.append(f"  pallas v2 split: lanes N1={s[0]}, sublanes N2={s[1]}")
    except Exception:
        pass
    return "\n".join(lines)


def describe(app) -> str:
    """Plan dump for an FFT/Convolution application (keepShaderCode-class
    introspection)."""
    if hasattr(app, "fusion_mode"):  # ConvolutionApplication
        cfg = app.config
        return (f"ConvolutionApplication shape={cfg.shape} "
                f"matrix={cfg.matrix_convolution} "
                f"number_kernels={cfg.number_kernels} "
                f"fusion={app.fusion_mode or 'none (XLA spectrum round trip)'}")
    out = [f"FFTApplication shape={app.config.shape} axes={app.config.axes} "
           f"engine={app.engine_name}"]
    zp = getattr(app, "zeropad_mode", None)
    if zp is not None:
        out[0] += f" zeropad={zp}"
    for ax, plan in sorted(app.axis_plans.items()):
        out.append(describe_axis(plan).replace("axis ", f"axis {ax}: "))
    return "\n".join(out)


def memory_layout(app) -> str:
    """``printMemoryLayout`` analog: which logical buffer each pass touches.
    Under XLA all buffers are compiler-managed; this reports the logical
    dataflow (input -> per-axis passes -> output)."""
    cfg = app.config
    rows = []
    src = "input"
    for ax in cfg.axes:
        plan = app.axis_plans[ax]
        extra = ""
        if plan.algorithm is Algorithm.BLUESTEIN:
            extra = f" (+chirp/b_fft tables, temp len {plan.decomp.bluestein_size})"
        elif plan.algorithm is Algorithm.RADER:
            extra = f" (+g-power tables, conv len {plan.n - 1})"
        rows.append(f"pass axis{ax}: read {src} -> write temp{ax}{extra}")
        src = f"temp{ax}"
    rows.append(f"final: {src} -> output")
    return "\n".join(rows)


def dump_hlo(app, x, inverse: bool = False, stage: str = "hlo") -> str:
    """Lowered program text for the app on example input ``x`` —
    the TPU analog of dumping generated kernel source."""
    import jax

    fn = app._inv if inverse else app._fwd
    lowered = fn.lower(x)
    if stage == "stablehlo":
        return str(lowered.compiler_ir("stablehlo"))
    return lowered.as_text()


def profile_trace(fn, *args, outdir="/tmp/vkfft_tpu_trace", iters=5):
    """Capture a jax.profiler trace of ``iters`` calls of ``fn(*args)``
    (works on the tunneled axon runtime — round-3 validated; op-level
    device events incl. per-pallas_call durations land in
    ``outdir/plugins/profile/*/*.trace.json.gz``).  Returns the outdir.
    The TPU analog of the reference's keepShaderCode+chrono loop pair."""
    import jax
    import numpy as _np

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(_np.asarray(leaf[(0,) * leaf.ndim]).real)  # warm compile
    with jax.profiler.trace(outdir):
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(_np.asarray(leaf[(0,) * leaf.ndim]).real)
    return outdir
