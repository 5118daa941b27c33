"""Device-mesh helpers for distributed FFTs.

The reference is single-device; its "backend" axis is the GPU-API selection
hexagon (``vkFFT/vkFFT.h:36-62``) and multi-GPU splitting is future work
(README.md:24-25).  Here the distributed layer is first-class: a
``jax.sharding.Mesh`` over ICI (one host) or ICI+DCN (multi-host), with
`all_to_all` transposes carrying the four-step/pencil decompositions.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def fft_mesh(axis_sizes: Optional[Sequence[int]] = None,
             axis_names: Sequence[str] = ("fft",),
             devices=None) -> Mesh:
    """Build a mesh for distributed FFTs.

    With the default 1-axis layout, all devices form one ring used for
    slab decomposition; pass two sizes (e.g. ``(4, 2)``) with names like
    ``("x", "y")`` for pencil decomposition.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) if len(axis_names) == 1 else None
    if axis_sizes is None or int(np.prod(axis_sizes)) != n:
        raise ValueError(f"axis_sizes {axis_sizes} must multiply to {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **kwargs) -> bool:
    """Multi-host wiring: bring up the JAX distributed runtime so
    ``jax.devices()`` spans every host's chips (DCN between hosts, ICI
    within).  Idempotent; a single-process call is a no-op.

    Returns True when the distributed runtime was (already) initialized for
    a multi-process job.  On managed TPU pods all three arguments are
    auto-detected and may be omitted.  The reference has no analog — it is
    single-device by design (SURVEY §2.5); this is the framework's
    first-class distributed backend.
    """
    if getattr(initialize_distributed, "_initialized", False):
        return True
    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None or kwargs)
    if not explicit and num_processes in (None, 1):
        # Auto-detect only when a launcher environment is present; otherwise
        # stay single-process (calling initialize() without one raises).
        import os
        markers = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                   "MEGASCALE_COORDINATOR_ADDRESS")
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multi_worker = len([h for h in hosts.split(",") if h.strip()]) > 1
        if not multi_worker and not any(os.environ.get(m) for m in markers):
            return False
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            # launcher markers present but no resolvable coordinator
            # (e.g. single-host tunnel): stay single-process
            return False
        initialize_distributed._initialized = True
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    initialize_distributed._initialized = True
    return True


def hybrid_fft_mesh(ici_axis_sizes: Sequence[int],
                    dcn_axis_sizes: Sequence[int],
                    axis_names: Sequence[str] = ("x", "y"),
                    devices=None) -> Mesh:
    """Mesh whose axes factor as (DCN x ICI): axis i spans
    ``dcn_axis_sizes[i] * ici_axis_sizes[i]`` devices, with the DCN (slow,
    inter-host) dimension outermost so collectives along the *inner* mesh
    axes ride ICI only.  For a pencil 3-D FFT across hosts, put the host
    dimension on axis 0: ``hybrid_fft_mesh((1, chips), (hosts, 1))`` gives
    a (hosts, chips) mesh where the hot z<->y transpose (mesh axis 1) stays
    on ICI and only the y<->x transpose crosses DCN.

    On a multi-process runtime this delegates to
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` (which
    groups devices by host granule); in a single process it reduces to a
    plain reshape so the same code paths are testable on a virtual mesh.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    ici = tuple(int(s) for s in ici_axis_sizes)
    dcn = tuple(int(s) for s in dcn_axis_sizes)
    if len(ici) != len(dcn) or len(ici) != len(axis_names):
        raise ValueError("ici/dcn axis sizes and names must align")
    total = tuple(a * b for a, b in zip(ici, dcn))
    if int(np.prod(total)) != len(devices):
        raise ValueError(
            f"mesh {total} (= ici {ici} x dcn {dcn}) needs "
            f"{int(np.prod(total))} devices, have {len(devices)}")
    n_proc = len({getattr(d, "process_index", 0) for d in devices})
    if n_proc > 1:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici, dcn, devices=devices)
    else:
        # single process: emulate the (dcn, ici) factorization by an
        # outer-dcn reshape — same mesh topology, virtual devices
        dev_array = np.asarray(devices).reshape(dcn + ici)
        order = [i for pair in zip(range(len(dcn)),
                                   range(len(dcn), 2 * len(dcn)))
                 for i in pair]
        dev_array = dev_array.transpose(order).reshape(total)
    return Mesh(dev_array, tuple(axis_names))
