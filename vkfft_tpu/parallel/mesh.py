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
