"""Multi-chip distributed 3-D FFT over a device mesh.

No reference analog — VkFFT is single-GPU (its README lists multi-GPU as
future work); this is the framework's flagship extension.  The decomposition
is the classic slab/pencil scheme: shard one (slab) or two (pencil) axes
over the mesh, transform device-local axes with the regular kernels, and
re-decompose with ``all_to_all`` collectives over ICI between passes.

This example runs on an 8-device virtual CPU mesh so it works anywhere; on
real hardware the same code runs over ICI (and over DCN with
``hybrid_fft_mesh`` + ``initialize_distributed`` for multi-host)."""
import os

# must be set before jax initializes — 8 virtual devices
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("VKFFT_TPU_EXAMPLES_CPU", "1")

import numpy as np

from _common import setup, rel_err


def main():
    setup()
    import jax
    from vkfft_tpu import parallel

    shape = (64, 32, 128)
    rng = np.random.default_rng(8)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)

    # 1-D mesh -> slab decomposition (one sharded axis)
    mesh = parallel.fft_mesh((8,))
    X = parallel.pfftn(x, mesh)
    err = rel_err(np.asarray(jax.device_get(X)), np.fft.fftn(x))
    print(f"slab pfftn over {mesh.shape} rel err {err:.2e}")
    assert err < 2e-6

    # 2-D mesh -> pencil decomposition (two sharded axes)
    mesh2 = parallel.fft_mesh((2, 4), axis_names=("x", "y"))
    X2 = parallel.pfftn(x, mesh2)
    err = rel_err(np.asarray(jax.device_get(X2)), np.fft.fftn(x))
    print(f"pencil pfftn over {mesh2.shape} rel err {err:.2e}")
    assert err < 2e-6

    # roundtrip through the distributed inverse
    z = parallel.pifftn(X2, mesh2)
    assert rel_err(np.asarray(jax.device_get(z)), x) < 2e-6

    # distributed REAL transform: the local rfft runs before any all_to_all,
    # so the interconnect moves the half spectrum (~half the bytes)
    xr = rng.standard_normal(shape).astype(np.float32)
    Xr = parallel.prfftn(xr, mesh)
    err = rel_err(np.asarray(jax.device_get(Xr)), np.fft.rfftn(xr))
    print(f"slab prfftn rel err {err:.2e}  (half spectrum {Xr.shape})")
    assert err < 2e-6
    back = parallel.pirfftn(Xr, shape, mesh)
    assert rel_err(np.asarray(jax.device_get(back)), xr) < 2e-6

    # distributed convolution: spectrum multiply in the transposed sharding —
    # zero reorder collectives (the distributed disableReorderFourStep)
    kr = rng.standard_normal(shape).astype(np.float32)
    conv = parallel.DistributedConvolution(shape, mesh, kr, real=True)
    got = np.asarray(jax.device_get(conv(xr)))
    ref = np.fft.irfftn(np.fft.rfftn(xr) * np.fft.rfftn(kr),
                        s=shape, axes=(0, 1, 2))
    err = rel_err(got, ref)
    print(f"distributed real convolution rel err {err:.2e}")
    assert err < 2e-6

    # multi-host sketch (requires real hosts; shown for completeness):
    #   parallel.initialize_distributed(coordinator, num_processes, pid)
    #   mesh = parallel.hybrid_fft_mesh((1, 4), (2, 1))  # (hosts, chips)
    #   X = parallel.pfftn(x, mesh, overlap_chunks=4)    # a2a/compute overlap
    print("ok")


if __name__ == "__main__":
    main()
