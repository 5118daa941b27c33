"""Multi-chip decomposition tests on the 8-device virtual CPU mesh — the
"multi-node without a cluster" capability the reference has no analog for
(its multi-GPU support is future work, README.md:24-25)."""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import vkfft_tpu as vt
from vkfft_tpu.parallel import DistributedFFT, fft_mesh, pfft, pfftn, pifftn


def rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


def test_mesh_helper():
    m = fft_mesh()
    assert m.devices.size == 8
    m2 = fft_mesh((4, 2), ("x", "y"))
    assert m2.devices.shape == (4, 2)


def test_batch_sharded_pfft():
    mesh = fft_mesh()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 64)) + 1j * rng.standard_normal((16, 64))
    y = np.asarray(pfft(x, mesh, engine="jnp"))
    assert rel_err(y, np.fft.fft(x)) < 1e-11


@pytest.mark.parametrize("shape", [(16, 32), (8, 16, 12), (16, 8, 8)])
def test_slab_fftn(shape):
    mesh = fft_mesh()
    rng = np.random.default_rng(int(np.prod(shape)))
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    app = DistributedFFT(shape, mesh, engine="jnp")
    y = np.asarray(app.forward(app.shard_input(x)))
    assert rel_err(y, np.fft.fftn(x)) < 1e-11


def test_slab_roundtrip():
    mesh = fft_mesh()
    shape = (16, 16, 8)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    app = DistributedFFT(shape, mesh, engine="jnp")
    y = app.forward(app.shard_input(x))
    z = np.asarray(app.inverse(y))
    assert rel_err(z, x) < 1e-11


def test_slab_transpose_back_sharding():
    mesh = fft_mesh()
    shape = (16, 16)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    app = DistributedFFT(shape, mesh, engine="jnp", transpose_back=True)
    y = app.forward(app.shard_input(x))
    assert rel_err(np.asarray(y), np.fft.fftn(x)) < 1e-11
    # output sharding matches input sharding (axis 0 sharded)
    assert y.sharding.spec == P(mesh.axis_names[0], None)


def test_pencil_fftn():
    mesh = fft_mesh((4, 2), ("px", "py"))
    shape = (8, 8, 16)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    app = DistributedFFT(shape, mesh, engine="jnp")
    y = np.asarray(app.forward(app.shard_input(x)))
    assert rel_err(y, np.fft.fftn(x)) < 1e-11
    z = np.asarray(app.inverse(app.forward(app.shard_input(x))))
    assert rel_err(z, x) < 1e-11


def test_pencil_transpose_back():
    mesh = fft_mesh((2, 2), ("px", "py"), devices=jax.devices()[:4])
    shape = (4, 4, 8)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    app = DistributedFFT(shape, mesh, engine="jnp", transpose_back=True)
    y = np.asarray(app.forward(app.shard_input(x)))
    assert rel_err(y, np.fft.fftn(x)) < 1e-11


def test_pfftn_facade():
    mesh = fft_mesh()
    shape = (8, 8)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    y = pfftn(x, mesh, engine="jnp")
    assert rel_err(np.asarray(y), np.fft.fftn(x)) < 1e-11
    z = np.asarray(pifftn(y, mesh, engine="jnp"))
    assert rel_err(z, x) < 1e-11


def test_divisibility_validation():
    mesh = fft_mesh()
    with pytest.raises(vt.FFTError):
        DistributedFFT((12, 16), mesh, engine="jnp")  # 12 % 8 != 0


def test_slab_planar():
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    mesh = fft_mesh()
    shape = (16, 16, 8)
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    app = DistributedFFT(shape, mesh, engine="jnp")
    p = app.shard_input(from_complex(x))
    y = app.forward(p)
    got = to_numpy(y)
    assert rel_err(got, np.fft.fftn(x.astype(np.complex128))) < 1e-4
    z = to_numpy(app.inverse(y))
    assert rel_err(z, x) < 1e-4


def test_pencil_planar():
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    mesh = fft_mesh((4, 2), ("px", "py"))
    shape = (8, 8, 16)
    rng = np.random.default_rng(10)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    app = DistributedFFT(shape, mesh, engine="jnp")
    p = app.shard_input(from_complex(x))
    z = to_numpy(app.inverse(app.forward(p)))
    assert rel_err(z, x) < 1e-4


def test_hybrid_mesh():
    from vkfft_tpu.parallel import hybrid_fft_mesh
    # emulated (dcn, ici) factorization: axis 0 = 2 hosts x 1 chip,
    # axis 1 = 1 x 4 chips
    m = hybrid_fft_mesh((1, 4), (2, 1), ("x", "y"))
    assert m.devices.shape == (2, 4)
    # axis 1 rows must be ICI-contiguous device ids (inner dimension)
    ids = np.array([[d.id for d in row] for row in m.devices])
    assert (np.diff(ids, axis=1) == 1).all()
    with pytest.raises(ValueError):
        hybrid_fft_mesh((1, 4), (4, 1), ("x", "y"))  # 16 != 8 devices


def test_initialize_distributed_single_process_noop():
    from vkfft_tpu.parallel import initialize_distributed
    assert initialize_distributed() is False  # no launcher env, no-op


@pytest.mark.parametrize("chunks", [2, 4])
def test_pencil_overlap_chunks(chunks):
    """Chunked a2a/compute overlap must be bit-identical in layout to the
    monolithic stage (the free-axis chunking changes scheduling only)."""
    mesh = fft_mesh((4, 2), ("px", "py"))
    shape = (8, 8, 16)
    rng = np.random.default_rng(11)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    ref_app = DistributedFFT(shape, mesh, engine="jnp")
    app = DistributedFFT(shape, mesh, engine="jnp", overlap_chunks=chunks)
    y_ref = np.asarray(ref_app.forward(ref_app.shard_input(x)))
    y = np.asarray(app.forward(app.shard_input(x)))
    assert rel_err(y, y_ref) < 1e-6
    z = np.asarray(app.inverse(app.forward(app.shard_input(x))))
    assert rel_err(z, x) < 1e-4


def test_slab_overlap_on_hybrid_mesh():
    from vkfft_tpu.parallel import hybrid_fft_mesh
    mesh = hybrid_fft_mesh((1, 4), (2, 1), ("px", "py"))
    shape = (8, 8, 16)
    rng = np.random.default_rng(12)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    app = DistributedFFT(shape, mesh, engine="jnp", overlap_chunks=2)
    z = np.asarray(app.inverse(app.forward(app.shard_input(x))))
    assert rel_err(z, x) < 1e-4


def test_slab_tail_pair_fused():
    """Slab 3-D on the pallas engine fuses the two device-local minor axes
    into one pair kernel per device (one local HBM r+w less per direction)."""
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    pe.set_interpret(True)
    try:
        mesh = fft_mesh()
        shape = (16, 128, 128)
        rng = np.random.default_rng(55)
        x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        app = DistributedFFT(shape, mesh, engine="pallas")
        assert app._tail_pair
        xp = app.shard_input(from_complex(x.astype(np.complex64)))
        y = to_numpy(app.forward(xp))
        assert rel_err(y, np.fft.fftn(x)) < 5e-5
        z = to_numpy(app.inverse(app.forward(xp)))
        assert rel_err(z, x) < 5e-5
    finally:
        pe.set_interpret(False)


# --- distributed real transforms (prfftn/pirfftn) ---------------------------
# The local rfft runs before any all_to_all, so the interconnect moves the
# half spectrum — ~half the bytes of embedding real data in a C2C transform.


@pytest.mark.parametrize("shape", [(16, 8, 12), (8, 30), (16, 8, 7)])
def test_slab_real_fftn(shape):
    from vkfft_tpu.parallel import prfftn, pirfftn
    mesh = fft_mesh()
    rng = np.random.default_rng(int(np.prod(shape)))
    x = rng.standard_normal(shape).astype(np.float32)
    X = np.asarray(prfftn(x, mesh, engine="jnp"))
    ref = np.fft.rfftn(x)
    assert X.shape == ref.shape
    assert rel_err(X, ref) < 2e-6
    back = np.asarray(pirfftn(X, shape, mesh, engine="jnp"))
    assert rel_err(back, x) < 2e-6


def test_pencil_real_fftn():
    mesh = fft_mesh((4, 2), ("px", "py"))
    rng = np.random.default_rng(3)
    shape = (8, 8, 14)  # half spectrum 8 divides py=2
    x = rng.standard_normal(shape).astype(np.float32)
    app = DistributedFFT(shape, mesh, engine="jnp", real=True)
    X = np.asarray(app.forward(app.shard_input(x)))
    assert rel_err(X, np.fft.rfftn(x)) < 2e-6
    assert rel_err(np.asarray(app.inverse(app.forward(app.shard_input(x)))), x) < 2e-6


def test_real_half_spectrum_divisibility_validation():
    from vkfft_tpu.errors import InvalidConfigError
    mesh = fft_mesh((4, 2), ("px", "py"))
    with pytest.raises(InvalidConfigError):
        # half spectrum 12//2+1 = 7 does not divide py=2
        DistributedFFT((8, 8, 12), mesh, engine="jnp", real=True)


def test_distributed_convolution():
    """Distributed frequency-domain convolution: forward in the transposed
    sharding, sharding-aligned spectrum multiply (no extra collectives),
    inverse — zero reorder transposes (the distributed
    disableReorderFourStep contract)."""
    from vkfft_tpu.parallel import DistributedConvolution
    mesh = fft_mesh()
    rng = np.random.default_rng(11)
    shape = (16, 8, 12)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    k = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    got = np.asarray(DistributedConvolution(shape, mesh, k, engine="jnp")(x))
    ref = np.fft.ifftn(np.fft.fftn(x) * np.fft.fftn(k))
    assert rel_err(got, ref) < 2e-6


def test_distributed_convolution_real():
    from vkfft_tpu.parallel import DistributedConvolution
    mesh = fft_mesh()
    rng = np.random.default_rng(12)
    shape = (16, 8, 12)
    xr = rng.standard_normal(shape).astype(np.float32)
    kr = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(DistributedConvolution(shape, mesh, kr, engine="jnp",
                                            real=True)(xr))
    ref = np.fft.irfftn(np.fft.rfftn(xr) * np.fft.rfftn(kr),
                        s=shape, axes=(0, 1, 2))
    assert rel_err(got, ref) < 2e-6
