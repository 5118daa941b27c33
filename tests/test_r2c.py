"""R2C/C2R correctness vs numpy (analog of reference precision sample 15,
``sample_15_precision_VkFFT_single_r2c.cpp``)."""
import numpy as np
import pytest

import vkfft_tpu as vt


def rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


# even (fast packed path), odd (fallback), prime, Bluestein-sized
SIZES = [2, 4, 8, 16, 64, 256, 1024, 6, 12, 60, 360, 1000,
         3, 5, 9, 15, 17, 97, 101, 254]


@pytest.mark.parametrize("n", SIZES)
def test_rfft(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n))
    y = np.asarray(vt.rfft(x, engine="jnp"))
    assert y.shape == (3, n // 2 + 1)
    assert rel_err(y, np.fft.rfft(x)) < 1e-11


@pytest.mark.parametrize("n", SIZES)
def test_irfft_roundtrip(n):
    rng = np.random.default_rng(n + 7)
    x = rng.standard_normal((2, n))
    X = np.fft.rfft(x)
    z = np.asarray(vt.irfft(X, n=n, engine="jnp"))
    assert z.shape == (2, n)
    assert rel_err(z, x) < 1e-11


def test_rfft_axis():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 5))
    y = np.asarray(vt.rfft(x, axis=0, engine="jnp"))
    assert rel_err(y, np.fft.rfft(x, axis=0)) < 1e-11


@pytest.mark.parametrize("shape", [(8, 16), (4, 6, 8), (16, 17)])
def test_rfftn_irfftn(shape):
    rng = np.random.default_rng(int(np.prod(shape)))
    x = rng.standard_normal(shape)
    y = np.asarray(vt.rfftn(x, engine="jnp"))
    assert rel_err(y, np.fft.rfftn(x)) < 1e-11
    z = np.asarray(vt.irfftn(y, s=shape, engine="jnp"))
    assert rel_err(z, x) < 1e-11


def test_rfft_fp32():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    y = np.asarray(vt.rfft(x, engine="jnp"))
    assert y.dtype == np.complex64
    assert rel_err(y, np.fft.rfft(x.astype(np.float64))) < 2e-6


def test_rfft2_pair_single_kernel():
    """The two minor axes of rfft2/irfft2 run as ONE kernel (r2c pair:
    one real-plane read + one half-spectrum write)."""
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.transforms import r2c
    import jax.numpy as jnp
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(31)
        for shape in ((128, 256), (3, 128, 256)):
            assert pe.use_r2c_pair(shape[-2], shape[-1])
            x = rng.standard_normal(shape).astype(np.float32)
            X = r2c.rfftn(jnp.asarray(x), engine="pallas")
            ref = np.fft.rfftn(x.astype(np.float64))
            got = np.asarray(X)
            assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6
            y = r2c.irfftn(X, engine="pallas")
            assert np.abs(np.asarray(y) - x).max() < 1e-5
    finally:
        pe.set_interpret(False)


@pytest.mark.parametrize("n", [3, 5, 101, 347, 1009])
@pytest.mark.parametrize("batch", [1, 2, 5])
def test_rfft_merged_sequences_odd(n, batch):
    """Odd lengths with batch >= 2 ride the merged-sequences path (two real
    lines per complex FFT — reference merged rows, vkFFT_R2C.h:27-177);
    batch 1 falls back.  Both must match numpy exactly."""
    rng = np.random.default_rng(n * 31 + batch)
    x = rng.standard_normal((batch, n)).astype(np.float32)
    y = np.asarray(vt.rfft(x, engine="jnp"))
    ref = np.fft.rfft(x)
    assert rel_err(y, ref) < 2e-6
    z = np.asarray(vt.irfft(y, n=n, engine="jnp"))
    assert rel_err(z, x) < 2e-5


def test_rfft_merged_sequences_multidim_and_axis():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 101)).astype(np.float32)
    assert rel_err(np.asarray(vt.rfft(x)), np.fft.rfft(x)) < 2e-6
    x2 = rng.standard_normal((7, 6)).astype(np.float32)
    assert rel_err(np.asarray(vt.rfft(x2, axis=0)), np.fft.rfft(x2, axis=0)) < 2e-6
