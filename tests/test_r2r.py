"""DCT/DST I-IV vs naive fp64 matmul oracles (analog of reference precision
samples 16/17, ``sample_16_precision_VkFFT_single_dct.cpp`` — which use FFTW
REDFT/RODFT; the naive definitions below are the same conventions)."""
import numpy as np
import pytest

import vkfft_tpu as vt


def naive_dct(x, type):
    n = x.shape[-1]
    j = np.arange(n)
    k = np.arange(n)[:, None]
    if type == 1:
        jj = np.arange(1, n - 1)
        M = 2 * np.cos(np.pi * jj * k / (n - 1))
        core = x[..., 1:-1] @ M.T
        return x[..., :1] + ((-1.0) ** k[:, 0]) * x[..., -1:] + core
    if type == 2:
        M = 2 * np.cos(np.pi * (2 * j + 1) * k / (2 * n))
        return x @ M.T
    if type == 3:
        jj = np.arange(1, n)
        M = 2 * np.cos(np.pi * jj * (2 * k + 1) / (2 * n))
        return x[..., :1] + x[..., 1:] @ M.T
    if type == 4:
        M = 2 * np.cos(np.pi * (2 * j + 1) * (2 * k + 1) / (4 * n))
        return x @ M.T
    raise ValueError(type)


def naive_dst(x, type):
    n = x.shape[-1]
    j = np.arange(n)
    k = np.arange(n)[:, None]
    if type == 1:
        M = 2 * np.sin(np.pi * (j + 1) * (k + 1) / (n + 1))
        return x @ M.T
    if type == 2:
        M = 2 * np.sin(np.pi * (2 * j + 1) * (k + 1) / (2 * n))
        return x @ M.T
    if type == 3:
        jj = np.arange(n - 1)
        M = 2 * np.sin(np.pi * (jj + 1) * (2 * k + 1) / (2 * n))
        return ((-1.0) ** k[:, 0]) * x[..., -1:] + x[..., :-1] @ M.T
    if type == 4:
        M = 2 * np.sin(np.pi * (2 * j + 1) * (2 * k + 1) / (4 * n))
        return x @ M.T
    raise ValueError(type)


def rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


SIZES = [2, 3, 4, 8, 15, 16, 32, 60, 64, 100, 128, 256]


@pytest.mark.parametrize("type", [1, 2, 3, 4])
@pytest.mark.parametrize("n", SIZES)
def test_dct(type, n):
    rng = np.random.default_rng(n * 10 + type)
    x = rng.standard_normal((3, n))
    y = np.asarray(vt.dct(x, type=type, engine="jnp"))
    assert rel_err(y, naive_dct(x, type)) < 1e-10


@pytest.mark.parametrize("type", [1, 2, 3, 4])
@pytest.mark.parametrize("n", SIZES)
def test_dst(type, n):
    rng = np.random.default_rng(n * 10 + type)
    x = rng.standard_normal((3, n))
    y = np.asarray(vt.dst(x, type=type, engine="jnp"))
    assert rel_err(y, naive_dst(x, type)) < 1e-10


@pytest.mark.parametrize("type", [1, 2, 3, 4])
def test_idct_roundtrip(type):
    n = 32
    rng = np.random.default_rng(type)
    x = rng.standard_normal((2, n))
    y = np.asarray(vt.idct(vt.dct(x, type=type, engine="jnp"), type=type, engine="jnp"))
    assert rel_err(y, x) < 1e-10


@pytest.mark.parametrize("type", [1, 2, 3, 4])
def test_idst_roundtrip(type):
    n = 24
    rng = np.random.default_rng(type)
    x = rng.standard_normal((2, n))
    y = np.asarray(vt.idst(vt.dst(x, type=type, engine="jnp"), type=type, engine="jnp"))
    assert rel_err(y, x) < 1e-10


def test_dct_axis_and_nd():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 12))
    y = np.asarray(vt.dct(x, type=2, axis=0, engine="jnp"))
    ref = naive_dct(x.T, 2).T
    assert rel_err(y, ref) < 1e-10
    y2 = np.asarray(vt.dctn(x, type=2, engine="jnp"))
    ref2 = naive_dct(naive_dct(x, 2).swapaxes(-1, -2), 2).swapaxes(-1, -2)
    assert rel_err(y2, ref2) < 1e-10


def test_dct_fp32():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    y = np.asarray(vt.dct(x, type=2, engine="jnp"))
    assert y.dtype == np.float32
    assert rel_err(y, naive_dct(x.astype(np.float64), 2)) < 5e-5


def test_dct_kernel_in_kernel_path():
    """DCT-II/III run the single-kernel in-kernel form on the pallas engine
    (permutation + half-size real FFT + unfold + rotation in one kernel)."""
    import jax.numpy as jnp
    import scipy.fft as sfft
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.transforms import r2r
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(41)
        n = 256
        assert pe.use_dct_kernel(n)
        x = rng.standard_normal((4, n)).astype(np.float32)
        for t in (2, 3):
            y = np.asarray(r2r.dct(jnp.asarray(x), type=t, engine="pallas"))
            ref = sfft.dct(x.astype(np.float64), type=t, axis=-1)
            assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-6, t
        # inverse pair through the public idct
        y2 = r2r.dct(jnp.asarray(x), type=2, engine="pallas")
        back = np.asarray(r2r.idct(y2, type=2, engine="pallas"))
        assert np.abs(back - x).max() < 1e-5
        # DST-II/III fold the sign flip + reversal into the DCT kernels
        for t in (2, 3):
            yd = np.asarray(r2r.dst(jnp.asarray(x), type=t, engine="pallas"))
            refd = sfft.dst(x.astype(np.float64), type=t, axis=-1)
            assert np.abs(yd - refd).max() / np.abs(refd).max() < 2e-6, t
    finally:
        pe.set_interpret(False)


def test_dct1_dst1_in_kernel_path():
    """DCT-I / DST-I run the single-kernel form (round 3): the symmetric /
    odd extension stays virtual inside the kernel (reference
    ``appendDCTI_read``, vkFFT_R2R.h:1339)."""
    import jax.numpy as jnp
    import scipy.fft as sfft
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.transforms import r2r
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(42)
        for n in (129, 257, 1025):
            assert pe.use_dct1_kernel(n), n
            x = rng.standard_normal((4, n)).astype(np.float32)
            y = np.asarray(pe.dct1_lines(jnp.asarray(x)))
            ref = sfft.dct(x.astype(np.float64), type=1, axis=-1)
            assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-6, n
        for n in (127, 255, 1023):
            assert pe.use_dst1_kernel(n), n
            x = rng.standard_normal((4, n)).astype(np.float32)
            y = np.asarray(pe.dst1_lines(jnp.asarray(x)))
            ref = sfft.dst(x.astype(np.float64), type=1, axis=-1)
            assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-6, n
        # public routing hits the kernels and stays correct
        x = rng.standard_normal((3, 257)).astype(np.float32)
        y = np.asarray(r2r.dct(jnp.asarray(x), type=1, engine="pallas"))
        ref = sfft.dct(x.astype(np.float64), type=1, axis=-1)
        assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-6
    finally:
        pe.set_interpret(False)


def test_dct4_dst4_in_kernel_path():
    """Even DCT/DST-IV run the single-kernel N/2-trick form (round 3;
    reference ``appendDCTIV_even_read``/``_write``, vkFFT_R2R.h:2318/2946).
    DST-IV is the same kernel with swapped input roles and negated odd
    phases."""
    import jax.numpy as jnp
    import scipy.fft as sfft
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.transforms import r2r
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(43)
        for n in (256, 1000, 1024):
            assert pe.use_dct4_kernel(n), n
            x = rng.standard_normal((4, n)).astype(np.float32)
            y = np.asarray(pe.dct4_lines(jnp.asarray(x)))
            ref = sfft.dct(x.astype(np.float64), type=4, axis=-1)
            assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-6, n
            yd = np.asarray(pe.dst4_lines(jnp.asarray(x)))
            refd = sfft.dst(x.astype(np.float64), type=4, axis=-1)
            assert np.abs(yd - refd).max() / np.abs(refd).max() < 2e-6, n
        # public routing + inverse roundtrip
        x = rng.standard_normal((3, 256)).astype(np.float32)
        y = r2r.dct(jnp.asarray(x), type=4, engine="pallas")
        back = np.asarray(r2r.idct(y, type=4, engine="pallas"))
        assert np.abs(back - x).max() < 1e-5
        yd = r2r.dst(jnp.asarray(x), type=4, engine="pallas")
        backd = np.asarray(r2r.idst(yd, type=4, engine="pallas"))
        assert np.abs(backd - x).max() < 1e-5
    finally:
        pe.set_interpret(False)
