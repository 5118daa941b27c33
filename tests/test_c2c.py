"""C2C correctness vs the numpy (FFTW-class) oracle — the analog of the
reference precision samples 11/12/14/18
(``sample_11_precision_VkFFT_single.cpp:289-323``: per-element diff norm vs
data norm), as a size matrix covering pow-2, mixed radix, direct primes,
Rader primes, and Bluestein sizes."""
import numpy as np
import pytest

import vkfft_tpu as vt

# pow-2 | mixed radix | direct primes | Rader primes | Bluestein
SIZES_1D = [1, 2, 4, 8, 16, 64, 256, 1024, 4096,
            6, 12, 15, 60, 120, 210, 360, 1000, 2310,
            17, 31, 61,
            67, 97, 101, 257, 641, 1009,
            10006, 919 * 2]
# 919: prime, 918=2*27*17 -> contains 17<=61 smooth -> Rader; 919*2 composite
# with large prime factor -> Bluestein.


def rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


@pytest.mark.parametrize("n", SIZES_1D)
def test_fft_1d_fp64(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    y = np.asarray(vt.fft(x, engine="jnp"))
    assert rel_err(y, np.fft.fft(x)) < 1e-11


@pytest.mark.parametrize("n", SIZES_1D)
def test_ifft_roundtrip_fp64(n):
    rng = np.random.default_rng(n + 1)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    z = np.asarray(vt.ifft(vt.fft(x, engine="jnp"), engine="jnp"))
    assert rel_err(z, x) < 1e-11


@pytest.mark.parametrize("n", [8, 256, 4096, 360, 97, 101, 1009])
def test_fft_1d_fp32(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))).astype(np.complex64)
    y = np.asarray(vt.fft(x, engine="jnp"))
    assert y.dtype == np.complex64
    # fp32 error grows ~log(n); bound matches reference FP32 precision curves
    assert rel_err(y, np.fft.fft(x.astype(np.complex128))) < 2e-6


@pytest.mark.parametrize("shape,axes", [
    ((8, 16), None),
    ((4, 6, 8), None),
    ((32, 32), (0,)),
    ((32, 32), (1,)),
    ((5, 12, 7), (1, 2)),
    ((16, 17, 4), None),
])
def test_fftn(shape, axes):
    rng = np.random.default_rng(int(np.prod(shape)))
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    y = np.asarray(vt.fftn(x, axes=axes, engine="jnp"))
    assert rel_err(y, np.fft.fftn(x, axes=axes)) < 1e-11
    z = np.asarray(vt.ifftn(y, axes=axes, engine="jnp"))
    assert rel_err(z, x) < 1e-11


def test_batch_dims():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32)) + 1j * rng.standard_normal((2, 3, 32))
    y = np.asarray(vt.fft(x, engine="jnp"))
    assert rel_err(y, np.fft.fft(x, axis=-1)) < 1e-11


def test_fft2():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 24, 16)) + 1j * rng.standard_normal((3, 24, 16))
    y = np.asarray(vt.fft2(x, engine="jnp"))
    assert rel_err(y, np.fft.fft2(x)) < 1e-11


def test_application_reuse():
    cfg = vt.FFTConfig(shape=(64,), normalize=True)
    app = vt.FFTApplication(cfg, engine="jnp")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 64)) + 1j * rng.standard_normal((5, 64))
    y = np.asarray(app.forward(x))
    assert rel_err(y, np.fft.fft(x)) < 1e-11
    z = np.asarray(app.inverse(y))
    assert rel_err(z, x) < 1e-11


def test_zeropad_input():
    # data outside [left, right) = [0, 8) is declared zero and ignored
    cfg = vt.FFTConfig(shape=(32,), zeropad_input=((8, 32),))
    app = vt.FFTApplication(cfg, engine="jnp")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32)) + 0j
    ref = x.copy()
    ref[:, 8:32] = 0
    y = np.asarray(app.forward(x))
    assert rel_err(y, np.fft.fft(ref)) < 1e-11


def test_fftn_4d():
    """4-D transform through the generic axis walk (reference default
    VKFFT_MAX_FFT_DIMENSIONS=4, vkFFT/vkFFT.h:70-102) — round-3 envelope."""
    rng = np.random.default_rng(44)
    for shape in [(8, 8, 8, 8), (4, 8, 16, 8), (3, 5, 8, 13)]:
        x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        y = np.asarray(vt.fftn(x, engine="jnp"))
        assert rel_err(y, np.fft.fftn(x)) < 1e-11, shape
        z = np.asarray(vt.ifftn(y, engine="jnp"))
        assert rel_err(z, x) < 1e-11, shape
    # 4-D via FFTApplication (config-driven path)
    app = vt.FFTApplication(vt.FFTConfig(shape=(4, 8, 8, 4), normalize=True),
                            engine="jnp")
    x = rng.standard_normal((2, 4, 8, 8, 4)) + 1j * rng.standard_normal((2, 4, 8, 8, 4))
    y = np.asarray(app.forward(x.astype(np.complex128)))
    assert rel_err(y, np.fft.fftn(x, axes=(-4, -3, -2, -1))) < 1e-11


def test_long_path_oracle_2e20():
    """Long-sequence multi-upload path vs the fp64 oracle at 2^20 and
    2^22 (reference envelope reaches 2^26, sample_11 matrix) — round 3."""
    rng = np.random.default_rng(45)
    for k in (20, 22):
        n = 1 << k
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        y = np.asarray(vt.fft(x, engine="jnp"))
        assert rel_err(y, np.fft.fft(x)) < 1e-10, k


def test_zeropad_output_pair_route():
    """Round 5 (verdict item 5): frequencyZeroPadding through the N-D pair
    route — forward writes of the declared-zero spectrum region elided,
    inverse reads skip it (``vkFFT_Structs.h:264-270`` applies per-axis to
    all kernels)."""
    import jax.numpy as jnp
    import numpy as np
    from vkfft_tpu import api
    from vkfft_tpu.config import FFTConfig
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar, to_numpy
    pe.set_interpret(True)
    try:
        shape = (64, 128, 128)
        app = api.FFTApplication(
            FFTConfig(shape=shape, normalize=True,
                      zeropad_output=((32, 64), (64, 128), (64, 128))),
            engine="pallas")
        assert app.zeropad_mode == "elided-pair-output"
        rng = np.random.default_rng(11)
        x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        f = app.forward(p)
        ref = np.fft.fftn(x)
        ref[32:] = 0
        ref[:, 64:] = 0
        ref[:, :, 64:] = 0
        err = np.max(np.abs(to_numpy(f) - ref)) / np.max(np.abs(ref))
        assert err < 5e-6, err
        b = app.inverse(f)
        refb = np.fft.ifftn(ref)
        err = np.max(np.abs(to_numpy(b) - refb)) / np.max(np.abs(refb))
        assert err < 5e-6, err
    finally:
        pe.set_interpret(False)


def test_zeropad_interior_inverse_restore():
    """Round 5: the inverse of an interior-window plan restores the
    declared-zero interior IN-KERNEL (no XLA mask pass)."""
    import jax.numpy as jnp
    import numpy as np
    from vkfft_tpu import api
    from vkfft_tpu.config import FFTConfig
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar, to_numpy
    pe.set_interpret(True)
    try:
        n = 1024
        app = api.FFTApplication(
            FFTConfig(shape=(n,), normalize=True,
                      zeropad_input=((256, 768),)), engine="pallas")
        assert "inverse in-kernel restore" in app.zeropad_mode
        rng = np.random.default_rng(13)
        x = rng.standard_normal((32, n)) + 1j * rng.standard_normal((32, n))
        x[:, 256:768] = 0
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        b = app.inverse(app.forward(p))
        got = to_numpy(b)
        assert np.max(np.abs(got - x)) / np.max(np.abs(x)) < 5e-6
        assert np.abs(got[:, 256:768]).max() == 0.0
    finally:
        pe.set_interpret(False)


def test_zeropad_bluestein_prefix_elision():
    """Round 5: a declared-zero input tail on a Bluestein plan narrows the
    fused kernel's read window (non-DIRECT elision — the reference's
    zero-pad guards are generic across kernels, vkFFT_Zeropad.h:28-182)."""
    import jax.numpy as jnp
    import numpy as np
    from vkfft_tpu import api
    from vkfft_tpu.config import FFTConfig
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar, to_numpy
    pe.set_interpret(True)
    try:
        n = 10007
        app = api.FFTApplication(
            FFTConfig(shape=(n,), normalize=True,
                      zeropad_input=((3000, n),)), engine="pallas")
        assert app.zeropad_mode.startswith("elided-prefix (bluestein")
        rng = np.random.default_rng(17)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        x[:, 3000:] = 0
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        f = app.forward(p)
        ref = np.fft.fft(x)
        assert np.max(np.abs(to_numpy(f) - ref)) / np.max(np.abs(ref)) < 5e-5
        b = app.inverse(f)
        assert np.max(np.abs(to_numpy(b) - x)) / np.max(np.abs(x)) < 5e-5
    finally:
        pe.set_interpret(False)


def test_zeropad_axes_route():
    """Round 5: general N-D per-axis prefix elision for shapes the pair
    kernel cannot take (each pass elides its own axis window; reference
    per-axis zero-pad guards are kernel-generic, vkFFT_Zeropad.h)."""
    import jax.numpy as jnp
    import numpy as np
    from vkfft_tpu import api
    from vkfft_tpu.config import FFTConfig
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar, to_numpy
    pe.set_interpret(True)
    try:
        shape = (512, 512)   # ny*nz > _PAIR_MAX_PTS: no pair route
        app = api.FFTApplication(
            FFTConfig(shape=shape, normalize=True,
                      zeropad_input=tuple((d // 2, d) for d in shape)),
            engine="pallas")
        assert app.zeropad_mode == "elided-axes"
        rng = np.random.default_rng(19)
        x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        x[256:] = 0
        x[:, 256:] = 0
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        f = app.forward(p)
        ref = np.fft.fftn(x)
        assert np.max(np.abs(to_numpy(f) - ref)) / np.max(np.abs(ref)) < 5e-6
        b = app.inverse(f)
        assert np.max(np.abs(to_numpy(b) - x)) / np.max(np.abs(x)) < 5e-6
    finally:
        pe.set_interpret(False)
