"""Convolution tests — identity-kernel and oracle checks (analog of reference
functional samples 50-52, e.g.
``sample_50_convolution_VkFFT_single_1d_matrix.cpp``)."""
import numpy as np
import pytest

import vkfft_tpu as vt
from vkfft_tpu.config import FFTConfig


def rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


@pytest.fixture
def _pallas_interpret():
    from vkfft_tpu.ops import pallas_engine
    pallas_engine.set_interpret(True)
    yield
    pallas_engine.set_interpret(False)


def test_fused_conv_app_1d_scalar(_pallas_interpret):
    """App-level routing: 1-D scalar conv on the pallas engine takes the
    single-kernel fused path (mode v3_1d) and matches the oracle."""
    from vkfft_tpu.pcomplex import Planar
    import jax.numpy as jnp
    n = 256
    rng = np.random.default_rng(11)
    x = rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
    h = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    cfg = FFTConfig(shape=(n,), convolution=True)
    app = vt.ConvolutionApplication(cfg, h, engine="pallas")
    assert app._fused is not None and app._fused[0] == "v3_1d"
    xp = Planar(jnp.asarray(x.real.astype(np.float32)),
                jnp.asarray(x.imag.astype(np.float32)))
    out = app(xp)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    ref = np.fft.ifft(np.fft.fft(x) * np.fft.fft(h))
    assert rel_err(got, ref) < 5e-6


def test_fused_conv_app_2d_rows(_pallas_interpret):
    """App-level routing: N-D scalar conv fuses the last axis (mode
    v3_rows) with only strided passes around it."""
    from vkfft_tpu.pcomplex import Planar
    import jax.numpy as jnp
    # ny*nz above the conv-pair VMEM cap: the single-kernel two-axis mode
    # declines and the last-axis-fused form is selected instead
    shape = (256, 512)
    rng = np.random.default_rng(12)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    h = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    cfg = FFTConfig(shape=shape, convolution=True)
    app = vt.ConvolutionApplication(cfg, h, engine="pallas")
    assert app._fused is not None and app._fused[0] == "v3_rows"
    xp = Planar(jnp.asarray(x.real.astype(np.float32)),
                jnp.asarray(x.imag.astype(np.float32)))
    out = app(xp)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    ref = np.fft.ifft2(np.fft.fft2(x) * np.fft.fft2(h))
    assert rel_err(got, ref) < 5e-6


def test_fused_conv_app_matrix(_pallas_interpret):
    """App-level routing: 1-D 3x3 matrix conv in one kernel (mode v3_mat)."""
    from vkfft_tpu.pcomplex import Planar
    import jax.numpy as jnp
    n, m = 256, 3
    rng = np.random.default_rng(13)
    x = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    kern = rng.standard_normal((m, m, n)) + 1j * rng.standard_normal((m, m, n))
    cfg = FFTConfig(shape=(n,), convolution=True, matrix_convolution=m,
                    coordinate_features=m)
    app = vt.ConvolutionApplication(cfg, kern, engine="pallas")
    assert app._fused is not None and app._fused[0] == "v3_mat"
    xp = Planar(jnp.asarray(x.real.astype(np.float32)),
                jnp.asarray(x.imag.astype(np.float32)))
    out = app(xp)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    K = np.fft.fft(kern)
    ref = np.fft.ifft(np.einsum("oin,in->on", K, np.fft.fft(x)))
    assert rel_err(got, ref) < 5e-6


def test_fftconvolve_vs_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64) + 0j
    h = rng.standard_normal(64) + 0j
    y = np.asarray(vt.fftconvolve(x, h, engine="jnp"))
    ref = np.fft.ifft(np.fft.fft(x) * np.fft.fft(h))
    assert rel_err(y, ref) < 1e-11


def test_identity_kernel_scalar():
    # delta kernel -> circular convolution is the identity (sample 50 pattern)
    n = 32
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, n)) + 0j
    delta = np.zeros(n)
    delta[0] = 1.0
    cfg = FFTConfig(shape=(n,), convolution=True)
    app = vt.ConvolutionApplication(cfg, delta, engine="jnp")
    y = np.asarray(app(x))
    assert rel_err(y, x) < 1e-11


def test_identity_kernel_matrix_3x3():
    # 3x3 identity matrix kernel (sample 50: identity-matrix convolution)
    n = 16
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, n)) + 0j  # (coord=3, n)
    kern = np.zeros((3, 3, n))
    for c in range(3):
        kern[c, c, 0] = 1.0
    cfg = FFTConfig(shape=(n,), convolution=True, matrix_convolution=3,
                    coordinate_features=3)
    app = vt.ConvolutionApplication(cfg, kern, engine="jnp")
    y = np.asarray(app(x))
    assert rel_err(y, x) < 1e-11


def test_matrix_convolution_oracle():
    n = 8
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    kern = rng.standard_normal((2, 2, n)) + 0j
    cfg = FFTConfig(shape=(n,), convolution=True, matrix_convolution=2,
                    coordinate_features=2)
    app = vt.ConvolutionApplication(cfg, kern, engine="jnp")
    y = np.asarray(app(x))
    Kf = np.fft.fft(kern, axis=-1)
    Xf = np.fft.fft(x, axis=-1)
    Yf = np.einsum("oiu,iu->ou", Kf, Xf)
    ref = np.fft.ifft(Yf, axis=-1)
    assert rel_err(y, ref) < 1e-11


def test_multi_kernel_batch():
    n = 16
    K = 3
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n) + 0j
    kerns = rng.standard_normal((K, n)) + 0j
    cfg = FFTConfig(shape=(n,), convolution=True, number_kernels=K)
    app = vt.ConvolutionApplication(cfg, kerns, engine="jnp")
    y = np.asarray(app(x))
    assert y.shape == (K, n)
    for k in range(K):
        ref = np.fft.ifft(np.fft.fft(x) * np.fft.fft(kerns[k]))
        assert rel_err(y[k], ref) < 1e-11


def test_conjugate_and_cross_power():
    # phase correlation: x correlated with a rolled copy peaks at the shift
    n = 64
    rng = np.random.default_rng(5)
    x = rng.standard_normal(n)
    shift = 11
    moved = np.roll(x, shift)
    cfg = FFTConfig(shape=(n,), convolution=True, conjugate_convolution=1,
                    cross_power_spectrum_normalization=True)
    app = vt.ConvolutionApplication(cfg, x + 0j, engine="jnp")
    corr = np.asarray(app(moved + 0j))
    assert int(np.argmax(np.abs(corr))) == shift


def test_2d_convolution():
    shape = (8, 16)
    rng = np.random.default_rng(6)
    x = rng.standard_normal(shape) + 0j
    h = rng.standard_normal(shape) + 0j
    cfg = FFTConfig(shape=shape, convolution=True)
    app = vt.ConvolutionApplication(cfg, h, engine="jnp")
    y = np.asarray(app(x))
    ref = np.fft.ifft2(np.fft.fft2(x) * np.fft.fft2(h))
    assert rel_err(y, ref) < 1e-11


def test_zeropadded_linear_convolution():
    # linear convolution via circular transform with declared-zero tails
    # (reference README.md:15-16: zero padding makes circular conv linear)
    n = 64
    sig_len, ker_len = 24, 16
    rng = np.random.default_rng(11)
    x = np.zeros(n)
    x[:sig_len] = rng.standard_normal(sig_len)
    h = np.zeros(n)
    h[:ker_len] = rng.standard_normal(ker_len)
    cfg = FFTConfig(shape=(n,), convolution=True,
                    zeropad_input=((sig_len, n),))
    app = vt.ConvolutionApplication(cfg, h + 0j, engine="jnp")
    y = np.asarray(app(x + 0j))
    ref = np.convolve(x[:sig_len], h[:ker_len])  # linear conv, len 39 < 64
    assert np.abs(y[: sig_len + ker_len - 1] - ref).max() < 1e-10


def test_fused_conv_app_pair(_pallas_interpret):
    """App-level routing: 2-D and 3-D scalar convs with pair-eligible minor
    axes take the single-kernel two-axis path (mode 'pair') — a 2-D conv is
    ONE HBM read+write total."""
    from vkfft_tpu.pcomplex import Planar
    import jax.numpy as jnp
    rng = np.random.default_rng(17)
    for shape in ((128, 128), (4, 128, 128)):
        h = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        x = (rng.standard_normal((2,) + shape)
             + 1j * rng.standard_normal((2,) + shape))
        cfg = FFTConfig(shape=shape, convolution=True)
        app = vt.ConvolutionApplication(cfg, h.astype(np.complex64),
                                        engine="pallas")
        assert app._fused is not None and app._fused[0] == "pair", shape
        xp = Planar(jnp.asarray(x.real.astype(np.float32)),
                    jnp.asarray(x.imag.astype(np.float32)))
        out = app(xp)
        got = np.asarray(out.re) + 1j * np.asarray(out.im)
        axes = tuple(range(-len(shape), 0))
        ref = np.fft.ifftn(np.fft.fftn(x, axes=axes)
                           * np.fft.fftn(h, axes=axes), axes=axes)
        assert rel_err(got, ref) < 5e-6


def test_fused_conv_pair_conjugate(_pallas_interpret):
    """conjugate_convolution variants ride the pair kernel in-kernel."""
    from vkfft_tpu.pcomplex import Planar
    import jax.numpy as jnp
    shape = (128, 128)
    rng = np.random.default_rng(18)
    h = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    x = (rng.standard_normal((2,) + shape)
         + 1j * rng.standard_normal((2,) + shape))
    X = np.fft.fft2(x)
    H = np.fft.fft2(h)
    for cc, ref_spec in ((1, X * np.conj(H)), (2, np.conj(X) * H)):
        cfg = FFTConfig(shape=shape, convolution=True,
                        conjugate_convolution=cc)
        app = vt.ConvolutionApplication(cfg, h.astype(np.complex64),
                                        engine="pallas")
        assert app._fused is not None and app._fused[0] == "pair"
        xp = Planar(jnp.asarray(x.real.astype(np.float32)),
                    jnp.asarray(x.imag.astype(np.float32)))
        out = app(xp)
        got = np.asarray(out.re) + 1j * np.asarray(out.im)
        ref = np.fft.ifft2(ref_spec)
        assert rel_err(got, ref) < 5e-6, cc


def test_linear_2d_conv_pair_elision(_pallas_interpret):
    """Linear 2-D convolution: declared-zero input windows are read-elided
    and the discarded output region write-elided, all inside the single
    pair kernel (reference conv+zeropad composition, README.md:15-16)."""
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    rng = np.random.default_rng(19)
    ny = nz = 128
    hy = hz = 64
    ky = kz = 16
    x = np.zeros((2, ny, nz), dtype=np.complex64)
    x[:, :hy, :hz] = (rng.standard_normal((2, hy, hz))
                      + 1j * rng.standard_normal((2, hy, hz))).astype(np.complex64)
    h = np.zeros((ny, nz), dtype=np.complex64)
    h[:ky, :kz] = rng.standard_normal((ky, kz)).astype(np.float32)
    cfg = FFTConfig(shape=(ny, nz), convolution=True,
                    zeropad_input=((hy, ny), (hz, nz)),
                    zeropad_output=((hy + ky - 1, ny), (hz + kz - 1, nz)))
    app = vt.ConvolutionApplication(cfg, h, engine="pallas")
    assert app._fused is not None and app._fused[0] == "pair"
    got = to_numpy(app(from_complex(x)))
    H = np.fft.fft2(h.astype(np.complex128))
    full = np.fft.ifft2(np.fft.fft2(x.astype(np.complex128), axes=(1, 2)) * H,
                        axes=(1, 2))
    ref = np.zeros_like(full)
    ref[:, :hy + ky - 1, :hz + kz - 1] = full[:, :hy + ky - 1, :hz + kz - 1]
    assert rel_err(got, ref) < 5e-6
    assert np.abs(got[:, hy + ky - 1:, :]).max() == 0.0


def test_conv_3d_all_axes_zeropad_elision(_pallas_interpret):
    """Sample-51 pattern: 3-D convolution with declared-zero windows on all
    axes — outer strided reads and minor pair reads are both elided."""
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    rng = np.random.default_rng(63)
    n0, ny, nz = 8, 128, 128
    h0, hy, hz = 4, 64, 64
    shape = (n0, ny, nz)
    x = np.zeros(shape, dtype=np.complex64)
    x[:h0, :hy, :hz] = (rng.standard_normal((h0, hy, hz))
                        + 1j * rng.standard_normal((h0, hy, hz))).astype(np.complex64)
    h = np.zeros(shape, dtype=np.complex64)
    h[:2, :8, :8] = rng.standard_normal((2, 8, 8)).astype(np.float32)
    cfg = FFTConfig(shape=shape, convolution=True,
                    zeropad_input=((h0, n0), (hy, ny), (hz, nz)))
    app = vt.ConvolutionApplication(cfg, h, engine="pallas")
    assert app._fused is not None and app._fused[0] == "pair"
    got = to_numpy(app(from_complex(x)))
    axes = (0, 1, 2)
    ref = np.fft.ifftn(
        np.fft.fftn(x.astype(np.complex128), axes=axes)
        * np.fft.fftn(h.astype(np.complex128), axes=axes), axes=axes)
    assert rel_err(got, ref) < 2e-6


def test_fusion_mode_observable():
    """Configs that lose the fused fast path are not silent: fusion_mode and
    debug.describe expose the decision (round-1 review item)."""
    import numpy as np
    from vkfft_tpu import FFTConfig, debug
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.transforms.conv import ConvolutionApplication

    pe.set_interpret(True)
    try:
        k = np.random.default_rng(0).standard_normal(64).astype(np.complex64)
        fused = ConvolutionApplication(
            FFTConfig(shape=(64,), convolution=True), k, engine="pallas")
        assert fused.fusion_mode is not None
        assert f"fusion={fused.fusion_mode}" in debug.describe(fused)
        unfused = ConvolutionApplication(
            FFTConfig(shape=(64,), convolution=True, number_kernels=2),
            np.stack([k, k]), engine="pallas")
        assert unfused.fusion_mode is None
        assert "none" in debug.describe(unfused)
    finally:
        pe.set_interpret(False)


def test_conv_pair_zeropad_compute_pruning():
    """Round 5 (verdict item 6): conv_fused_pair prunes the forward stage
    sets for declared-zero input corners (the reference's zero-padded conv
    benchmark geometry, sample_51_..._zeropadding_r2c.cpp)."""
    import jax.numpy as jnp
    import numpy as np
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(51)
        ny = nz = 128
        x = np.zeros((2, ny, nz), np.complex128)
        x[:, :64, :64] = (rng.standard_normal((2, 64, 64))
                          + 1j * rng.standard_normal((2, 64, 64)))
        h = rng.standard_normal((ny, nz)) + 1j * rng.standard_normal((ny, nz))
        H = np.fft.fft2(h)
        ref = np.fft.ifft2(np.fft.fft2(x, axes=(1, 2)) * H[None], axes=(1, 2))
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        Ht = np.ascontiguousarray(np.swapaxes(H, 0, 1))
        y = pe.conv_fused_pair(p, ny, nz, Ht, scale=1.0 / (ny * nz),
                               in_keep=(64, 64))
        got = np.asarray(y.re) + 1j * np.asarray(y.im)
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6
    finally:
        pe.set_interpret(False)
