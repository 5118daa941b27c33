"""Config-driven transform kinds: R2C/DCT/DST must execute through the one
config struct, exactly like the reference's performR2C/performDCT/performDST
flags (``vkFFT_Structs.h:201-203``, dispatch ``vkFFT_Plan_FFT.h:682-696``)."""
import numpy as np
import pytest
import scipy.fft as sfft

from vkfft_tpu import FFTApplication, FFTConfig, TransformKind
from vkfft_tpu.errors import InvalidConfigError


def test_r2c_kind_forward_inverse():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 64)).astype(np.float32)
    app = FFTApplication(FFTConfig(shape=(64,), kind=TransformKind.R2C))
    X = np.asarray(app.forward(x))
    ref = np.fft.rfft(x, axis=-1)
    assert X.shape == (5, 33)
    np.testing.assert_allclose(X, ref, rtol=0, atol=1e-4 * np.abs(ref).max())
    back = np.asarray(app.inverse(X))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-5)


def test_r2c_kind_2d():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 32)).astype(np.float32)
    app = FFTApplication(FFTConfig(shape=(8, 32), kind=TransformKind.R2C))
    X = np.asarray(app.forward(x))
    ref = np.fft.rfftn(x)
    assert X.shape == (8, 17)
    np.testing.assert_allclose(X, ref, rtol=0, atol=1e-4 * np.abs(ref).max())
    back = np.asarray(app.inverse(X))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-5)


@pytest.mark.parametrize("rr_type", [1, 2, 3, 4])
@pytest.mark.parametrize("kind", [TransformKind.DCT, TransformKind.DST])
def test_r2r_kinds(kind, rr_type):
    rng = np.random.default_rng(2)
    n = 30 if rr_type != 1 else 31
    x = rng.standard_normal((3, n)).astype(np.float32)
    app = FFTApplication(FFTConfig(shape=(n,), kind=kind, rr_type=rr_type))
    y = np.asarray(app.forward(x))
    sp = sfft.dct if kind is TransformKind.DCT else sfft.dst
    ref = sp(x.astype(np.float64), type=rr_type, axis=-1)
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-3 * np.abs(ref).max())
    back = np.asarray(app.inverse(y))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-4)


def test_dct_kind_2d():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((6, 10)).astype(np.float32)
    app = FFTApplication(FFTConfig(shape=(6, 10), kind=TransformKind.DCT, rr_type=2))
    y = np.asarray(app.forward(x))
    ref = sfft.dctn(x.astype(np.float64), type=2)
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-3 * np.abs(ref).max())
    back = np.asarray(app.inverse(y))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-4)


def test_batch_field_is_validated():
    app = FFTApplication(FFTConfig(shape=(16,), batch=4))
    rng = np.random.default_rng(4)
    ok = rng.standard_normal((4, 16)).astype(np.complex64)
    app.forward(ok)  # (4, 16) matches batch=4
    bad = rng.standard_normal((3, 16)).astype(np.complex64)
    with pytest.raises(InvalidConfigError, match="batch"):
        app.forward(bad)


def test_batch_field_multidim_lead():
    app = FFTApplication(FFTConfig(shape=(16,), batch=6))
    x = np.random.default_rng(5).standard_normal((2, 3, 16)).astype(np.complex64)
    app.forward(x)  # 2*3 == 6


def test_convolution_config_rejected_with_pointer():
    with pytest.raises(InvalidConfigError, match="ConvolutionApplication"):
        FFTApplication(FFTConfig(shape=(16,), convolution=True))


def test_r2c_kind_wrong_shape_raises():
    app = FFTApplication(FFTConfig(shape=(64,), kind=TransformKind.R2C))
    with pytest.raises(InvalidConfigError):
        app.forward(np.zeros((5, 32), np.float32))


def test_set_compute_mode_flags():
    import vkfft_tpu as vt
    from vkfft_tpu.ops import pallas_engine as pe
    try:
        vt.set_compute_mode("fp32_int8")
        assert pe._V3_MXU_INT8 and pe._PRECISION is __import__("jax").lax.Precision.HIGHEST
        vt.set_compute_mode("bf16")
        assert not pe._V3_MXU_INT8
        vt.set_compute_mode("fp32")
        assert pe._PRECISION is __import__("jax").lax.Precision.HIGHEST
        import pytest
        with pytest.raises(ValueError):
            vt.set_compute_mode("nope")
    finally:
        vt.set_compute_mode("fp32")
