"""Double-double tier tests (reference quad-precision analog, sample 19 /
``sample_19_precision_VkFFT_quadDoubleDouble.cpp``): target ~2^-48 relative
accuracy from fp32 pairs."""
import numpy as np
import pytest

from vkfft_tpu.precision import dd_add, dd_from_f64, dd_mul, dd_to_f64
from vkfft_tpu.precision.dd_fft import fft_dd


def test_dd_roundtrip_split():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000)
    # split is exact to fp32-pair resolution (~2^-48)
    err = np.abs(dd_to_f64(dd_from_f64(a)) - a)
    assert err.max() < 1e-13


def test_dd_mul_precision():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(512)
    b = rng.standard_normal(512)
    got = dd_to_f64(dd_mul(dd_from_f64(a), dd_from_f64(b)))
    err = np.abs(got - a * b) / np.abs(a * b)
    assert err.max() < 1e-13


def test_dd_add_precision():
    rng = np.random.default_rng(2)
    a = rng.standard_normal(512)
    b = rng.standard_normal(512) * 1e-8
    got = dd_to_f64(dd_add(dd_from_f64(a), dd_from_f64(b)))
    err = np.abs(got - (a + b))
    assert err.max() < 1e-13


@pytest.mark.parametrize("n", [8, 16, 64, 60, 100, 256, 101])
def test_dd_fft_accuracy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    y = fft_dd(x)
    ref = np.fft.fft(x)
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    # ~2^-48 class; far beyond fp32's 1e-7
    assert rel < 5e-12


def test_dd_fft_roundtrip():
    n = 64
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    z = fft_dd(fft_dd(x), inverse=True, normalize=True)
    assert np.abs(z - x).max() < 1e-12
