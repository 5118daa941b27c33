"""Precision tier plumbing through FFTApplication: DOUBLE (double-double),
HALF/BFLOAT16 storage (reference: halfPrecision/doublePrecision config flags,
``vkFFT_Structs.h:187-199``)."""
import numpy as np
import pytest

import vkfft_tpu as vt
from vkfft_tpu.config import Precision
from vkfft_tpu.pcomplex import Planar, from_complex, to_numpy
from vkfft_tpu.precision.doubledouble import ddc_from_complex128, ddc_to_complex128


def rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


def test_ddcomplex_application():
    n = 64
    cfg = vt.FFTConfig(shape=(n,), precision=Precision.DOUBLE, normalize=True)
    app = vt.FFTApplication(cfg, engine="jnp")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    xd = ddc_from_complex128(x)
    y = app.forward(xd)
    got = ddc_to_complex128(y)
    assert rel_err(got, np.fft.fft(x)) < 1e-10
    z = ddc_to_complex128(app.inverse(y))
    assert rel_err(z, x) < 1e-10


def test_ddcomplex_2d():
    shape = (8, 16)
    cfg = vt.FFTConfig(shape=shape, precision=Precision.DOUBLE, normalize=True)
    app = vt.FFTApplication(cfg, engine="jnp")
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    y = ddc_to_complex128(app.forward(ddc_from_complex128(x)))
    assert rel_err(y, np.fft.fftn(x)) < 1e-10


def test_double_config_host_complex(monkeypatch):
    """Config-level fp64 on a complex-free backend (verdict item 6): a
    DOUBLE-precision application accepts host complex128 directly — the
    boundary converts through ddc_from_complex128 and back — and Planar
    fp32 pairs widen in-trace.  Reference: one-flag ``doublePrecision``
    (``vkFFT_Structs.h:187``)."""
    from vkfft_tpu import api
    monkeypatch.setattr(api, "complex_supported", lambda: False)
    n = 64
    cfg = vt.FFTConfig(shape=(n,), precision=Precision.DOUBLE, normalize=True)
    app = vt.FFTApplication(cfg, engine="jnp")
    rng = np.random.default_rng(7)
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    y = app.forward(x)          # host complex128 in ...
    assert isinstance(y, np.ndarray) and y.dtype == np.complex128
    assert rel_err(y, np.fft.fft(x)) < 1e-10
    z = app.inverse(y)          # ... and back out
    assert rel_err(z, x) < 1e-10
    # Planar fp32 pairs widen in-trace (lo planes zero) instead of raising
    p = from_complex(x.astype(np.complex64))
    yd = app.forward(p)
    got = ddc_to_complex128(yd)
    assert rel_err(got, np.fft.fft(x)) < 1e-5  # fp32 input floor


@pytest.mark.parametrize("prec,tol", [(Precision.BFLOAT16, 5e-2), (Precision.HALF, 5e-3)])
def test_storage_precision(prec, tol):
    import jax.numpy as jnp
    n = 128
    cfg = vt.FFTConfig(shape=(n,), precision=prec)
    app = vt.FFTApplication(cfg, engine="jnp")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
    p = from_complex(x.astype(np.complex64))
    y = app.forward(p)
    got = (np.asarray(y.re, dtype=np.float64) + 1j * np.asarray(y.im, dtype=np.float64))
    assert rel_err(got, np.fft.fft(x)) < tol
