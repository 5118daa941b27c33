"""In-kernel normalization (``scale=``): the 1/N multiply rides the kernel
stage tables instead of a separate elementwise HBM pass — the reference's
stageNormalization (``vkFFT_RadixShuffle.h:49-65``) as host constant folding.

Covers every algorithm path on both engines, the strided-axis kernel, and
the app-level normalize flag that now routes through it."""
import numpy as np
import jax.numpy as jnp
import pytest

import vkfft_tpu as vt
from vkfft_tpu.pcomplex import Planar, to_numpy
from vkfft_tpu.planner import plan_axis
from vkfft_tpu.ops import pallas_engine as pe, jnp_engine as je


@pytest.fixture(autouse=True)
def _interpret():
    pe.set_interpret(True)
    yield
    pe.set_interpret(False)


def _mk(b, n, seed=0):
    rng = np.random.default_rng(seed)
    return Planar(jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)),
                  jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)))


# one n per algorithm/kernel family: v3, v3-large, v2 (67 > 64 lane factor),
# SPLIT, RADER, BLUESTEIN, long path, tiny
SCALE_SIZES = [1024, 134, 262, 131, 10007, 32768, 8]


@pytest.mark.parametrize("n", SCALE_SIZES)
@pytest.mark.parametrize("inverse", [False, True])
def test_scale_matches_postmultiply_pallas(n, inverse):
    plan = plan_axis(n)
    x = _mk(4, n)
    s = 1.0 / n
    got = pe.fft_lines_p(x, plan, inverse, scale=s)
    ref = pe.fft_lines_p(x, plan, inverse) * np.float32(s)
    scale_mag = np.max(np.abs(to_numpy(ref))) + 1e-30
    err = np.max(np.abs(to_numpy(got) - to_numpy(ref))) / scale_mag
    assert err < 2e-6, (n, inverse, err)


@pytest.mark.parametrize("n", [1024, 262, 131, 10007])
def test_scale_matches_postmultiply_jnp(n):
    plan = plan_axis(n)
    x = _mk(4, n)
    s = 1.0 / n
    got = je.fft_lines_p(x, plan, True, scale=s)
    ref = je.fft_lines_p(x, plan, True) * np.float32(s)
    err = np.max(np.abs(to_numpy(got) - to_numpy(ref)))
    assert err < 1e-6 * (np.max(np.abs(to_numpy(ref))) + 1e-30)


def test_scale_strided_axis():
    plan = plan_axis(256)
    rng = np.random.default_rng(1)
    x = Planar(jnp.asarray(rng.standard_normal((2, 256, 128)).astype(np.float32)),
               jnp.asarray(rng.standard_normal((2, 256, 128)).astype(np.float32)))
    got = pe.fft_axis_p(x, 1, plan, True, scale=0.25)
    ref = pe.fft_axis_p(x, 1, plan, True) * np.float32(0.25)
    assert np.max(np.abs(to_numpy(got) - to_numpy(ref))) < 1e-6


@pytest.mark.parametrize("shape", [(64,), (16, 32)])
def test_app_normalize_roundtrip(shape):
    """normalize=True inverse (in-kernel scale) still reproduces the input."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    cfg = vt.FFTConfig(shape=shape, normalize=True)
    app = vt.FFTApplication(cfg)
    xp = Planar(jnp.asarray(x.real.astype(np.float32)),
                jnp.asarray(x.imag.astype(np.float32)))
    back = to_numpy(app.inverse(app.forward(xp)))
    assert np.max(np.abs(back - x)) < 1e-4 * np.max(np.abs(x))


def test_app_normalize_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 96)) + 1j * rng.standard_normal((8, 96))
    got = to_numpy(vt.ifft(Planar(jnp.asarray(x.real.astype(np.float32)),
                                  jnp.asarray(x.imag.astype(np.float32)))))
    ref = np.fft.ifft(x, axis=-1)
    assert np.max(np.abs(got - ref)) < 1e-5 * np.max(np.abs(ref))
