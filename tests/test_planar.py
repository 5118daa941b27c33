"""Planar (complex-free) path tests — the representation used on TPU backends
without complex-dtype support (axon).  Runs on CPU against the complex
oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vkfft_tpu as vt
from vkfft_tpu.pcomplex import Planar, from_complex, to_numpy
from vkfft_tpu.ops import jnp_engine, pallas_engine
from vkfft_tpu.planner import plan_axis


def rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


def _mk(n, batch=3, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed + n)
    x = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    if dtype == np.float32:
        x = x.astype(np.complex64)
    return x


@pytest.mark.parametrize("n", [8, 60, 256, 97, 101, 1009, 10006, 254])
def test_planar_jnp_engine(n):
    x = _mk(n)
    p = from_complex(x)
    y = to_numpy(jnp_engine.fft_lines_p(p, plan_axis(n)))
    assert rel_err(y, np.fft.fft(x)) < 1e-11


@pytest.mark.parametrize("n", [8, 64, 360, 97, 101])
def test_planar_pallas_engine(n):
    pallas_engine.set_interpret(True)
    try:
        x = _mk(n, dtype=np.float32)
        p = from_complex(x)
        y = to_numpy(pallas_engine.fft_lines_p(p, plan_axis(n)))
        assert rel_err(y, np.fft.fft(x.astype(np.complex128))) < 5e-6
    finally:
        pallas_engine.set_interpret(False)


def test_planar_roundtrip_axis():
    x = _mk(32, batch=4)
    p = from_complex(x.reshape(4, 32))
    plan = plan_axis(4)
    y = jnp_engine.fft_axis_p(p, 0, plan)
    ref = np.fft.fft(x.reshape(4, 32), axis=0)
    assert rel_err(to_numpy(y), ref) < 1e-11


def test_planar_api_fftn():
    x = _mk(64)
    p = from_complex(x)
    y = vt.fftn(p, axes=(-1,), engine="jnp")
    assert isinstance(y, Planar)
    assert rel_err(to_numpy(y), np.fft.fft(x)) < 1e-11
    z = vt.fftn(y, axes=(-1,), engine="jnp", inverse=True)
    assert rel_err(to_numpy(z), x) < 1e-11


def test_planar_pytree():
    p = Planar(jnp.ones((2, 4)), jnp.zeros((2, 4)))
    q = jax.jit(lambda v: v * 2.0)(p)
    assert isinstance(q, Planar)
    assert np.allclose(np.asarray(q.re), 2.0)


def test_planar_application():
    cfg = vt.FFTConfig(shape=(16, 8), normalize=True)
    app = vt.FFTApplication(cfg, engine="jnp")
    x = _mk(16 * 8, batch=1).reshape(16, 8)
    p = from_complex(x)
    y = app.forward(p)
    assert rel_err(to_numpy(y), np.fft.fftn(x)) < 1e-11
    z = app.inverse(y)
    assert rel_err(to_numpy(z), x) < 1e-11


def test_keep_intermediate_order():
    """disableReorderFourStep analog: the flag promises a reorder-free
    fwd+inv round trip in *some* consistent intermediate order.  v3 sizes
    are natural-order native (no reorder pass exists to skip); pre-v3 sizes
    return the v2 swapped digit order."""
    from vkfft_tpu.ops import pallas_engine
    pallas_engine.set_interpret(True)
    try:
        n = 256
        cfg = vt.FFTConfig(shape=(n,), normalize=True, keep_intermediate_order=True)
        app = vt.FFTApplication(cfg, engine="pallas")
        x = _mk(n, batch=4, dtype=np.float32)
        p = from_complex(x)
        Y = app.forward(p)
        # round trip restores exactly whatever the intermediate order is
        z = to_numpy(app.inverse(Y))
        assert rel_err(z, x) < 5e-6
        nat = np.fft.fft(x.astype(np.complex128))
        sw = to_numpy(Y)
        if pallas_engine._use_v3(n):
            # round 3: v3 sizes return the OPAQUE transposed-intermediate
            # (steps, n, gb) layout (no exit transpose — the
            # disableReorderFourStep economy); contents are the natural
            # spectrum with lines in lanes
            steps, nn, gb = sw.shape
            assert nn == n
            re_nat = np.moveaxis(sw, 1, 2).reshape(steps * gb, n)[:4]
            assert rel_err(re_nat, nat) < 5e-6
        else:
            # v2 swapped digit order
            n1, n2 = pallas_engine.split_lane_major(n)
            assert rel_err(sw.reshape(4, n2, n1),
                           nat.reshape(4, n1, n2).swapaxes(1, 2)) < 5e-6
    finally:
        pallas_engine.set_interpret(False)


def test_tl_spectrum_no_shape_collision():
    """Round-3 advice (medium): two forwards whose padded tl intermediates
    share a SHAPE (e.g. batches 100 and 128 both padding to one 128-line
    block) must each round-trip to their own batch — the contract rides the
    TlSpectrum value, not app side-state."""
    from vkfft_tpu.ops import pallas_engine
    from vkfft_tpu.pcomplex import TlSpectrum
    pallas_engine.set_interpret(True)
    try:
        n = 256
        cfg = vt.FFTConfig(shape=(n,), normalize=True,
                           keep_intermediate_order=True)
        app = vt.FFTApplication(cfg, engine="pallas")
        xa = _mk(n, batch=100, dtype=np.float32)
        xb = _mk(n, batch=128, dtype=np.float32)
        Ya = app.forward(from_complex(xa))
        Yb = app.forward(from_complex(xb))
        assert isinstance(Ya, TlSpectrum) and isinstance(Yb, TlSpectrum)
        assert Ya.shape == Yb.shape  # the collision the dict keying broke on
        za = to_numpy(app.inverse(Ya))
        zb = to_numpy(app.inverse(Yb))
        assert za.shape == (100, n) and zb.shape == (128, n)
        assert rel_err(za, xa) < 5e-6
        assert rel_err(zb, xb) < 5e-6
    finally:
        pallas_engine.set_interpret(False)


def test_tl_spectrum_pair_2d():
    """keep_intermediate_order on the N-D pair path (round 4): the 2-D
    forward returns the opaque (nz, ny) kernel-state TlSpectrum; the
    inverse (of any app instance with the same config) restores natural
    planes — one in-tile transpose saved per direction."""
    from vkfft_tpu.ops import pallas_engine
    from vkfft_tpu.pcomplex import TlSpectrum
    pallas_engine.set_interpret(True)
    try:
        ny, nz = 128, 256
        cfg = vt.FFTConfig(shape=(ny, nz), normalize=True,
                           keep_intermediate_order=True)
        app = vt.FFTApplication(cfg, engine="pallas")
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((2, ny, nz))
             + 1j * rng.standard_normal((2, ny, nz))).astype(np.complex64)
        Y = app.forward(from_complex(x))
        assert isinstance(Y, TlSpectrum) and Y.n2 == nz
        assert Y.shape[-2:] == (nz, ny)
        # contents are the natural 2-D spectrum, transposed
        ref = np.fft.fft2(x.astype(np.complex128))
        got = np.swapaxes(to_numpy(Y), -2, -1)
        assert rel_err(got, ref) < 5e-6
        # a fresh app instance inverts it (contract rides the value)
        app2 = vt.FFTApplication(cfg, engine="pallas")
        z = to_numpy(app2.inverse(Y))
        assert rel_err(z, x) < 5e-6
    finally:
        pallas_engine.set_interpret(False)


def test_tl_spectrum_survives_plan_reload():
    """Verdict item 9: a reloaded application (plan blob round trip) can
    invert a tl forward produced by the original app — the
    disableReorderFourStep contract is declarative, not side-stateful."""
    from vkfft_tpu import cache
    from vkfft_tpu.ops import pallas_engine
    from vkfft_tpu.pcomplex import TlSpectrum
    pallas_engine.set_interpret(True)
    try:
        n = 256
        cfg = vt.FFTConfig(shape=(n,), normalize=True,
                           keep_intermediate_order=True)
        app = vt.FFTApplication(cfg, engine="pallas")
        x = _mk(n, batch=5, dtype=np.float32)
        Y = app.forward(from_complex(x))
        assert isinstance(Y, TlSpectrum)
        app2 = cache.load_application_from_string(
            cache.save_application_to_string(app), engine="pallas")
        z = to_numpy(app2.inverse(Y))
        assert rel_err(z, x) < 5e-6
        # and a mismatched config refuses rather than mis-slicing
        other = vt.FFTApplication(vt.FFTConfig(shape=(512,), normalize=True),
                                  engine="pallas")
        try:
            other.inverse(Y)
            assert False, "expected InvalidConfigError"
        except vt.errors.InvalidConfigError:
            pass
    finally:
        pallas_engine.set_interpret(False)
