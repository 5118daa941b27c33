"""Size-sweep and engine-equivalence tests — the pytest rendition of the
reference's "all supported systems" sweeps (``sample_1000..1004``), plus
cross-engine agreement checks the reference cannot do (it has one backend
per build)."""
import numpy as np
import pytest

import vkfft_tpu as vt
from vkfft_tpu.ops import jnp_engine, pallas_engine
from vkfft_tpu.pcomplex import from_complex, to_numpy
from vkfft_tpu.planner import plan_axis


def rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


def test_sweep_all_sizes_2_to_128():
    """Every length 2..128 through the jnp engine vs the fp64 oracle —
    exercises every planner branch in one go."""
    rng = np.random.default_rng(0)
    worst = 0.0
    for n in range(2, 129):
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        y = np.asarray(vt.fft(x, engine="jnp"))
        worst = max(worst, rel_err(y, np.fft.fft(x)))
    assert worst < 1e-11, worst


@pytest.mark.parametrize("n", [130, 131, 210, 222, 333, 444, 1001])
def test_sweep_awkward_sizes(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    y = np.asarray(vt.fft(x, engine="jnp"))
    assert rel_err(y, np.fft.fft(x)) < 1e-11


@pytest.mark.parametrize("n", [16, 60, 128, 360, 1024])
def test_engine_equivalence(n):
    """jnp engine and pallas (interpret) engine agree to fp32 tolerance on
    identical inputs."""
    pallas_engine.set_interpret(True)
    try:
        rng = np.random.default_rng(n)
        x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
             ).astype(np.complex64)
        p = from_complex(x)
        plan = plan_axis(n)
        y_jnp = to_numpy(jnp_engine.fft_lines_p(from_complex(x), plan))
        y_pal = to_numpy(pallas_engine.fft_lines_p(p, plan))
        assert rel_err(y_pal, y_jnp.astype(np.complex128)) < 5e-6
    finally:
        pallas_engine.set_interpret(False)


def test_parseval_energy():
    """Parseval: sum|X|^2 == n * sum|x|^2 — an oracle-free invariant."""
    rng = np.random.default_rng(7)
    for n in (64, 360, 1009):
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        X = np.asarray(vt.fft(x, engine="jnp"))
        lhs = np.sum(np.abs(X) ** 2, axis=-1)
        rhs = n * np.sum(np.abs(x) ** 2, axis=-1)
        assert np.allclose(lhs, rhs, rtol=1e-10)


def test_linearity_and_shift():
    """DFT linearity and the circular-shift theorem."""
    rng = np.random.default_rng(8)
    n = 96
    a = rng.standard_normal((n,)) + 1j * rng.standard_normal((n,))
    b = rng.standard_normal((n,)) + 1j * rng.standard_normal((n,))
    Fa = np.asarray(vt.fft(a, engine="jnp"))
    Fb = np.asarray(vt.fft(b, engine="jnp"))
    Fab = np.asarray(vt.fft(2 * a + 3j * b, engine="jnp"))
    assert np.allclose(Fab, 2 * Fa + 3j * Fb, atol=1e-10)
    shift = 17
    Fs = np.asarray(vt.fft(np.roll(a, shift), engine="jnp"))
    phase = np.exp(-2j * np.pi * shift * np.arange(n) / n)
    assert np.allclose(Fs, Fa * phase, atol=1e-9)
