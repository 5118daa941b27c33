"""Pallas engine correctness in interpreter mode (CPU-runnable; real-TPU
compilation is exercised by bench.py / __graft_entry__.py on hardware)."""
import numpy as np
import pytest

import vkfft_tpu as vt
from vkfft_tpu.ops import pallas_engine
from vkfft_tpu.planner import plan_axis


@pytest.fixture(autouse=True)
def _interpret():
    pallas_engine.set_interpret(True)
    yield
    pallas_engine.set_interpret(False)


def rel_err(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


def test_split_two_factors():
    assert pallas_engine.split_two_factors(4096) == (64, 64)
    assert pallas_engine.split_two_factors(1024) == (32, 32)
    assert pallas_engine.split_two_factors(96) == (1, 96)
    assert pallas_engine.split_two_factors(128 * 128) == (128, 128)
    assert pallas_engine.split_two_factors(2 * 127 * 127) is None  # 127*254
    assert pallas_engine.split_two_factors(97 * 64) == (64, 97)
    assert pallas_engine.split_two_factors(1 << 20) is None


# direct two-factor sizes incl. prime factors the matmul eats directly,
# plus Rader (97) and Bluestein (10006 -> core 20250 unsupported... use small)
@pytest.mark.parametrize("n", [8, 64, 128, 256, 360, 1024, 97 * 64, 101])
def test_pallas_fft_vs_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))).astype(np.complex64)
    y = np.asarray(pallas_engine.fft_lines(__import__("jax").numpy.asarray(x), plan_axis(n)))
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(y, ref) < 5e-6


@pytest.mark.parametrize("n", [64, 256, 360])
def test_pallas_roundtrip(n):
    import jax.numpy as jnp
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    plan = plan_axis(n)
    y = pallas_engine.fft_lines(jnp.asarray(x), plan)
    z = np.asarray(pallas_engine.fft_lines(y, plan, inverse=True)) / n
    assert rel_err(z, x) < 5e-6


def test_pallas_axis_and_fallback():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((8, 16)) + 1j * rng.standard_normal((8, 16))).astype(np.complex64)
    plan = plan_axis(8)
    y = np.asarray(pallas_engine.fft_axis(jnp.asarray(x), 0, plan))
    assert rel_err(y, np.fft.fft(x.astype(np.complex128), axis=0)) < 5e-6
    # complex128 falls back to jnp engine
    x64 = x.astype(np.complex128)
    y64 = np.asarray(pallas_engine.fft_axis(jnp.asarray(x64), 0, plan))
    assert rel_err(y64, np.fft.fft(x64, axis=0)) < 1e-11


def test_api_engine_pallas():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((4, 256)) + 1j * rng.standard_normal((4, 256))).astype(np.complex64)
    y = np.asarray(vt.fft(x, engine="pallas"))
    assert rel_err(y, np.fft.fft(x.astype(np.complex128))) < 5e-6


# -- v2 lane-major kernel ----------------------------------------------------

def test_split_lane_major():
    assert pallas_engine.split_lane_major(1024) == (128, 8)
    assert pallas_engine.split_lane_major(4096) == (128, 32)
    assert pallas_engine.split_lane_major(360) == (120, 3)
    assert pallas_engine.split_lane_major(96) == (96, 1)
    assert pallas_engine.split_lane_major(127) == (127, 1)
    assert pallas_engine.split_lane_major(131) is None or \
        pallas_engine.split_lane_major(131) == (1, 131)


@pytest.mark.parametrize("n", [64, 256, 360, 1024, 4096])
def test_v2_natural_fwd_inv(n):
    import jax.numpy as jnp
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((5, n)) + 1j * rng.standard_normal((5, n))).astype(np.complex64)
    xr = jnp.asarray(np.ascontiguousarray(x.real))
    xi = jnp.asarray(np.ascontiguousarray(x.imag))
    yr, yi = pallas_engine.core_fft_planar_v2(xr, xi, n, False, order="natural")
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(got, ref) < 5e-6
    zr, zi = pallas_engine.core_fft_planar_v2(yr, yi, n, True, order="natural")
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    assert rel_err(back, x) < 5e-6


@pytest.mark.parametrize("n", [256, 1024])
def test_v2_swapped_roundtrip(n):
    import jax.numpy as jnp
    rng = np.random.default_rng(n + 1)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))).astype(np.complex64)
    xr = jnp.asarray(np.ascontiguousarray(x.real))
    xi = jnp.asarray(np.ascontiguousarray(x.imag))
    # swapped fwd -> swapped inv == identity*n with no reorder passes
    yr, yi = pallas_engine.core_fft_planar_v2(xr, xi, n, False, order="swapped")
    zr, zi = pallas_engine.core_fft_planar_v2(yr, yi, n, True, order="swapped")
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    assert rel_err(back, x) < 5e-6
    # swapped output is the digit-transposed natural output
    n1, n2 = pallas_engine.split_lane_major(n)
    nat = np.fft.fft(x.astype(np.complex128))
    sw = (np.asarray(yr) + 1j * np.asarray(yi))
    assert rel_err(sw.reshape(3, n2, n1),
                   nat.reshape(3, n1, n2).swapaxes(1, 2)) < 5e-6


def test_v2_bf16_storage():
    import jax.numpy as jnp
    n = 256
    rng = np.random.default_rng(9)
    x = rng.standard_normal((4, n)).astype(np.float32)
    xr = jnp.asarray(x).astype(jnp.bfloat16)
    xi = jnp.zeros_like(xr)
    yr, yi = pallas_engine.core_fft_planar_v2(xr, xi, n, False)
    assert yr.dtype == jnp.bfloat16
    got = np.asarray(yr.astype(jnp.float32)) + 1j * np.asarray(yi.astype(jnp.float32))
    ref = np.fft.fft(x.astype(np.float64))
    # bf16 storage: ~3 decimal digits
    assert rel_err(got, ref) < 3e-2


# -- strided-axis kernel ----------------------------------------------------

@pytest.mark.parametrize("n", [64, 256, 1024])
def test_strided_kernel(n):
    import jax.numpy as jnp
    rng = np.random.default_rng(n)
    P, S = 2, 24
    x = (rng.standard_normal((P, n, S)) + 1j * rng.standard_normal((P, n, S))).astype(np.complex64)
    xr = jnp.asarray(np.ascontiguousarray(x.real))
    xi = jnp.asarray(np.ascontiguousarray(x.imag))
    yr, yi = pallas_engine.strided_fft_planar(xr, xi, n, False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x.astype(np.complex128), axis=1)
    assert rel_err(got, ref) < 5e-6
    zr, zi = pallas_engine.strided_fft_planar(yr, yi, n, True)
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    assert rel_err(back, x) < 5e-6


def test_fft_axis_p_strided_dispatch():
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((64, 3, 16)) + 1j * rng.standard_normal((64, 3, 16))).astype(np.complex64)
    p = Planar(jnp.asarray(np.ascontiguousarray(x.real)),
               jnp.asarray(np.ascontiguousarray(x.imag)))
    y = pallas_engine.fft_axis_p(p, 0, plan_axis(64))
    got = np.asarray(y.re) + 1j * np.asarray(y.im)
    ref = np.fft.fft(x.astype(np.complex128), axis=0)
    assert rel_err(got, ref) < 5e-6


# -- long-sequence multi-upload path -----------------------------------------

def test_split_long():
    assert pallas_engine.split_long(1 << 20) is not None
    nc, ns = pallas_engine.split_long(1 << 20)
    assert nc * ns == 1 << 20 and ns <= 16384 and nc <= 16384


@pytest.mark.parametrize("n", [32768, 1 << 17])
def test_long_fft(n):
    import jax.numpy as jnp
    rng = np.random.default_rng(n)
    B = 2
    x = (rng.standard_normal((B, n)) + 1j * rng.standard_normal((B, n))).astype(np.complex64)
    xr = jnp.asarray(np.ascontiguousarray(x.real))
    xi = jnp.asarray(np.ascontiguousarray(x.imag))
    yr, yi = pallas_engine.fft_long_planar(xr, xi, n, False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(got, ref) < 2e-5
    zr, zi = pallas_engine.fft_long_planar(yr, yi, n, True)
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    assert rel_err(back, x) < 2e-5


def test_split_long3():
    # beyond the 2-level range the 3-upload split must exist (axis ceiling
    # 2^32+, reference README.md:8)
    for n in (1 << 29, 1 << 32, 3**20):
        sp = pallas_engine.split_long3(n)
        assert sp is not None
        na, nb, ns = sp
        assert na * nb * ns == n
        for f in sp:
            assert pallas_engine._use_v2(f)


def test_long3_fft():
    """3-upload four-step path, forced on a small n (the dispatch itself
    only uses it beyond ~2^28, which is too big for a CPU test)."""
    import jax.numpy as jnp
    n = 1 << 15
    rng = np.random.default_rng(7)
    B = 2
    x = (rng.standard_normal((B, n))
         + 1j * rng.standard_normal((B, n))).astype(np.complex64)
    xr = jnp.asarray(np.ascontiguousarray(x.real))
    xi = jnp.asarray(np.ascontiguousarray(x.imag))
    yr, yi = pallas_engine._fft_long3_planar(xr, xi, n, False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(got, ref) < 2e-5
    zr, zi = pallas_engine._fft_long3_planar(yr, yi, n, True)
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    assert rel_err(back, x) < 2e-5
    # swapped-order contract: fwd+inv pairs cancel without the reorder
    yr2, yi2 = pallas_engine._fft_long3_planar(xr, xi, n, False,
                                               order="swapped")
    zr2, zi2 = pallas_engine._fft_long3_planar(yr2, yi2, n, True,
                                               order="swapped")
    back2 = (np.asarray(zr2) + 1j * np.asarray(zi2)) / n
    assert rel_err(back2, x) < 2e-5


def test_long_swapped_roundtrip():
    import jax.numpy as jnp
    n = 32768
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    xr = jnp.asarray(np.ascontiguousarray(x.real))
    xi = jnp.asarray(np.ascontiguousarray(x.imag))
    yr, yi = pallas_engine.fft_long_planar(xr, xi, n, False, order="swapped")
    zr, zi = pallas_engine.fft_long_planar(yr, yi, n, True, order="swapped")
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    assert rel_err(back, x) < 2e-5


def test_conv_fused_kernel():
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    n = 256
    rng = np.random.default_rng(4)
    x = (rng.standard_normal((6, n)) + 1j * rng.standard_normal((6, n))).astype(np.complex64)
    h = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    table = np.fft.fft(h)
    p = Planar(jnp.asarray(np.ascontiguousarray(x.real)),
               jnp.asarray(np.ascontiguousarray(x.imag)))
    out = pallas_engine.conv_fused_planar(p, n, table, normalize=True)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    ref = np.fft.ifft(np.fft.fft(x.astype(np.complex128)) * table)
    assert rel_err(got, ref) < 5e-6


def test_conv_fused_v3_scalar_modes():
    """Single-kernel conv (fwd + multiply + inline inverse in one pallas
    call, reference vkFFT_FFT.h:241-351): plain, conjugate-data, and
    cross-power-normalized variants."""
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    n = 256
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((140, n))
         + 1j * rng.standard_normal((140, n))).astype(np.complex64)
    h = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    H = np.fft.fft(h)
    p = Planar(jnp.asarray(np.ascontiguousarray(x.real)),
               jnp.asarray(np.ascontiguousarray(x.imag)))
    X = np.fft.fft(x.astype(np.complex128))

    out = pallas_engine.conv_fused_v3(p, n, H, scale=1.0 / n)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    assert rel_err(got, np.fft.ifft(X * H)) < 5e-6

    out = pallas_engine.conv_fused_v3(p, n, H, scale=1.0 / n, conj_data=True)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    assert rel_err(got, np.fft.ifft(np.conj(X) * H)) < 5e-6

    out = pallas_engine.conv_fused_v3(p, n, H, scale=1.0 / n, xpow=True)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    Y = X * H
    assert rel_err(got, np.fft.ifft(Y / np.abs(Y))) < 5e-6


def test_conv_fused_v3_rows():
    """N-D last-axis fused pass: per-line spectrum rows (table blocked like
    the data, the in-kernel analog of the reference's strided kernel-buffer
    reads)."""
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    n, rows, b = 128, 256, 2
    rng = np.random.default_rng(6)
    x = (rng.standard_normal((b * rows, n))
         + 1j * rng.standard_normal((b * rows, n))).astype(np.complex64)
    Ht = rng.standard_normal((rows, n)) + 1j * rng.standard_normal((rows, n))
    p = Planar(jnp.asarray(np.ascontiguousarray(x.real)),
               jnp.asarray(np.ascontiguousarray(x.imag)))
    out = pallas_engine.conv_fused_v3_rows(
        p, n, rows, np.ascontiguousarray(Ht.T), scale=1.0 / n)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    ref = np.fft.ifft(np.fft.fft(x.astype(np.complex128))
                      * np.tile(Ht, (b, 1)))
    assert rel_err(got, ref) < 5e-6


def test_conv_fused_v3_matrix():
    """m x m matrix convolution in one kernel (reference 2x2/3x3 kernels,
    vkFFT_Convolution.h:125)."""
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    n, m = 128, 3
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((5, m, n))
         + 1j * rng.standard_normal((5, m, n))).astype(np.complex64)
    K = rng.standard_normal((m, m, n)) + 1j * rng.standard_normal((m, m, n))
    p = Planar(jnp.asarray(np.ascontiguousarray(x.real)),
               jnp.asarray(np.ascontiguousarray(x.imag)))
    out = pallas_engine.conv_fused_v3_matrix(p, n, m, K, scale=1.0 / n)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    X = np.fft.fft(x.astype(np.complex128))
    ref = np.fft.ifft(np.einsum("oin,bin->bon", K, X))
    assert rel_err(got, ref) < 5e-6


@pytest.mark.parametrize("n", [262, 393])
def test_split_pallas(n):
    """Composite Rader (Cooley-Tukey split) through the pallas engine."""
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))).astype(np.complex64)
    import jax.numpy as jnp
    y = np.asarray(pallas_engine.fft_lines(jnp.asarray(x), plan_axis(n)))
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(y, ref) < 5e-6


def test_zeropad_elision_core():
    """in_nonzero (forward read elision) and out_keep (inverse write
    elision) must match the full kernel on zero-tail data (reference
    ``vkFFT_Zeropad.h`` semantics: declared region is treated as zero)."""
    import jax.numpy as jnp
    n, h, B = 1024, 512, 4
    rng = np.random.default_rng(3)
    x = np.zeros((B, n), dtype=np.complex64)
    x[:, :h] = (rng.standard_normal((B, h))
                + 1j * rng.standard_normal((B, h)))
    xr = jnp.asarray(np.ascontiguousarray(x.real))
    xi = jnp.asarray(np.ascontiguousarray(x.imag))
    assert pallas_engine.zeropad_rows(n, h) == 4
    yr, yi = pallas_engine.core_fft_planar_v2(xr, xi, n, False, in_nonzero=h)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(got, ref) < 2e-6
    # garbage in the declared-zero tail is ignored (never read)
    xg_r = jnp.asarray(np.ascontiguousarray(x.real) + 0)
    xg_r = xg_r.at[:, h:].set(99.0)
    yr2, _ = pallas_engine.core_fft_planar_v2(xg_r, xi, n, False, in_nonzero=h)
    np.testing.assert_allclose(np.asarray(yr2), np.asarray(yr))
    # inverse write elision: keep only [0, h)
    zr, zi = pallas_engine.core_fft_planar_v2(yr, yi, n, True, out_keep=h)
    assert zr.shape == (B, h)
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    assert rel_err(back, x[:, :h]) < 2e-6


def test_zeropad_elision_api():
    """Config-driven zero-pad elision through FFTApplication (pallas)."""
    import jax.numpy as jnp
    import vkfft_tpu as vt
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    n, h = 256, 128
    cfg = vt.FFTConfig(shape=(n,), zeropad_input=((h, n),), normalize=True)
    app = vt.FFTApplication(cfg, engine="pallas")
    rng = np.random.default_rng(4)
    x = np.zeros((3, n), dtype=np.complex64)
    x[:, :h] = rng.standard_normal((3, h)) + 1j * rng.standard_normal((3, h))
    y = app.forward(from_complex(x))
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(to_numpy(y), ref) < 2e-6
    z = to_numpy(app.inverse(y))
    # inverse zeroes the declared region and restores the data part
    assert rel_err(z[:, :h], x[:, :h]) < 2e-6
    assert np.abs(z[:, h:]).max() < 1e-5


def test_zeropad_output_elision_api():
    """frequencyZeroPadding (``vkFFT_Structs.h:264``) through the config:
    a declared-zero spectrum tail elides the forward's writes and the
    inverse's reads on the v3 kernel (round-4, verdict item 5)."""
    import vkfft_tpu as vt
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    n, oh = 256, 96
    cfg = vt.FFTConfig(shape=(n,), zeropad_output=((oh, n),), normalize=True)
    app = vt.FFTApplication(cfg, engine="pallas")
    assert app.zeropad_mode == "elided-output"
    rng = np.random.default_rng(9)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
         ).astype(np.complex64)
    y = to_numpy(app.forward(from_complex(x)))
    ref = np.fft.fft(x.astype(np.complex128))
    # kept spectrum prefix is exact; the declared-zero tail comes back zero
    assert rel_err(y[:, :oh], ref[:, :oh]) < 2e-6
    assert np.abs(y[:, oh:]).max() == 0.0
    # inverse never reads the declared-zero tail BEYOND the lane-rounded
    # window (the DMA window rounds oh up to the next 128 multiple for
    # Mosaic block legality; anything inside the rounded window is covered
    # by the declared-zero contract): garbage past the rounded boundary
    # must not affect the result
    oh_dma = -(-oh // 128) * 128
    y_g = y.copy()
    y_g[:, oh_dma:] = 123.0
    z = to_numpy(app.inverse(from_complex(y_g)))
    zref = np.fft.ifft(np.concatenate(
        [ref[:, :oh], np.zeros((3, n - oh))], axis=1))
    assert rel_err(z, zref) < 2e-6


def test_zeropad_both_windows_api():
    """Input-prefix + output-window combined: one kernel call with both
    elision windows ('elided-prefix+output')."""
    import vkfft_tpu as vt
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    n, ih, oh = 256, 128, 64
    cfg = vt.FFTConfig(shape=(n,), zeropad_input=((ih, n),),
                       zeropad_output=((oh, n),), normalize=True)
    app = vt.FFTApplication(cfg, engine="pallas")
    assert app.zeropad_mode == "elided-prefix+output"
    rng = np.random.default_rng(11)
    x = np.zeros((3, n), dtype=np.complex64)
    x[:, :ih] = (rng.standard_normal((3, ih))
                 + 1j * rng.standard_normal((3, ih)))
    y = to_numpy(app.forward(from_complex(x)))
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(y[:, :oh], ref[:, :oh]) < 2e-6
    assert np.abs(y[:, oh:]).max() == 0.0
    z = to_numpy(app.inverse(from_complex(y)))
    zref = np.fft.ifft(np.concatenate(
        [ref[:, :oh], np.zeros((3, n - oh))], axis=1))
    # declared-zero time tail restored as zeros, prefix matches the oracle
    assert rel_err(z[:, :ih], zref[:, :ih]) < 2e-6
    assert np.abs(z[:, ih:]).max() == 0.0


# ---------------------------------------------------------------------------
# v3 kernel (batch-in-lanes Stockham, natural-order native)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [8, 47, 60, 64, 100, 128, 256, 360, 1000, 2048])
def test_v3_natural_fwd_inv(n):
    import jax.numpy as jnp
    plan = pallas_engine._v3_plan(n)
    assert plan is not None, n
    rng = np.random.default_rng(n)
    xr = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32))
    fr, fi = pallas_engine.core_fft_planar_v3(xr, xi, n, False)
    ref = np.fft.fft(np.asarray(xr).astype(np.complex128)
                     + 1j * np.asarray(xi))
    assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 5e-6
    br, bi = pallas_engine.core_fft_planar_v3(fr, fi, n, True)
    assert rel_err(np.asarray(br) / n, np.asarray(xr)) < 5e-6
    assert rel_err(np.asarray(bi) / n, np.asarray(xi)) < 5e-6


def test_v3_plan_rules():
    # VPU leading 4/2 factors only while >= 64 rows remain; MXU <= 64
    assert pallas_engine._v3_plan(1024) == ((4, 4), (64,))
    assert pallas_engine._v3_plan(2048) == ((4, 4, 2), (64,))
    assert pallas_engine._v3_plan(47) == ((), (47,))
    assert pallas_engine._v3_plan(2 * 67) is None        # prime factor > 64
    assert pallas_engine._v3_plan(4096) == ((4, 4, 4), (64,))
    assert pallas_engine._v3_plan(8192) == ((4, 4, 4, 2), (64,))
    assert pallas_engine._v3_plan(16384) is None         # beyond _V3_MAX_N
    assert pallas_engine._v3_plan(1) is None


@pytest.mark.parametrize("n,h", [
    (1024, 256),   # VPU r=4 first stage, q=1 (quarter-pad)
    (1024, 512),   # q=2 (half-pad)
    (1024, 768),   # q=3
    (1024, 600),   # q=3 with a partial live chunk
    (190, 80),     # VPU r=2 first stage, q=1 (plan ((2,), (19, 5)))
    (96, 40),      # MXU-first (48, 2): pruned packed table K=2q
    (47, 20),      # MXU-only prime: pruned direct DFT contraction
])
def test_v3_pruned_stage1(n, h):
    """Zero-pad COMPUTE pruning (round 4): the declared-zero tail prunes the
    first stage's butterfly/contraction — the full-width zero plane never
    materializes in VMEM (reference ``vkFFT_Zeropad.h:133-182``)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(n + h)
    xr = np.zeros((4, n), np.float32)
    xi = np.zeros((4, n), np.float32)
    xr[:, :h] = rng.standard_normal((4, h))
    xi[:, :h] = rng.standard_normal((4, h))
    # forward read elision + pruning
    fr, fi = pallas_engine.core_fft_planar_v3(
        jnp.asarray(xr), jnp.asarray(xi), n, False, in_nonzero=h)
    ref = np.fft.fft(xr.astype(np.complex128) + 1j * xi)
    assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 5e-6
    # inverse read elision + pruning (frequencyZeroPadding mirror: the
    # spectrum's declared-zero tail is never read)
    sr = np.zeros((4, n), np.float32)
    si = np.zeros((4, n), np.float32)
    sr[:, :h] = rng.standard_normal((4, h))
    si[:, :h] = rng.standard_normal((4, h))
    br, bi = pallas_engine.core_fft_planar_v3(
        jnp.asarray(sr), jnp.asarray(si), n, True, in_nonzero=h)
    iref = np.fft.ifft(sr.astype(np.complex128) + 1j * si) * n
    assert rel_err(np.asarray(br) + 1j * np.asarray(bi), iref) < 5e-6


@pytest.mark.parametrize("n", [263, 1019])  # p-1 non-smooth -> BLUESTEIN
def test_bluestein_fused_kernel(n):
    """Single-kernel Bluestein (round 4, verdict item 3): chirp pre/post
    multiplies fused into the kernel's read/write paths, the [n, m) pad
    never DMA'd, pruned first stage (``vkFFT_Bluestein.h:32,201``)."""
    from vkfft_tpu.planner import plan_axis, Algorithm
    from vkfft_tpu.pcomplex import Planar
    import jax.numpy as jnp
    plan = plan_axis(n)
    assert plan.algorithm is Algorithm.BLUESTEIN
    m = plan.decomp.bluestein_size
    assert pallas_engine._use_v3(m), (n, m)
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    p = Planar(jnp.asarray(x.real.astype(np.float32)),
               jnp.asarray(x.imag.astype(np.float32)))
    y = pallas_engine.fft_lines_p(p, plan, False)
    ref = np.fft.fft(x)
    assert rel_err(np.asarray(y.re) + 1j * np.asarray(y.im), ref) < 2e-5
    z = pallas_engine.fft_lines_p(y, plan, True, scale=1.0 / n)
    assert rel_err(np.asarray(z.re) + 1j * np.asarray(z.im), x) < 2e-5


def test_3d_corner_elision():
    """N-D outer-first corner elision (round 4): with declared-zero windows
    on all three axes the forward transforms the outer axis over only the
    nonzero minor corner (zero lines never transformed), the pair consumes
    the corner, and the inverse mirrors — matching the reference's 3-D
    zero-padded sample 4."""
    import vkfft_tpu as vt
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    nx = ny = nz = 128
    hx, hy, hz = 64, 64, 64
    cfg = vt.FFTConfig(shape=(nx, ny, nz), normalize=True,
                       zeropad_input=((hx, nx), (hy, ny), (hz, nz)))
    app = vt.FFTApplication(cfg, engine="pallas")
    assert app.zeropad_mode == "elided-pair"
    rng = np.random.default_rng(5)
    x = np.zeros((nx, ny, nz), dtype=np.complex64)
    x[:hx, :hy, :hz] = (rng.standard_normal((hx, hy, hz))
                        + 1j * rng.standard_normal((hx, hy, hz)))
    y = to_numpy(app.forward(from_complex(x)))
    ref = np.fft.fftn(x.astype(np.complex128))
    assert rel_err(y, ref) < 5e-6
    z = to_numpy(app.inverse(app.forward(from_complex(x))))
    assert rel_err(z[:hx, :hy, :hz], x[:hx, :hy, :hz]) < 5e-6
    assert np.abs(z[hx:]).max() < 1e-6
    assert np.abs(z[:, hy:]).max() < 1e-6
    assert np.abs(z[:, :, hz:]).max() < 1e-6


def test_bluestein_long_conv():
    """Long-regime Bluestein (round 4, verdict item 3): m beyond the
    single-kernel range runs the 3-kernel fused path — strided + fused conv
    (spectrum multiply in the swapped four-step layout) + strided — with the
    structured padded size m = Nc*Ns chosen by the planner."""
    from vkfft_tpu.planner import plan_axis, Algorithm
    from vkfft_tpu.pcomplex import Planar
    import jax.numpy as jnp
    n = 10007   # prime, p-1 = 2*5003 non-smooth -> Bluestein
    plan = plan_axis(n)
    assert plan.algorithm is Algorithm.BLUESTEIN
    m = plan.decomp.bluestein_size
    # pow-2 structured size (e40: all-K=128 conv stages beat the smaller
    # 20480 = 2^12*5 whose conv drags a K=4 MXU tail, by 14% on v5e)
    assert m == 32768, m
    nc, ns = pallas_engine.split_long(m)
    assert nc % 128 == 0 and pallas_engine._use_v3(ns)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    p = Planar(jnp.asarray(x.real.astype(np.float32)),
               jnp.asarray(x.imag.astype(np.float32)))
    y = pallas_engine.fft_lines_p(p, plan, False)
    ref = np.fft.fft(x)
    assert rel_err(np.asarray(y.re) + 1j * np.asarray(y.im), ref) < 5e-5
    z = pallas_engine.fft_lines_p(y, plan, True, scale=1.0 / n)
    assert rel_err(np.asarray(z.re) + 1j * np.asarray(z.im), x) < 5e-5


def test_strided_pruned_stage1():
    """The strided kernel prunes its first stage the same way."""
    import jax.numpy as jnp
    n, h, s = 256, 64, 256
    rng = np.random.default_rng(3)
    xr = np.zeros((2, n, s), np.float32)
    xi = np.zeros((2, n, s), np.float32)
    xr[:, :h] = rng.standard_normal((2, h, s))
    xi[:, :h] = rng.standard_normal((2, h, s))
    orr, oi = pallas_engine.strided_fft_planar(
        jnp.asarray(xr), jnp.asarray(xi), n, False, in_keep=h)
    ref = np.fft.fft(xr.astype(np.complex128) + 1j * xi, axis=1)
    assert rel_err(np.asarray(orr) + 1j * np.asarray(oi), ref) < 5e-6


def test_v3_zeropad_elision():
    import jax.numpy as jnp
    n, h = 96, 40   # any prefix length (no row-alignment requirement)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((4, n)).astype(np.float32)
    xi = rng.standard_normal((4, n)).astype(np.float32)
    xr[:, h:] = 0
    xi[:, h:] = 0
    fr, fi = pallas_engine.core_fft_planar_v3(
        jnp.asarray(xr), jnp.asarray(xi), n, False, in_nonzero=h)
    ref = np.fft.fft(xr.astype(np.complex128) + 1j * xi)
    assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 5e-6
    # inverse write elision returns only the kept prefix
    br, bi = pallas_engine.core_fft_planar_v3(fr, fi, n, True, out_keep=h)
    assert br.shape == (4, h)
    full = np.fft.ifft(np.asarray(fr) + 1j * np.asarray(fi)) * n
    assert rel_err(np.asarray(br) + 1j * np.asarray(bi), full[:, :h]) < 5e-6


def test_v3_batch_padding():
    # batch not a multiple of the 128-lane block
    import jax.numpy as jnp
    n = 64
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    fr, fi = pallas_engine.core_fft_planar_v3(xr, xi, n, False)
    ref = np.fft.fft(np.asarray(xr).astype(np.complex128) + 1j * np.asarray(xi))
    assert fr.shape == (3, n)
    assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 5e-6


# ---------------------------------------------------------------------------
# In-kernel R2C / C2R (single-kernel pack + stages + untangle; reference
# appendR2C_write vkFFT_R2C.h:450 / appendC2R_read :178)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [8, 16, 64, 200, 256, 1000, 1024, 2048])
def test_r2c_kernel_fwd_inv(n):
    import jax.numpy as jnp
    assert pallas_engine.use_r2c_kernel(n), n
    rng = np.random.default_rng(n)
    x = rng.standard_normal((5, n)).astype(np.float32)
    ar, ai = pallas_engine.rfft_lines_planar(jnp.asarray(x))
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    assert ar.shape == (5, n // 2 + 1)
    assert rel_err(np.asarray(ar) + 1j * np.asarray(ai), ref) < 5e-6
    y = pallas_engine.irfft_lines_planar(
        jnp.asarray(ref.real.astype(np.float32)),
        jnp.asarray(ref.imag.astype(np.float32)), n)
    assert rel_err(np.asarray(y) / (n // 2), x) < 5e-6


def test_r2c_kernel_gate():
    assert not pallas_engine.use_r2c_kernel(7)       # odd
    assert not pallas_engine.use_r2c_kernel(4)       # too small
    assert pallas_engine.use_r2c_kernel(4096)        # m=2048 (VMEM raised)
    assert not pallas_engine.use_r2c_kernel(16384)   # m=8192 over the cap
    assert not pallas_engine.use_r2c_kernel(2 * 67)  # m has prime > 64
    assert pallas_engine.use_r2c_kernel(2048)


def test_rfft_irfft_uses_kernel_path():
    """transforms.r2c routes through the single-kernel path under the pallas
    engine and matches numpy end to end (incl. non-last axis + batch)."""
    import jax.numpy as jnp
    from vkfft_tpu.transforms import r2c
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 7, 256)).astype(np.float32)
    y = r2c.rfft(jnp.asarray(x), engine="pallas")
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    got = np.asarray(y.re) + 1j * np.asarray(y.im) if hasattr(y, "re") else np.asarray(y)
    assert rel_err(got, ref) < 5e-6
    z = r2c.irfft(y, n=256, engine="pallas")
    assert rel_err(np.asarray(z), x) < 5e-6
    # non-last axis
    y0 = r2c.rfft(jnp.asarray(x), axis=1, engine="pallas")
    ref0 = np.fft.rfft(x.astype(np.float64), axis=1)
    got0 = np.asarray(y0.re) + 1j * np.asarray(y0.im) if hasattr(y0, "re") else np.asarray(y0)
    assert rel_err(got0, ref0) < 2e-5


@pytest.mark.parametrize("n", [256, 1000, 1024])
def test_v3_int8_mxu_mode(n):
    """6-pass int8 MXU emulation (experiments/e18): fp32-class accuracy
    (~3e-7) through the v3-family kernels when toggled on."""
    import jax.numpy as jnp
    pallas_engine.set_mxu_int8(True)
    try:
        plan = plan_axis(n)
        rng = np.random.default_rng(n)
        x = rng.standard_normal((64, n)) + 1j * rng.standard_normal((64, n))
        from vkfft_tpu.pcomplex import Planar
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        y = pallas_engine.fft_lines_p(p, plan, False)
        got = np.asarray(y.re, np.float64) + 1j * np.asarray(y.im, np.float64)
        assert rel_err(got, np.fft.fft(x)) < 2e-6
        z = pallas_engine.fft_lines_p(y, plan, True, scale=1.0 / n)
        zc = np.asarray(z.re, np.float64) + 1j * np.asarray(z.im, np.float64)
        assert rel_err(zc, x) < 2e-6
    finally:
        pallas_engine.set_mxu_int8(False)


def test_int8_digits_exactness():
    """The three-digit int8 decomposition reconstructs to ~23 bits."""
    rng = np.random.default_rng(0)
    X = rng.standard_normal((64, 64))
    s = float(np.max(np.abs(X)))
    d = pallas_engine._int8_digits(X, s)
    rec = sum(di.astype(np.float64) / sc
              for di, sc in zip(d, pallas_engine._INT8_SCALES)) * s
    assert np.max(np.abs(rec - X)) < 2.5e-7 * s


def test_v2_int8_mxu_mode():
    """6-pass int8 emulation through the v2 kernel (natural + swapped)."""
    import jax.numpy as jnp
    pallas_engine.set_mxu_int8(True)
    try:
        n = 4096
        rng = np.random.default_rng(7)
        xr = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32))
        fr, fi = pallas_engine.core_fft_planar_v2(xr, xi, n, False)
        ref = np.fft.fft(np.asarray(xr).astype(np.complex128)
                         + 1j * np.asarray(xi))
        assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 2e-6
        sr, si = pallas_engine.core_fft_planar_v2(xr, xi, n, False,
                                                  order="swapped")
        br, bi = pallas_engine.core_fft_planar_v2(sr, si, n, True,
                                                  order="swapped",
                                                  scale=1.0 / n)
        assert rel_err(np.asarray(br), np.asarray(xr)) < 2e-6
        assert rel_err(np.asarray(bi), np.asarray(xi)) < 2e-6
    finally:
        pallas_engine.set_mxu_int8(False)


# ---------------------------------------------------------------------------
# Fused two-axis kernel (both minor axes in one VMEM-resident pass)
# ---------------------------------------------------------------------------


def test_pair_kernel():
    import jax.numpy as jnp
    rng = np.random.default_rng(21)
    for ny, nz in ((128, 256), (256, 128)):
        assert pallas_engine.pair_available(ny, nz)
        x = (rng.standard_normal((2, ny, nz))
             + 1j * rng.standard_normal((2, ny, nz)))
        fr, fi = pallas_engine.fft_pair_planar(
            jnp.asarray(x.real.astype(np.float32)),
            jnp.asarray(x.imag.astype(np.float32)), ny, nz, False)
        ref = np.fft.fft2(x, axes=(1, 2))
        assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 2e-6
        br, bi = pallas_engine.fft_pair_planar(fr, fi, ny, nz, True,
                                               scale=1.0 / (ny * nz))
        assert rel_err(np.asarray(br) + 1j * np.asarray(bi), x) < 2e-6


def test_pair_gate():
    assert not pallas_engine.pair_available(128, 192)   # nz % 128 != 0
    assert not pallas_engine.pair_available(1024, 1024) # VMEM cap
    assert not pallas_engine.pair_available(131, 256)   # prime > 64


def test_pair_routing_application():
    """2-D and 3-D applications route the two minor axes through the fused
    pair kernel (and match the oracle with normalization)."""
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    rng = np.random.default_rng(22)
    for shape in ((128, 128), (4, 128, 256)):
        cfg = vt.FFTConfig(shape=shape, normalize=True)
        app = vt.FFTApplication(cfg, engine="pallas")
        x = (rng.standard_normal(shape)
             + 1j * rng.standard_normal(shape)).astype(np.complex64)
        y = app.forward(from_complex(x))
        ref = np.fft.fftn(x.astype(np.complex128))
        assert rel_err(to_numpy(y), ref) < 5e-6
        z = to_numpy(app.inverse(y))
        assert rel_err(z, x) < 5e-6


def test_pair_zeropad_elision_api():
    """2-D/3-D prefix zero windows ride the pair kernel's read/write
    elision (the N-D extension of the 1-D elision fast path)."""
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    rng = np.random.default_rng(23)
    ny, nz, hy, hz = 128, 128, 64, 96
    x = np.zeros((2, ny, nz), dtype=np.complex64)
    x[:, :hy, :hz] = (rng.standard_normal((2, hy, hz))
                      + 1j * rng.standard_normal((2, hy, hz))).astype(np.complex64)
    cfg = vt.FFTConfig(shape=(ny, nz), zeropad_input=((hy, ny), (hz, nz)),
                       normalize=True)
    app = vt.FFTApplication(cfg, engine="pallas")
    y = to_numpy(app.forward(from_complex(x)))
    ref = np.fft.fft2(x.astype(np.complex128))
    assert rel_err(y, ref) < 2e-6
    z = to_numpy(app.inverse(app.forward(from_complex(x))))
    assert rel_err(z[:, :hy, :hz], x[:, :hy, :hz]) < 2e-6
    assert np.abs(z[:, hy:, :]).max() == 0.0
    assert np.abs(z[:, :, hz:]).max() == 0.0


def test_compute_mode_switch_invalidates_dct_cache():
    """set_mxu_int8 must drop every kernel-builder cache (regression: the
    DCT and r2c-pair builders kept kernels compiled under the previous MXU
    mode; on hardware that silently serves the wrong precision)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    pallas_engine.dct2_lines(x)
    pallas_engine.rfft2_pair_planar(
        jnp.asarray(rng.standard_normal((1, 128, 256)).astype(np.float32)))
    assert pallas_engine._build_dct_call.cache_info().currsize > 0
    assert pallas_engine._build_r2c_pair_call.cache_info().currsize > 0
    pallas_engine.set_mxu_int8(pallas_engine._V3_MXU_INT8)  # no-op value
    assert pallas_engine._build_dct_call.cache_info().currsize == 0
    assert pallas_engine._build_r2c_pair_call.cache_info().currsize == 0


def test_outer_axis_zeropad_elision():
    """Prefix windows on OUTER axes elide the strided kernel's row reads
    (forward) and writes (inverse) — full N-D elision, the sample-51
    zero-padded-volume pattern."""
    from vkfft_tpu.pcomplex import from_complex, to_numpy
    rng = np.random.default_rng(61)
    n0, ny, nz = 8, 128, 128
    h0, hy, hz = 4, 64, 96
    shape = (n0, ny, nz)
    x = np.zeros(shape, dtype=np.complex64)
    x[:h0, :hy, :hz] = (rng.standard_normal((h0, hy, hz))
                        + 1j * rng.standard_normal((h0, hy, hz))).astype(np.complex64)
    cfg = vt.FFTConfig(shape=shape, normalize=True,
                       zeropad_input=((h0, n0), (hy, ny), (hz, nz)))
    app = vt.FFTApplication(cfg, engine="pallas")
    y = to_numpy(app.forward(from_complex(x)))
    ref = np.fft.fftn(x.astype(np.complex128))
    assert rel_err(y, ref) < 2e-6
    z = to_numpy(app.inverse(app.forward(from_complex(x))))
    assert rel_err(z[:h0, :hy, :hz], x[:h0, :hy, :hz]) < 2e-6
    assert np.abs(z[h0:]).max() == 0.0
    assert np.abs(z[:, hy:]).max() == 0.0
    assert np.abs(z[:, :, hz:]).max() == 0.0


def test_strided_elision_kernel():
    """Strided v3 kernel in_keep/out_keep row windows."""
    import jax.numpy as jnp
    rng = np.random.default_rng(62)
    n, h, P, S = 256, 96, 2, 256
    x = np.zeros((P, n, S), np.complex128)
    x[:, :h] = (rng.standard_normal((P, h, S))
                + 1j * rng.standard_normal((P, h, S)))
    xr = jnp.asarray(x.real[:, :h].astype(np.float32))
    xi = jnp.asarray(x.imag[:, :h].astype(np.float32))
    fr, fi = pallas_engine.strided_fft_planar(xr, xi, n, False, in_keep=h)
    ref = np.fft.fft(x, axis=1)
    assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 2e-6
    br, bi = pallas_engine.strided_fft_planar(fr, fi, n, True,
                                              scale=1.0 / n, out_keep=h)
    assert br.shape == (P, h, S)
    assert rel_err(np.asarray(br) + 1j * np.asarray(bi), x[:, :h]) < 2e-6


def test_interior_zeropad_elision():
    """Round 3 (verdict item 7): an interior declared-zero window
    [left, right) with right < n elides the read of the zero middle —
    prefix and tail are DMA'd as two BlockSpec windows.  The application
    routes aligned interior windows to the elided kernel and reports the
    mode via ``zeropad_mode`` / ``debug.describe``."""
    import jax.numpy as jnp
    from vkfft_tpu import FFTConfig, FFTApplication, debug
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.pcomplex import Planar
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(7)
        # windows must be lane-tile-legal (round-4 hardware audit: block
        # dims 128-divisible) — unaligned interior windows route to masking
        assert not pe.v3_interior_window_ok(512, 100, 256)
        assert not pe.v3_interior_window_ok(1024, 100, 896)
        for n, (l, r) in [(1024, (256, 768)), (512, (128, 384)),
                          (1024, (128, 896))]:
            assert pe.v3_interior_window_ok(n, l, r), (n, l, r)
            x = rng.standard_normal((130, n)).astype(np.float32)
            y = rng.standard_normal((130, n)).astype(np.float32)
            x[:, l:r] = 0
            y[:, l:r] = 0
            fr, fi = pe.core_fft_planar_v3(jnp.asarray(x), jnp.asarray(y),
                                           n, False, in_window=(l, r))
            ref = np.fft.fft((x + 1j * y).astype(np.complex128))
            got = np.asarray(fr) + 1j * np.asarray(fi)
            assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6
        # unaligned tail falls back (gate says no)
        assert not pe.v3_interior_window_ok(1024, 100, 900)
        # application routing + introspection surface
        app = FFTApplication(FFTConfig(shape=(1024,),
                                       zeropad_input=((256, 768),),
                                       normalize=True), engine="pallas")
        assert app.zeropad_mode.startswith("elided-interior")
        assert "zeropad=elided-interior" in debug.describe(app)
        x = rng.standard_normal((130, 1024)).astype(np.float32)
        x[:, 256:768] = 0
        p = Planar(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
        F = app.forward(p)
        ref = np.fft.fft(x)
        got = np.asarray(F.re) + 1j * np.asarray(F.im)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6
        # mode reporting for the other routes
        app2 = FFTApplication(FFTConfig(shape=(1024,),
                                        zeropad_input=((600, 1024),)),
                              engine="pallas")
        assert app2.zeropad_mode == "elided-prefix"
        app3 = FFTApplication(FFTConfig(shape=(1024,),
                                        zeropad_input=((100, 900),)),
                              engine="pallas")
        assert app3.zeropad_mode == "masked"
    finally:
        pe.set_interpret(False)


def test_strided_unaligned_trailing_batch():
    """Strided tile rounds UP to whole lane tiles when the trailing batch
    is unaligned (e.g. s=129 from a half-spectrum axis) — an unaligned
    tile fails Mosaic layout inference on hardware (round-3 e28 finding;
    hardware coverage in tpu_smoke)."""
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    from vkfft_tpu.planner import plan_axis
    pallas_engine.set_interpret(True)
    try:
        assert pallas_engine._strided_tile_s(256, 129) % 128 == 0
        rng = np.random.default_rng(46)
        x = rng.standard_normal((2, 256, 129)) + 1j * rng.standard_normal((2, 256, 129))
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        q = pallas_engine.fft_axis_p(p, 1, plan_axis(256), False)
        ref = np.fft.fft(x, axis=1)
        got = np.asarray(q.re) + 1j * np.asarray(q.im)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6
    finally:
        pallas_engine.set_interpret(False)


# ---------------------------------------------------------------------------
# Round 5: outer-axis kernel, fused long-tier Bluestein, conv interleaving
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [64, 256, 60, 7, 512])
def test_outer_kernel_vs_numpy(n):
    """Outer-axis kernel: natural rank-4 layout, leading-dim all-VPU stages
    (round 5; kills the XLA relayout the (P, n, S) strided view pays for
    axes ahead of the minor dims — BENCH fact 38)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(n)
    x = rng.standard_normal((1, n, 16, 128)) + 1j * rng.standard_normal((1, n, 16, 128))
    xr = jnp.asarray(x.real.astype(np.float32))
    xi = jnp.asarray(x.imag.astype(np.float32))
    fr, fi = pallas_engine.outer_fft_planar(xr, xi, n, False)
    ref = np.fft.fft(x, axis=1)
    assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 5e-6
    ir, ii = pallas_engine.outer_fft_planar(fr, fi, n, True, scale=1.0 / n)
    assert rel_err(np.asarray(ir) + 1j * np.asarray(ii), x) < 5e-6


def test_outer_kernel_elision_windows():
    """in_keep/out_keep row-prefix elision incl. pruned stage-1 terms."""
    import jax.numpy as jnp
    n, keep = 256, 96
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, n, 8, 128)) + 1j * rng.standard_normal((1, n, 8, 128))
    x[:, keep:] = 0
    xr = jnp.asarray(x.real.astype(np.float32))
    xi = jnp.asarray(x.imag.astype(np.float32))
    fr, fi = pallas_engine.outer_fft_planar(xr, xi, n, False, in_keep=keep)
    ref = np.fft.fft(x, axis=1)
    assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 5e-6
    orr, oi = pallas_engine.outer_fft_planar(xr, xi, n, False, out_keep=128)
    assert orr.shape[1] == 128
    assert rel_err(np.asarray(orr) + 1j * np.asarray(oi), ref[:, :128]) < 5e-6


def test_outer_kernel_routing_3d():
    """fft_axis_p routes outer axes through the outer kernel when the
    natural rank-4 view qualifies (axis <= ndim-3, nz lane-aligned)."""
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    from vkfft_tpu.planner import plan_axis
    rng = np.random.default_rng(9)
    x = rng.standard_normal((64, 16, 128)) + 1j * rng.standard_normal((64, 16, 128))
    p = Planar(jnp.asarray(x.real.astype(np.float32)),
               jnp.asarray(x.imag.astype(np.float32)))
    assert pallas_engine.outer_available(64, 16, 128)
    q = pallas_engine.fft_axis_p(p, 0, plan_axis(64), False)
    ref = np.fft.fft(x, axis=0)
    assert rel_err(np.asarray(q.re) + 1j * np.asarray(q.im), ref) < 5e-6


def test_outer_plan_gate():
    assert pallas_engine._outer_plan(256) == (4, 4, 4, 4)
    assert pallas_engine._outer_plan(512) == (4, 4, 4, 4, 2)
    assert pallas_engine._outer_plan(60) == (4, 3, 5)
    assert pallas_engine._outer_plan(11) is None      # prime > 7
    assert pallas_engine._outer_plan(1 << 13) is None  # beyond cap
    assert not pallas_engine.outer_available(256, 16, 120)  # nz not 128-mult


def test_bluestein_long_fused_chirp():
    """Round-5 chirp fusion: the long tier's chirp pre/post multiplies ride
    the strided kernels as full rows-kind tables (no m-sized XLA passes —
    reference fuses the chirp at every size, vkFFT_Bluestein.h:32)."""
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    for (n, m) in ((460, 16384), (700, 32768)):
        assert pallas_engine._long_conv_ok(m)
        rng = np.random.default_rng(n)
        x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        f = pallas_engine._bluestein_long_fused_p(p, n, m, False)
        ref = np.fft.fft(x, axis=1)
        assert rel_err(np.asarray(f.re) + 1j * np.asarray(f.im), ref) < 5e-5
        z = pallas_engine._bluestein_long_fused_p(f, n, m, True, scale=1.0 / n)
        assert rel_err(np.asarray(z.re) + 1j * np.asarray(z.im), x) < 5e-5


def test_conv_v3_interleave_slabs():
    """The fused conv kernel's il slab loop (round 5) keeps per-slab table
    columns correct for rows-mode tables (N-D last-axis convolution)."""
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    n, rows, B = 256, 128, 512
    rng = np.random.default_rng(11)
    x = rng.standard_normal((B, n)) + 1j * rng.standard_normal((B, n))
    tab = rng.standard_normal((n, rows)) + 1j * rng.standard_normal((n, rows))
    p = Planar(jnp.asarray(x.real.astype(np.float32)),
               jnp.asarray(x.imag.astype(np.float32)))
    ref = np.fft.ifft(np.fft.fft(x, axis=1)
                      * tab.T[np.arange(B) % rows], axis=1) * n
    old = pallas_engine._V3_IL_OVERRIDE
    try:
        pallas_engine._V3_IL_OVERRIDE = 2
        y = pallas_engine.conv_fused_v3_rows(
            p, n, rows, np.ascontiguousarray(tab * (1.0 / n)))
    finally:
        pallas_engine._V3_IL_OVERRIDE = old
    got = np.asarray(y.re) + 1j * np.asarray(y.im)
    assert rel_err(got, ref * (1.0 / n)) < 5e-5


def test_strided_ilp_interleave():
    """Leading-dim (P-line) interleave in the v3 strided kernel (round 5):
    small-S workloads can't interleave lane chunks; il_p lines per grid
    step supply the independent pipelines instead."""
    import jax.numpy as jnp
    rng = np.random.default_rng(21)
    x = rng.standard_normal((4, 256, 256)) + 1j * rng.standard_normal((4, 256, 256))
    xr = jnp.asarray(x.real.astype(np.float32))
    xi = jnp.asarray(x.imag.astype(np.float32))
    old = pallas_engine._STRIDED_ILP_OVERRIDE
    try:
        pallas_engine._STRIDED_ILP_OVERRIDE = 2
        pallas_engine._build_strided_call.cache_clear()
        fr, fi = pallas_engine.strided_fft_planar(xr, xi, 256, False)
    finally:
        pallas_engine._STRIDED_ILP_OVERRIDE = old
        pallas_engine._build_strided_call.cache_clear()
    ref = np.fft.fft(x, axis=1)
    assert rel_err(np.asarray(fr) + 1j * np.asarray(fi), ref) < 5e-6


def test_bluestein_pair_kernel():
    """Round 5: the ONE-kernel long-tier Bluestein (conv-pair form) — the
    (Nc, Ns) four-step plane with chirps, inter-pass twiddles and the
    spectrum multiply all inside one kernel (vkFFT_Bluestein.h:32,201)."""
    import jax.numpy as jnp
    from vkfft_tpu.pcomplex import Planar
    for (n, m) in ((10007, 32768), (460, 16384)):
        rng = np.random.default_rng(n)
        x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
        p = Planar(jnp.asarray(x.real.astype(np.float32)),
                   jnp.asarray(x.imag.astype(np.float32)))
        f = pallas_engine._bluestein_pair_p(p, n, m, False)
        ref = np.fft.fft(x, axis=1)
        assert rel_err(np.asarray(f.re) + 1j * np.asarray(f.im), ref) < 5e-5
        z = pallas_engine._bluestein_pair_p(f, n, m, True, scale=1.0 / n)
        assert rel_err(np.asarray(z.re) + 1j * np.asarray(z.im), x) < 5e-5
        # declared-zero input tail narrows the read window
        x2 = np.array(x)
        x2[:, n // 3:] = 0
        p2 = Planar(jnp.asarray(x2.real.astype(np.float32)),
                    jnp.asarray(x2.imag.astype(np.float32)))
        f2 = pallas_engine._bluestein_pair_p(p2, n, m, False,
                                             in_keep=n // 3)
        ref2 = np.fft.fft(x2, axis=1)
        assert rel_err(np.asarray(f2.re) + 1j * np.asarray(f2.im),
                       ref2) < 5e-5
