"""LUT factory tests — values checked against direct fp64 formulas (the
reference validates LUTs only implicitly through end-to-end precision runs;
``vkFFT_ManageLUT.h``)."""
import numpy as np

from vkfft_tpu import luts
from vkfft_tpu.planner import plan_axis


def test_dft_matrix_unitary():
    for r in (2, 3, 4, 5, 7, 8, 11, 13, 16, 31):
        D = luts.dft_matrix(r)
        I = D @ np.conj(D.T) / r
        assert np.allclose(I, np.eye(r), atol=1e-12)
        Dinv = luts.dft_matrix(r, inverse=True)
        assert np.allclose(np.conj(D), Dinv)


def test_dft_matrix_matches_numpy():
    for r in (4, 6, 9, 16):
        x = np.random.default_rng(r).standard_normal(r) + 0j
        assert np.allclose(luts.dft_matrix(r) @ x, np.fft.fft(x), atol=1e-12)


def test_stage_twiddle_values():
    tw = luts.stage_twiddle(4, 8)  # M = 32
    i, m = np.meshgrid(np.arange(4), np.arange(8), indexing="ij")
    assert np.allclose(tw, np.exp(-2j * np.pi * i * m / 32), atol=1e-14)
    assert np.allclose(luts.stage_twiddle(4, 8, inverse=True), np.conj(tw))


def test_bluestein_chirp_consistency():
    n, m = 12, 32
    a, b_fft = luts.bluestein_chirp(n, m)
    k = np.arange(n)
    assert np.allclose(a, np.exp(-1j * np.pi * k * k / n), atol=1e-12)
    # convolution identity: FFT-based circular conv of (x*a) with b then *a
    # equals the DFT of x
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y = np.zeros(m, dtype=complex)
    y[:n] = x * a
    conv = np.fft.ifft(np.fft.fft(y) * b_fft)
    assert np.allclose(a * conv[:n], np.fft.fft(x), atol=1e-9)


def test_rader_tables():
    p = 17
    perm, inv_perm, b_fft = luts.rader_tables(p)
    # perm is a permutation of 1..p-1
    assert sorted(perm) == list(range(1, p))
    assert sorted(inv_perm) == list(range(1, p))
    # g^q * g^{-q} == 1 mod p
    assert np.all((perm * inv_perm) % p == 1)
    b = np.exp(-2j * np.pi * inv_perm / p)
    assert np.allclose(np.fft.fft(b), b_fft, atol=1e-12)


def test_r2c_post_twiddle():
    tw = luts.r2c_post_twiddle(16)
    assert tw.shape == (9,)
    assert np.allclose(tw, np.exp(-2j * np.pi * np.arange(9) / 16))


def test_axis_tables_shapes():
    plan = plan_axis(360)
    tabs = luts.axis_tables(plan, inverse=False)
    assert len(tabs["stages"]) == len(plan.stages)
    for (D, tw), s in zip(tabs["stages"], plan.stages):
        assert D.shape == (s.r, s.r)
        assert tw.shape == (s.r, s.Mp)
