"""Planner unit tests — the layer the reference never unit-tested (its
factorization is only exercised end-to-end through the CLI suite,
``vkFFT_Scheduler.h:2289-2404``)."""
import numpy as np
import pytest

from vkfft_tpu.planner import (
    Algorithm,
    build_stages,
    decompose,
    is_prime,
    next_smooth,
    plan_axis,
    prime_factors,
)
from vkfft_tpu.planner.factorize import MAX_DIRECT_PRIME, MAX_GROUP_RADIX


@pytest.mark.parametrize("n,expect", [
    (1, []),
    (2, [2]),
    (12, [2, 2, 3]),
    (360, [2, 2, 2, 3, 3, 5]),
    (10007, [10007]),
    (2 * 3 * 5 * 7 * 11 * 13, [2, 3, 5, 7, 11, 13]),
])
def test_prime_factors(n, expect):
    assert prime_factors(n) == expect


def test_is_prime():
    primes = {2, 3, 5, 7, 11, 13, 17, 97, 101, 10007}
    for n in range(2, 110):
        assert is_prime(n) == (n in primes or all(n % p for p in range(2, n)))


@pytest.mark.parametrize("n", [2, 3, 4, 6, 8, 12, 16, 60, 128, 256, 1024, 4096, 2**16, 360, 1000, 2310])
def test_direct_radices_multiply_to_n(n):
    d = decompose(n)
    assert d.algorithm is Algorithm.DIRECT
    assert int(np.prod(d.radices)) == n
    assert all(r <= 64 for r in d.radices)


def test_pow2_prefers_radix_16():
    assert decompose(4096).radices == (16, 16, 16)
    assert decompose(256).radices == (16, 16)
    # no trailing radix-2 stage for 2^13
    assert 2 not in decompose(8192).radices


def test_direct_prime_stages():
    # primes <= MAX_DIRECT_PRIME run as one direct DFT stage
    for p in (17, 31, 61, 67, 97, 101, 113, 127):
        d = decompose(p)
        assert d.algorithm is Algorithm.DIRECT
        assert d.radices == (p,)


def test_rader_selection():
    # prime > direct limit with smooth p-1 -> Rader over p-1
    d = decompose(131)  # 130 = 2*5*13
    assert d.algorithm is Algorithm.RADER
    assert int(np.prod(d.radices)) == 130
    d2 = decompose(1009)  # 1008 = 2^4*3^2*7
    assert d2.algorithm is Algorithm.RADER


def test_bluestein_selection():
    # 10007 prime with 10006 = 2*5003 (5003 not smooth) -> Bluestein
    d = decompose(10007)
    assert d.algorithm is Algorithm.BLUESTEIN
    assert d.bluestein_size >= 2 * 10007 - 1
    assert decompose(d.bluestein_size).algorithm is Algorithm.DIRECT


def test_split_selection():
    # composite with Rader-eligible large prime factors -> Cooley-Tukey split
    for n, expect in ((2 * 5003, (5003, 2)), (131 * 3, (131, 3)),
                      (131 * 131, (131, 131))):
        d = decompose(n)
        assert d.algorithm is Algorithm.SPLIT
        assert d.split == expect


def test_next_smooth():
    assert next_smooth(1) == 1
    assert next_smooth(17) == 18
    assert next_smooth(121) == 121  # 11^2
    for n in (37, 1000, 12345):
        m = next_smooth(n)
        assert m >= n
        assert all(p <= 13 for p in prime_factors(m))


def test_build_stages_invariants():
    d = decompose(3600)
    stages = build_stages(3600, d.radices)
    L, M = 1, 3600
    for s in stages:
        assert (s.L, s.M) == (L, M)
        assert s.M == s.r * s.Mp
        L, M = L * s.r, M // s.r
    assert (L, M) == (3600, 1)


def test_plan_axis_core_n():
    assert plan_axis(128).core_n == 128
    assert plan_axis(97).core_n == 97   # direct prime stage
    p131 = plan_axis(131)
    assert p131.core_n == 130           # Rader convolution length
    pb = plan_axis(10007)
    assert pb.core_n == pb.decomp.bluestein_size
