"""CLI driver smoke tests — every fast sample runs end-to-end on CPU (the
reference's suite has no tests of its own test driver; regressions like
planar-output handling surfaced only on hardware)."""
import sys

import numpy as np
import pytest

from vkfft_tpu import cli


def run_sample(num, extra=()):
    rc = cli.main(["-vkfft", str(num), *extra])
    assert rc == 0


def test_list_and_devices(capsys):
    assert cli.main(["-list"]) == 0
    out = capsys.readouterr().out
    assert "precision" in out
    assert cli.main(["-devices"]) == 0


@pytest.mark.parametrize("num", [11, 12, 13, 14, 15, 16, 17, 18, 50, 51, 52, 10])
def test_fast_samples(num):
    run_sample(num)


def test_user_benchmark():
    run_sample(200, ["-X", "64", "-B", "4", "-N", "2"])


def test_user_benchmark_dct():
    run_sample(200, ["-X", "64", "-B", "2", "-N", "2", "-DCT", "2"])
