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


def test_user_benchmark_save_load(tmp_path):
    """Reference -save/-load flags: persist the plan blob from sample 200
    and rebuild the application from it."""
    blob = str(tmp_path / "plan.bin")
    run_sample(200, ["-X", "64", "-B", "2", "-N", "2", "-save", blob])
    run_sample(200, ["-X", "64", "-B", "2", "-N", "2", "-load", blob])
