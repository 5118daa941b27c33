"""Every shipped example runs green on the CPU test platform (the reference
ships its examples as compiled benchmark samples; ours are executable docs —
this keeps them from rotting)."""
import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    p for p in (pathlib.Path(__file__).parent.parent / "examples").glob("ex*.py")
)


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.stem)
def test_example(script):
    env = dict(os.environ)
    env["VKFFT_TPU_EXAMPLES_CPU"] = "1"
    env["PYTHONPATH"] = str(script.parent.parent)
    res = subprocess.run(
        [sys.executable, str(script)], cwd=script.parent, env=env,
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, f"{script.name} failed:\n{res.stdout}\n{res.stderr}"
    assert res.stdout.strip().endswith("ok"), res.stdout
