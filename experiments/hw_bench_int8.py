"""Run bench.py with the fp32_int8 compute mode (6-pass int8 MXU emulation).

Decision probe for the set_compute_mode default: if this headline beats the
bf16 6-pass fp32 headline at equal error class, flip the default
(RESULTS_TPU_R2.md decision rules).
"""
import os
import runpy

os.environ["VKFFT_TPU_INT8_MXU"] = "1"
runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
               run_name="__main__")
