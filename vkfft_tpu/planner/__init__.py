from vkfft_tpu.planner.factorize import (
    Algorithm,
    SizeDecomposition,
    decompose,
    is_prime,
    next_smooth,
    prime_factors,
)
from vkfft_tpu.planner.plan import AxisPlan, Stage, build_stages, plan_axis
