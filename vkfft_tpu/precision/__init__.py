from vkfft_tpu.precision.doubledouble import (
    DD,
    DDComplex,
    dd_add,
    dd_from_f64,
    dd_mul,
    dd_neg,
    dd_sub,
    dd_to_f64,
)
