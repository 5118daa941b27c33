from vkfft_tpu.parallel.mesh import (
    fft_mesh,
    hybrid_fft_mesh,
    initialize_distributed,
)
from vkfft_tpu.parallel.pencil import (
    DistributedConvolution,
    DistributedFFT,
    pfft,
    pfftn,
    pifftn,
    pirfftn,
    prfftn,
)
