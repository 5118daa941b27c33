from vkfft_tpu.parallel.mesh import fft_mesh
from vkfft_tpu.parallel.pencil import (
    DistributedFFT,
    pfft,
    pfftn,
    pifftn,
)
