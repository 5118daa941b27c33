from vkfft_tpu.transforms.r2c import rfft, irfft, rfftn, irfftn, rfft2, irfft2
from vkfft_tpu.transforms.r2r import dct, idct, dst, idst, dctn, dstn
from vkfft_tpu.transforms.conv import fftconvolve, ConvolutionApplication
