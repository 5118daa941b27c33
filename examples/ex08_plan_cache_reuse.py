"""Application binary reuse: plan blobs + the XLA persistent compile cache.

Reference analog: API guide "Simple FFT application binary reuse application"
(``VkFFT_API_guide.tex:2580``; ``saveApplicationToString`` /
``loadApplicationFromString``).  Two layers here:

1. plan blobs — a declarative JSON description of the planning state
   (config + per-axis algorithm), shippable to machines without a planner;
2. the XLA persistent cache — compiled TPU executables keyed by HLO, so a
   warm process skips the 20-40 s first compile entirely."""
import numpy as np

from _common import setup, rel_err


def main():
    setup()
    import vkfft_tpu as vt
    from vkfft_tpu import cache
    from vkfft_tpu.pcomplex import from_complex, to_numpy

    # compiled-binary layer: point XLA's cache at a directory once per process
    cache.enable_persistent_cache("/tmp/vkfft_tpu_xla_cache")

    n = 2048
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    app = vt.FFTApplication(vt.FFTConfig(shape=(n,), normalize=True))
    blob = cache.save_application_to_string(app)      # bytes, JSON inside
    print(f"plan blob: {len(blob)} bytes")

    # ...ship blob elsewhere; rebuild without replanning decisions...
    app2 = cache.load_application_from_string(blob)
    y = to_numpy(app2.forward(from_complex(x)))
    err = rel_err(y, np.fft.fft(x))
    print(f"restored app rel err {err:.2e}")
    assert err < 2e-6
    assert rel_err(to_numpy(app2.inverse(app2.forward(from_complex(x)))), x) < 2e-6
    print("ok")


if __name__ == "__main__":
    main()
