"""Double-double tier tests (reference quad-precision analog, sample 19 /
``sample_19_precision_VkFFT_quadDoubleDouble.cpp``): target ~2^-48 relative
accuracy from fp32 pairs."""
import numpy as np
import pytest

from vkfft_tpu.precision import dd_add, dd_from_f64, dd_mul, dd_to_f64
from vkfft_tpu.precision.dd_fft import fft_dd


def test_dd_roundtrip_split():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000)
    # split is exact to fp32-pair resolution (~2^-48)
    err = np.abs(dd_to_f64(dd_from_f64(a)) - a)
    assert err.max() < 1e-13


def test_dd_mul_precision():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(512)
    b = rng.standard_normal(512)
    got = dd_to_f64(dd_mul(dd_from_f64(a), dd_from_f64(b)))
    err = np.abs(got - a * b) / np.abs(a * b)
    assert err.max() < 1e-13


def test_dd_add_precision():
    rng = np.random.default_rng(2)
    a = rng.standard_normal(512)
    b = rng.standard_normal(512) * 1e-8
    got = dd_to_f64(dd_add(dd_from_f64(a), dd_from_f64(b)))
    err = np.abs(got - (a + b))
    assert err.max() < 1e-13


@pytest.mark.parametrize("n", [8, 16, 64, 60, 100, 256, 101])
def test_dd_fft_accuracy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    y = fft_dd(x)
    ref = np.fft.fft(x)
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    # ~2^-48 class; far beyond fp32's 1e-7
    assert rel < 5e-12


def test_dd_fft_roundtrip():
    n = 64
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    z = fft_dd(fft_dd(x), inverse=True, normalize=True)
    assert np.abs(z - x).max() < 1e-12


@pytest.mark.parametrize("n", [17, 97, 257])
def test_dd_rader_primes(n):
    """Primes > 13 take the dd Rader path (exact-size p-1 convolution)
    instead of a Bluestein detour — the reference's quad tier has in-kernel
    Rader (``VkFFTGenerateRaderFFTKernel`` per precision)."""
    from vkfft_tpu.precision import dd_fft
    assert dd_fft._DD_MAX_PRIME < n
    rng = np.random.default_rng(n)
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    y = fft_dd(x)
    ref = np.fft.fft(x)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 5e-12


def test_dd_strided_kernel_interpret():
    """Strided dd kernel (middle axis of (P, n, S), lanes = trailing batch)
    matches the oracle at dd precision — no transpose, the dd analog of the
    fp32 strided path."""
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.precision.dd_kernel import dd_fft_strided_pallas
    from vkfft_tpu.precision.doubledouble import (ddc_from_complex128,
                                                  ddc_to_complex128)
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(11)
        for n, s in ((64, 128), (100, 40)):   # s=40 exercises lane padding
            x = (rng.standard_normal((2, n, s))
                 + 1j * rng.standard_normal((2, n, s)))
            y = dd_fft_strided_pallas(ddc_from_complex128(x), n, False)
            got = ddc_to_complex128(y)
            ref = np.fft.fft(x, axis=1)
            assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-12
    finally:
        pe.set_interpret(False)


def test_dd_axis_routes_strided():
    """fft_axis_dd sends non-minor smooth axes through the strided kernel
    (no moveaxis) and matches the oracle."""
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.precision import dd_fft
    from vkfft_tpu.precision.doubledouble import (ddc_from_complex128,
                                                  ddc_to_complex128)
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(12)
        x = (rng.standard_normal((3, 32, 20))
             + 1j * rng.standard_normal((3, 32, 20)))
        y = dd_fft.fft_axis_dd(ddc_from_complex128(x), 1, 32)
        got = ddc_to_complex128(y)
        ref = np.fft.fft(x, axis=1)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-12
    finally:
        pe.set_interpret(False)


def test_dd_four_step_interpret():
    """n beyond the dd kernel's VMEM ceiling runs the dd four-step
    (strided-dd + twiddle + contiguous-dd + transpose) at dd accuracy —
    the quad multi-upload analog."""
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.precision import dd_fft
    from vkfft_tpu.precision.doubledouble import (ddc_from_complex128,
                                                  ddc_to_complex128)
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(13)
        for n in (4096, 6144):
            assert dd_fft._use_dd_fourstep(n)
            x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
            y = ddc_to_complex128(
                dd_fft.fft_lines_dd(ddc_from_complex128(x), n, False))
            ref = np.fft.fft(x)
            assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-14
    finally:
        pe.set_interpret(False)


def test_dd_pallas_kernel_interpret():
    """The single-kernel dd pipeline (VMEM-resident stages) matches the
    oracle at dd precision in interpreter mode."""
    from vkfft_tpu.ops import pallas_engine as pe
    from vkfft_tpu.precision.dd_kernel import dd_fft_pallas, use_dd_kernel
    from vkfft_tpu.precision.doubledouble import (ddc_from_complex128,
                                                  ddc_to_complex128)
    pe.set_interpret(True)
    try:
        rng = np.random.default_rng(9)
        for n in (64, 1000):
            assert use_dd_kernel(n)
            x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
            y = dd_fft_pallas(ddc_from_complex128(x), n, False)
            got = ddc_to_complex128(y)
            ref = np.fft.fft(x)
            assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-12
    finally:
        pe.set_interpret(False)


def test_dd_kernel_hardware_trace_has_no_optimization_barrier():
    """Mosaic cannot lower lax.optimization_barrier (hardware-observed:
    tests/tpu_smoke.py dd section, round 2).  The hardware build
    (interpret=False) must trace the EFT pipeline with barriers off;
    interpreter builds keep them (there the ops run through XLA, whose
    simplifier the barriers exist to block)."""
    import jax
    from jax.experimental import pallas as pl
    from vkfft_tpu.precision import dd_kernel as dk

    stages = dk._dd_stage_tables(64, False)

    def trace(barriers):
        import numpy as np
        import jax.numpy as jnp
        import functools
        kernel = functools.partial(dk._dd_fft_kernel, 64, dk._DD_SB, stages,
                                   barriers)
        # trace the kernel body the way pallas_call does, without running it
        refs = ([jnp.zeros((1, dk._DD_SB, 64), jnp.float32)] * 4
                + [jnp.asarray(t) for st in stages if st[4] is not None
                   for t in st[4]]
                + [jnp.zeros((1, dk._DD_SB, 64), jnp.float32)] * 4)

        class FakeRef:
            def __init__(self, a):
                self.a = a

            def __getitem__(self, idx):
                return self.a[idx]

            def __setitem__(self, idx, v):
                pass

        jaxpr = jax.make_jaxpr(
            lambda *xs: kernel(*[FakeRef(x) for x in xs]) or 0)(*refs)
        return "optimization_barrier" in str(jaxpr)

    assert trace(barriers=True) is True
    assert trace(barriers=False) is False


def test_dd_builder_binds_barriers_from_interpret():
    """Wiring guard (advisor round 2): the builder must bind barriers=False
    exactly when interpret=False.  Intercept pallas_call to capture the
    kernel partial each builder constructs — if the binding were inverted,
    the trace-shape test above would still pass while hardware builds
    regress to tracing optimization_barrier."""
    import functools
    from unittest import mock
    from vkfft_tpu.precision import dd_kernel as dk

    for builder, args in ((dk._build_dd_call, (64, False, 128)),
                          (dk._build_dd_strided_call, (64, False, 8, 256))):
        for interpret in (False, True):
            captured = {}

            def fake_pallas_call(kernel, *a, **kw):
                captured["kernel"] = kernel
                return lambda *xs: None

            with mock.patch.object(dk.pl, "pallas_call", fake_pallas_call):
                builder.__wrapped__(*args, interpret)  # bypass lru_cache
            k = captured["kernel"]
            assert isinstance(k, functools.partial)
            # barriers is the last static positional arg before the refs
            assert k.args[-1] is interpret, (builder.__name__, interpret)
