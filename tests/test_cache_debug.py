"""Plan cache + debug observability tests (reference: binary save/load in
sample 0, ``sample_0...cpp:169-199``; keepShaderCode/printMemoryLayout)."""
import numpy as np
import pytest

import vkfft_tpu as vt
from vkfft_tpu import cache, debug
from vkfft_tpu.planner import plan_axis


def test_plan_save_load_roundtrip():
    cfg = vt.FFTConfig(shape=(64, 32), normalize=True)
    app = vt.FFTApplication(cfg, engine="jnp")
    blob = cache.save_application_to_string(app)
    assert blob.startswith(b"VKFFT-TPU-PLAN")
    app2 = cache.load_application_from_string(blob, engine="jnp")
    assert app2.config == cfg
    assert app2.axis_plans.keys() == app.axis_plans.keys()
    for ax in app.axis_plans:
        assert app2.axis_plans[ax].cache_key() == app.axis_plans[ax].cache_key()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 32)) + 1j * rng.standard_normal((64, 32))
    np.testing.assert_allclose(np.asarray(app2.forward(x)),
                               np.asarray(app.forward(x)), rtol=1e-12)


def test_load_rejects_garbage():
    with pytest.raises(ValueError):
        cache.load_plan(b"not a plan")


def test_describe_and_memory_layout():
    cfg = vt.FFTConfig(shape=(131, 1024))
    app = vt.FFTApplication(cfg, engine="jnp")
    text = debug.describe(app)
    assert "rader" in text
    assert "1024" in text
    layout = debug.memory_layout(app)
    assert "pass axis0" in layout and "output" in layout


def test_describe_bluestein():
    text = debug.describe_axis(plan_axis(10007))
    assert "bluestein" in text and "padded" in text
    split_text = debug.describe_axis(plan_axis(10006))
    assert "split" in split_text and "5003" in split_text


def test_dump_hlo():
    import jax.numpy as jnp
    cfg = vt.FFTConfig(shape=(16,))
    app = vt.FFTApplication(cfg, engine="jnp")
    x = jnp.zeros((2, 16), jnp.complex128)
    text = debug.dump_hlo(app, x)
    assert "dot" in text or "einsum" in text or len(text) > 100


def test_persistent_cache_toggle(tmp_path):
    import jax
    cache.enable_persistent_cache(str(tmp_path / "xla_cache"))
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla_cache")
    jax.config.update("jax_compilation_cache_dir", None)
